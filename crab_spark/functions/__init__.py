"""Column-level function helpers (HTML→spans conversion, URL hashing —
the engine's equivalent of the reference's parsing utilities)."""
