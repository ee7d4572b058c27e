"""Data-page parser — span-world port of the reference's
examples/test_server/parser_data.py.

The reference extracts ``.input`` / ``.output`` CSS spans into a flat
{"input": .., "output": ..} row; the synthetic corpus carries them as
``key=value`` text spans. Returns a flat dict — normalized by the
registry to the single-table {"default": [row]} form, exactly like
lib.rs:140-144 wraps parser_data's dict.
"""

from __future__ import annotations

TYPE_ID: int = 2


def parse(spans: list[dict]) -> dict:
    data: dict[str, str] = {}
    for s in spans:
        if s["kind"] == "text" and "=" in s["text"]:
            k, _, v = s["text"].partition("=")
            if k in ("input", "output"):
                data[k] = v
    return data
