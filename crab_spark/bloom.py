"""Bloom pre-filter for the URL-seen set.

The seen-set membership test (crab: UNIQUE index + INSERT OR IGNORE,
storage.rs:20-23, 93-101) is an anti-join here. At 10^10 URLs the
anti-join's shuffle dominates the epoch, and most candidate links in a
steady-state crawl are *already seen* — but the ones that aren't are the
ones we must not lose. A Bloom filter gives a cheap, no-false-negative
"definitely new" test: candidates the filter rejects skip the join
entirely and are appended directly; only the "maybe seen" remainder pays
the shuffle. This is plain DataFrame mechanics, not a Catalyst rule.

Scale note: a single bitmap for 10^10 keys at 1% FPR is ~12 GiB — too
big to broadcast. ``BucketedBloom`` is the production layout: one
bitmap per seen-set hash bucket (the frontier's ``part`` column), built
incrementally per epoch, persisted as a sidecar next to the table
manifest (save_sidecar/load_sidecar) so a resumed crawl catches up from
the per-epoch register deltas instead of rescanning the full frontier;
on a cluster executors only load the buckets they probe. The sandbox
broadcasts the whole dict (same code path, smaller constants).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import N_BUCKETS

# splitmix64 finalizer constants — public-domain integer mixing
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _C1
    x ^= x >> np.uint64(27)
    x *= _C2
    x ^= x >> np.uint64(31)
    return x


class Bloom:
    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.bits = bits if bits is not None else np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_keys: int, fpr: float = 0.01) -> "Bloom":
        n_keys = max(n_keys, 1)
        n_bits = int(-n_keys * np.log(fpr) / (np.log(2) ** 2)) + 8
        n_hashes = max(1, round(n_bits / n_keys * np.log(2)))
        return cls(n_bits, n_hashes)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        # (k, n) positions via double hashing: h1 + i*h2 mod m
        h1 = _mix(keys)
        h2 = _mix(keys ^ _C1) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys.astype(np.uint64)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys.astype(np.uint64))
        probed = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return probed.all(axis=0).astype(bool)

    def union(self, other: "Bloom") -> "Bloom":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        return Bloom(self.n_bits, self.n_hashes, np.bitwise_or(self.bits, other.bits))

    def to_state(self) -> dict:
        return {"kind": "flat", "n_bits": self.n_bits, "n_hashes": self.n_hashes,
                "bits": self.bits.tobytes()}


class BucketedBloom:
    """One Bloom bitmap per frontier hash bucket: keys route by
    ``part = pmod(url_hash, n_buckets)`` (identical to the frontier's
    bucket column, so bitmap b answers exactly bucket b's keys). Same
    interface as Bloom (add / might_contain / union) — register() and
    the probe UDF take either."""

    def __init__(self, n_buckets: int, n_bits: int, n_hashes: int,
                 bits: np.ndarray | None = None):
        self.n_buckets = int(n_buckets)
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        n_bytes = (self.n_bits + 7) // 8
        self.bits = (
            bits if bits is not None
            else np.zeros((self.n_buckets, n_bytes), dtype=np.uint8)
        )

    @classmethod
    def sized_for(cls, n_keys: int, n_buckets: int = N_BUCKETS, fpr: float = 0.01
                  ) -> "BucketedBloom":
        per_bucket = Bloom.sized_for(max(n_keys // max(n_buckets, 1), 1), fpr)
        return cls(n_buckets, per_bucket.n_bits, per_bucket.n_hashes)

    def _buckets(self, keys: np.ndarray) -> np.ndarray:
        # pmod semantics: numpy's % on int64 already yields the sign of
        # the (positive) divisor, matching Spark's pmod
        return keys.view(np.int64) % self.n_buckets

    def add(self, keys: np.ndarray) -> None:
        k = keys.astype(np.uint64)
        b = self._buckets(k)
        for part in np.unique(b):
            # Bloom.add mutates the row view in place
            Bloom(self.n_bits, self.n_hashes, self.bits[int(part)]).add(k[b == part])

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        out = np.zeros(len(k), dtype=bool)
        if len(k) == 0:
            return out
        b = self._buckets(k)
        for part in np.unique(b):
            m = b == part
            out[m] = Bloom(
                self.n_bits, self.n_hashes, self.bits[int(part)]
            ).might_contain(k[m])
        return out

    def union(self, other: "BucketedBloom") -> "BucketedBloom":
        assert (self.n_buckets, self.n_bits, self.n_hashes) == (
            other.n_buckets, other.n_bits, other.n_hashes)
        return BucketedBloom(
            self.n_buckets, self.n_bits, self.n_hashes,
            np.bitwise_or(self.bits, other.bits),
        )

    def to_state(self) -> dict:
        return {"kind": "bucketed", "n_buckets": self.n_buckets,
                "n_bits": self.n_bits, "n_hashes": self.n_hashes,
                "bits": self.bits.tobytes()}


def bloom_from_state(state: dict, writable: bool = True):
    """Rebuild a filter from its to_state() dict. ``writable=False``
    wraps the serialized bytes zero-copy (frombuffer views) — the probe
    path only reads, and skipping the copy matters when this runs once
    per executor over a broadcast of a large filter."""
    if state["kind"] == "cuckoo":
        from .cuckoo import CuckooFilter  # lazy: cuckoo imports our _mix

        return CuckooFilter.from_state(state, writable=writable)
    raw = np.frombuffer(state["bits"], dtype=np.uint8)
    if writable:
        raw = raw.copy()
    if state["kind"] == "bucketed":
        return BucketedBloom(
            state["n_buckets"], state["n_bits"], state["n_hashes"],
            raw.reshape(state["n_buckets"], -1),
        )
    return Bloom(state["n_bits"], state["n_hashes"], raw)


def build_bloom(
    df: DataFrame,
    col: str,
    n_keys_hint: int = 0,
    fpr: float = 0.01,
    proto: Bloom | None = None,
) -> Bloom:
    """Distributed build: each task folds its Arrow batches into a partial
    bitmap; the driver ORs the partials (a tree-reduce on a cluster).
    Pass ``proto`` to size the bitmap compatibly with an existing filter
    (so the result can be union()ed into it — the incremental per-epoch
    maintenance path)."""
    if proto is None:
        proto = Bloom.sized_for(n_keys_hint, fpr)
    empty_state = {k: v for k, v in proto.to_state().items() if k != "bits"}
    bits_shape = proto.bits.shape

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = dict(empty_state)
        st["bits"] = np.zeros(bits_shape, dtype=np.uint8).tobytes()
        b = bloom_from_state(st)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                b.add(pdf[col].to_numpy(dtype=np.int64).view(np.uint64))
        if any_rows:
            yield pd.DataFrame({"bits": [b.bits.tobytes()]})

    partials = df.select(col).mapInPandas(fold, schema=T.StructType(
        [T.StructField("bits", T.BinaryType(), False)])).collect()
    out_bits = np.zeros(bits_shape, dtype=np.uint8)
    for row in partials:
        out_bits |= np.frombuffer(row["bits"], dtype=np.uint8).reshape(bits_shape)
    out_state = dict(empty_state)
    out_state["bits"] = out_bits.tobytes()
    return bloom_from_state(out_state)


# Executor-side memo of deserialized broadcast filters: one probe UDF
# is created per register call, but the worker process survives across
# Arrow batches AND epochs — without this, every batch re-materialized
# the full filter from broadcast state (a whole-bitmap memcpy per batch
# on large filters). Keyed by the UDF's uuid hex; insertion-ordered, so
# eviction drops the OLDEST entries (a wholesale clear would force every
# other live probe UDF to re-deserialize its filter mid-query).
_BC_FILTER_CACHE: dict[str, object] = {}


def might_contain_udf(spark, bloom):
    """Arrow-vectorized membership probe over a long column (flat or
    bucketed filter), with the bitmap(s) broadcast once per executor and
    the deserialized filter memoized per worker process (keyed on the
    broadcast id; read-only zero-copy reconstruction).

    Every call broadcasts a fresh snapshot of the filter (the filter
    may have gained keys since the last call), and broadcast blocks
    live in the BlockManager for the SparkContext lifetime unless
    released — on the module's own ~12 GiB large-filter sizing that is
    an unbounded leak across epochs. The handle is exposed as
    ``probe.broadcast``; callers that own the probe must destroy it
    once no plan referencing the UDF will run again (register() does
    this for probes it creates itself)."""
    bc = spark.sparkContext.broadcast(bloom.to_state())
    bc_id = uuid.uuid4().hex  # one deserialization per (UDF, worker)

    @F.pandas_udf(T.BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        b = _BC_FILTER_CACHE.get(bc_id)
        if b is None:
            while len(_BC_FILTER_CACHE) > 8:  # old epochs' broadcasts
                _BC_FILTER_CACHE.pop(next(iter(_BC_FILTER_CACHE)))
            b = bloom_from_state(bc.value, writable=False)
            _BC_FILTER_CACHE[bc_id] = b
        return pd.Series(b.might_contain(keys.to_numpy(dtype=np.int64).view(np.uint64)))

    probe.broadcast = bc
    return probe


# ---------------------------------------------------------------------------
# Sidecar persistence — the seen-set filter lives NEXT TO the table
# manifest (i.e. on the same shared filesystem/object store as the
# table's data files — where Iceberg keeps its metadata) so a resumed
# crawl loads it and folds in only the register deltas committed after
# the last save (O(delta), not O(frontier)).
#
# Layout is a DIRECTORY, one file per frontier `part` bucket plus a
# meta.json committed last:
#
#   <name>.d/meta.json        {"version", "covered", kind+params}
#   <name>.d/part-<n>.bin     raw bitmap row (bloom) / shard table (cuckoo)
#
# so (a) the per-epoch incremental save rewrites ONLY the parts the
# delta touched, and (b) the executor-side probe loads ONLY the parts
# present in its batch (sidecar_probe_udf) — the whole filter is NEVER
# broadcast. bloom.py's own sizing math says a 10^10-key/1% FPR filter
# is ~12 GiB: per-part files are the only layout that scales.
#
# Crash safety: part files are replaced atomically, meta last. A part
# file newer than meta either contains a SUPERSET of the keys meta
# covers (bloom bits only gain; cuckoo inserts keep existing
# fingerprints, duplicates allowed) or — when a cuckoo kick chain
# exhausted mid-insert, which displaces one stored fingerprint and
# skips the insert call's remaining keys — carries the saturation flag
# IN-BAND (shard_to_bytes' trailing byte), making every probe answer
# 'maybe'. Either way a torn save can cause extra 'maybe' probes but
# never a false negative, even against a stale meta.
# ---------------------------------------------------------------------------

def _atomic_write(path: Path, data: bytes) -> None:
    tmp = path.with_suffix(f".tmp-{uuid.uuid4().hex}")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def _sweep_tmp(d: Path) -> None:
    """Remove orphaned _atomic_write temp files (a crash or task kill
    between write_bytes and os.replace leaves a part-sized *.tmp-* file
    nothing else ever touches). Called driver-side at save/fold entry —
    before any task starts writing — so it never races a live writer."""
    for f in d.glob("*.tmp-*"):
        f.unlink(missing_ok=True)


def _filter_meta(filt) -> dict:
    """Filter parameters for meta.json WITHOUT serializing any bitmap —
    an incremental save must never pay a full-filter memcpy (that is
    the cost the per-part layout exists to avoid)."""
    if hasattr(filt, "shards"):  # cuckoo
        return {"kind": "cuckoo", "n_buckets": filt.n_buckets,
                "shard_bkts": filt.shard_bkts, "parts": sorted(filt.shards),
                "sat_parts": filt.saturated_parts()}
    if hasattr(filt, "n_buckets"):  # bucketed bloom
        return {"kind": "bucketed", "n_buckets": filt.n_buckets,
                "n_bits": filt.n_bits, "n_hashes": filt.n_hashes}
    return {"kind": "flat", "n_bits": filt.n_bits, "n_hashes": filt.n_hashes}


def save_sidecar(path: str | Path, filt, covered_tags: set[str],
                 changed_parts: set[int] | None = None) -> None:
    """Persist the filter. ``changed_parts`` limits the write to the
    parts an epoch's delta touched (None = write everything — the
    cold-build path). meta.json is committed last via os.replace and
    records a PER-PART version: an unchanged part keeps its version, so
    executor caches keyed on it stay warm across epochs instead of
    being invalidated wholesale by every save."""
    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)
    _sweep_tmp(d)
    meta = _filter_meta(filt)
    meta["covered"] = sorted(covered_tags)
    old = _read_meta(d)
    meta["version"] = (old.get("version", 0) if old else 0) + 1
    # generation id: survives across saves, changes when the sidecar is
    # rebuilt after meta loss (where the version counter restarts) —
    # executor part caches key on it so they can never serve a previous
    # generation's filter objects
    meta["gen"] = old.get("gen", uuid.uuid4().hex) if old else uuid.uuid4().hex
    part_versions: dict[str, int] = dict(old.get("part_versions", {})) if old else {}
    if old is not None:
        params = ("kind", "n_bits", "n_hashes", "n_buckets", "shard_bkts")
        if any(old.get(k) != meta.get(k) for k in params):
            # filter was rebuilt with different geometry: every existing
            # part file is garbage — a partial save over them would mix
            # layouts, so wipe and force a full rewrite
            for f in d.glob("part-*.bin"):
                f.unlink()
            changed_parts = None
            part_versions = {}

    written: set[str] = set()
    if meta["kind"] == "flat":
        _atomic_write(d / "part-flat.bin", filt.bits.tobytes())
        part_versions["flat"] = meta["version"]
        written.add("flat")
    elif meta["kind"] == "bucketed":
        parts = (
            range(filt.n_buckets) if changed_parts is None
            else sorted(changed_parts)
        )
        for p in parts:
            row = filt.bits[int(p)]
            if changed_parts is None and not row.any():
                continue  # all-zero bucket: absence means zeros
            _atomic_write(d / f"part-{int(p)}.bin", row.tobytes())
            part_versions[str(int(p))] = meta["version"]
            written.add(str(int(p)))
    else:  # cuckoo: one file per existing shard
        from .cuckoo import shard_to_bytes

        parts = (
            filt.shards.keys() if changed_parts is None
            else (set(changed_parts) & set(filt.shards))
        )
        for p in parts:
            _atomic_write(d / f"part-{int(p)}.bin",
                          shard_to_bytes(filt.shards[int(p)]))
            part_versions[str(int(p))] = meta["version"]
            written.add(str(int(p)))
    if changed_parts is None:
        # FULL save: a part file this pass skipped (all-zero bloom
        # bucket, cuckoo shard dropped from filt.shards) no longer
        # exists in the in-memory filter — unlink it and drop its
        # version entry, or a later probe resurrects stale keys (after
        # a CuckooFilter.delete, a false 'maybe' that defeats the
        # delete; for bloom, bits the rebuild no longer sets).
        for stale in set(part_versions) - written:
            (d / ("part-flat.bin" if stale == "flat"
                  else f"part-{stale}.bin")).unlink(missing_ok=True)
            del part_versions[stale]
    meta["part_versions"] = part_versions
    _atomic_write(d / "meta.json", json.dumps(meta).encode())


def _read_meta(d: Path) -> dict | None:
    p = d / "meta.json"
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except Exception:
        return None


def load_sidecar(path: str | Path):
    """Driver-side full reconstruction: (filter, covered_tags) or None
    if absent/unreadable (caller rebuilds from the table)."""
    d = Path(path)
    meta = _read_meta(d)
    if meta is None:
        return None
    try:
        kind = meta["kind"]
        if kind == "flat":
            bits = (d / "part-flat.bin").read_bytes()
            state = {"kind": "flat", "n_bits": meta["n_bits"],
                     "n_hashes": meta["n_hashes"], "bits": bits}
            return bloom_from_state(state), set(meta["covered"])
        if kind == "bucketed":
            b = BucketedBloom(meta["n_buckets"], meta["n_bits"], meta["n_hashes"])
            for p in range(b.n_buckets):
                f = d / f"part-{p}.bin"
                if f.exists():
                    b.bits[p] = np.frombuffer(f.read_bytes(), dtype=np.uint8)
            return b, set(meta["covered"])
        # cuckoo
        from .cuckoo import CuckooFilter, shard_from_bytes

        filt = CuckooFilter({}, meta["n_buckets"], meta["shard_bkts"])
        for p in meta.get("parts", []):
            filt.shards[int(p)] = shard_from_bytes(
                (d / f"part-{int(p)}.bin").read_bytes(), meta["shard_bkts"]
            )
        for p in meta.get("sat_parts", []):
            # meta saturation is a superset of in-band flags only for
            # legacy files; union the two sources
            filt.shards[int(p)].saturated = True
        return filt, set(meta["covered"])
    except Exception:
        return None  # corrupt sidecar ⇒ caller rebuilds from the table


# Worker-process cache of loaded part files, keyed (dir, version, part).
# Bounded: old versions evicted wholesale when the cache grows.
_PART_CACHE: dict[tuple[str, str, int, int], object] = {}


def _load_part(d: str, version: int, part: int, meta: dict):
    """One part's probe-ready filter object, loaded lazily and memoized
    per worker process, keyed on the sidecar's generation id AND the
    part's OWN version (unchanged parts stay cached across epochs).
    The generation id guards meta-loss rebuilds: a sidecar rebuilt from
    scratch restarts its version counter at 1, and without the
    generation in the key a long-lived worker would keep serving the
    PREVIOUS sidecar's cached parts — reporting seen URLs as
    'definitely new'. Missing file = no keys in that part (all-new)."""
    key = (d, str(meta.get("gen", "")), version, part)
    got = _PART_CACHE.get(key)
    if got is not None:
        return got
    while len(_PART_CACHE) > 256:  # oldest-first: keep other UDFs' hot parts
        _PART_CACHE.pop(next(iter(_PART_CACHE)))
    kind = meta["kind"]
    f = Path(d) / ("part-flat.bin" if kind == "flat" else f"part-{part}.bin")
    if not f.exists():
        _PART_CACHE[key] = False
        return False
    raw = f.read_bytes()
    if kind == "cuckoo":
        from .cuckoo import shard_from_bytes

        # writable=False: probes never mutate; the in-band saturation
        # flag makes a post-saturation file answer 'maybe' even when
        # paired with a stale meta that lacks the sat_parts entry
        obj = shard_from_bytes(raw, meta["shard_bkts"], writable=False)
    else:
        obj = Bloom(meta["n_bits"], meta["n_hashes"],
                    np.frombuffer(raw, dtype=np.uint8))
    _PART_CACHE[key] = obj
    return obj


def probe_sidecar(keys: np.ndarray, d: str, meta: dict) -> np.ndarray:
    """Vectorized membership probe that touches ONLY the part files the
    key batch routes to. Pure function (worker-side body of
    sidecar_probe_udf; unit-testable for file selectivity). Cuckoo
    saturation is read from META, not the cached shard object — a shard
    can saturate without its file version changing."""
    out = np.zeros(len(keys), dtype=bool)
    if len(keys) == 0:
        return out
    k = keys.astype(np.uint64)
    pv = meta.get("part_versions", {})
    if meta["kind"] == "flat":
        b = _load_part(d, int(pv.get("flat", meta.get("version", 0))), -1, meta)
        return b.might_contain(k) if b is not False else out
    n_buckets = int(meta["n_buckets"])
    sat = set(meta.get("sat_parts", []))
    parts = k.view(np.int64) % n_buckets
    for p in np.unique(parts):
        m = parts == p
        if meta["kind"] == "cuckoo" and int(p) in sat:
            out[m] = True
            continue
        b = _load_part(d, int(pv.get(str(int(p)), 0)), int(p), meta)
        if b is False:
            continue
        if meta["kind"] == "cuckoo":
            out[m] = b.contains(k[m])
        else:
            out[m] = b.might_contain(k[m])
    return out


def fold_delta_files(spark, delta: DataFrame, path: str | Path,
                     tag: str | None = None, col: str = "url_hash") -> dict | None:
    """Fold one register delta's keys into the sidecar part files
    EXECUTOR-SIDE (r3 verdict item 2: the driver must never materialize
    an epoch's keys — at a link-rich 100× epoch that was ~1 GB/epoch
    through the driver).

    Shape: the delta is hash-partitioned on ``part`` so each part's keys
    land in exactly one task; the task loads that part's current file
    (shared filesystem/object store, same place the table's data files
    live), inserts its keys, and atomically replaces the file. The
    driver's only work is the meta.json commit (versions, covered tag,
    cuckoo part/saturation bookkeeping) — O(touched parts) dict
    entries, zero key bytes.

    Crash/retry safety: part files only ever gain keys (bloom bits OR
    in; cuckoo inserts keep existing fingerprints, duplicates allowed)
    — except a cuckoo shard whose kick chain exhausts, which evicts one
    fingerprint and skips the call's remaining keys; that file carries
    its saturation flag in-band (shard_to_bytes), so readers answer
    'maybe' for everything even under a stale meta. A torn fold or a
    retried task therefore yields extra 'maybe' probes, never a false
    negative; meta commits last, and re-folding an already-folded tag
    is idempotent for bloom and superset-safe for cuckoo. Returns the
    updated meta, or None if no sidecar exists (caller cold-builds)."""
    d = Path(path)
    meta = _read_meta(d)
    if meta is None:
        return None
    _sweep_tmp(d)  # driver-side, before any task writes
    kind = meta["kind"]
    ds = str(d)
    fold_schema = T.StructType([
        T.StructField("part", T.IntegerType(), False),
        T.StructField("saturated", T.BooleanType(), False),
    ])

    if kind == "flat":
        # single bitmap file: one task folds everything (still executor-
        # side; the flat layout is the small-scale config by definition)
        keyed = delta.select(F.col(col).alias("k")).coalesce(1)
        n_bits, n_hashes = int(meta["n_bits"]), int(meta["n_hashes"])

        def fold_flat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            chunks = [pdf["k"].to_numpy(dtype=np.int64).view(np.uint64)
                      for pdf in batches if len(pdf)]
            if chunks:
                f = Path(ds) / "part-flat.bin"
                raw = (np.frombuffer(f.read_bytes(), dtype=np.uint8).copy()
                       if f.exists()
                       else np.zeros((n_bits + 7) // 8, dtype=np.uint8))
                b = Bloom(n_bits, n_hashes, raw)
                b.add(np.concatenate(chunks))
                _atomic_write(f, b.bits.tobytes())
                yield pd.DataFrame({"part": [-1], "saturated": [False]})

        touched_rows = keyed.mapInPandas(fold_flat, schema=fold_schema).collect()
        touched = {"flat"} if touched_rows else set()
        new_sat: set[int] = set()
    else:
        n_buckets = int(meta["n_buckets"])
        keyed = delta.select(F.col(col).alias("k")).withColumn(
            "part", F.pmod(F.col("k"), F.lit(n_buckets)).cast("int")
        )
        # each part wholly in ONE task → no two tasks touch one file
        n_parts = max(spark.sparkContext.defaultParallelism, 4)
        keyed = keyed.repartition(n_parts, "part")
        mparams = {k: meta[k] for k in ("kind", "n_bits", "n_hashes",
                                        "n_buckets", "shard_bkts") if k in meta}
        # known-saturated shards (monotone union on the driver) ship to
        # the tasks so legacy flag-less files skip their insert loops
        msat = {int(x) for x in meta.get("sat_parts", [])}

        def fold_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc: dict[int, list[np.ndarray]] = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                for p, grp in pdf.groupby("part"):
                    acc.setdefault(int(p), []).append(
                        grp["k"].to_numpy(dtype=np.int64).view(np.uint64)
                    )
            out_p, out_s = [], []
            for p, chunks in acc.items():
                keys = np.concatenate(chunks)
                f = Path(ds) / f"part-{p}.bin"
                raw = f.read_bytes() if f.exists() else None
                if mparams["kind"] == "cuckoo":
                    from .cuckoo import CuckooShard, shard_from_bytes, shard_to_bytes

                    shard = (
                        shard_from_bytes(raw, mparams["shard_bkts"])
                        if raw is not None else CuckooShard(mparams["shard_bkts"])
                    )
                    if not shard.saturated and int(p) in msat:
                        # legacy file (flag only in meta): restore the
                        # flag so insert() is a free early return
                        # instead of a guaranteed-to-fail kick chain
                        # per key, every epoch, forever
                        shard.saturated = True
                    shard.insert(keys)
                    _atomic_write(f, shard_to_bytes(shard))
                    sat = bool(shard.saturated)
                else:
                    bits = (
                        np.frombuffer(raw, dtype=np.uint8).copy()
                        if raw is not None
                        else np.zeros((mparams["n_bits"] + 7) // 8, dtype=np.uint8)
                    )
                    b = Bloom(mparams["n_bits"], mparams["n_hashes"], bits)
                    b.add(keys)
                    _atomic_write(f, b.bits.tobytes())
                    sat = False
                out_p.append(p)
                out_s.append(sat)
            if out_p:
                yield pd.DataFrame({"part": out_p, "saturated": out_s})

        touched_rows = keyed.mapInPandas(fold_parts, schema=fold_schema).collect()
        touched = {str(int(r["part"])) for r in touched_rows}
        new_sat = {int(r["part"]) for r in touched_rows if r["saturated"]}

    # driver-side: META ONLY — bump versions of touched parts, record
    # coverage, merge cuckoo part/saturation lists
    meta["version"] = meta.get("version", 0) + 1
    pv = dict(meta.get("part_versions", {}))
    for p in touched:
        pv[p] = meta["version"]
    meta["part_versions"] = pv
    if tag is not None:
        meta["covered"] = sorted(set(meta.get("covered", [])) | {tag})
    if kind == "cuckoo":
        meta["parts"] = sorted(
            set(meta.get("parts", [])) | {int(p) for p in touched}
        )
        meta["sat_parts"] = sorted(set(meta.get("sat_parts", [])) | new_sat)
    _atomic_write(d / "meta.json", json.dumps(meta).encode())
    return meta


def rewrite_covered(path: str | Path, covered_tags: set[str]) -> dict | None:
    """Re-baseline the sidecar's covered-tag set without touching any
    part file (used when a table compaction collapses the reg-* tags
    the sidecar tracked into one compact-* tag)."""
    d = Path(path)
    meta = _read_meta(d)
    if meta is None:
        return None
    meta["covered"] = sorted(covered_tags)
    meta["version"] = meta.get("version", 0) + 1
    _atomic_write(d / "meta.json", json.dumps(meta).encode())
    return meta


def sidecar_probe_udf(spark, path: str | Path):
    """Membership probe UDF backed by the per-part sidecar FILES: the
    closure carries only (dir, meta) — a few hundred bytes — and each
    worker lazily loads just the part files its batches route to. This
    is the scale path: nothing filter-sized ever transits the driver→
    executor broadcast channel. Returns None if no sidecar exists."""
    d = Path(path)
    meta = _read_meta(d)
    if meta is None:
        return None
    meta = {k: v for k, v in meta.items() if k != "covered"}
    ds = str(d)

    @F.pandas_udf(T.BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        return pd.Series(
            probe_sidecar(
                keys.to_numpy(dtype=np.int64).view(np.uint64), ds, meta
            )
        )

    return probe
