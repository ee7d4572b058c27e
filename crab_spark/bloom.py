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


def bloom_from_state(state: dict):
    if state["kind"] == "cuckoo":
        from .cuckoo import CuckooFilter  # lazy: cuckoo imports our _mix

        return CuckooFilter.from_state(state)
    raw = np.frombuffer(state["bits"], dtype=np.uint8)
    if state["kind"] == "bucketed":
        return BucketedBloom(
            state["n_buckets"], state["n_bits"], state["n_hashes"],
            raw.reshape(state["n_buckets"], -1).copy(),
        )
    return Bloom(state["n_bits"], state["n_hashes"], raw.copy())


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


def might_contain_udf(spark, bloom):
    """Arrow-vectorized membership probe over a long column (flat or
    bucketed filter), with the bitmap(s) broadcast once per executor
    (not per task)."""
    bc = spark.sparkContext.broadcast(bloom.to_state())

    @F.pandas_udf(T.BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        b = bloom_from_state(bc.value)
        return pd.Series(b.might_contain(keys.to_numpy(dtype=np.int64).view(np.uint64)))

    return probe


# ---------------------------------------------------------------------------
# Sidecar persistence — the seen-set filter lives NEXT TO the table
# manifest so a resumed crawl loads it and folds in only the register
# deltas committed after the last save (O(delta), not O(frontier)).
# The sidecar may lag the manifest (crash between register-commit and
# save) but never lead it, so a catch-up union can only ADD keys —
# false negatives (the dangerous direction) are impossible.
# ---------------------------------------------------------------------------

def save_sidecar(path: str | Path, bloom, covered_tags: set[str]) -> None:
    """Atomic write (os.replace) of the filter + the register tags it
    covers."""
    path = Path(path)
    meta = {k: v for k, v in bloom.to_state().items() if k != "bits"}
    meta["covered"] = sorted(covered_tags)
    tmp = path.with_suffix(f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "wb") as f:
        np.savez(f, meta=json.dumps(meta),
                 bits=np.frombuffer(bloom.to_state()["bits"], dtype=np.uint8))
    os.replace(tmp, path)


def load_sidecar(path: str | Path):
    """Returns (bloom, covered_tags) or None if absent/unreadable."""
    path = Path(path)
    if not path.exists():
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            state = {k: v for k, v in meta.items() if k != "covered"}
            state["bits"] = z["bits"].tobytes()
            return bloom_from_state(state), set(meta["covered"])
    except Exception:
        return None  # corrupt sidecar ⇒ caller rebuilds from the table
