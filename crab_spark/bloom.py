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
big to broadcast. The production layout is one bitmap per seen-set hash
bucket (``part`` column), built incrementally per epoch and stored next
to the table; executors only load the buckets they probe. The sandbox
build uses one bitmap (the bucket split is a dict keyed by ``part`` —
same code path, smaller constants).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = Bloom(n_bits, n_hashes)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                b.add(pdf[col].to_numpy(dtype=np.int64).view(np.uint64))
        if any_rows:
            yield pd.DataFrame({"bits": [b.bits.tobytes()]})

    partials = df.select(col).mapInPandas(fold, schema=T.StructType(
        [T.StructField("bits", T.BinaryType(), False)])).collect()
    out = Bloom(n_bits, n_hashes)
    for row in partials:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


def might_contain_udf(spark, bloom: Bloom):
    """Arrow-vectorized membership probe over a long column, with the
    bitmap broadcast once per executor (not per task)."""
    bc = spark.sparkContext.broadcast((bloom.n_bits, bloom.n_hashes, bloom.bits.tobytes()))

    @F.pandas_udf(T.BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        n_bits, n_hashes, raw = bc.value
        b = Bloom(n_bits, n_hashes, np.frombuffer(raw, dtype=np.uint8))
        return pd.Series(b.might_contain(keys.to_numpy(dtype=np.int64).view(np.uint64)))

    return probe
