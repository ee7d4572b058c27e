"""Cuckoo-filter URL-seen set — the north_rule's alternative to the
Bloom pre-filter (bloom.py). Same role in register(): a cheap
no-false-negative "definitely new" test that lets most candidate links
skip the anti-join shuffle.

Why a cuckoo filter at all (Fan et al., CoNEXT'14): ~same memory as a
Bloom at 1% FPR but supports DELETE (a Bloom cannot un-set bits), so a
seen-set that must forget rows — e.g. a TTL'd recrawl policy where URLs
become fetchable again — keeps its filter exact instead of rebuilding.
Lookup is two bucket probes (vectorizable); insert is a sequential
kick chain, which is why the distributed build shards by the frontier's
``part`` bucket: each shard is built sequentially INSIDE one task over
its partition's keys, and the driver keeps the dict of shards (probe
routes by part). Shards cannot be OR-merged like Bloom bitmaps — the
incremental per-epoch path inserts the (small) delta's keys instead.

Parameters: 4-slot buckets, 16-bit fingerprints (empty = 0), partial-
key displacement i2 = i1 XOR hash(fp), ≤500 kicks before declaring the
shard full (at 95% load this "never" happens when sized correctly).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import _mix
from .schemas import N_BUCKETS

_SLOTS = 4
_MAX_KICKS = 500
_FP_MASK = np.uint64(0xFFFF)


def _fingerprint(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint of each (uint64) key."""
    fp = (_mix(keys ^ np.uint64(0xA076_1D64_78BD_642F)) & _FP_MASK).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _index1(keys: np.ndarray, n_bkts: int) -> np.ndarray:
    return (_mix(keys) % np.uint64(n_bkts)).astype(np.int64)


def _index2(i1: np.ndarray, fp: np.ndarray, n_bkts: int) -> np.ndarray:
    alt = i1.astype(np.uint64) ^ _mix(fp.astype(np.uint64))
    return (alt % np.uint64(n_bkts)).astype(np.int64)


def shard_to_bytes(shard: "CuckooShard") -> bytes:
    """Serialize a shard WITH its saturation flag in-band (one trailing
    byte). A saturated table is missing the fingerprint its failed kick
    chain held in hand (plus any keys the insert call skipped after
    flipping) — the flag is the only thing making those reads answer
    'maybe', so it must travel WITH the bytes: a reader pairing the
    file with stale metadata (sidecar meta.json not yet committed)
    would otherwise see false negatives."""
    return shard.table.tobytes() + (b"\x01" if shard.saturated else b"\x00")


def shard_from_bytes(raw: bytes, shard_bkts: int,
                     writable: bool = True) -> "CuckooShard":
    """Inverse of shard_to_bytes. Legacy files without the trailing
    flag byte load as unsaturated (their writers predate the in-band
    flag; their saturation, if any, lives in sidecar meta)."""
    n = shard_bkts * _SLOTS * 2
    table = np.frombuffer(raw[:n], dtype=np.uint16).reshape(shard_bkts, _SLOTS)
    shard = CuckooShard(shard_bkts, table.copy() if writable else table)
    shard.saturated = len(raw) > n and raw[n] != 0
    return shard


class CuckooShard:
    """One part-bucket's filter: (n_bkts, 4) uint16 table.

    Over-capacity behavior: when a kick chain fails the shard flips to
    ``saturated`` and from then on answers 'maybe' for EVERY key — the
    seen-set contract (no false negatives) survives, register just pays
    the exact membership check for that part. Crashing mid-crawl over a
    mis-sized bloom_capacity (the r2 advice finding) is replaced by a
    per-shard graceful degrade."""

    def __init__(self, n_bkts: int, table: np.ndarray | None = None):
        self.n_bkts = int(n_bkts)
        self.saturated = False
        self.table = (
            table if table is not None
            else np.zeros((self.n_bkts, _SLOTS), dtype=np.uint16)
        )

    @classmethod
    def sized_for(cls, n_keys: int, load: float = 0.84) -> "CuckooShard":
        n_bkts = 1
        while n_bkts * _SLOTS * load < max(n_keys, 1):
            n_bkts <<= 1  # power of two keeps XOR displacement closed
        return cls(max(n_bkts, 2))

    def insert(self, keys: np.ndarray, rng_seed: int = 7) -> None:
        """Sequential insert with kick chains (the write path is per-
        epoch delta-sized; lookups are the hot path)."""
        if self.saturated:
            return  # shard already answers 'maybe' for everything
        rng = np.random.RandomState(rng_seed)
        fps = _fingerprint(keys.astype(np.uint64))
        i1s = _index1(keys.astype(np.uint64), self.n_bkts)
        for fp, i1 in zip(fps, i1s):
            i2 = int(_index2(np.array([i1]), np.array([fp]), self.n_bkts)[0])
            # NO presence-dedup here, deliberately: if key B skipped its
            # insert because key A's colliding fingerprint was visible in
            # one of B's buckets, a later kick chain could migrate A's
            # copy to A's OTHER bucket (not one of B's) — a false
            # negative, which the seen-set contract forbids. Duplicate
            # fingerprints are allowed (Fan et al. §3) and cost slots
            # only on 2^-16 collisions.
            placed = False
            for idx in (i1, i2):
                empty = np.flatnonzero(self.table[idx] == 0)
                if len(empty):
                    self.table[idx, empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # kick chain
            idx, cur = int(i1), np.uint16(fp)
            for _ in range(_MAX_KICKS):
                slot = rng.randint(_SLOTS)
                cur, self.table[idx, slot] = self.table[idx, slot], cur
                idx = int(_index2(np.array([idx]), np.array([cur]), self.n_bkts)[0])
                empty = np.flatnonzero(self.table[idx] == 0)
                if len(empty):
                    self.table[idx, empty[0]] = cur
                    cur = None
                    break
            if cur is not None:
                # kick chain exhausted: the shard is over capacity.
                # Degrade, don't die — 'maybe' for all keys keeps the
                # no-false-negative contract; the caller is warned to
                # raise bloom_capacity (crawler.crawl).
                self.saturated = True
                return

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized lookup: two bucket probes per key."""
        k = keys.astype(np.uint64)
        if len(k) == 0:
            return np.zeros(0, dtype=bool)
        if self.saturated:
            return np.ones(len(k), dtype=bool)
        fp = _fingerprint(k)
        i1 = _index1(k, self.n_bkts)
        i2 = _index2(i1, fp, self.n_bkts)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per key (the capability a
        Bloom lacks). Returns per-key removed flags."""
        k = keys.astype(np.uint64)
        out = np.zeros(len(k), dtype=bool)
        if self.saturated:
            return out  # membership unknowable; nothing safely deletable
        fps = _fingerprint(k)
        i1s = _index1(k, self.n_bkts)
        i2s = _index2(i1s, fps, self.n_bkts)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            for idx in (int(i1), int(i2)):
                hits = np.flatnonzero(self.table[idx] == fp)
                if len(hits):
                    self.table[idx, hits[0]] = 0
                    out[n] = True
                    break
        return out


class CuckooFilter:
    """Partitioned cuckoo filter: one shard per frontier ``part``
    bucket, same probe/maintenance interface as the Bloom classes
    (might_contain / add / to_state) so register() and the sidecar
    machinery take either."""

    def __init__(self, shards: dict[int, CuckooShard], n_buckets: int = N_BUCKETS,
                 shard_bkts: int | None = None):
        self.n_buckets = int(n_buckets)
        self.shards = shards
        self.shard_bkts = int(
            shard_bkts if shard_bkts is not None
            else (next(iter(shards.values())).n_bkts if shards else 2)
        )

    @classmethod
    def sized_for(cls, n_keys: int, n_buckets: int = N_BUCKETS) -> "CuckooFilter":
        proto = CuckooShard.sized_for(max(n_keys // max(n_buckets, 1), 1))
        return cls({}, n_buckets, proto.n_bkts)

    def _parts(self, keys: np.ndarray) -> np.ndarray:
        return keys.view(np.int64) % self.n_buckets  # pmod parity

    def _shard(self, part: int) -> CuckooShard:
        if part not in self.shards:
            self.shards[part] = CuckooShard(self.shard_bkts)
        return self.shards[part]

    def add(self, keys: np.ndarray) -> None:
        k = keys.astype(np.uint64)
        parts = self._parts(k)
        for p in np.unique(parts):
            self._shard(int(p)).insert(k[parts == p])

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        out = np.zeros(len(k), dtype=bool)
        if not len(k):
            return out
        parts = self._parts(k)
        for p in np.unique(parts):
            m = parts == p
            shard = self.shards.get(int(p))
            out[m] = shard.contains(k[m]) if shard is not None else False
        return out

    def delete(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        out = np.zeros(len(k), dtype=bool)
        parts = self._parts(k)
        for p in np.unique(parts):
            m = parts == p
            shard = self.shards.get(int(p))
            if shard is not None:
                out[m] = shard.delete(k[m])
        return out

    def saturated_parts(self) -> list[int]:
        return sorted(p for p, s in self.shards.items() if s.saturated)

    def to_state(self) -> dict:
        parts = sorted(self.shards)
        stacked = (
            np.stack([self.shards[p].table for p in parts])
            if parts else np.zeros((0, self.shard_bkts, _SLOTS), dtype=np.uint16)
        )
        return {"kind": "cuckoo", "n_buckets": self.n_buckets,
                "shard_bkts": self.shard_bkts, "parts": parts,
                "sat_parts": self.saturated_parts(),
                "bits": stacked.tobytes()}

    @classmethod
    def from_state(cls, state: dict, writable: bool = True) -> "CuckooFilter":
        parts = list(state["parts"])
        raw = np.frombuffer(state["bits"], dtype=np.uint16).reshape(
            len(parts), state["shard_bkts"], _SLOTS
        )
        shards = {
            int(p): CuckooShard(
                state["shard_bkts"], raw[n].copy() if writable else raw[n]
            )
            for n, p in enumerate(parts)
        }
        for p in state.get("sat_parts", []):
            shards[int(p)].saturated = True
        return cls(shards, state["n_buckets"], state["shard_bkts"])


def build_cuckoo(df: DataFrame, col: str, proto: CuckooFilter) -> CuckooFilter:
    """Distributed shard build: repartition keys by ``part`` so each
    task owns whole shards, build them sequentially in-task, collect
    the (serialized) shards — never the keys — to the driver."""
    n_buckets, shard_bkts = proto.n_buckets, proto.shard_bkts

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = CuckooFilter({}, n_buckets, shard_bkts)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                local.add(pdf[col].to_numpy(dtype=np.int64).view(np.uint64))
        if any_rows:
            for p, shard in local.shards.items():
                yield pd.DataFrame({"part": [p], "table": [shard.table.tobytes()],
                                    "sat": [bool(shard.saturated)]})

    shards_df = (
        df.select(F.col(col), F.pmod(F.col(col), F.lit(n_buckets)).cast("int").alias("_p"))
        .repartition(n_buckets, "_p")
        .select(col)
        .mapInPandas(fold, schema=T.StructType([
            T.StructField("part", T.IntegerType(), False),
            T.StructField("table", T.BinaryType(), False),
            T.StructField("sat", T.BooleanType(), False),
        ]))
    )
    out = CuckooFilter({}, n_buckets, shard_bkts)
    for row in shards_df.collect():
        table = np.frombuffer(row["table"], dtype=np.uint16).reshape(shard_bkts, _SLOTS)
        p = int(row["part"])
        if p in out.shards:  # two tasks produced the same part (shouldn't)
            raise RuntimeError(f"duplicate cuckoo shard for part {p}")
        out.shards[p] = CuckooShard(shard_bkts, table.copy())
        out.shards[p].saturated = bool(row["sat"])
    return out
