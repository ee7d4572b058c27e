"""Cuckoo-filter seen set (the north_rule's bloom/cuckoo alternative):
no false negatives, bounded FPR, DELETE support (the capability Bloom
lacks), distributed shard build parity, sidecar roundtrip, and crawl
equivalence with the filter on."""

from __future__ import annotations

import numpy as np
import pytest

from crab_spark.bloom import load_sidecar, might_contain_udf, save_sidecar
from crab_spark.cuckoo import CuckooFilter, CuckooShard, build_cuckoo


def _keys(n, mult=0x9E3779B97F4A7C15, off=0):
    # uniform over part buckets (an odd multiplier alone would skew
    # key % 32 to odd residues if we forced low bits)
    return np.arange(off, off + n, dtype=np.uint64) * np.uint64(mult) + np.uint64(7)


def test_shard_no_false_negatives_and_fpr():
    keys = _keys(3000)
    s = CuckooShard.sized_for(3000)
    s.insert(keys)
    assert s.contains(keys).all()
    other = _keys(5000, mult=2654435761, off=10_000)
    fresh = other[~np.isin(other, keys)]
    assert s.contains(fresh).mean() < 0.01  # 16-bit fp, 2 buckets ⇒ ~0.1%


def test_shard_delete_then_absent():
    keys = _keys(500)
    s = CuckooShard.sized_for(1000)
    s.insert(keys)
    removed = s.delete(keys[:100])
    assert removed.all()
    assert not s.contains(keys[:100]).any()  # exact removal (no fp twins here)
    assert s.contains(keys[100:]).all()      # rest untouched


def test_shard_raises_over_capacity():
    s = CuckooShard(2)  # 8 slots
    with pytest.raises(RuntimeError, match="over capacity"):
        s.insert(_keys(64))


def test_filter_routes_parts_and_probes():
    keys = _keys(20_000)
    f = CuckooFilter.sized_for(20_000)
    f.add(keys)
    assert f.might_contain(keys).all()
    fresh = _keys(8000, mult=2654435761, off=50_000)
    fresh = fresh[~np.isin(fresh, keys)]
    assert f.might_contain(fresh).mean() < 0.01
    # round-trip through state (the broadcast/sidecar form)
    f2 = CuckooFilter.from_state(f.to_state())
    assert f2.might_contain(keys).all()


def test_distributed_build_matches_local(spark):
    rows = [(int(k),) for k in _keys(2000).view(np.int64)]
    df = spark.createDataFrame(rows, "url_hash long")
    proto = CuckooFilter.sized_for(2000)
    built = build_cuckoo(df, "url_hash", proto)
    keys = np.array([k for (k,) in rows], dtype=np.int64).view(np.uint64)
    assert built.might_contain(keys).all()
    probe = might_contain_udf(spark, built)  # broadcast probe path
    got = df.select(probe("url_hash").alias("m")).collect()
    assert all(r["m"] for r in got)


def test_sidecar_roundtrip_cuckoo(tmp_path):
    f = CuckooFilter.sized_for(1000)
    keys = _keys(300)
    f.add(keys)
    save_sidecar(tmp_path / "c.npz", f, {"reg-000001"})
    loaded, covered = load_sidecar(tmp_path / "c.npz")
    assert covered == {"reg-000001"}
    assert isinstance(loaded, CuckooFilter)
    assert loaded.might_contain(keys).all()


def test_crawl_with_cuckoo_filter_equivalent(spark, store):
    """use_bloom='cuckoo' is a pure optimization: final frontier equals
    the filter-off crawl, across a resume boundary (sidecar reload +
    delta insert path)."""
    from crab_spark import corpus as C
    from crab_spark.crawler import CorpusFetcher, crawl
    from crab_spark.frontier import seed_frontier
    from crab_spark.parsers import data, listing, load_registry
    from crab_spark.schemas import SEEDS

    registry = load_registry([listing, data])
    fetcher = CorpusFetcher(C.corpus_df(spark, 4))
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store, fetcher, registry, batch_size=10, max_epochs=2, use_bloom="cuckoo")
    side = load_sidecar(store.root / "_manifests" / "bloom-frontier.npz")
    assert side is not None and isinstance(side[0], CuckooFilter)
    crawl(store, fetcher, registry, batch_size=10, use_bloom="cuckoo")  # resume
    on = {r["url"]: r["seq"] for r in store.read("frontier").collect()}

    store2 = type(store)(store.root.parent / "wh-nofilter", spark)
    seed_frontier(store2, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store2, fetcher, registry, batch_size=10, use_bloom=False)
    off = {r["url"]: r["seq"] for r in store2.read("frontier").collect()}
    assert on == off
