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


def test_shard_saturates_over_capacity_no_false_negatives():
    """r2 advice: over-capacity must degrade, not crash the crawl. A
    full shard flips to 'saturated': every probe answers maybe (the
    exact membership check still runs), deletes refuse, and the flag
    survives state/sidecar roundtrips."""
    s = CuckooShard(2)  # 8 slots
    keys = _keys(64)
    s.insert(keys)      # would have raised before; now saturates
    assert s.saturated
    assert s.contains(keys).all()            # no false negatives, ever
    assert s.contains(_keys(64, off=999)).all()  # 'maybe' for everything
    assert not s.delete(keys[:4]).any()      # membership unknowable
    # filter-level: saturation is per shard and serializes
    f = CuckooFilter.sized_for(8, n_buckets=4)
    f.add(_keys(256))
    sat = f.saturated_parts()
    assert sat  # tiny shards, 256 keys: something saturated
    f2 = CuckooFilter.from_state(f.to_state())
    assert f2.saturated_parts() == sat
    assert f2.might_contain(_keys(256)).all()


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
    save_sidecar(tmp_path / "c.d", f, {"reg-000001"})
    loaded, covered = load_sidecar(tmp_path / "c.d")
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
    crawl(store, fetcher, registry, batch_size=10, max_epochs=2, use_bloom="cuckoo",
          bloom_min_frontier=0)
    side = load_sidecar(store.root / "_manifests" / "bloom-frontier.d")
    assert side is not None and isinstance(side[0], CuckooFilter)
    crawl(store, fetcher, registry, batch_size=10, use_bloom="cuckoo",
          bloom_min_frontier=0)  # resume
    on = {r["url"]: r["seq"] for r in store.read("frontier").collect()}

    store2 = type(store)(store.root.parent / "wh-nofilter", spark)
    seed_frontier(store2, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store2, fetcher, registry, batch_size=10, use_bloom=False)
    off = {r["url"]: r["seq"] for r in store2.read("frontier").collect()}
    assert on == off


def test_crawl_with_undersized_cuckoo_survives_and_matches(spark, store):
    """r2 advice: an undersized filter (bloom_capacity far below the
    frontier) used to abort the crawl mid-epoch. With per-shard
    saturation the crawl completes, warns, and still produces the exact
    filter-off result."""
    import warnings as w

    from crab_spark import corpus as C
    from crab_spark.crawler import CorpusFetcher, crawl
    from crab_spark.frontier import seed_frontier
    from crab_spark.parsers import data, listing, load_registry
    from crab_spark.schemas import SEEDS

    registry = load_registry([listing, data])
    # 29 pages + 290 data links = 319 URLs over 32 shards of 8 slots
    # (bloom_capacity=16 → minimum-size shards): several shards MUST
    # overflow
    fetcher = CorpusFetcher(C.corpus_df(spark, 30))
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        crawl(store, fetcher, registry, batch_size=60, use_bloom="cuckoo", bloom_min_frontier=0,
              bloom_capacity=16)
    assert any("over capacity" in str(c.message) for c in caught)
    on = {r["url"]: r["seq"] for r in store.read("frontier").collect()}

    store2 = type(store)(store.root.parent / "wh-nofilter2", spark)
    seed_frontier(store2, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store2, fetcher, registry, batch_size=60, use_bloom=False)
    off = {r["url"]: r["seq"] for r in store2.read("frontier").collect()}
    assert on == off


def test_recrawl_with_cuckoo_delete_forgets_urls(spark, store):
    """Stretch from the r2 verdict: a TTL policy that truly FORGETS
    URLs exercises the delete capability the Bloom lacks. Flow: crawl →
    delete a page's key from the filter AND its frontier/fetched rows →
    re-register finds it genuinely new again (fresh seq, no false
    'seen')."""
    import numpy as np

    from crab_spark import corpus as C
    from crab_spark.crawler import CorpusFetcher, crawl
    from crab_spark.frontier import register, seed_frontier
    from crab_spark.parsers import data, listing, load_registry
    from crab_spark.schemas import SEEDS

    registry = load_registry([listing, data])
    fetcher = CorpusFetcher(C.corpus_df(spark, 4))
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store, fetcher, registry, batch_size=10, use_bloom="cuckoo", bloom_min_frontier=0)
    side = load_sidecar(store.root / "_manifests" / "bloom-frontier.d")
    assert side is not None
    filt, _ = side

    victim = C.page_url(2)
    vrow = store.read("frontier").filter(f"url = '{victim}'").collect()[0]
    key = np.array([vrow["url_hash"]], dtype=np.int64).view(np.uint64)
    assert filt.might_contain(key).all()
    assert filt.delete(key).all()           # the Bloom-impossible op
    assert not filt.might_contain(key).any()  # genuinely forgotten

    # forget it in the tables too, then re-register: it must be NEW
    from pyspark.sql import functions as F

    keep = store.read("frontier").filter(F.col("url") != victim)
    from crab_spark.schemas import FRONTIER
    store.overwrite("frontier", keep.select([f.name for f in FRONTIER.fields]),
                    tag="forget")
    max_seq = store.read("frontier").agg(F.max("seq")).collect()[0][0]
    cands = spark.createDataFrame(
        [(victim, C.PAGE_TYPE, 1, 0, 0)],
        "url string, type_id int, depth int, parent_pos long, link_idx int",
    )
    n = register(store, cands, epoch=99, seen_bloom=filt, max_seq=max_seq)
    assert n == 1
    got = store.read("frontier").filter(F.col("url") == victim).collect()[0]
    assert got["seq"] == max_seq + 1  # re-registered with a fresh seq


def test_saturation_flag_travels_in_band(tmp_path):
    """A saturated shard's part file must self-describe: the failed
    kick chain evicted one stored fingerprint (and skipped the call's
    remaining keys), so a reader pairing the file with a STALE meta
    (no sat_parts entry — the driver crashed before the meta commit)
    must still answer 'maybe' for everything."""
    from crab_spark import bloom as bm
    from crab_spark.cuckoo import shard_from_bytes, shard_to_bytes

    s = CuckooShard(2)  # tiny: 8 slots
    s.insert(_keys(64))  # guaranteed to saturate
    assert s.saturated
    # round-trip keeps the flag
    rt = shard_from_bytes(shard_to_bytes(s), 2)
    assert rt.saturated and rt.contains(_keys(200, off=500)).all()
    # legacy flag-less bytes load unsaturated (meta carries the flag)
    legacy = shard_from_bytes(s.table.tobytes(), 2)
    assert not legacy.saturated

    # crash-window probe: file has the in-band flag, meta does NOT
    d = tmp_path / "side.d"
    d.mkdir()
    (d / "part-3.bin").write_bytes(shard_to_bytes(s))
    meta = {"kind": "cuckoo", "n_buckets": 32, "shard_bkts": 2,
            "parts": [3], "sat_parts": [], "version": 1,
            "part_versions": {"3": 1}}
    bm._PART_CACHE.clear()
    probe_keys = _keys(64, off=900)
    probe_keys = probe_keys[(probe_keys.view(np.int64) % 32) == 3][:8]
    assert len(probe_keys) > 0
    got = bm.probe_sidecar(probe_keys, str(d), meta)
    assert got.all()  # stale meta, in-band flag still says 'maybe'


def test_part_cache_generation_guards_meta_loss_rebuild(tmp_path):
    """A sidecar rebuilt after meta.json loss restarts its version
    counter — the worker part cache must key on the generation id too,
    or it keeps serving the PREVIOUS sidecar's filters (reporting seen
    URLs as definitely-new)."""
    from crab_spark import bloom as bm
    from crab_spark.bloom import BucketedBloom

    d = tmp_path / "side.d"
    old_keys, new_keys = _keys(500), _keys(500, off=5000)
    b1 = BucketedBloom.sized_for(1000)
    b1.add(old_keys)
    save_sidecar(d, b1, set())
    meta1 = bm._read_meta(d)
    bm._PART_CACHE.clear()
    assert bm.probe_sidecar(old_keys[:64], str(d), meta1).all()  # cache warm

    (d / "meta.json").unlink()  # meta loss → cold rebuild from scratch
    b2 = BucketedBloom.sized_for(1000)
    b2.add(new_keys)
    save_sidecar(d, b2, set())
    meta2 = bm._read_meta(d)
    assert meta2["version"] == 1 == meta1["version"]  # counter restarted
    assert meta2["gen"] != meta1["gen"]
    # same (dir, version, part) keys — only the generation differs; the
    # probe must see the NEW filter, not the warm cache entries
    assert bm.probe_sidecar(new_keys[:64], str(d), meta2).all()


def test_sidecar_sweeps_orphaned_tmp_files(tmp_path):
    """A crash between _atomic_write's write_bytes and os.replace
    leaves a part-sized *.tmp-* orphan; the next save must sweep it."""
    from crab_spark.bloom import BucketedBloom

    d = tmp_path / "side.d"
    b = BucketedBloom.sized_for(100)
    b.add(_keys(100))
    save_sidecar(d, b, set())
    orphan = d / "part-5.tmp-deadbeef"
    orphan.write_bytes(b"x" * 1024)
    save_sidecar(d, b, set())
    assert not orphan.exists()
    assert load_sidecar(d) is not None


def test_cuckoo_random_ops_model_check():
    """Seeded-random insert/delete interleavings vs a Python multiset
    model (the session-11 cross-validation protocol applied to the
    seen-set sidecar): after every step, every LIVE key answers True
    (no false negatives — the invariant register() depends on: a false
    negative would re-register a seen URL and corrupt seq/order), fresh
    never-inserted keys stay under the 16-bit-fingerprint FPR bound,
    delete acknowledges every live key, and fully-deleted keys drop
    back to FPR-level presence (exact absence is NOT the contract —
    a live fp-twin in the same bucket pair legitimately keeps a
    deleted key 'maybe')."""
    from collections import Counter

    rng = np.random.default_rng(4099)
    for trial in range(3):
        f = CuckooFilter.sized_for(20_000, n_buckets=8)
        model: Counter[int] = Counter()
        ever: set[int] = set()
        for step in range(10):
            if step % 3 != 2 or not model:
                ks = rng.integers(1, 2**63, size=int(rng.integers(100, 300)),
                                  dtype=np.uint64)
                if model and step % 2:
                    # sprinkle duplicates of already-live keys: the
                    # multiset path (insert copies, delete one copy)
                    dups = rng.choice(
                        np.array(list(model), dtype=np.uint64),
                        size=min(20, len(model)))
                    ks = np.concatenate([ks, dups])
                f.add(ks)
                for k in ks.tolist():
                    model[k] += 1
                    ever.add(k)
            else:
                victims = rng.choice(
                    np.array(list(model), dtype=np.uint64),
                    size=min(80, len(model)), replace=False)
                removed = f.delete(victims)
                assert removed.all(), f"live key refused delete t{trial} s{step}"
                for k in victims.tolist():
                    model[k] -= 1
                    if not model[k]:
                        del model[k]
            live = np.array(sorted(model), dtype=np.uint64)
            assert f.might_contain(live).all(), f"false negative t{trial} s{step}"
            assert not f.saturated_parts()
        fresh = rng.integers(1, 2**63, size=5000, dtype=np.uint64)
        fresh = fresh[~np.isin(fresh, np.array(sorted(ever), dtype=np.uint64))]
        assert f.might_contain(fresh).mean() < 0.01, "FPR blown"
        gone = np.array(
            sorted(ever - set(model)), dtype=np.uint64)
        if len(gone):
            assert f.might_contain(gone).mean() < 0.05, "deletes not taking"
