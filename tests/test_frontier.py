"""Frontier semantics tests — mirrors the reference storage integration
suite (/root/reference/tests/sqlite.rs): register-once dedup (:64-78),
register→list roundtrip (:20-42), content write flips status (:80-105),
depth-ASC LIMIT dequeue (storage.rs:110-123)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crab_spark import frontier as fr
from crab_spark.bloom import (
    Bloom,
    BucketedBloom,
    build_bloom,
    load_sidecar,
    might_contain_udf,
    save_sidecar,
)
from crab_spark.schemas import SEEDS, STATUS_NOT_DOWNLOADED


def _cands(spark, rows):
    """rows: list of (url, type_id, depth, parent_pos, link_idx)"""
    return spark.createDataFrame(
        rows, "url string, type_id int, depth int, parent_pos long, link_idx int"
    )


def test_register_once(spark, store):
    """second/third insert of the same URL returns not-new (sqlite.rs:64-78)."""
    c = _cands(spark, [("http://h/a", 1, 0, 0, 0)])
    assert fr.register(store, c, epoch=1) == 1
    assert fr.register(store, c, epoch=2) == 0
    assert fr.register(store, c, epoch=3) == 0
    assert store.read("frontier").count() == 1


def test_register_in_batch_dedup_first_wins(spark, store):
    c = _cands(
        spark,
        [
            ("http://h/a", 1, 0, 0, 0),
            ("http://h/b", 2, 1, 0, 1),
            ("http://h/a", 9, 7, 0, 2),  # dup: first wins (type 1, depth 0)
        ],
    )
    assert fr.register(store, c, epoch=1) == 2
    rows = {r["url"]: r for r in store.read("frontier").collect()}
    assert rows["http://h/a"]["type_id"] == 1
    assert rows["http://h/a"]["depth"] == 0
    assert rows["http://h/a"]["seq"] == 0
    assert rows["http://h/b"]["seq"] == 1


def test_register_roundtrip_fields(spark, store):
    fr.seed_frontier(store, spark.createDataFrame([("http://h/x", 3)], SEEDS))
    row = store.read("frontier").collect()[0]
    assert row["url"] == "http://h/x"
    assert row["type_id"] == 3
    assert row["depth"] == 0
    assert row["status"] == STATUS_NOT_DOWNLOADED
    assert row["host"] == "h"
    assert row["part"] == row["url_hash"] % 32
    assert row["seq"] == 0


def test_dequeue_depth_then_seq_order(spark, store):
    c = _cands(
        spark,
        [
            ("http://h/d2a", 1, 2, 0, 0),
            ("http://h/d0a", 1, 0, 0, 1),
            ("http://h/d1a", 1, 1, 0, 2),
            ("http://h/d0b", 1, 0, 0, 3),
        ],
    )
    fr.register(store, c, epoch=1)
    got = [r["url"] for r in fr.dequeue(store, batch_size=3).orderBy("pos").collect()]
    # depth ASC, then registration order (seq) — LIMIT 3
    assert got == ["http://h/d0a", "http://h/d0b", "http://h/d1a"]


def test_mark_fetched_excludes_from_pending(spark, store):
    c = _cands(spark, [("http://h/a", 1, 0, 0, 0), ("http://h/b", 1, 0, 0, 1)])
    fr.register(store, c, epoch=1)
    done = store.read("frontier").filter(F.col("url") == "http://h/a")
    fr.mark_fetched(store, done, epoch=1)
    pend = [r["url"] for r in fr.pending(store).collect()]
    assert pend == ["http://h/b"]
    # reset flips it back to pending (storage.rs:125-132 semantics)
    fr.reset_pages(store, done.select("url_hash"))
    assert fr.pending(store).count() == 2


def test_register_routes_big_batches_to_two_pass_rank(spark, store, monkeypatch):
    """Bounded-window invariant (r3 verdict item 5): a candidate set
    bigger than SEQ_WINDOW_MAX must take the parallel two-pass range
    rank, never the single-task global window — and produce identical
    dense seq values. Bound lowered via monkeypatch so the branch is
    exercised without 100k-row fixtures."""
    from crab_spark import util as U

    calls = []
    real = U.ordered_index

    def spy(df, order_cols, name="idx", start=0, num_partitions=None):
        calls.append(name)
        return real(df, order_cols, name, start=start,
                    num_partitions=num_partitions)

    monkeypatch.setattr(fr, "ordered_index", spy)
    monkeypatch.setattr(fr, "SEQ_WINDOW_MAX", 10)
    rows = [(f"http://h/{i}", 1, 0, 0, i) for i in range(40)]
    # seed the table (first write takes the no-seen-side branch)
    assert fr.register(store, _cands(spark, rows[:5]), epoch=1) == 5
    calls.clear()
    assert fr.register(store, _cands(spark, rows), epoch=2) == 35
    assert "seq" in calls  # the two-pass path ran for the big batch
    seqs = sorted(r["seq"] for r in store.read("frontier").collect())
    assert seqs == list(range(40))  # dense, no gaps, both paths agree
    # registration order unchanged: seq follows (parent_pos, link_idx)
    by_url = {r["url"]: r["seq"] for r in store.read("frontier").collect()}
    assert by_url["http://h/0"] == 0 and by_url["http://h/5"] == 5
    assert by_url["http://h/39"] == 39


def test_dequeue_scans_only_head_depths(spark, store):
    """Scale contract: dequeue must not rank the whole pending set. The
    depth cutoff predicate has to reach BOTH parquet scans (frontier and
    fetched log) and the top-k must compile to TakeOrderedAndProject —
    per-epoch work O(batch + head-depth slice), not O(frontier)."""
    rows = [
        (f"http://h/{d}/{i}", 1, d, 0, d * 100 + i)
        for d in range(6) for i in range(10)
    ]
    fr.register(store, _cands(spark, rows), epoch=1)
    # resolve ALL of depth 0 → the head is depth 1
    done = store.read("frontier").filter(F.col("depth") == 0)
    fr.mark_fetched(store, done, epoch=1)

    batch = fr.dequeue(store, batch_size=5)
    got = [(r["depth"], r["pos"]) for r in batch.orderBy("pos").collect()]
    assert [d for d, _ in got] == [1] * 5 and [p for _, p in got] == [1, 2, 3, 4, 5]

    plan = batch._sc._jvm.PythonSQLUtils.explainString(
        batch._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    # cutoff is depth 1 (10 pending rows at depth 1 ≥ batch 5); the
    # pushed predicate must appear on every parquet scan in the plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert len(pushed) >= 2  # frontier scan + fetched scan
    assert all("LessThanOrEqual(depth,1)" in l for l in pushed), pushed


def test_dequeue_head_scan_survives_sorted_compaction(spark, store):
    """r4 (r3 verdict item 6): the dequeue's depth cutoff prunes via
    parquet row-group MIN/MAX stats, which correlate with append order
    only until a compaction rewrites the table. compact(sort_within=
    ['depth']) must restore the physical depth ordering — asserted on
    the actual parquet files — and the head-scan plan contract must
    hold against the post-compaction store."""
    import pyarrow.parquet as pq

    for e, d in enumerate(range(4)):  # one depth per epoch, like a crawl
        fr.register(
            store,
            _cands(spark, [(f"http://h/{d}/{i}", 1, d, 0, i) for i in range(10)]),
            epoch=e + 1,
        )
    fr.mark_fetched(store, store.read("frontier").filter(F.col("depth") == 0),
                    epoch=4)
    assert store.compact("frontier", n_files=1, sort_within=["depth"]) == 4

    # physical layout: every rewritten parquet file is depth-sorted
    files = list((store.root / "frontier").glob("snap-compact-*/**/*.parquet"))
    assert files
    for f in files:
        depths = pq.read_table(f, columns=["depth"])["depth"].to_pylist()
        assert depths == sorted(depths), f
    before = {(r["url"], r["seq"]) for r in store.read("frontier").collect()}
    assert len(before) == 40

    batch = fr.dequeue(store, batch_size=5)
    got = [(r["depth"], r["pos"]) for r in batch.orderBy("pos").collect()]
    assert [d for d, _ in got] == [1] * 5
    plan = batch._sc._jvm.PythonSQLUtils.explainString(
        batch._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert len(pushed) >= 2
    assert all("LessThanOrEqual(depth,1)" in l for l in pushed), pushed


def test_fetched_fold_keeps_both_consumers_pruning(spark, store):
    """r5: the fetched log folds at the same compact_threshold as the
    frontier, sorted (depth, epoch). Physical contract: within each
    rewritten file depth runs are ascending and epochs ascend inside a
    depth run — so the BFS dequeue's depth cutoff AND priority mode's
    epoch>r suffix read both keep row-group MIN/MAX pruning. Plan
    contract: post-fold, the dequeue's depth predicate still reaches
    the fetched parquet scan."""
    import pyarrow.parquet as pq

    for e, d in enumerate(range(4)):
        fr.register(
            store,
            _cands(spark, [(f"http://h/{d}/{i}", 1, d, 0, i) for i in range(10)]),
            epoch=e + 1,
        )
    # resolve depths 0 and 1 across two epochs each (4 done-* deltas)
    for e, d in [(1, 0), (2, 0), (3, 1), (4, 1)]:
        half = store.read("frontier").filter(
            (F.col("depth") == d) & (F.col("seq") % 2 == e % 2))
        fr.mark_fetched(store, half, epoch=e)
    assert store.compact("fetched", n_files=1,
                         sort_within=["depth", "epoch"]) == 4

    files = list((store.root / "fetched").glob("snap-compact-*/**/*.parquet"))
    assert files
    for f in files:
        rows = pq.read_table(f, columns=["depth", "epoch"])
        pairs = list(zip(rows["depth"].to_pylist(), rows["epoch"].to_pylist()))
        assert pairs == sorted(pairs), f
    # rows survived the fold exactly
    assert store.read("fetched").count() == 20

    batch = fr.dequeue(store, batch_size=5)
    assert batch.count() == 5
    plan = batch._sc._jvm.PythonSQLUtils.explainString(
        batch._jdf.queryExecution(), "formatted"
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert len(pushed) >= 2  # frontier scan + post-fold fetched scan
    assert all("LessThanOrEqual(depth," in l for l in pushed), pushed


def test_register_seen_side_is_pruned_and_streamed(spark, store):
    """r3 scale contract for register (the r2 verdict's top item):
    (a) frontier appends are Hive-partitioned by `part`, so the
        membership check's seen_slice opens ONLY the part directories
        the candidate batch touches — across every committed delta;
    (b) the membership check STREAMS the seen side: two
        BroadcastHashJoins (seen ⋉ broadcast(keys), then
        cands ∖ broadcast(hits)), never a shuffle of the frontier."""
    from crab_spark.plans import formatted_plan

    fr.register(
        store, _cands(spark, [(f"http://h/{i}", 1, 0, 0, i) for i in range(64)]),
        epoch=1,
    )
    fr.register(
        store, _cands(spark, [(f"http://h/x{i}", 1, 1, 0, i) for i in range(64)]),
        epoch=2,
    )
    assert store.partition_by("frontier") == "part"

    # (a) file-level pruning through the manifest union
    sl = fr.seen_slice(store, [3, 7])
    files = [r[0] for r in sl.select(F.input_file_name()).distinct().collect()]
    assert files, "expected the store to hold rows in parts 3/7"
    assert all("part=3/" in f or "part=7/" in f for f in files), files
    pf = [l for l in formatted_plan(sl).splitlines() if "PartitionFilters" in l]
    assert pf and all("part" in l for l in pf), pf

    # (b) streamed membership: no exchange on the seen side
    cand_keys = spark.createDataFrame(
        [(f"http://h/{i}",) for i in range(60, 70)], "url string"
    ).withColumn("url_hash", F.xxhash64("url"))
    out = fr.antijoin_new(
        cand_keys.select("url_hash", "url"), fr.seen_slice(store, list(range(32)))
    )
    plan = formatted_plan(out)
    # seen ⋉ broadcast(keys) (the semi may replicate into each delta-dir
    # union branch) then cands ∖ broadcast(hits); the frontier side must
    # never hit an exchange-shuffle join
    assert "BroadcastHashJoin LeftSemi" in plan, plan
    assert "BroadcastHashJoin LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # e2e: the streamed probe returns exactly the unseen urls
    got = {r["url"] for r in out.collect()}
    assert got == {f"http://h/{i}" for i in range(64, 70)}


def test_antijoin_seen_broadcast_fast_path(spark, store):
    """r6: at or below SEEN_BROADCAST_LIMIT seen rows the slice itself
    is broadcast — ONE BroadcastHashJoin LeftAnti, no two-step semi
    probe — with results identical to the probe path."""
    from crab_spark.plans import formatted_plan

    fr.register(
        store,
        _cands(spark, [(f"http://h/{i}", 1, 0, 0, i) for i in range(40)]),
        epoch=1,
    )
    cand_keys = (
        spark.createDataFrame(
            [(f"http://h/{i}",) for i in range(30, 50)], "url string"
        )
        .withColumn("url_hash", F.xxhash64("url"))
        .select("url_hash", "url")
    )
    seen = fr.seen_slice(store, list(range(32)))
    fast = fr.antijoin_new(cand_keys, seen, seen_rows=40)
    plan = formatted_plan(fast)
    assert "BroadcastHashJoin LeftAnti" in plan, plan
    assert "LeftSemi" not in plan, plan
    want = {f"http://h/{i}" for i in range(40, 50)}
    assert {r["url"] for r in fast.collect()} == want
    # above the limit: the two-step probe (semi + anti), same rows
    slow = fr.antijoin_new(cand_keys, seen,
                           seen_rows=fr.SEEN_BROADCAST_LIMIT + 1)
    assert "LeftSemi" in formatted_plan(slow)
    assert {r["url"] for r in slow.collect()} == want


def test_seed_index_paths_identical(spark, tmp_path, monkeypatch):
    """r6: seed_frontier's scale-adaptive link_idx assignment — the
    small-list single-task window and the large-list two-pass range
    rank (forced via SEQ_WINDOW_MAX=0, which also forces the parallel
    seq path) must produce byte-identical frontiers, including under
    duplicate and invalid seeds."""
    from crab_spark.store import TableStore

    rows = [("http://h/b", 1), ("http://h/a", 2), ("http://h/c", 1),
            ("http://h/a", 2), ("not a url", 1)]
    seeds = spark.createDataFrame(rows, "url string, type_id int")
    s1 = TableStore(tmp_path / "w1", spark)
    n1 = fr.seed_frontier(s1, seeds)
    monkeypatch.setattr(fr, "SEQ_WINDOW_MAX", 0)
    s2 = TableStore(tmp_path / "w2", spark)
    n2 = fr.seed_frontier(s2, seeds)
    assert n1 == n2 == 3  # dup url deduped, invalid dropped
    cols = s1.read("frontier").columns
    r1 = sorted(map(tuple, s1.read("frontier").select(cols).collect()))
    r2 = sorted(map(tuple, s2.read("frontier").select(cols).collect()))
    assert r1 == r2


def test_register_shuffle_fallback_above_broadcast_limit(spark, store, monkeypatch):
    """Candidate batches past BROADCAST_CANDIDATE_LIMIT take the classic
    shuffle anti-join (broadcasting millions of keys would pressure the
    driver) — results identical either way."""
    fr.register(store, _cands(spark, [(f"http://h/{i}", 1, 0, 0, i) for i in range(30)]),
                epoch=1)
    monkeypatch.setattr(fr, "BROADCAST_CANDIDATE_LIMIT", 5)
    mix = _cands(spark, [(f"http://h/{i}", 1, 1, 1, i) for i in range(20, 50)])
    assert fr.register(store, mix, epoch=2) == 20  # 10 dup + 20 new
    assert store.read("frontier").count() == 50
    assert sorted(r["seq"] for r in store.read("frontier").collect()) == list(range(50))


def test_sidecar_probe_cuckoo_parts(tmp_path):
    """The per-part file probe handles cuckoo sidecars too (shard files
    + saturated flags from meta), including saturated shards answering
    'maybe' for everything."""
    import numpy as np

    from crab_spark import bloom as bm
    from crab_spark.cuckoo import CuckooFilter

    f = CuckooFilter.sized_for(2000)
    keys = np.arange(1000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    f.add(keys)
    # saturate one shard artificially
    sat_part = int(keys[0].view(np.int64) % f.n_buckets)
    f.shards[sat_part].saturated = True
    d = tmp_path / "ck.d"
    save_sidecar(d, f, {"reg-000001"})
    meta = bm._read_meta(d)
    assert sat_part in meta["sat_parts"]
    bm._PART_CACHE.clear()
    assert bm.probe_sidecar(keys, str(d), meta).all()  # no false negatives
    # keys routing to the saturated part answer True even if never added
    fresh = np.array(
        [k for k in range(10_000, 40_000)
         if k % f.n_buckets == sat_part][:16], dtype=np.uint64)
    assert bm.probe_sidecar(fresh, str(d), meta).all()


def test_pending_depth_counts_subtraction(spark, store):
    rows = [(f"http://h/{d}/{i}", 1, d, 0, d * 10 + i) for d in range(3) for i in range(4)]
    fr.register(store, _cands(spark, rows), epoch=1)
    fr.mark_fetched(
        store, store.read("frontier").filter("depth = 1 and url_hash % 2 = 0"), epoch=1
    )
    counts = fr.pending_depth_counts(store)
    n1 = store.read("fetched").count()
    assert counts[0] == 4 and counts[2] == 4
    assert counts.get(1, 0) == 4 - n1


def test_register_bloom_equivalence(spark, store):
    """Bloom pre-filter is a pure optimization: identical results on/off
    (SURVEY §7 step 7 equivalence requirement)."""
    base = _cands(spark, [(f"http://h/{i}", 1, 0, 0, i) for i in range(50)])
    fr.register(store, base, epoch=1)
    seen = store.read("frontier")
    bloom = build_bloom(seen, "url_hash", n_keys_hint=1024)
    mix = _cands(
        spark,
        [(f"http://h/{i}", 1, 1, 1, i) for i in range(25, 75)],  # 25 dup + 25 new
    )
    assert fr.register(store, mix, epoch=2, seen_bloom=bloom) == 25
    assert store.read("frontier").count() == 75
    seqs = [r["seq"] for r in store.read("frontier").collect()]
    assert sorted(seqs) == list(range(75))  # seq stays dense and unique


def test_bloom_no_false_negatives(spark):
    import numpy as np

    keys = np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
    b = Bloom.sized_for(10_000, fpr=0.01)
    b.add(keys)
    assert b.might_contain(keys).all()
    other = np.arange(50_000, 60_000, dtype=np.uint64) * np.uint64(2654435761)
    fpr = b.might_contain(other).mean()
    assert fpr < 0.05


def test_bucketed_bloom_no_false_negatives_and_routes(spark):
    import numpy as np

    keys = (np.arange(20_000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    b = BucketedBloom.sized_for(20_000)
    b.add(keys)
    assert b.might_contain(keys).all()
    other = np.arange(1, 10_001, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(7)
    fresh = other[~np.isin(other, keys)]
    assert b.might_contain(fresh).mean() < 0.05


def test_bucketed_bloom_udf_and_build(spark):
    df = spark.createDataFrame([(int(i) * 7919,) for i in range(500)], "url_hash long")
    b = build_bloom(df, "url_hash", proto=BucketedBloom.sized_for(500))
    import numpy as np

    keys = (np.arange(500, dtype=np.int64) * 7919).view(np.uint64)
    assert b.might_contain(keys).all()
    probe = might_contain_udf(spark, b)
    got = df.select(probe("url_hash").alias("m")).collect()
    assert all(r["m"] for r in got)


def test_bloom_sidecar_roundtrip(tmp_path):
    import numpy as np

    b = BucketedBloom.sized_for(1000)
    keys = np.arange(100, dtype=np.uint64) * np.uint64(31)
    b.add(keys)
    p = tmp_path / "bloom.d"
    save_sidecar(p, b, {"reg-000001", "reg-000002"})
    loaded, covered = load_sidecar(p)
    assert covered == {"reg-000001", "reg-000002"}
    assert loaded.might_contain(keys).all()
    assert (loaded.bits == b.bits).all()
    assert load_sidecar(tmp_path / "missing.d") is None


def test_fold_delta_files_matches_driver_build(spark, tmp_path):
    """bloom.fold_delta_files (the executor-side per-epoch fold) must
    leave the sidecar equivalent to a cold build over base ∪ delta —
    for both filter kinds — and maintain meta (covered tag, bumped
    part versions) without the driver touching any keys."""
    import numpy as np

    from crab_spark import bloom as bm
    from crab_spark.cuckoo import CuckooFilter, build_cuckoo

    base_keys = np.arange(1, 401, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    delta_keys = np.arange(500, 701, dtype=np.uint64) * np.uint64(2654435761)
    base_df = spark.createDataFrame(
        [(int(np.int64(k)),) for k in base_keys], "url_hash long")
    delta_df = spark.createDataFrame(
        [(int(np.int64(k)),) for k in delta_keys], "url_hash long")

    for kind in ("bloom", "cuckoo"):
        d = tmp_path / f"{kind}.d"
        if kind == "bloom":
            filt = build_bloom(base_df, "url_hash",
                               proto=BucketedBloom.sized_for(2000))
        else:
            filt = build_cuckoo(base_df, "url_hash",
                                proto=CuckooFilter.sized_for(2000))
        save_sidecar(d, filt, {"reg-000001"})
        v0 = bm._read_meta(d)["version"]
        meta = bm.fold_delta_files(spark, delta_df, d, "reg-000002")
        assert meta["version"] == v0 + 1
        assert set(meta["covered"]) == {"reg-000001", "reg-000002"}
        touched = {int(p) for p in
                   delta_keys.view(np.int64) % filt.n_buckets}
        bumped = {int(p) for p, v in meta["part_versions"].items()
                  if v == meta["version"]}
        assert bumped == touched  # only delta-touched parts rewritten
        loaded, covered = load_sidecar(d)
        assert loaded.might_contain(base_keys).all()
        assert loaded.might_contain(delta_keys).all()
        # and the lazy file probe agrees
        bm._PART_CACHE.clear()
        probe_meta = {k: v for k, v in bm._read_meta(d).items() if k != "covered"}
        assert bm.probe_sidecar(
            np.concatenate([base_keys, delta_keys]), str(d), probe_meta
        ).all()
    # a missing sidecar reports None (caller cold-builds)
    assert bm.fold_delta_files(spark, delta_df, tmp_path / "nope.d", "t") is None


def test_full_save_unlinks_stale_part_files(tmp_path):
    """A FULL save (changed_parts=None) must remove part files the
    filter no longer carries, or a later probe resurrects deleted keys
    from the stale file — false 'maybe' answers that defeat a
    CuckooFilter.delete (r3 ADVICE finding)."""
    import numpy as np

    from crab_spark import bloom as bm
    from crab_spark.cuckoo import CuckooFilter

    # cuckoo: delete every key of one shard, drop the shard, full save
    f = CuckooFilter.sized_for(2000)
    keys = np.arange(1, 601, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    f.add(keys)
    d = tmp_path / "cuck.d"
    save_sidecar(d, f, {"reg-000001"})
    parts = keys.view(np.int64) % f.n_buckets
    victim = int(parts[0])
    victim_keys = keys[parts == victim]
    assert f.delete(victim_keys).all()
    del f.shards[victim]
    save_sidecar(d, f, {"reg-000001", "reg-000002"})
    assert not (d / f"part-{victim}.bin").exists()
    meta = bm._read_meta(d)
    assert str(victim) not in meta["part_versions"]
    bm._PART_CACHE.clear()
    assert not bm.probe_sidecar(victim_keys, str(d), meta).any()
    loaded, _ = load_sidecar(d)
    assert not loaded.might_contain(victim_keys).any()

    # bloom: a same-geometry rebuild with one bucket now empty must not
    # leave the old bucket's bits probe-visible
    b1 = BucketedBloom.sized_for(1000)
    b1.add(keys)
    d2 = tmp_path / "blo.d"
    save_sidecar(d2, b1, {"reg-000001"})
    b2 = BucketedBloom(b1.n_buckets, b1.n_bits, b1.n_hashes)
    keep = keys[parts != victim]
    b2.add(keep)
    save_sidecar(d2, b2, {"reg-000001"})
    assert not (d2 / f"part-{victim}.bin").exists()
    loaded2, _ = load_sidecar(d2)
    assert not loaded2.might_contain(victim_keys).any()
    assert loaded2.might_contain(keep).all()


def test_sidecar_probe_touches_only_batch_parts(tmp_path):
    """Scale contract for the seen-set probe (r2 verdict item 3): the
    per-part sidecar means a probe loads ONLY the part files its key
    batch routes to — never the whole filter (bloom.py's own math:
    ~12 GiB at 10^10 keys, unbroadcastable)."""
    import numpy as np

    from crab_spark import bloom as bm

    b = BucketedBloom.sized_for(10_000)
    keys = np.arange(5000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    b.add(keys)
    d = tmp_path / "side.d"
    save_sidecar(d, b, {"reg-000001"})
    meta = bm._read_meta(d)

    # pick keys routing to exactly two parts
    parts = keys.view(np.int64) % b.n_buckets
    chosen = {int(parts[0]), int(parts[1])} if parts[0] != parts[1] else {int(parts[0]), int(parts[2])}
    sel = keys[np.isin(parts, list(chosen))][:64]
    bm._PART_CACHE.clear()
    got = bm.probe_sidecar(sel, str(d), meta)
    assert got.all()  # no false negatives
    loaded_parts = {k[-1] for k in bm._PART_CACHE}  # (dir, gen, version, part)
    assert loaded_parts == chosen, (loaded_parts, chosen)

    # incremental save: only the touched part files are rewritten
    import os
    mtimes = {f.name: os.path.getmtime(f) for f in d.glob("part-*.bin")}
    extra = np.array([123456789, 987654321], dtype=np.uint64)
    b.add(extra)
    touched = {int(p) for p in extra.view(np.int64) % b.n_buckets}
    import time as _t
    _t.sleep(0.05)
    save_sidecar(d, b, {"reg-000001", "reg-000002"}, changed_parts=touched)
    for f in d.glob("part-*.bin"):
        p = int(f.stem.split("-")[1])
        if p in touched or f.name not in mtimes:
            continue
        assert os.path.getmtime(f) == mtimes[f.name], f"untouched {f.name} rewritten"
    # and the incrementally-saved filter still answers everything
    loaded, covered = load_sidecar(d)
    assert covered == {"reg-000001", "reg-000002"}
    assert loaded.might_contain(np.concatenate([keys, extra])).all()


def test_sidecar_probe_udf_matches_broadcast_probe(spark, tmp_path):
    """The file-backed probe UDF is plan-for-plan interchangeable with
    the broadcast probe: identical answers over the same key column."""
    df = spark.createDataFrame([(int(i) * 7919,) for i in range(500)], "url_hash long")
    b = build_bloom(df, "url_hash", proto=BucketedBloom.sized_for(500))
    d = tmp_path / "probe.d"
    save_sidecar(d, b, set())
    from crab_spark.bloom import sidecar_probe_udf

    probe_f = sidecar_probe_udf(spark, d)
    probe_b = might_contain_udf(spark, b)
    mixed = spark.createDataFrame(
        [(int(i) * 7919,) for i in range(1000)], "url_hash long"
    )
    got = mixed.select(
        "url_hash", probe_f("url_hash").alias("f"), probe_b("url_hash").alias("b")
    ).collect()
    assert all(r["f"] == r["b"] for r in got)
    assert all(r["f"] for r in got if r["url_hash"] < 500 * 7919)
    assert sidecar_probe_udf(spark, tmp_path / "nope.d") is None


def test_crawl_persists_and_reuses_bloom_sidecar(spark, store):
    """crawl() saves the sidecar per epoch; a resumed crawl must load it
    (covered == committed reg tags) and still converge identically."""
    from crab_spark import corpus as C
    from crab_spark.bloom import load_sidecar as _load
    from crab_spark.crawler import CorpusFetcher, crawl
    from crab_spark.parsers import load_registry
    from crab_spark.parsers import data as pd_
    from crab_spark.parsers import listing as pl_

    registry = load_registry([pl_, pd_])
    fr.seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    fetcher = CorpusFetcher(C.corpus_df(spark, 4))
    # bloom_min_frontier=0: force the sidecar on below the
    # scale-adaptive activation threshold (crawler.BLOOM_MIN_FRONTIER)
    crawl(store, fetcher, registry, batch_size=10, max_epochs=2,
          bloom_min_frontier=0)
    side = _load(store.root / "_manifests" / "bloom-frontier.d")
    assert side is not None
    bloom, covered = side
    assert covered == set(store.tags("frontier"))
    # resume completes on the sidecar (equivalence: same final state as
    # the bloom-off path)
    crawl(store, fetcher, registry, batch_size=10, bloom_min_frontier=0)
    on = {r["url"]: r["seq"] for r in store.read("frontier").collect()}

    store2 = type(store)(store.root.parent / "wh-nobloom", spark)
    fr.seed_frontier(store2, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store2, fetcher, registry, batch_size=10, use_bloom=False)
    off = {r["url"]: r["seq"] for r in store2.read("frontier").collect()}
    assert on == off


def test_bloom_udf_matches_local(spark):
    b = Bloom.sized_for(1000)
    import numpy as np

    keys = np.array([1, 2, 3, 5, 8, 13], dtype=np.uint64)
    b.add(keys)
    df = spark.createDataFrame([(int(i),) for i in range(20)], "url_hash long")
    probe = might_contain_udf(spark, b)
    got = {r["url_hash"]: r["m"] for r in df.select("url_hash", probe("url_hash").alias("m")).collect()}
    local = b.might_contain(np.arange(20, dtype=np.uint64))
    assert all(got[i] == bool(local[i]) for i in range(20))


def test_score_host_budget_interleaves_hosts(spark, store):
    """north_rule priority frontier: a hot host's overflow beyond the
    budget must sink a level, so a priority-ordered dequeue interleaves
    hosts instead of draining the hot host first."""
    rows = (
        [(f"http://hot/{i}", 1, 0, 0, i) for i in range(10)]        # hot: 10 rows
        + [(f"http://cold/{i}", 1, 0, 0, 100 + i) for i in range(2)]  # cold: 2
    )
    fr.register(store, _cands(spark, rows), epoch=1)
    scored = fr.score_host_budget(fr.pending(store), host_budget=4)
    got = [
        (r["host"], r["priority"])
        for r in scored.orderBy("priority", "seq").limit(6).collect()
    ]
    # first 6 by (priority, seq): hot's first 4 (prio 0) + cold's 2 (prio 0)
    assert sorted(h for h, _ in got) == ["cold", "cold", "hot", "hot", "hot", "hot"]
    assert all(p == 0.0 for _, p in got)
    over = {r["host"]: max(r2["priority"] for r2 in scored.filter(
        scored.host == r["host"]).collect()) for r in scored.select("host").distinct().collect()}
    assert over["hot"] == 2.0 and over["cold"] == 0.0  # 10 rows / budget 4


def test_store_compact_preserves_rows(spark, store):
    for e in range(1, 6):
        fr.register(store, _cands(spark, [(f"http://h/{e}", 1, 0, 0, e)]), epoch=e)
    before = {(r["url"], r["seq"]) for r in store.read("frontier").collect()}
    assert len(store.tags("frontier")) == 5
    n = store.compact("frontier", n_files=1)
    assert n == 5 and len(store.tags("frontier")) == 1
    assert {(r["url"], r["seq"]) for r in store.read("frontier").collect()} == before
    assert store.compact("frontier") == 0  # idempotent: single dir already
    # vacuum expires the 5 pre-compaction dirs; the live snapshot survives
    assert store.vacuum("frontier") == 5
    assert {(r["url"], r["seq"]) for r in store.read("frontier").collect()} == before
    assert store.vacuum("frontier") == 0


def test_by_priority_dequeue_after_host_budget_rescore(spark, store):
    """Integration: apply_host_budget rewrites priorities, then a
    priority dequeue interleaves hosts (hot host capped per level)
    while the depth dequeue would drain the hot host first."""
    rows = (
        [(f"http://hot/{i}", 1, 0, 0, i) for i in range(8)]
        + [(f"http://cold/{i}", 1, 0, 0, 100 + i) for i in range(3)]
    )
    fr.register(store, _cands(spark, rows), epoch=1)
    # depth dequeue: pure (depth, seq) order → hot's 8 rows come first
    depth_first = [r["host"] for r in
                   fr.dequeue(store, batch_size=8).orderBy("pos").collect()]
    assert depth_first == ["hot"] * 8

    frontier_dirs_before = store._read_manifest("frontier")["dirs"]
    fr.apply_host_budget(store, host_budget=3)
    got = [(r["host"], r["priority"]) for r in
           fr.dequeue(store, batch_size=6, by_priority=True).orderBy("pos").collect()]
    # priority 0: hot's first 3 + cold's 3 — hosts interleaved
    assert sorted(h for h, _ in got) == ["cold"] * 3 + ["hot"] * 3
    assert all(p == 0.0 for _, p in got)
    # seq stays intact through the rescore (identity preserved)
    assert sorted(r["seq"] for r in store.read("frontier").collect()) == list(range(11))
    # r3 scale contract: the rescore is a DELTA table — the frontier
    # registration log itself is never rewritten by a maintenance pass
    assert store._read_manifest("frontier")["dirs"] == frontier_dirs_before
    assert store.exists("rescore") and store.read("rescore").count() == 11


def test_priority_dequeue_scans_only_cutoff_slice(spark, store):
    """r4 scale contract (the r3 verdict's one weak item): priority-mode
    dequeue must be O(batch + head slice) like BFS mode. The rescore
    snapshot is Hive-partitioned by priority band, so ``pband <= cutoff``
    prunes whole partition dirs; the since-rescore frontier/fetched
    deltas are row-group-pruned by epoch; nothing scans the full
    pending set and the fetched anti-join side is broadcast."""
    from crab_spark.plans import formatted_plan, plan_lines

    # one hot host (12 rows) + two cold hosts → bands 0..3 under budget 3
    rows = (
        [(f"http://hot/{i}", 1, 0, 0, i) for i in range(12)]
        + [(f"http://cold/{i}", 1, 0, 0, 100 + i) for i in range(3)]
    )
    fr.register(store, _cands(spark, rows), epoch=1)
    fr.mark_fetched(store, store.read("frontier").filter("seq >= 13"), epoch=1)
    counts = fr.apply_host_budget(store, host_budget=3)
    # pending: hot 0-11 (bands 0,1,2,3) + cold/0 (band 0)
    assert counts == {0: 4, 1: 3, 2: 3, 3: 3}
    # fresh registrations after the snapshot (the since-rescore delta)
    fr.register(store, _cands(spark, [("http://new/a", 1, 0, 0, 0)]), epoch=2)

    batch = fr.dequeue(store, batch_size=6, by_priority=True, prio_counts=None)
    got = [(r["host"], r["priority"]) for r in batch.orderBy("pos").collect()]
    # counts with the fresh row: band0=5 < 6, +band1=8 ≥ 6 → cutoff 1;
    # top-6 by (priority, seq) = all five band-0 rows + hot/3 at band 1
    assert sorted(h for h, p in got if p == 0.0) == ["cold", "hot", "hot", "hot", "new"]
    assert [(h, p) for h, p in got if p != 0.0] == [("hot", 1.0)]

    plan = formatted_plan(batch)
    assert "TakeOrderedAndProject" in plan
    # snapshot scan: the band cutoff must arrive as a PARTITION filter
    # (file-level pruning over the pband=N dirs)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l and "pband" in l]
    assert pf and all("<= 1)" in l for l in pf), pf
    # frontier + fetched delta scans: epoch predicates pushed (row-group
    # pruning — only the since-rescore suffix is read)
    pushed = plan_lines(batch, "PushedFilters")
    assert any("GreaterThan(epoch_discovered,1)" in l for l in pushed), pushed
    assert any("GreaterThan(epoch,1)" in l for l in pushed), pushed
    # the pending set is never shuffled: anti-join side is broadcast
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan, plan


def test_priority_rescore_on_drained_frontier_clears_snapshot(spark, store):
    """Edge: a rescore pass over a fully-fetched frontier must not leave
    an unreadable empty Hive-partitioned snapshot behind — the table is
    cleared and the priority dequeue returns empty cleanly (the shape a
    second crawl() call on a completed store hits on its first epoch)."""
    rows = [(f"http://h/{i}", 1, 0, 0, i) for i in range(4)]
    fr.register(store, _cands(spark, rows), epoch=1)
    assert fr.apply_host_budget(store, host_budget=2) == {0: 2, 1: 2}
    fr.mark_fetched(store, store.read("frontier"), epoch=1)
    assert fr.apply_host_budget(store, host_budget=2) == {}
    assert not store.exists("rescore")
    assert fr.dequeue(store, batch_size=5, by_priority=True).count() == 0
    assert fr.pending_priority_counts(store) == {}


def test_host_budget_rescore_scores_pending_only(spark, store):
    """Fetched rows neither consume budget slots nor appear in the
    delta: the scoring window runs AFTER the pending anti-join."""
    rows = [(f"http://hot/{i}", 1, 0, 0, i) for i in range(6)]
    fr.register(store, _cands(spark, rows), epoch=1)
    fr.mark_fetched(store, store.read("frontier").filter("seq < 3"), epoch=1)
    fr.apply_host_budget(store, host_budget=2)
    assert store.read("rescore").count() == 3  # the pending slice only
    # repeated passes GC themselves: one live dir, no orphan snapshots,
    # no unbounded collapsed_tags (r3 review — the delta has no resume
    # value, unlike the fetched log's done-* history)
    fr.apply_host_budget(store, host_budget=2)
    fr.apply_host_budget(store, host_budget=2)
    m = store._read_manifest("rescore")
    assert len(m["dirs"]) == 1 and "collapsed_tags" not in m
    assert sum(1 for c in (store.root / "rescore").iterdir() if c.is_dir()) == 1
    got = [(r["seq"], r["priority"]) for r in
           fr.dequeue(store, batch_size=3, by_priority=True).orderBy("pos").collect()]
    # pending seqs 3,4,5 under budget 2: two at level 0, overflow at 1
    assert [s for s, _ in got] == [3, 4, 5]
    assert [p for _, p in got] == [0.0, 0.0, 1.0]


def test_priority_snapshot_excludes_rerun_epoch(spark, store):
    """Exactly-once resume vs a standalone rescore: a snapshot taken
    BETWEEN a crashed epoch's register and its resume (its as-of then
    covers the crashed epoch's own registrations) must not leak those
    rows into the rerun's dequeue — both the banded snapshot AND the
    fresh slice honor exclude_epoch."""
    fr.register(store, _cands(spark, [(f"http://a/{i}", 1, 0, 0, i)
                                      for i in range(4)]), epoch=1)
    # epoch 2 crashed after register: its rows are committed
    fr.register(store, _cands(spark, [(f"http://b/{i}", 1, 1, 0, i)
                                      for i in range(3)]), epoch=2)
    # operator runs the maintenance pass before resuming: default as-of
    # = max(done, reg) = 2 → snapshot includes epoch-2 rows
    counts = fr.apply_host_budget(store, host_budget=10)
    assert sum(counts.values()) == 7
    got = fr.dequeue(store, batch_size=10, by_priority=True,
                     exclude_epoch=2).collect()
    assert sorted(r["url"] for r in got) == [f"http://a/{i}" for i in range(4)]
    # and the counts helper sees the same visibility
    pc = fr.pending_priority_counts(store, exclude_epoch=2)
    assert sum(pc.values()) == 4


def test_legacy_flat_rescore_upgrades_to_banded(spark, store):
    """A store whose rescore table predates the banded layout (flat,
    unpartitioned) must be upgraded by the next apply_host_budget —
    otherwise the cutoff-pruned dequeue silently never activates."""
    fr.register(store, _cands(spark, [(f"http://h/{i}", 1, 0, 0, i)
                                      for i in range(5)]), epoch=1)
    # simulate the legacy layout: unpartitioned delta written directly
    store.overwrite(
        "rescore",
        store.read("frontier").select("url_hash", "url", "priority"),
        tag="rescore",
    )
    assert store.partition_by("rescore") is None
    assert fr._rescore_epochs(store) is None  # banded path inactive
    counts = fr.apply_host_budget(store, host_budget=3)
    assert store.partition_by("rescore") == "pband"
    assert fr._rescore_epochs(store) is not None  # banded path active
    assert sum(counts.values()) == 5
    got = fr.dequeue(store, batch_size=5, by_priority=True,
                     prio_counts=counts).collect()
    assert len(got) == 5


def test_crash_window_rescore_separates_watermarks(spark, store):
    """A rescore snapshot taken in a crash window (reg-2 committed,
    done-2 not) must record SEPARATE registration/fetched watermarks:
    after the crashed epoch's rerun commits done-2, readers fold
    fetched[epoch > 1] and remove those rows from the head. A conflated
    max(reg, done) = 2 watermark folds only fetched[epoch > 2] and
    re-dequeues the entire rerun batch forever."""
    # epoch 1: A, B registered and fully fetched (done-1)
    fr.register(store, _cands(spark, [("http://h/a", 1, 0, 0, 0),
                                      ("http://h/b", 1, 0, 0, 1)]), epoch=1)
    fr.mark_fetched(store, store.read("frontier"), epoch=1)
    # epoch 2 crash window: C, D registered, nothing fetched yet
    fr.register(store, _cands(spark, [("http://h/c", 1, 1, 0, 0),
                                      ("http://h/d", 1, 1, 0, 1)]), epoch=2)
    # standalone rescore during the window (DEFAULT as-of derivation)
    counts = fr.apply_host_budget(store, host_budget=100)
    assert sum(counts.values()) == 2                       # C, D pending
    st = store.read_state("rescore")
    assert (int(st["epoch"]), int(st["done_epoch"])) == (2, 1)
    # the rerun of epoch 2 resolves C (done-2 commits with epoch=2)
    c_row = store.read("frontier").filter(F.col("url") == "http://h/c")
    fr.mark_fetched(store, c_row, epoch=2)
    # head and counts must now see ONLY D
    head = fr.scored_head(store, cutoff=None)
    assert [r["url"] for r in head.collect()] == ["http://h/d"]
    pc = fr.pending_priority_counts(store)
    assert sum(pc.values()) == 1
    got = fr.dequeue(store, batch_size=10, by_priority=True, prio_counts=pc)
    assert [r["url"] for r in got.collect()] == ["http://h/d"]


def test_register_evaluates_seen_probe_once(spark, store):
    """The seen-set probe UDF must run exactly once over the candidate
    set: the probe column is computed before the cache, so the
    definite-new/maybe union branches read the cached verdict instead
    of each re-running the (sidecar-loading) UDF over all rows."""
    import pandas as pd
    from pyspark.sql import functions as F2

    fr.register(store, _cands(spark, [("http://h/seed", 1, 0, 0, 0)]), epoch=1)
    acc = spark.sparkContext.accumulator(0)

    def _probe_fn(keys):
        acc.add(len(keys))
        return pd.Series([False] * len(keys))

    # no type hints: module-level `from __future__ import annotations`
    # turns them into strings pyspark can't resolve here
    probe = F2.pandas_udf(_probe_fn, "boolean")

    n = 64
    cands = _cands(spark, [(f"http://h/p{i}", 1, 1, 0, i) for i in range(n)])
    assert fr.register(store, cands, epoch=2, seen_bloom=probe) == n
    assert acc.value == n, f"probe ran over {acc.value} rows, expected {n}"
