"""Batch/stream equivalence: the streaming operators must produce the
same results as their batch duals (q18/q19) on the same input."""

from __future__ import annotations

import pytest

from crab_spark.queries import QUERIES
from crab_spark.streaming.windows import (
    run_available_now,
    sessionize_stream,
    stream_events,
    tumbling_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    stream = stream_events(spark, sf_dir)
    got = run_available_now(
        tumbling_counts(stream), "tumbling_test", str(tmp_path / "ck1"),
        output_mode="complete",
    )
    want = QUERIES["q18_tumbling_window"](spark, sf_dir)
    g = {(str(r["win_start"]), r["event_type"]): (r["n"], r["avg_value"])
         for r in got.collect()}
    w = {(str(r["win_start"]), r["event_type"]): (r["n"], r["avg_value"])
         for r in want.collect()}
    assert g == w and len(g) > 0


def test_streaming_sessionize_equals_batch(spark, sf_dir, tmp_path):
    stream = stream_events(spark, sf_dir)
    got = run_available_now(
        sessionize_stream(stream), "sessionize_test", str(tmp_path / "ck2"),
        output_mode="update",
    )
    want = QUERIES["q19_sessionize"](spark, sf_dir)
    g = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got.collect()}
    w = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_streaming_register_dedups_across_microbatches(spark, tmp_path):
    """Streaming first-wins dedup: two link-feed drops with overlap —
    every URL comes out exactly once, across micro-batch boundaries."""
    import pandas as pd

    from crab_spark.streaming.frontier_stream import (
        LINK_FEED_SCHEMA,
        dedup_links_stream,
        stream_link_feed,
    )
    from crab_spark.streaming.windows import run_available_now

    feed = tmp_path / "feed"
    feed.mkdir()
    batch1 = [(f"http://h/{i}", 1, 0) for i in range(50)]
    batch2 = [(f"http://h/{i}", 1, 1) for i in range(25, 75)]  # 25 dups
    spark.createDataFrame(batch1, LINK_FEED_SCHEMA).coalesce(1).write.parquet(
        str(feed / "drop1.parquet")
    )
    spark.createDataFrame(batch2, LINK_FEED_SCHEMA).coalesce(1).write.parquet(
        str(feed / "drop2.parquet")
    )
    out = run_available_now(
        dedup_links_stream(stream_link_feed(spark, str(feed))),
        "register_stream", str(tmp_path / "ckpt"), output_mode="append",
    )
    urls = [r["url"] for r in out.collect()]
    assert sorted(urls) == sorted({f"http://h/{i}" for i in range(75)})
    assert len(urls) == len(set(urls)) == 75


def test_streaming_pii_scrub_equals_batch(spark, sf_dir, tmp_path):
    """The stateless scrub gate runs on a stream unchanged: streaming
    pii_scrub over the documents file-source == the batch q46 result
    (same injected-PII layer not applied here — raw corpus, so this
    also pins the zero-PII negative path end-to-end)."""
    from crab_spark.operators import scrub as SC
    from crab_spark.streaming.windows import (
        run_available_now,
        stream_documents,
    )

    got = run_available_now(
        SC.pii_scrub(stream_documents(spark, sf_dir)),
        "pii_stream_test", str(tmp_path / "ck_pii"), output_mode="append",
    )
    want = SC.pii_scrub(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    g = {r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["n_phones"],
                       r["redacted_hash"]) for r in got.collect()}
    w = {r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["n_phones"],
                       r["redacted_hash"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_symlink_dirs_reused_across_calls(spark, sf_dir):
    """Repeated stream_events/stream_documents calls must reuse one
    memoized symlink dir per source file instead of leaking a fresh
    mkdtemp per invocation (process-lifetime litter)."""
    from crab_spark.streaming import windows as W

    before = dict(W._STREAM_SYMLINK_DIRS)
    W.stream_events(spark, sf_dir)
    W.stream_events(spark, sf_dir)
    W.stream_documents(spark, sf_dir)
    W.stream_documents(spark, sf_dir)
    added = {k: v for k, v in W._STREAM_SYMLINK_DIRS.items() if k not in before}
    # at most one dir per distinct source file, reused on the 2nd call
    assert len(added) <= 2
    import os
    for d in added.values():
        assert os.path.isdir(d)


def test_streaming_heuristic_gate_and_line_dedup_equal_batch(spark, sf_dir, tmp_path):
    """The new stateless curation ops run on a stream unchanged — the
    live-ingest contract: heuristic_quality_gate composed over
    dedup_lines (clean first, gate the cleaned text) on the documents
    file-source equals the same composition on the batch read. One
    streaming query pins both ops plus their composition end-to-end."""
    from crab_spark.operators import scrub as SC
    from crab_spark.operators import text as X
    from crab_spark.streaming.windows import (
        run_available_now,
        stream_documents,
    )

    def pipeline(docs):
        return X.heuristic_quality_gate(SC.dedup_lines(docs))

    got = run_available_now(
        pipeline(stream_documents(spark, sf_dir)),
        "gate_stream_test", str(tmp_path / "ck_gate"), output_mode="append",
    )
    want = pipeline(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    g = {r["doc_id"]: (r["n_words"], r["keep"]) for r in got.collect()}
    w = {r["doc_id"]: (r["n_words"], r["keep"]) for r in want.collect()}
    assert g == w and len(g) > 0 and any(v[1] for v in g.values())


def test_streaming_holdout_split_and_mixture_equal_batch(spark, sf_dir, tmp_path):
    """The new stateless sampling ops run on a stream unchanged:
    holdout_split composed over apply_mixture_rates (rates precomputed
    batch-side — the tiny-model-state pattern, like broadcast
    centroids) on the documents file-source equals the batch result.
    An ingest pipeline can thus assign splits and mixture verdicts AT
    ARRIVAL TIME with the identical hash rules the batch engine uses."""
    from crab_spark.operators import sampling as SA
    from crab_spark.streaming.windows import (
        run_available_now,
        stream_documents,
    )

    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = SA.temperature_mixture_rates(batch, alpha=0.5)

    def pipeline(docs):
        split = SA.holdout_split(docs, (0.8, 0.1, 0.1),
                                 ("train", "val", "test"), salt="st")
        mixed = SA.apply_mixture_rates(split, rates, base_rate=0.5,
                                       salt="sm")
        return split.select("doc_id", "split").join(mixed, "doc_id")

    got = run_available_now(
        pipeline(stream_documents(spark, sf_dir)),
        "holdout_stream_test", str(tmp_path / "ck_split"),
        output_mode="append",
    )
    want = pipeline(batch)
    g = {r["doc_id"]: (r["split"], r["keep"]) for r in got.collect()}
    w = {r["doc_id"]: (r["split"], r["keep"]) for r in want.collect()}
    assert g == w and len(g) > 0
    assert {v[0] for v in g.values()} == {"train", "val", "test"}


def test_streaming_hll_registers_equal_batch(spark, sf_dir, tmp_path):
    """Streaming windowed-HLL dual of q95: the stateful streaming agg
    maintains the same 64-registers-per-window table the batch path
    computes, so finalizing the streamed registers (the stateless
    read-side view, sketches.hll_estimate) reproduces q95's estimates
    exactly. Pins that the register math stays in sync between the
    batch and streaming code paths."""
    from crab_spark.operators.sketches import hll_estimate
    from crab_spark.streaming.windows import windowed_hll_registers

    stream = stream_events(spark, sf_dir)
    regs = run_available_now(
        windowed_hll_registers(stream), "hll_regs_test",
        str(tmp_path / "ck_hll"), output_mode="complete",
    )
    got = {
        str(r["win_start"]): r["est_distinct"]
        for r in hll_estimate(regs, ["win_start"]).collect()
    }
    want = {
        str(r["win_start"]): r["est_distinct"]
        for r in QUERIES["q95_hll_windowed"](spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_hopping_equals_batch(spark, sf_dir, tmp_path):
    """Streaming dual of q102: the hopping-window agg over the file
    stream reproduces the batch query exactly (availableNow drains the
    whole table, complete mode emits final window states)."""
    from crab_spark.streaming.windows import hopping_sums

    stream = stream_events(spark, sf_dir)
    got = run_available_now(
        hopping_sums(stream), "hopping_test", str(tmp_path / "ck_hop"),
        output_mode="complete",
    )
    want = QUERIES["q102_hopping_window"](spark, sf_dir)
    g = {str(r["win_start"]): (r["n"], r["sum_value"]) for r in got.collect()}
    w = {str(r["win_start"]): (r["n"], r["sum_value"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_streaming_recrawl_equals_batch(spark, sf_dir, tmp_path):
    """The recrawl scheduler's streaming dual: per-key change-rate
    state folded incrementally must reproduce q110's batch schedule
    exactly (same signature, span, interval, and due-time rule)."""
    from crab_spark.streaming.windows import recrawl_stream

    stream = stream_events(spark, sf_dir)
    got = run_available_now(
        recrawl_stream(stream), "recrawl_test", str(tmp_path / "ck_rc"),
        output_mode="update",
    )
    want = QUERIES["q110_recrawl_schedule"](spark, sf_dir)
    cols = ("n_obs", "n_changes", "span_sec", "interval_sec",
            "next_due_epoch")
    g = {r["url_key"]: tuple(r[c] for c in cols) for r in got.collect()}
    w = {r["url_key"]: tuple(r[c] for c in cols) for r in want.collect()}
    assert g == w and len(g) > 0


def test_streaming_sessionize_random_microbatch_splits(spark, sf_dir, tmp_path):
    """Stateful sessionization must be microbatch-split-invariant: the
    same events chunked into random-sized TIME-ORDERED drops (one file
    per micro-batch via maxFilesPerTrigger=1, the live-ingest shape)
    fold through the per-user state across batch boundaries to exactly
    the single-drop/batch answer. The single-drop dual above pins the
    arithmetic; this pins the state carry (n_sessions, n_events,
    last_ts resume) under split points nobody chose."""
    import random

    from crab_spark.streaming.windows import (
        EVENTS_SCHEMA,
        run_available_now,
        sessionize_stream,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .orderBy("ts", "event_id")
        .collect()
    )
    rng = random.Random(3517)
    cuts = sorted(rng.sample(range(1, len(events)), 3))
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, (lo, hi) in enumerate(
        zip([0] + cuts, cuts + [len(events)])
    ):
        spark.createDataFrame(events[lo:hi], EVENTS_SCHEMA).coalesce(
            1
        ).write.parquet(str(feed / f"drop{i}.parquet"))

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")  # drops are dirs of parts
        .parquet(str(feed))
    )
    got_rows = run_available_now(
        sessionize_stream(stream), "sess_split_test",
        str(tmp_path / "ck_split"), output_mode="update",
    ).collect()
    # update mode appends one row per (user, micro-batch that touched
    # it); both counters are monotone, so the max tuple IS the final
    g: dict[int, tuple[int, int]] = {}
    for r in got_rows:
        t = (r["n_sessions"], r["n_events"])
        if r["user_id"] not in g or t > g[r["user_id"]]:
            g[r["user_id"]] = t
    want = QUERIES["q19_sessionize"](spark, sf_dir)
    w = {r["user_id"]: (r["n_sessions"], r["n_events"])
         for r in want.collect()}
    assert g == w and len(g) > 0


def test_streaming_recrawl_random_microbatch_splits(spark, sf_dir, tmp_path):
    """Split-invariance for the recrawl scheduler's state fold: random
    time-ordered drops through recrawl_stream must land on q110's batch
    schedule exactly (prev_sig/first_ep/last_ep carried across batch
    boundaries; n_obs is monotone, so each key's max-n_obs update row
    is its final schedule)."""
    import random

    from crab_spark.streaming.windows import (
        EVENTS_SCHEMA,
        recrawl_stream,
        run_available_now,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .orderBy("ts", "event_id")
        .collect()
    )
    rng = random.Random(6229)
    cuts = sorted(rng.sample(range(1, len(events)), 3))
    feed = tmp_path / "rc_feed"
    feed.mkdir()
    for i, (lo, hi) in enumerate(zip([0] + cuts, cuts + [len(events)])):
        spark.createDataFrame(events[lo:hi], EVENTS_SCHEMA).coalesce(
            1
        ).write.parquet(str(feed / f"drop{i}.parquet"))

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(feed))
    )
    got_rows = run_available_now(
        recrawl_stream(stream), "recrawl_split_test",
        str(tmp_path / "ck_rc_split"), output_mode="update",
    ).collect()
    cols = ("n_obs", "n_changes", "span_sec", "interval_sec",
            "next_due_epoch")
    g: dict[int, tuple] = {}
    for r in got_rows:
        t = tuple(r[c] for c in cols)
        if r["url_key"] not in g or t[0] > g[r["url_key"]][0]:
            g[r["url_key"]] = t
    want = QUERIES["q110_recrawl_schedule"](spark, sf_dir)
    w = {r["url_key"]: tuple(r[c] for c in cols) for r in want.collect()}
    assert g == w and len(g) > 0
