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
