"""Streaming windowed aggregation + stateful sessionization.

Batch/stream duality: ``tumbling_counts`` is q18_tumbling_window as a
streaming query (watermark + window agg, append-complete on
availableNow); ``sessionize_stream`` is q19_sessionize as an
``applyInPandasWithState`` operator (per-user session state with a
30-min gap timeout). On a live crawl these run over the metrics/events
feed; in tests they run over the events parquet as a file stream with
Trigger.AvailableNow, so results are exact and comparable to the batch
query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _symlink_stream_dir(src: str, name: str) -> str:
    """The streaming file source lists a DIRECTORY; the testdata ships
    one parquet *file* per table, so expose it through a symlinked dir
    — memoized per source file so repeated calls reuse one temp dir for
    the process lifetime instead of leaking a fresh mkdtemp each."""
    import os
    import tempfile

    if not os.path.isfile(src):
        return src
    key = os.path.abspath(src)
    d = _STREAM_SYMLINK_DIRS.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=f"{name}_stream_")
        os.symlink(key, os.path.join(d, os.path.basename(src)))
        _STREAM_SYMLINK_DIRS[key] = d
    return d


# one symlink dir per distinct source file for the process lifetime
_STREAM_SYMLINK_DIRS: dict[str, str] = {}


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one parquet = one
    micro-batch under availableNow; on a live pipeline this would be a
    Kafka/file-drop source with the same downstream graph)."""
    src = _symlink_stream_dir(f"{sf_dir}/events.parquet", "events")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling window (1h) per event_type with a watermark
    for late data — the streaming dual of q18."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").getField("start").alias("win_start"),
                 "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


def hopping_sums(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time hopping window (1 h size, 30 min slide) — the
    streaming dual of q102_hopping_window: the identical
    ``window(ts, size, slide)`` expression plus a watermark, so each
    event updates exactly the two covering windows' running state."""
    return (
        events.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes")
            .getField("start")
            .alias("win_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def windowed_hll_registers(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming distinct-user HLL: (win_start, bucket, max_rho) per
    1 h tumbling window. The registers ARE the streaming state —
    max() is the HLL merge, so Spark's windowed stateful aggregation
    holds exactly 64 integers per window instead of a distinct-user
    set, and late events within the watermark merge for free. The
    estimate is the STATELESS read-side view (sketches.hll_estimate
    over the register sink) — chaining it here would need a second
    stateful agg; production pipelines materialize registers and let
    dashboards finalize. Register math is identical to the batch q95
    (operators/sketches.registers_over), which the dual test pins."""
    key = F.coalesce(F.col("user_id").cast("string"), F.lit(""))
    h32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    pre = (
        events.withWatermark("ts", watermark)
        .select("ts", (h32 % 64).cast("int").alias("bucket"), h32.alias("_h32"))
        .select("ts", "bucket", F.expr("_h32 div 64").alias("v"))
        .select(
            "ts",
            "bucket",
            F.when(F.col("v") > 0, 27 - F.length(F.bin(F.col("v"))))
            .otherwise(F.lit(27))
            .cast("int")
            .alias("rho"),
        )
    )
    return (
        pre.groupBy(F.window("ts", "1 hour"), "bucket")
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.col("window.start").alias("win_start"), "bucket", "max_rho"
        )
    )


SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
SESSION_STATE = T.StructType(
    [
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session counting with a 1800 s gap rule — the custom
    stateful operator pattern (applyInPandasWithState). State carries
    (n_sessions, n_events, last event time)."""
    n_sessions, n_events, last_ts = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for t in pdf["ts"]:
            sec = t.timestamp() // 1
            if last_ts is None or sec - last_ts > 1800:
                n_sessions += 1
            last_ts = sec
            n_events += 1
    state.update((int(n_sessions), int(n_events), float(last_ts)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(df: DataFrame, query_name: str, checkpoint: str,
                      output_mode: str = "complete") -> DataFrame:
    """Execute a streaming query to completion (Trigger.AvailableNow) into
    an in-memory sink and return the result table."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(query_name)


DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (same symlinked-dir
    trick as stream_events). The stateless curation operators (PII
    scrub, chunking, token counts, quality features) apply to this
    stream UNCHANGED — same DataFrame graph, micro-batch at a time —
    which is how a live ingest pipeline runs the scrub gate before
    anything lands in the lake."""
    src = _symlink_stream_dir(f"{sf_dir}/documents.parquet", "documents")
    return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(src)


RECRAWL_OUT = T.StructType(
    [
        T.StructField("url_key", T.LongType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("span_sec", T.LongType()),
        T.StructField("interval_sec", T.LongType()),
        T.StructField("next_due_epoch", T.LongType()),
    ]
)
RECRAWL_STATE = T.StructType(
    [
        T.StructField("n_obs", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("prev_sig", T.LongType()),
        T.StructField("first_ep", T.LongType()),
        T.StructField("last_ep", T.LongType()),
    ]
)

_RECRAWL_SIG_MOD = 5
_RECRAWL_MIN_GAP = 60


def _recrawl_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-URL recrawl state (the q110 arithmetic, incrementally): the
    state carries (n_obs, n_changes, prev_sig, first_ep, last_ep) —
    O(5 ints) per key forever — and each micro-batch folds its
    observations in event order, emitting the key's refreshed
    schedule row. The content signature (floor(value·100) mod 5,
    truncated mod — Spark's % semantics) and the integer due-time rule
    are identical to the batch operator, pinned by the dual test."""
    import math

    if state.exists:
        n_obs, n_changes, prev_sig, first_ep, last_ep = state.get
    else:
        n_obs, n_changes, prev_sig, first_ep, last_ep = 0, 0, None, None, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for t, v in zip(pdf["ts"], pdf["value"]):
            ep = 0 if pd.isna(t) else int(t.timestamp() // 1)
            val = 0.0 if pd.isna(v) else float(v)
            s = int(math.floor(val * 100))
            sig = s - int(s / _RECRAWL_SIG_MOD) * _RECRAWL_SIG_MOD
            if prev_sig is not None and sig != prev_sig:
                n_changes += 1
            prev_sig = sig
            n_obs += 1
            first_ep = ep if first_ep is None else min(first_ep, ep)
            last_ep = ep if last_ep is None else max(last_ep, ep)
    state.update(
        (int(n_obs), int(n_changes), int(prev_sig or 0),
         int(first_ep or 0), int(last_ep or 0))
    )
    span = (last_ep or 0) - (first_ep or 0)
    interval = span // max(n_changes, 1)
    yield pd.DataFrame(
        {
            "url_key": [key[0]],
            "n_obs": [n_obs],
            "n_changes": [n_changes],
            "span_sec": [span],
            "interval_sec": [interval],
            "next_due_epoch": [(last_ep or 0) + max(interval, _RECRAWL_MIN_GAP)],
        }
    )


def recrawl_stream(events: DataFrame) -> DataFrame:
    """Streaming dual of q110_recrawl_schedule: the change-rate state
    lives PER URL KEY in the stateful operator (applyInPandasWithState,
    the sessionize pattern) so a live fetch log keeps every page's
    next-due time current without rescanning history — exactly the
    state a production freshness scheduler holds."""
    return events.withColumnRenamed(
        "user_id", "url_key"
    ).groupBy("url_key").applyInPandasWithState(
        _recrawl_fn,
        outputStructType=RECRAWL_OUT,
        stateStructType=RECRAWL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
