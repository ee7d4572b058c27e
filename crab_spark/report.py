"""Presentation / observability surface — the `crab` CLI reports
(SURVEY §2.5 O1-O5) over the engine's tables.

- list_pages    → `crab list-pages` fixed-width report (main.rs:262-277)
- page_row / dump_content → `parse <id>` point lookups (main.rs:225-244,
  302-309): metadata/debug paths — a filter on the frontier/documents
  tables, pushed down to the scan.
- parser_report → `crab parsers` capability table (main.rs:316-331)
- crawl_report  → the tui dashboard totals (terminal.rs:28-157) derived
  from the metrics table instead of in-memory atomics; per-epoch rows
  give the time series the 100 ms ticker used to render.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .frontier import pending
from .parsers import ParserRegistry
from .schemas import DOCUMENTS, FRONTIER
from .store import TableStore


def _table_or_empty(store: TableStore, name: str, schema) -> DataFrame:
    """A fresh workspace has no committed tables; the reference's
    reports print empty output there (SELECT over an empty sqlite
    table), so the report surface must too — not traceback."""
    if store.exists(name):
        return store.read(name)
    return store.spark.createDataFrame([], schema)


def list_pages(store: TableStore, limit: int | None = 1000) -> DataFrame:
    """id/url/depth/status listing; status derived from the fetched log
    (the reference reads it off the pages row, storage.rs:71-79).
    ``limit=None`` = unbounded, the reference's behavior (its SELECT has
    no LIMIT); the default keeps ad-hoc console calls bounded."""
    frontier = _table_or_empty(store, "frontier", FRONTIER)
    if store.exists("fetched"):
        fetched = store.read("fetched").select(
            "url_hash", "url", F.col("reason").alias("_rsn")
        )
        frontier = frontier.join(fetched, ["url_hash", "url"], "left")
    else:
        frontier = frontier.withColumn("_rsn", F.lit(None).cast("string"))
    out = (
        frontier.withColumn(
            "status_name",
            F.when(F.col("_rsn") == "fetched", "Downloaded")
            .when(F.col("_rsn") == "robots", "RobotsSkipped")
            .otherwise("NotDownloaded"),
        )
        .select("seq", "url", "type_id", "depth", "status_name")
        .orderBy("seq")
    )
    return out if limit is None else out.limit(limit)


def page_row(store: TableStore, url: str) -> DataFrame:
    return _table_or_empty(store, "frontier", FRONTIER).filter(
        F.col("url") == url
    )


def dump_content(store: TableStore, url: str) -> DataFrame:
    """Raw span content of one page (`crab dump <id>`) — the NEWEST
    version if the page was re-fetched (latest_documents; the filter
    lands before the version agg, so this scans one doc_id's rows)."""
    from .util import latest_documents

    return latest_documents(
        _table_or_empty(store, "documents", DOCUMENTS).filter(
            F.col("doc_id") == url
        )
    ).select("spans")


def parser_report(registry: ParserRegistry) -> list[dict]:
    return registry.describe()


def crawl_report(store: TableStore) -> dict:
    """Dashboard totals: requests / successful / invalid / new links +
    frontier occupancy. One aggregation over the metrics summary rows."""
    totals = {"requests": 0, "successful": 0, "invalid": 0, "new_links": 0}
    if store.exists("metrics"):
        row = (
            store.read("metrics")
            .filter(F.col("part") == -1)
            .agg(
                F.sum("requests").alias("requests"),
                F.sum("successful").alias("successful"),
                F.sum("invalid").alias("invalid"),
                F.sum("new_links").alias("new_links"),
            )
            .collect()[0]
        )
        totals = {k: int(row[k] or 0) for k in totals}
    totals["frontier_size"] = (
        store.read("frontier").count() if store.exists("frontier") else 0
    )
    totals["pending"] = pending(store).count() if store.exists("frontier") else 0
    return totals


def epoch_timeseries(store: TableStore) -> DataFrame:
    """Per-epoch metric rows — what the tui ticker displayed over time."""
    return (
        store.read("metrics")
        .filter(F.col("part") == -1)
        .select("epoch", "requests", "successful", "invalid", "new_links")
        .orderBy("epoch")
    )
