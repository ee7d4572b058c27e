"""Offline maintenance entry points — the reference's non-crawl commands.

- ``navigate_all``  → `crab navigate-all` (main.rs:202-223): scan ALL
  downloaded pages, extract + absolutize links, register the new ones.
  Reference quirks reproduced: (a) children are registered at the
  PARENT's depth, not depth+1 (main.rs:212, 219-221) — override with
  ``depth_offset=1`` for crawl-consistent depths; (b) the reference
  buffers every link in memory before registering to dodge a SQLite
  cursor/write conflict (main.rs:205-206) — snapshot isolation makes
  that a non-issue here, the whole thing is ONE DataFrame DAG.
- ``validate_sweep`` → `crab validate [--reset]` (main.rs:279-300):
  re-run the validators over stored content; optionally reset failing
  pages to NotDownloaded so the next crawl refetches them. The
  reference collects invalid ids first and resets after the scan
  completes (lock avoidance, main.rs:292-295) — same shape here, but
  because the store is snapshot-isolated, not because it has to be.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .frontier import register, reset_pages
from .parsers import ParserRegistry
from .store import TableStore
from .urlnorm import absolutize_udf
from .util import latest_documents, ordered_index


def _downloaded_docs(store: TableStore) -> DataFrame:
    """documents ⋈ frontier → (doc_id, type_id, depth, spans) for all
    downloaded pages (the reference's read_downloaded_pages cursor,
    storage.rs:170-177, as a plain join). Goes through
    ``latest_documents`` so a re-fetched page (TTL recrawl, sitemap
    refresh, reset) contributes its NEWEST version once — the
    reference's content-replaced semantics over the append-only log."""
    docs = latest_documents(store.read("documents"))
    meta = store.read("frontier").select(
        F.col("url").alias("doc_id"), "type_id", "depth", "url_hash"
    )
    return docs.join(meta, "doc_id")


def navigate_all(
    store: TableStore,
    registry: ParserRegistry,
    depth_offset: int = 0,  # reference default: parent's depth (quirk b)
    epoch: int | None = None,
) -> int:
    """Extract links from every downloaded page and register the new
    ones. Returns the number of newly registered URLs."""
    if not (store.exists("documents") and store.exists("frontier")):
        return 0  # fresh workspace: nothing downloaded (reference: no-op)
    docs = _downloaded_docs(store)

    nav_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField(
                "links",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("url", T.StringType()),
                            T.StructField("type_id", T.IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, type_id, depth, spans in zip(
                pdf["doc_id"], pdf["type_id"], pdf["depth"], pdf["spans"]
            ):
                if spans is None:
                    continue
                links = registry.run_navigate(int(type_id), [dict(s) for s in spans])
                out.append(
                    (doc_id, int(depth),
                     [{"url": u, "type_id": int(t)} for u, t in links])
                )
            yield pd.DataFrame(out, columns=["doc_id", "depth", "links"])

    nav = docs.select("doc_id", "type_id", "depth", "spans").mapInPandas(
        run, schema=nav_schema
    )
    # deterministic registration order: parents by (depth, doc_id), links
    # by navigate-output position — matches the reference's sequential
    # scan order over its depth-ordered storage
    parents = ordered_index(nav, ["depth", "doc_id"], "parent_pos", start=0)
    exploded = parents.select(
        "doc_id", "depth", "parent_pos",
        F.posexplode_outer("links").alias("link_idx", "link"),
    ).filter(F.col("link").isNotNull())
    cands = (
        exploded.withColumn("abs_url", absolutize_udf(F.col("link.url"), F.col("doc_id")))
        .filter(F.col("abs_url").isNotNull())
        .select(
            F.col("abs_url").alias("url"),
            F.col("link.type_id").alias("type_id"),
            (F.col("depth") + F.lit(depth_offset)).cast("int").alias("depth"),
            F.col("parent_pos"),
            F.col("link_idx").cast("int").alias("link_idx"),
        )
    )
    if epoch is None:
        epoch = int(store.read_state("crawl", {"epoch": 0})["epoch"]) + 1
    n_new = register(store, cands, epoch=epoch)
    # bump the checkpoint so a later call (or crawl) gets a fresh epoch
    # tag — append tags must be unique per logical operation
    store.write_state("crawl", {"epoch": epoch})
    parents.df_ordered_cache.unpersist()
    return n_new


def recrawl_older_than(store: TableStore, max_age_epochs: int) -> int:
    """TTL recrawl policy (beyond the reference, which only has per-page
    reset): flip every page fetched more than ``max_age_epochs`` epochs
    ago back to pending, so the next crawl refreshes stale content.
    Returns the number of pages re-queued.

    Works entirely on the fetched log: one filter + overwrite (a
    row-level DELETE on Iceberg). Robots-skipped rows are NOT revived —
    a disallow is not staleness. Note for the cuckoo seen-set: recrawl
    does not unregister URLs (they stay seen — re-fetching, not
    re-discovering), so the filter needs no deletes here; cuckoo.delete
    exists for policies that truly forget URLs."""
    if not store.exists("fetched"):
        return 0
    fetched = store.read("fetched")
    cur = fetched.agg(F.max("epoch")).collect()[0][0] or 0
    stale = (F.col("epoch") <= cur - max_age_epochs) & (F.col("reason") == "fetched")
    n = fetched.filter(stale).count()
    if n:
        # keep_history: the replaced done-* tags feed resume-epoch derivation
        store.overwrite("fetched", fetched.filter(~stale), tag="recrawl",
                        keep_history=True)
    return n


def validate_sweep(
    store: TableStore, registry: ParserRegistry, reset: bool = False
) -> int:
    """Re-validate stored content; return the number of invalid pages,
    optionally resetting them for refetch."""
    if not (store.exists("documents") and store.exists("frontier")):
        return 0  # fresh workspace: nothing downloaded (reference: no-op)
    docs = _downloaded_docs(store)

    @F.pandas_udf(T.BooleanType())
    def valid_udf(type_ids: pd.Series, spans_col: pd.Series) -> pd.Series:
        return pd.Series(
            [
                registry.run_validate(int(t), [dict(s) for s in sp])
                if sp is not None else False
                for t, sp in zip(type_ids, spans_col)
            ]
        )

    invalid = docs.filter(~valid_udf(F.col("type_id"), F.col("spans"))).select(
        "url_hash"
    )
    invalid = invalid.cache()
    n = invalid.count()
    if reset and n:
        reset_pages(store, invalid)
    invalid.unpersist()
    return n


def prune_document_versions(store: TableStore) -> int:
    """Drop superseded document versions — keep the newest
    ``fetched_epoch`` row per doc_id (the Iceberg
    ``rewrite_data_files`` + ``expire_snapshots`` analogue for the
    append-only documents log). ``util.latest_documents`` already gives
    every reader content-replaced semantics without this; pruning only
    bounds storage after heavy recrawl churn (TTL sweeps / sitemap
    refresh loops re-fetching the same pages). Returns rows removed.

    ``keep_history=True`` records the collapsed ``docs-*`` tags so a
    crash-window replay of the last epoch's docs append no-ops instead
    of re-duplicating rows the prune already folded (the fetched-log
    in-crawl compaction discipline, crawler.py)."""
    if not store.exists("documents"):
        return 0
    docs = store.read("documents")
    keep = latest_documents(docs)
    n_drop = docs.count() - keep.count()
    if n_drop:
        store.overwrite("documents", keep, tag="prune", keep_history=True)
    return n_drop
