"""Table schemas for the engine.

Reference data model: the single SQLite ``pages`` relation built up by
migrations V1..V6 (/root/reference/migrations, storage.rs:43-50). We
split it the way a columnar engine wants it split:

- ``frontier``  — the scheduling state (no content): one row per known
  URL. Mirrors pages(id,url,type,depth,status) plus scale-out columns
  (url_hash bucket key, host, seq tiebreaker, priority, lineage).
- ``documents`` — the fetched-content mirror, *interleaved text+media
  spans* per BASELINE.json input_hint, replacing crab's zstd'd HTML blob
  (storage.rs:135-144). Compression is the parquet codec's job.
- ``links``     — transient per-epoch navigate() output (crab materializes
  these directly as pages rows, crawler.rs:136-142).
- ``metrics`` / ``lineage`` — per (epoch, partition) crawl counters,
  replacing the in-memory CrawlerState (crawler.rs:17-29) and tui.
- ``parsed``    — long-format parse() output; crab's ParsedTables
  (lib.rs:67-68) is {table: [{col: val}]} with ragged string rows.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Page status — reference enum PageStatus (storage.rs:26-31), values
# pinned by V4__change_status.sql CHECK (status IN (1,2)).
STATUS_NOT_DOWNLOADED = 1
STATUS_DOWNLOADED = 2

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # text | link | media
        T.StructField("text", T.StringType(), False),       # span text; href for links
        T.StructField("media_ref", T.StringType(), False),  # non-empty only for media
        T.StructField("offset", T.IntegerType(), False),    # monotone within doc
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),     # canonical URL
        T.StructField("spans", T.ArrayType(SPAN), False),
        T.StructField("fetched_epoch", T.IntegerType(), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),     # xxhash64(canonical url)
        T.StructField("url", T.StringType(), False),        # canonical form
        T.StructField("host", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),   # parser route (V5)
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),          # registration order (rowid)
        T.StructField("priority", T.DoubleType(), False),   # north_rule scoring hook
        T.StructField("epoch_discovered", T.IntegerType(), False),
        T.StructField("part", T.IntegerType(), False),      # hash bucket of url_hash
    ]
)

LINKS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),        # absolutized, canonical
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("src_depth", T.IntegerType(), False),
        T.StructField("parent_pos", T.LongType(), False),   # parent's dequeue position
        T.StructField("link_idx", T.IntegerType(), False),  # position in navigate() output
    ]
)

METRICS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("requests", T.LongType(), False),
        T.StructField("successful", T.LongType(), False),
        T.StructField("invalid", T.LongType(), False),
        T.StructField("new_links", T.LongType(), False),
    ]
)

PARSED = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("row_idx", T.IntegerType(), False),
        T.StructField("col_idx", T.IntegerType(), False),  # position within the row dict
        T.StructField("col", T.StringType(), False),
        T.StructField("val", T.StringType(), False),
    ]
)

# RFC 9309 rule: Allow/Disallow + pattern (with * wildcards, $ anchor)
ROBOTS_RULE = T.StructType(
    [
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("pattern", T.StringType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rules", T.ArrayType(ROBOTS_RULE), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
        T.StructField("fetched_epoch", T.IntegerType(), False),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),
    ]
)

# Number of hash buckets for the seen-set / frontier layout. At 10^10
# URLs you want O(10^4) buckets (~1e6 keys/bucket); in the sandbox a
# small power of two keeps task counts sane. Kept as a module constant so
# tests and the store agree.
N_BUCKETS = 32
