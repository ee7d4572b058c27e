"""Streaming dual of the frontier register path.

The engine's crawl models each epoch as a Structured-Streaming-style
batch (north_star); this module shows the same seen-set semantics as an
ACTUAL streaming query: a file-drop (or Kafka) source of discovered
links, exactly-once first-wins dedup via streaming ``dropDuplicates``
state, appended to the frontier sink.

Design tradeoff vs the batch engine (frontier.register): streaming
dedup state lives in the state store (RocksDB/HDFS) and grows with the
seen set — at 10^10 URLs that is exactly the bloom-sidecar + bucketed
anti-join problem the batch path solves with table-side state, which is
why the epoch loop is the primary engine and this is the
continuous-ingest variant (e.g. a link feed from an external fetcher
fleet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINK_FEED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)


def stream_link_feed(spark: SparkSession, feed_dir: str) -> DataFrame:
    """File-source stream: every parquet drop in ``feed_dir`` is a
    micro-batch of discovered links (the Kafka stand-in)."""
    return (
        spark.readStream.schema(LINK_FEED_SCHEMA)
        .option("recursiveFileLookup", "true")  # drops may be dirs of parts
        .parquet(feed_dir)
    )


def dedup_links_stream(links: DataFrame) -> DataFrame:
    """First-wins URL dedup across micro-batches: streaming
    ``dropDuplicates`` keyed on (url_hash, url) — same identity rule as
    frontier.register (hash partitions, string is the identity), with
    the seen set held in streaming state. Emits each canonical URL
    exactly once, on first sight."""
    return (
        links.withColumn("url_hash", F.xxhash64("url"))
        .dropDuplicates(["url_hash", "url"])
    )
