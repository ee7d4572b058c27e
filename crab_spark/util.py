"""Small shared helpers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ordered_index(
    df: DataFrame,
    order_cols: list[str],
    name: str = "idx",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based index in (order_cols) order, WITHOUT a global
    single-partition sort.

    A plain ``row_number().over(Window.orderBy(...))`` funnels the whole
    DataFrame through ONE task — the serial section that caps crawl-epoch
    scaling (Amdahl). This is the classic two-pass replacement:

    1. range-partition by the order keys (parallel sort),
    2. count rows per partition (tiny driver-side collect → cumulative
       offsets, in range order),
    3. per-partition row_number (parallel) + offset.

    Ties in order_cols must not exist (callers order by unique keys);
    range partitioning keeps equal keys co-located so the result would
    still be deterministic up to tie order.

    Returns a DataFrame with the extra ``name`` column. The intermediate
    is cached (two passes must see identical partitioning); caller
    should ``.unpersist()`` the RETURNED frame's source when done — we
    expose it via ``df_ordered_cache`` attribute for that.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    counts = ranged.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = start
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["count"])
    if offsets:
        omap = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
    else:
        # zero rows: any typed map keeps the analyzer happy (never read)
        omap = F.create_map(F.lit(0), F.lit(start))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = ranged.withColumn(
        name,
        (F.row_number().over(w).cast("long") - 1 + omap[F.col("_pid")]).cast("long"),
    ).drop("_pid")
    out.df_ordered_cache = ranged  # handle for caller-side unpersist
    return out


def fan_out(df: DataFrame, *by: str) -> DataFrame:
    """Spread a low-parallelism input over the cluster before CPU-heavy
    per-row work (shingling, per-token hashing, vector math).

    A small parquet table is often ONE row group, so its scan is one
    task no matter how many cores exist — and everything fused into the
    scan stage (explode + md5 per shingle, dot products per row) runs
    serially while 31 cores idle (measured: q23's shingle+minhash stage
    13.7 s serial vs 2.3 s fanned out at sf1.0). The optimization
    guide's cure for input skew is "repartition immediately after the
    read"; this helper does that ONLY when the input's planned scan
    parallelism is below the cluster's, so at real scale (thousands of
    input splits) it is a no-op and adds no exchange.

    ``by`` columns make the added exchange a hash partitioning that a
    downstream groupBy/window on the same key reuses (one exchange
    total instead of two). Without ``by`` it is a round-robin spread.
    The explicit partition count pins the exchange against AQE
    coalescing (a user-specified repartition is never coalesced).
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # unplannable frames (e.g. streaming): leave as-is
        return df
    if cur >= n:
        return df
    if by:
        return df.repartition(n, *[F.col(c) for c in by])
    return df.repartition(n)


def local_df(spark: SparkSession, rows: list[tuple], schema: T.StructType) -> DataFrame:
    """Tiny driver-side DataFrame via the pandas→Arrow path.

    ``spark.createDataFrame(list, schema)`` parallelizes through the
    legacy pickle RDD path — in local mode every action on it launches
    one Python worker per partition (~6-8 s for a 32-row frame at
    local[32]). The Arrow path ships a single batch, ~30× faster, and on
    a cluster avoids shipping a pickled RDD entirely.
    """
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf, schema=schema)


def latest_documents(docs: DataFrame) -> DataFrame:
    """One row per doc_id: the newest ``fetched_epoch`` version.

    The documents table is append-only — a recrawl (TTL sweep,
    ``sitemap_refresh``, per-page reset) appends a FRESH row for the
    re-fetched page rather than updating in place, because a reset
    can't atomically rewrite two tables (the fetched log is the commit
    point; a documents rewrite beside it would open a crash window
    where content is gone but status still says Downloaded). Readers
    go through this view to get the reference's content-REPLACED
    semantics (storage.rs UPDATE pages SET content): latest version
    wins, older versions stay as lineage until compaction policy says
    otherwise.

    Shape: map-combinable groupBy(doc_id).max + semi join-back — the
    skew-splittable first-wins pattern (operators/dedup.py), never a
    global window; payload (spans) columns are never shuffled."""
    latest = docs.groupBy("doc_id").agg(
        F.max("fetched_epoch").alias("fetched_epoch")
    )
    return docs.join(latest, ["doc_id", "fetched_epoch"], "left_semi")
