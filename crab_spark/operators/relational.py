"""Relational operators Spark lacks as single primitives — as-of join
and range-bucket join — built as compositions of DataFrame ops (the
round contract's preferred path for custom operators: composition
first, Pandas UDF only when semantics force it; these don't).

Reference scope note: bazhenov/crab has no time-series relational
layer at all; these extend the §2.4 category sweep the way a real
consumer of the engine (metrics over the crawl's event stream) needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import local_df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for every LEFT row, the most recent RIGHT row with
    the same keys at-or-before its timestamp (kdb aj / pandas
    merge_asof / Flink temporal join). Implemented as the union-tag
    carry-forward: tag right rows 0 and left rows 1, one window per
    key ordered by (ts, side, id), and `last(payload, ignorenulls)`
    carries the newest right payload onto each left row — ONE shuffle
    on the keys, no per-row lookups, no range self-join blowup.

    Tie rules, deterministic on any engine: a right row AT the left
    row's exact timestamp counts (side orders right first); among
    right ties the largest (ts, id) wins — "latest state at time t".
    Left rows with no prior right row keep NULL payload columns.

    Scale shape: the one shuffle is on the join keys, so skew = the
    hottest key's row count — the standard bounded-session caveat
    (same as sessionize/q19); at 100 TB a pathological single key
    would salt + two-pass like the rank machinery, noted not built."""
    pay = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col(id_col).alias("_id"),
            F.col(ts_col).alias("_ts"),
            *[F.col(c).alias(f"_{c}") for c in payload_cols],
        ),
    )
    r = right.select(
        *key_cols, ts_col, id_col, *payload_cols, F.lit(0).alias("_side")
    )
    lt = left.select(
        *key_cols, ts_col, id_col,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload_cols],
        F.lit(1).alias("_side"),
    )
    u = r.unionByName(lt)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_side", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_pay", F.last(pay, ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        id_col,
        *key_cols,
        ts_col,
        F.col("_pay._id").alias(f"{prefix}{id_col}"),
        F.col("_pay._ts").alias(f"{prefix}{ts_col}"),
        *[F.col(f"_pay._{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out


def range_join_tiers(
    df: DataFrame,
    tiers: list[tuple[float, float, str]],
    val_col: str = "value",
) -> DataFrame:
    """Range-bucket join: attach the [lo, hi) tier whose interval
    contains ``val_col`` — the dimension-banding join (price tiers,
    latency buckets, score bands) Spark expresses as a non-equi join.
    The tier table is rows-of-literals and BROADCAST, so the physical
    plan is a BroadcastNestedLoopJoin evaluating two comparisons per
    (row × tier) — with tens of tiers that is strictly cheaper than
    any sort-based interval machinery, and the big side never
    shuffles. Rows outside every tier keep a NULL tier (left join) —
    a verdict, not a silent drop. Overlapping tiers are caller error;
    intervals are checked disjoint up front."""
    from pyspark.sql import types as T

    srt = sorted(tiers)
    for (lo1, hi1, _), (lo2, _, _) in zip(srt, srt[1:]):
        if lo2 < hi1:
            raise ValueError(f"overlapping tiers: [{lo1},{hi1}) and [{lo2},..)")
    schema = T.StructType([
        T.StructField("tier_lo", T.DoubleType()),
        T.StructField("tier_hi", T.DoubleType()),
        T.StructField("tier", T.StringType()),
    ])
    tdf = local_df(
        df.sparkSession,
        [(float(lo), float(hi), str(name)) for lo, hi, name in tiers],
        schema,
    )
    cond = (F.col(val_col) >= F.col("tier_lo")) & (F.col(val_col) < F.col("tier_hi"))
    return df.join(F.broadcast(tdf), cond, "left")
