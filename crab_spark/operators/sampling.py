"""Deterministic corpus sampling — reproducible downsampling/mixing for
training-data pipelines.

Random sampling (df.sample) is seed- and partitioning-dependent; a
100 TB pipeline wants the SAME subset on every run, engine, and retry.
Hash sampling gives that: keep a row iff md5(salt || key) — uniform in
[0, 2^128) — falls under rate·2^128. Pure codegen expressions, no
shuffle, portable to any engine with md5 (the DuckDB oracle runs the
identical predicate; lowercase fixed-width hex compares lexicographic ==
numeric). The salt decorrelates independent samples of the same corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _hex_threshold(rate: float) -> str:
    """32-nibble hex threshold for a keep-rate in [0, 1]."""
    rate = min(max(rate, 0.0), 1.0)
    return format(min(int(rate * (1 << 128)), (1 << 128) - 1), "032x")


def _key_hash(key_col: str, salt: str) -> Column:
    """md5(salt || key), with NULL keys hashing as the empty string:
    concat(salt, NULL) is NULL and 'NULL < threshold' filters the row
    out — a 99.9% sample would deterministically drop 100% of NULL-key
    rows while rate=1.0 kept them. Oracle mirror:
    md5('salt' || COALESCE(CAST(key AS VARCHAR), ''))."""
    return F.md5(F.concat(
        F.lit(salt), F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    ))


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic ~rate sample keyed on ``key_col``."""
    if rate >= 1.0:
        return df
    if rate <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(_key_hash(key_col, salt) < F.lit(_hex_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. language rebalancing:
    {'en': 0.1, 'de': 1.0}); strata absent from ``rates`` keep
    ``default_rate``. One codegen'd CASE over the stratum column — no
    shuffle, no per-stratum passes."""
    thresh = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strat_col) == value
        lit = F.lit(_hex_threshold(rate))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    thresh = (
        F.lit(_hex_threshold(default_rate)) if thresh is None
        else thresh.otherwise(F.lit(_hex_threshold(default_rate)))
    )
    return df.filter(_key_hash(key_col, salt) < thresh)


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-budget mixture construction: each source contributes
    documents — in the deterministic md5(salt‖key) order, so the mix is
    reproducible on any engine/run/retry — until its token budget
    fills. A document is kept iff the tokens BEFORE it within its
    source are under budget (a source may overflow by at most one
    document — the packing.py rule, and exactly expressible as a
    running sum, so the DuckDB oracle is one window function). Sources
    absent from ``budgets`` get ``default_budget`` (0 = excluded).

    This is the "sample source s until B_s tokens" step every mixture
    recipe ends with, downstream of the per-source weights q45/q51
    inform.

    Scale shape: the KEYED two-level cumsum (the per-source
    generalization of packing.with_pack_ids): range-partition by
    (source, hash) — a mega-source spreads over many partitions, so
    source skew cannot serialize the pass —, per-partition window
    cumsum in parallel, per-(partition, source) totals cumsum'd on an
    O(#partitions·#sources)-row frame and broadcast back as offsets.
    Never a corpus-wide single-task window.

    Output: the kept rows as (key, source, n_tokens, cum_before).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    budget = None
    for s, b in sorted(budgets.items()):
        cond = F.col(source_col) == s
        lit = F.lit(int(b))
        budget = F.when(cond, lit) if budget is None else budget.when(cond, lit)
    budget = (
        F.lit(int(default_budget)) if budget is None
        else budget.otherwise(F.lit(int(default_budget)))
    )
    ranged = (
        df.select(
            F.col(key_col),
            F.col(source_col).alias("source"),
            F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
            _key_hash(key_col, salt).alias("_h"),
            budget.cast("long").alias("_budget"),
        )
        .repartitionByRange(num_partitions, F.col("source"), F.col("_h"))
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    # level 2: one row per (partition, source) — tiny — cumsum'd per
    # source in _pid order (range partitioning makes _pid order = hash
    # order within each source)
    totals = ranged.groupBy("_pid", "source").agg(F.sum("n_tokens").alias("_tot"))
    w_tot = Window.partitionBy("source").orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_tot), F.lit(0))
    ).select("_pid", "source", "_off")
    # level 1: parallel per-(partition, source) running sum + offset
    w = Window.partitionBy("_pid", "source").orderBy("_h", key_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # null-safe on source: NULL-source rows form their own mixture
    # group (they get default_budget from the CASE above) and must
    # match their own offsets row, not vanish at the join
    off_r = offsets.withColumnRenamed("_pid", "_opid").withColumnRenamed(
        "source", "_osrc"
    )
    out = (
        ranged.join(
            F.broadcast(off_r),
            (F.col("_pid") == F.col("_opid"))
            & F.col("source").eqNullSafe(F.col("_osrc")),
        )
        .withColumn(
            "cum_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("_off"),
        )
        .filter(F.col("cum_before") < F.col("_budget"))
        .select(key_col, "source", "n_tokens", "cum_before")
    )
    out.df_ordered_cache = ranged  # caller may unpersist after its action
    return out


def temperature_mixture_rates(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Multinomial temperature reweighting — the mixture step of the
    GPT-3 / PaLM / mT5 data recipes: a source's sampling share is its
    token share raised to ``alpha`` (< 1 upweights small/high-quality
    sources, 1 = natural distribution), renormalized. One row per
    source: n_docs, n_tokens, ``token_share`` p_s, ``temp_share``
    p_s^α / Σ p^α, and ``boost`` = temp_share / token_share — the
    per-source rate multiplier a sampler applies.

    Composition contract: this is the RATES half; applying them is the
    already-audited `stratified_sample` (q38) with per-source rates =
    clamp(base_rate · boost) — rates cross the driver as an O(#sources)
    collect, the engine's documented pattern for tiny model state
    (centroids, depth counts). Keep decisions then remain exact
    hash-threshold comparisons; nothing downstream depends on float
    boundary behavior inside a filter.

    Scale shape: one map-side-combinable aggregation over (source) —
    token counts from size(tokens()) per row, no explode — plus two
    1-row/broadcast totals. NULL sources aggregate as their own group
    (the q57 convention); NULL text counts 0 tokens."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = F.size(F.filter(tokens(txt), lambda w: w != "")).cast("long")
    per = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("_t"))
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "_p", F.col("n_tokens") / F.col("_t")
    ).withColumn("_pa", F.pow("_p", F.lit(float(alpha))))
    z = shared.agg(F.sum("_pa").alias("_z"))
    return (
        shared.crossJoin(F.broadcast(z))
        .select(
            source_col,
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("_p", round_to).alias("token_share"),
            F.round(F.col("_pa") / F.col("_z"), round_to).alias("temp_share"),
            # a 0-token source contributes nothing a sampler could take:
            # boost pinned to 0.0, not the IEEE 0/0 NaN
            F.when(F.col("_p") > 0, F.round(
                F.col("_pa") / F.col("_z") / F.col("_p"), round_to
            )).otherwise(F.lit(0.0)).alias("boost"),
        )
    )


def holdout_split(
    df: DataFrame,
    fractions: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic leakage-free holdout assignment — every document
    lands in exactly ONE split, and lands in the SAME split on every
    run, engine, retry, and corpus revision (a doc that was in `test`
    last month cannot silently migrate into `train` after a re-shard,
    which is how eval contamination happens in practice). The splits
    are cumulative intervals of the same md5 key-hash the samplers use:
    a doc is `names[i]` iff its hash falls in
    [Σ fractions[:i], Σ fractions[:i+1]) · 2^128 — disjoint and
    exhaustive by construction, no second hash, no residual bucket.

    NULL keys hash as '' (the `_key_hash` convention) so they get a
    deterministic split instead of a NULL verdict.

    Scale shape: one codegen'd CASE over the scan — zero shuffles,
    zero joins; the split column is computed where the row already is.
    Oracle mirror: the identical CASE over
    md5(salt || COALESCE(CAST(key AS VARCHAR), ''))."""
    if len(fractions) != len(names) or not names:
        raise ValueError("fractions and names must be equal-length and non-empty")
    h = _key_hash(key_col, salt)
    expr: Column | None = None
    cum = 0.0
    for frac, name in zip(fractions[:-1], names[:-1]):
        cum += float(frac)
        cond = h < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def epoch_order(
    df: DataFrame,
    seed: str = "",
    key_col: str = "doc_id",
    name: str = "epoch_pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    dense 0-based position in md5(seed || key) order — the corpus
    shuffle a training run performs before sharding, reproducible
    across engines and retries (unlike ORDER BY rand()). A new seed is
    a new epoch order; the same seed replays the same order, so an
    interrupted data-prep job resumes into identical shards.

    Scale shape: the two-pass range-partitioned rank (`ordered_index`)
    — a parallel sort by the hash key plus a per-partition row_number
    with broadcast offsets, never a single-task global window. Output
    keeps the shuffle key so downstream shard assignment
    (floor(pos / shard_size)) needs no re-hash.

    Oracle mirror: row_number() OVER (ORDER BY md5-key, key) - 1."""
    from ..util import ordered_index

    keyed = df.withColumn("_sk", _key_hash(key_col, seed))
    ranked = ordered_index(keyed, ["_sk", key_col], name)
    out = ranked.select(
        key_col, F.col("_sk").alias("shuffle_key"), F.col(name).cast("long").alias(name)
    )
    out.df_ordered_cache = ranked.df_ordered_cache
    return out


def apply_mixture_rates(
    docs: DataFrame,
    rates: DataFrame,
    base_rate: float,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """APPLY a mixture: per-doc keep verdicts under per-source rates =
    min(base_rate × boost, 1.0), with ``rates`` the
    `temperature_mixture_rates` output (or any (source, boost) frame)
    — the missing half between computing a temperature mixture (q68)
    and sampling it. The keep decision is the hash-fraction rule:
    the first 48 bits of md5(salt‖key) as a fraction of 2^48 (EXACT in
    double) compared against the rate — reproducible on any engine,
    run, and retry, and a re-rate only flips the marginal docs
    (nested-interval property of hash sampling).

    Returns one row per doc: (key, source, rate, keep). Sources absent
    from ``rates`` (and NULL sources, if absent) get rate 0.0 — an
    unknown source must be an explicit decision, not a silent pass.

    Scale shape: one corpus scan joined against the BROADCAST
    (|sources|-row) rates frame — null-safe so NULL-source rows meet
    their rate instead of dropping; no other shuffle."""
    r = rates.select(
        F.col(source_col).alias("_src"), F.col("boost").alias("_boost")
    )
    frac = (
        F.conv(F.substring(_key_hash(key_col, salt), 1, 12), 16, 10).cast("long")
        / F.lit(float(1 << 48))
    )
    rate = F.least(F.lit(float(base_rate)) * F.coalesce("_boost", F.lit(0.0)),
                   F.lit(1.0))
    return (
        docs.join(F.broadcast(r), F.col(source_col).eqNullSafe(F.col("_src")),
                  "left")
        .select(
            key_col,
            source_col,
            # NO display rounding: base (dyadic) x boost (identical
            # rounded double) -> bit-identical product on any engine,
            # while round()-ing it would land exactly on a half-tie
            # whenever a 6-dp boost is halved (engines tie-break
            # differently)
            rate.alias("rate"),
            (frac < rate).alias("keep"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight: Column,
    key_col: str = "doc_id",
    salt: str = "ws|",
) -> DataFrame:
    """Efraimidis–Spirakis one-pass weighted sampling WITHOUT
    replacement: each row draws a deterministic uniform u from its md5
    (first 6 bytes → (U+1)/(2^48+1) ∈ (0,1)) and races with key
    −ln(u)/w; the k SMALLEST keys win, which is distributionally
    identical to k sequential weighted draws. This completes the
    sampling arc: hash_sample keeps rows uniformly, mixture ops set
    per-stratum RATES — this draws an exact-size sample proportional
    to a per-row weight (e.g. token count: "sample tokens, not
    documents").

    Determinism/parity: u is exact dyadic double arithmetic on both
    engines; the race key rounds to 9 dp (values are tiny — ln/w — so
    the repo's 4-6 dp would mass-tie; libm-vs-JVM ln differs at most
    ~1 ulp ≈ 1e-17 abs here, far below the 9 dp grid) and −ln keeps it
    ≥ 0 so no −0.0/+0.0 split; ties break on the id. Scale shape: pure
    codegen per row + ONE distributed top-k (TakeOrdered) — no global
    sort, no shuffle beyond the k-row collect."""
    kid = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    big_u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), kid)), 1, 12), 16, 10
    ).cast("double")
    u = (big_u + F.lit(1.0)) / F.lit(281474976710657.0)  # 2^48 + 1
    w = weight.cast("double")
    race = F.round(-F.log(u) / w, 9)
    return (
        df.select(
            key_col,
            weight.cast("long").alias("w"),
            race.alias("race"),
        )
        .orderBy(F.asc("race"), F.asc_nulls_first(key_col))
        .limit(k)
    )
