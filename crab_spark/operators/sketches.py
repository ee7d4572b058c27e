"""Deterministic streaming-sketch operators: HyperLogLog distinct,
count-min heavy hitters, and a Bloom-filter membership audit.

Why hand-rolled sketches instead of ``approx_count_distinct`` /
``DataFrameStatFunctions.countMinSketch`` / ``bloomFilter``: Spark's
built-ins hash with xxhash/Murmur and keep opaque JVM state, so no
other engine can reproduce their estimates — they are un-oracle-able
and their per-run values depend on internal seeds. These
implementations define every hash from md5 (the repo-wide portable
hash, see operators/dedup.py) and every merge as a map-combinable
``groupBy().max/sum`` — which is exactly the algebra the classical
sketches use, so the Spark plan is the same partial-aggregate shape a
native implementation would produce, while DuckDB can replay the
identical arithmetic bit-for-bit.

Scale notes (100 TB):
- HLL state is ``groups × 2^p`` rows (p=6 → 64 registers/group) built
  by a partial-combinable max — the shuffle carries registers, not
  tokens.
- The CMS sketch is ``d × w`` cells (4×256 here) built by a partial-
  combinable sum; estimation broadcasts the sketch to the candidate
  words.
- The Bloom bitset is ≤ m distinct bit rows (m=4096) and is broadcast
  to the probe side — the same broadcast-membership-join shape the
  crawler's URL-seen sidecar uses (crab_spark/bloom.py), expressed
  here as a pure relational query so the membership/false-positive
  semantics are DuckDB-oracle-able.

Reference parity: crab keeps its URL-seen set as a SQLite unique index
(reference storage.rs, migrations/V3__url_uniq.sql) — the Bloom audit
models the scale-out replacement for that index mandated by the north
rule (bloom/cuckoo URL-seen set).

Float policy: the only floats are the HLL estimate (dyadic 2^-M terms
whose double sum is exact, one deterministic division, ln over a
64-value domain verified identical across engines) and the Bloom FP
rate — both round()ed on BOTH sides per the repo convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import fan_out

# 0.7213 / (1 + 1.079/64) evaluated once in IEEE double and pinned as
# a literal: DuckDB would otherwise evaluate the expression in DECIMAL
# arithmetic and disagree in the 16th digit.
_HLL_ALPHA_M64 = "0.7093409548395029"
_HLL_P = 6  # 2^6 = 64 registers per group


def _norm_words(text: Column) -> Column:
    """The q30/q34 token convention: collapse whitespace runs, lower,
    split on ' ' (empties filtered at the explode site)."""
    return F.split(F.regexp_replace(F.lower(text), r"\s+", " "), " ")


def _md5_int(col: Column, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of md5 as a BIGINT (big-endian, the
    same number ``conv`` reads) — n_hex ≤ 15 keeps it inside int64.
    Oracle mirror: the ``_hexbyte`` byte-arithmetic in queries.py."""
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_registers(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group HLL register table over WORDS: (grp, bucket,
    max_rho). max() is the HLL register merge: idempotent +
    commutative, so Spark's partial aggregation IS the sketch union
    and duplicate words cost nothing."""
    words = (
        fan_out(docs.select(group_col, text_col))
        .select(
            F.col(group_col).alias("grp"),
            F.explode(_norm_words(F.col(text_col))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    return registers_over(words, F.col("word"), ["grp"])


def registers_over(
    df: DataFrame, key: Column, group_cols: list[str]
) -> DataFrame:
    """HLL register table for arbitrary keys: (group_cols..., bucket,
    max_rho). The register coordinates are pure codegen (md5 → conv →
    bin-length), and the merge is a map-combinable max — which also
    makes this directly usable as a STREAMING stateful aggregate (the
    registers are the state; see streaming/windows.py)."""
    h32 = _md5_int(key, 8)
    keyed = df.select(
        *group_cols, (h32 % 64).cast("int").alias("bucket"), (h32).alias("_h32")
    ).select(
        *group_cols,
        "bucket",
        F.expr("_h32 div 64").alias("v"),
    ).select(
        *group_cols,
        "bucket",
        F.when(F.col("v") > 0, 27 - F.length(F.bin(F.col("v"))))
        .otherwise(F.lit(27))
        .cast("int")
        .alias("rho"),
    )
    return keyed.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("max_rho")
    )


def hll_distinct(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group HLL distinct-word estimate: (group_col, est_distinct)."""
    regs = hll_registers(docs, text_col, group_col)
    return hll_estimate(regs, ["grp"]).withColumnRenamed("grp", group_col)


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize a register table into (group_cols..., est_distinct).

    Harmonic mean over 64 registers; empty registers contribute
    2^0 = 1. All 2^-M terms are dyadic rationals whose double sum is
    EXACT (exponents ≤ 27, 64 terms — well inside the 53-bit
    mantissa), so the only roundings are the final division and the
    small-range ``ln`` correction, both deterministic and round(4)ed.
    Stateless given the registers — in a streaming pipeline this is
    the read-side view over the stateful register store.
    """
    per_group = regs.groupBy(*group_cols).agg(
        # 2^-M as an exact dyadic double; shiftleft via expr — the
        # PySpark wrapper only takes a literal bit count
        F.sum(F.expr("cast(1.0 as double) / shiftleft(cast(1 as bigint), max_rho)")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    z = F.lit(64) - F.col("n_present")
    s_total = F.col("s_present") + z.cast("double")
    # float(_HLL_ALPHA_M64), NOT F.expr of the literal: Spark parses
    # bare decimal literals as DECIMAL and DuckDB as DECIMAL too —
    # both sides must go through the same string→double conversion
    raw = F.lit(float(_HLL_ALPHA_M64)) * F.lit(4096.0) / s_total
    est = F.when(
        (raw <= F.lit(160.0)) & (z > 0),
        F.lit(64.0) * F.log(F.lit(64.0) / z.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        F.round(est, 4).alias("est_distinct"),
    )


def _hll_est_col(s: Column, z: Column) -> Column:
    """round(4) HLL estimate from harmonic sum ``s`` (over all 64
    registers, empty = 2^0) and zero-register count ``z``."""
    raw = F.lit(float(_HLL_ALPHA_M64)) * F.lit(4096.0) / s
    return F.round(
        F.when(
            (raw <= F.lit(160.0)) & (z > 0),
            F.lit(64.0) * F.log(F.lit(64.0) / z.cast("double")),
        ).otherwise(raw),
        4,
    )


def hll_pair_overlap(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Pairwise source-overlap estimates from HLL register ALGEBRA —
    no value-level join anywhere: (src_a, src_b, est_a, est_b,
    est_union, est_intersect).

    Register max IS sketch union, so |A∪B| comes from zipping two
    64-register rows with greatest(), and |A∩B| by inclusion-
    exclusion. After the single corpus pass that builds the sparse
    registers, the whole |S|×|S| overlap matrix costs O(|S|²·64) rows
    — this is why sketches, not distincts, answer "how much do my
    sources overlap?" at 100 TB (a value join would shuffle every
    distinct word |S| times). est_intersect can go slightly negative
    — honest sketch noise, reported unclamped. NULL-source docs are
    excluded (a pair ordering over NULL is meaningless); groups keep
    the word-token convention of q90.
    """
    spark = docs.sparkSession
    # regs feeds BOTH the source list and the dense join — cache it
    # (|S|·64 rows) so the corpus-scale explode behind it runs once;
    # df_ordered_cache is the caller-unpersist handle
    regs = hll_registers(docs, text_col, group_col).cache()
    srcs = regs.select("grp").where(F.col("grp").isNotNull()).distinct()
    buckets = spark.range(64).select(F.col("id").cast("int").alias("bucket"))
    dense = (
        srcs.crossJoin(buckets)
        .join(regs, ["grp", "bucket"], "left")
        .select(
            "grp", "bucket", F.coalesce("max_rho", F.lit(0)).alias("rho")
        )
    )
    a, b = dense.alias("a"), dense.alias("b")
    two = "cast(1.0 as double) / shiftleft(cast(1 as bigint), {})"
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.grp") < F.col("b.grp")),
    ).select(
        F.col("a.grp").alias("src_a"),
        F.col("b.grp").alias("src_b"),
        F.col("a.rho").alias("ra"),
        F.col("b.rho").alias("rb"),
        F.greatest(F.col("a.rho"), F.col("b.rho")).alias("ru"),
    )
    agg = pairs.groupBy("src_a", "src_b").agg(
        F.sum(F.expr(two.format("ra"))).alias("sa"),
        F.sum(F.when(F.col("ra") == 0, 1).otherwise(0)).alias("za"),
        F.sum(F.expr(two.format("rb"))).alias("sb"),
        F.sum(F.when(F.col("rb") == 0, 1).otherwise(0)).alias("zb"),
        F.sum(F.expr(two.format("ru"))).alias("su"),
        F.sum(F.when(F.col("ru") == 0, 1).otherwise(0)).alias("zu"),
    )
    est_a = _hll_est_col(F.col("sa"), F.col("za"))
    est_b = _hll_est_col(F.col("sb"), F.col("zb"))
    est_u = _hll_est_col(F.col("su"), F.col("zu"))
    out = agg.select(
        "src_a",
        "src_b",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        F.round(est_a + est_b - est_u, 4).alias("est_intersect"),
    )
    out.df_ordered_cache = regs
    return out


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows; columns are fixed at 256 (one md5 byte)


def cms_heavy_hitters(
    docs: DataFrame,
    threshold: int,
    text_col: str = "text",
) -> DataFrame:
    """Words the 4×256 count-min sketch estimates at ≥ threshold
    occurrences, with the exact count alongside as the overcount
    audit: (word, exact_cnt, cms_cnt), cms_cnt ≥ exact_cnt always.

    One token explode total: the sketch cells derive from the CACHED
    per-word exact counts (sum of counts ≡ sum of occurrences), not
    from a second pass over the token stream — the r5 multi-consumer
    explode rule applied at design time. Estimation joins the
    candidate vocabulary against the BROADCAST 1,024-cell sketch and
    takes min over the d rows. Integer arithmetic end-to-end: the
    oracle matches bit-for-bit, no float policy needed.
    ``df_ordered_cache`` (the vocabulary counts) is the
    caller-unpersist handle.
    """
    words = (
        fan_out(docs.select(text_col))
        .select(F.explode(_norm_words(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
    )
    exact = (
        words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_cnt")).cache()
    )
    keyed = exact.select(
        "word",
        "exact_cnt",
        F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("row_id"),
    ).select(
        "word",
        "exact_cnt",
        "row_id",
        _md5_int(
            F.concat(F.col("row_id").cast("string"), F.lit("|"), F.col("word")), 2
        ).cast("int").alias("col_id"),
    )
    sketch = keyed.groupBy("row_id", "col_id").agg(
        F.sum("exact_cnt").alias("cnt")
    )
    est = (
        keyed.join(F.broadcast(sketch), ["row_id", "col_id"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").alias("cms_cnt"))
    )
    out = est.where(F.col("cms_cnt") >= threshold).select(
        "word", "exact_cnt", "cms_cnt"
    )
    out.df_ordered_cache = exact
    return out


# ---------------------------------------------------------------------------
# Bloom-filter membership audit
# ---------------------------------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 3


def bloom_bits(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """Distinct set bits of the m=4096, k=3 Bloom filter over keys:
    bit_i = first-2-md5-bytes('i|key') % m. ≤ m rows regardless of
    input size — the relational form of the crawler's per-partition
    URL-seen bitset (crab_spark/bloom.py builds the same thing as a
    packed numpy array; this form is what a membership JOIN sees)."""
    hashed = keys.select(
        F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i"),
        F.col(key_col).alias("key"),
    ).select(
        (
            _md5_int(F.concat(F.col("i").cast("string"), F.lit("|"), F.col("key")), 4)
            % _BLOOM_M
        ).cast("int").alias("bit")
    )
    return hashed.distinct()


def bloom_audit(
    build: DataFrame,
    probe: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """One-row false-positive audit of the Bloom set: build the bitset
    from ``build`` keys, probe with DISJOINT ``probe`` keys (caller
    guarantees disjointness, so every positive is a false positive):
    (n_build, n_probe, n_false_pos, fp_rate).

    A probe is positive iff all k of its bits are set — counted by
    broadcasting the ≤4096-row bitset to the probes' exploded bits and
    requiring k hits. This is the exact shape of the frontier's
    register() prefilter (crab_spark/frontier.py): Bloom-positive URLs
    continue to the authoritative anti-join, negatives are dropped
    early; fp_rate is the fraction of that wasted second look.
    """
    bits = bloom_bits(build, key_col)
    probe_bits = probe.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i"),
    ).select(
        "key",
        (
            _md5_int(F.concat(F.col("i").cast("string"), F.lit("|"), F.col("key")), 4)
            % _BLOOM_M
        ).cast("int").alias("bit"),
    )
    hits = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .where(F.col("n_set") == _BLOOM_K)
    )
    n_build = build.select(F.count(F.lit(1)).alias("n_build"))
    n_probe = probe.select(F.count(F.lit(1)).alias("n_probe"))
    n_fp = hits.select(F.count(F.lit(1)).alias("n_false_pos"))
    return (
        n_build.crossJoin(n_probe)
        .crossJoin(n_fp)
        .select(
            "n_build",
            "n_probe",
            "n_false_pos",
            F.round(
                F.col("n_false_pos").cast("double") / F.col("n_probe"), 6
            ).alias("fp_rate"),
        )
    )
