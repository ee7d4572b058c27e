"""Decontamination & repetition analysis — the eval-leakage and
low-quality-repetition gates of a pretraining data pipeline.

Three first-class ops, all pure built-in expressions on the hot path
(whole-stage codegen; no Python anywhere):

- ``repetition_stats``: within-document duplicated-k-gram fraction —
  the RefinedWeb/Gopher-style repetition signal (boilerplate, SEO spam
  and generator loops score high). One scan, zero shuffles: the shingle
  array and its distinct count are computed per row inside codegen.

- ``ngram_contamination``: n-gram overlap between the corpus and a
  benchmark/eval set (the decontamination check every training-data
  pipeline runs before release). Scale shape: the BENCHMARK side is
  tiny relative to the corpus (eval sets are MBs against 100 TB), so
  its distinct shingle set is broadcast — the corpus is scanned once,
  its exploded shingles hash-join the broadcast set map-side, and the
  per-doc count is a map-side-combinable groupBy(doc_id). The corpus
  is never shuffled on shingles.

- ``source_mix_report``: per-source corpus composition (doc count,
  bytes, mean length, language spread, exact-dup rate) — the numbers a
  mixture-weighting step consumes. One map-side-combinable aggregation
  pass; the dup rate reuses the exact-dedup content hash so it needs no
  second scan.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized, word_shingles


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document k-gram repetition: total shingles, distinct
    shingles, and the duplicated fraction ``rep_ratio`` =
    1 − distinct/total (0 for a repetition-free doc). Rounded for
    engine-portable comparison."""
    sh = word_shingles(normalized(F.col(text_col)), k)
    n = F.size(sh).cast("long")
    d = F.size(F.array_distinct(sh)).cast("long")
    return docs.select(
        F.col(id_col),
        n.alias("n_ngrams"),
        d.alias("n_distinct"),
        F.round(F.lit(1.0) - d / F.greatest(n, F.lit(1)), 4).alias("rep_ratio"),
    )


def benchmark_shingles(
    benchmark: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """The benchmark set's DISTINCT k-word shingles — the small side of
    the contamination probe (distinct first, so the broadcast carries
    each shingle once)."""
    return (
        benchmark.select(
            F.explode(word_shingles(normalized(F.col(text_col)), k)).alias("shingle")
        )
        .filter(F.col("shingle") != "")
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_frac: float = 0.0,
) -> DataFrame:
    """Per-document decontamination stats against ``benchmark``:
    ``n_contaminated`` (distinct k-grams shared with the eval set),
    ``n_shingles`` (the doc's distinct non-empty k-grams),
    ``contam_frac`` = n_contaminated / n_shingles (rounded 4 dp), and
    ``contaminated`` = contam_frac > ``max_frac`` — the thresholded
    contaminated-fraction form real pipelines gate on (a long document
    legitimately quoting one benchmark phrase survives a 5% cutoff; a
    verbatim eval-set copy doesn't). The default ``max_frac=0.0``
    reproduces the strict any-hit rule.

    The flag is decided in EXACT integer arithmetic — ``max_frac`` is
    parsed as a decimal Fraction and the comparison runs as
    ``n_contaminated · denom > numer · n_shingles`` — so a boundary
    document (frac exactly == max_frac, NOT contaminated) gets the
    identical verdict from Spark, the DuckDB oracle, or any engine,
    with no float-rounding coin flips.

    Plan: corpus shingles (exploded per doc, deduped per doc via
    array_distinct BEFORE the explode — no double counting) LEFT join
    the broadcast benchmark shingle set, then one map-side-combinable
    aggregation per doc computing both counts. Exactly one shuffle (the
    doc_id aggregation, partial-combined), zero joins that could ever
    shuffle the corpus on shingle values — and every doc keeps ≥1
    exploded row (word_shingles yields at least one, possibly empty,
    shingle), so zero-hit docs stay in the output without a second
    join."""
    frac = Fraction(str(max_frac))
    bench = F.broadcast(
        benchmark_shingles(benchmark, text_col, k).withColumn("_hit", F.lit(1))
    )
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles(normalized(F.col(text_col)), k))
        ).alias("shingle"),
    )
    return (
        doc_sh.join(bench, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_contaminated"),
            F.sum((F.col("shingle") != "").cast("long"))
            .cast("long")
            .alias("n_shingles"),
        )
        .withColumn(
            "contam_frac",
            F.round(
                F.col("n_contaminated")
                / F.greatest(F.col("n_shingles"), F.lit(1)),
                4,
            ),
        )
        .withColumn(
            "contaminated",
            F.col("n_contaminated") * F.lit(frac.denominator)
            > F.lit(frac.numerator) * F.col("n_shingles"),
        )
    )


def source_mix_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source composition rollup: doc count, total/mean chars,
    language spread, and the exact-duplicate rate (1 − distinct content
    hashes / docs) — the inputs to a corpus mixture-weighting step.
    One shuffle on the source key; every aggregate is map-side
    combinable (count/sum/approx-free distincts are exact here because
    the per-source group is the unit of interest)."""
    norm = normalized(F.col(text_col))
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(lang_col).alias("lang"),
            F.length(text_col).cast("long").alias("n_chars"),
            F.md5(norm).alias("content_hash"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 2).alias("mean_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(
                F.lit(1.0) - F.countDistinct("content_hash") / F.count("*"), 4
            ).alias("dup_rate"),
        )
    )
