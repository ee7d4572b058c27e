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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import fan_out
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
    # fan_out: per-row shingling fuses into the scan (no-op at scale)
    docs = fan_out(docs.select(id_col, text_col))
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
    doc_sh = fan_out(docs.select(id_col, text_col)).select(
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


def neardup_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str | None = None,
    n_hashes: int = 8,
    band_size: int = 2,
    sig_k: int = 2,
    verify_k: int = 3,
    min_jaccard: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """NEAR-duplicate decontamination: flag corpus documents that are
    lightly-rewritten copies of benchmark/eval documents — the leakage
    ``ngram_contamination``'s exact-shingle probe cannot see (a
    paraphrased eval answer shares almost no exact 5-grams but most of
    its MinHash bands). One row per corpus document:
    ``n_neardup_bench`` (benchmark docs with shingle-set Jaccard ≥
    ``min_jaccard``), ``max_jaccard`` (over ALL banded candidates, 0.0
    when none), ``contaminated`` = n_neardup_bench > 0.

    Scale shape — the corpus×benchmark MinHash probe, asymmetric by
    construction: both sides get signatures (the corpus side's is the
    audited q22 explode+combinable-min plan, ONE corpus shuffle on
    doc_id); the benchmark's band keys AND its shingle sets are
    broadcast (eval sets are MBs against 100 TB), so candidate
    generation and the Jaccard verify are both map-side joins — the
    corpus is never shuffled on band keys or shingles, and the verify
    fans out per banded candidate, never per document. ``max_bucket``
    caps CORPUS band buckets (a boilerplate mega-bucket would fan every
    bench hit out |bucket|-wide); dropped buckets attach as
    ``.dropped_buckets`` — no silent caps."""
    from .dedup import band_keys, cap_buckets, minhash_signatures

    bid = bench_id_col or id_col
    csigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col, n_hashes=n_hashes, k=sig_k
    )
    bsigs = minhash_signatures(
        benchmark, text_col=text_col, id_col=bid, n_hashes=n_hashes, k=sig_k
    )
    ckeys = band_keys(csigs, id_col, n_hashes, band_size)
    dropped = None
    if max_bucket is not None:
        ckeys, dropped = cap_buckets(ckeys, ["band_idx", "band_key"], max_bucket)
    bkeys = band_keys(bsigs, bid, n_hashes, band_size).withColumnRenamed(bid, "_bid")
    # cached: cand feeds both the verify join and the semi-join prune;
    # without it the whole candidate-generation subtree (the corpus
    # band explode + cap window + broadcast probe) executes twice —
    # cand itself is bounded by |bench bands| x max_bucket, so the
    # cache is candidate-sized
    cand = (
        ckeys.join(F.broadcast(bkeys), ["band_idx", "band_key"])
        .select(id_col, "_bid")
        .distinct()
        .cache()
    )
    # raw text, not normalized — the ngram_jaccard/q24 verify convention
    # (signatures and verify sets must see the SAME tokenization)
    sets = lambda frame, key, out: frame.select(  # noqa: E731
        key,
        F.array_distinct(word_shingles(F.col(text_col), verify_k)).alias(out),
    )
    # verify sets only for CANDIDATE docs: the candidate id set is
    # bounded by |bench bands| × max_bucket (broadcastable next to the
    # corpus), so the semi-join prunes map-side and the full corpus's
    # shingle arrays are never materialized or shuffled — only the
    # banded hits' are
    cand_docs = docs.join(
        F.broadcast(cand.select(id_col).distinct()), id_col, "left_semi"
    )
    csets = sets(cand_docs, F.col(id_col), "_sh")
    bsets = sets(benchmark, F.col(bid).alias("_bid"), "_bsh")
    inter = F.size(F.array_intersect("_sh", "_bsh")).cast("double")
    union = F.size(F.array_union("_sh", "_bsh")).cast("double")
    j = (
        cand.join(csets, id_col)
        .join(F.broadcast(bsets), "_bid")
        .select(F.col(id_col), F.round(inter / union, 6).alias("_j"))
    )
    per_doc = j.groupBy(id_col).agg(
        F.sum((F.col("_j") >= F.lit(min_jaccard)).cast("long")).alias("n_neardup_bench"),
        F.max("_j").alias("max_jaccard"),
    )
    out = (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_neardup_bench", F.lit(0)).cast("long").alias("n_neardup_bench"),
            F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce("n_neardup_bench", F.lit(0)) > 0).alias("contaminated"),
        )
    )
    out.dropped_buckets = dropped
    # the candidate cache must reach the registry lifecycle wrapper
    out.df_pipeline_caches = [cand]
    return out


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
        fan_out(docs.select(source_col, lang_col, text_col))
        .select(
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


def embedding_decontamination(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space sibling of
    ``ngram_contamination`` (and the third modality after q63's
    near-dup text check): a benchmark item that was paraphrased or
    translated into the corpus shares no shingles, but its embedding
    still sits next to the eval vector. Flags every corpus vector
    whose max cosine against ANY benchmark vector reaches
    ``threshold``. Returns (id, max_bench_cos, is_contaminated) for
    every corpus row — a verdict, not a dropped row (q46 convention).

    Scale shape: eval benchmarks are MBs against a 100 TB corpus, so
    the bench side is collapsed to ONE row (collect_list of its
    vectors) and broadcast — the plan is a BroadcastNestedLoopJoin
    with exactly one build row, i.e. a map-side constant. The corpus
    is scanned ONCE, never shuffled, and never fans out to
    |corpus| x |bench| intermediate rows: the max-cosine fold runs
    per-row inside codegen over the broadcast array. Zero-norm
    vectors cosine to NULL (similarity.cosine's ANSI guard);
    array_max skips them exactly like the oracle's max().
    """
    from .similarity import cosine

    pack = bench.agg(
        F.collect_list(F.col(vec_col).cast("array<double>")).alias("_bvecs")
    )
    best = F.round(
        F.array_max(
            F.transform(F.col("_bvecs"), lambda b: cosine(F.col(vec_col), b))
        ),
        round_to,
    )
    return (
        corpus.crossJoin(F.broadcast(pack))
        .select(F.col(id_col), best.alias("max_bench_cos"))
        .withColumn(
            "is_contaminated",
            F.col("max_bench_cos") >= F.lit(float(threshold)),
        )
    )


def contamination_attribution(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """WHICH benchmark document leaked — the audit step after
    `ngram_contamination`'s per-doc flag: for every corpus document
    sharing at least one k-gram with the eval set, the single
    benchmark doc it overlaps most (shared distinct-shingle count,
    ties to the lowest bench id), the doc's own distinct-shingle
    count, and the overlap fraction. A decontamination report that
    says "contaminated" without saying *by what* can't distinguish an
    eval-set copy from a benchmark built on the same public source —
    the attribution is what a human reviews.

    Scale shape: both sides dedupe shingles per doc row-locally
    (array_distinct before the explode); the benchmark side —
    (bench_id, shingle), eval sets are MBs against a 100 TB corpus —
    is BROADCAST, so the corpus is scanned once and never shuffled on
    shingle values. Per-(doc, bench) counts are one map-side-combinable
    aggregation; the argmax window partitions by doc over at most
    |bench| matched rows, and the per-doc shingle totals join on the
    id. Returns only docs with ≥1 shared shingle (the q44 flag is the
    full-coverage surface)."""
    bsh = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(
            F.array_distinct(word_shingles(normalized(F.col(text_col)), k))
        ).alias("shingle"),
    ).filter(F.col("shingle") != "")
    # cached: the corpus shingle relation feeds BOTH the broadcast
    # probe and the per-doc totals; word_shingles' lambda defeats
    # exchange-reuse (the bigram_lm lesson), so without the cache the
    # corpus explode would run once per consumer. df_ordered_cache is
    # the caller-unpersist handle.
    dsh = (
        fan_out(docs.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(normalized(F.col(text_col)), k))
            ).alias("shingle"),
        )
        .filter(F.col("shingle") != "")
        .cache()
    )
    matches = (
        dsh.join(F.broadcast(bsh), "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("n_shared").desc(), F.col("bench_id").asc()
    )
    top = (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    nsh = dsh.groupBy(id_col).agg(F.count("*").cast("long").alias("n_shingles"))
    out = top.join(nsh, id_col).select(
        id_col,
        "bench_id",
        "n_shared",
        "n_shingles",
        F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("overlap_frac"),
    )
    out.df_ordered_cache = dsh
    return out
