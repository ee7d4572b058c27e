"""The engine's query library + ANSI-SQL oracles.

One entry per operator family from SURVEY.md §2 (scan/filter/project,
top-k dequeue, dedup-register anti-join, joins, aggregation, windows,
set ops, string/date/json functions, explode, rollup, sessionization)
plus the training-data operators (exact/MinHash/SimHash dedup, n-gram
Jaccard, embedding similarity, text analysis, multimodal plumbing).

Every Spark query aliases its computed columns to the SAME names as its
oracle SQL; the driver compares row counts, schemas and order-insensitive
value hashes at sf=0.01 via DuckDB. ALL 42 queries carry an oracle:
simhash via md5_number_upper (reproduces the engine's per-token hash
bit-for-bit), IVF via list_cosine_similarity + arg_max, and the media
decode pipeline via an md5-derived stub contract whose widths/frames/
features one SQL expression reproduces (operators/multimodal.py
FakeDecoder).

Float policy: every float aggregate/score is round()ed (4-6 dp) on BOTH
sides so accumulation-order noise can't flip the value hash; DuckDB
FLOAT[] inputs are cast to DOUBLE[] before math to match Spark's double
accumulation.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .operators import decontam as DC
from .operators import dedup as D
from .operators import graph as G
from .operators import multimodal as M
from .operators import packing as P
from .operators import pipeline as PL
from .operators import relational as R
from .operators import sampling as SA
from .operators import scrub as SC
from .operators import similarity as S
from .operators import sketches as SK
from .operators import text as X


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# relational / crawl-shaped
# ---------------------------------------------------------------------------

def q01_scan_filter_project(spark, sf):
    """S2 + predicate/projection pushdown: both reach the parquet scan."""
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") < "1995-03-15")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


def q02_count_all(spark, sf):
    return t(spark, sf, "orders").agg(F.count("*").alias("n"))


def q03_point_lookup(spark, sf):
    return (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def q04_topk_order(spark, sf):
    """F2 dequeue shape: ORDER BY key ASC, tiebreak, LIMIT k —
    TakeOrderedAndProject, no global sort."""
    return (
        t(spark, sf, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


def q05_distinct(spark, sf):
    return t(spark, sf, "events").select("event_type").distinct()


def q06_first_wins(spark, sf):
    """F1 in-batch dedup: first row per key by deterministic order."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
    )


def q07_anti_join(spark, sf):
    """F1 seen-set semantics: candidates NOT IN seen (left anti)."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


def q08_semi_join(spark, sf):
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.filter(F.col("c_acctbal") > 9000)
        .join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_acctbal")
    )


def q09_pricing_summary(spark, sf):
    """TPC-H Q1 shape — the flagship aggregation (map-side partials,
    one shuffle on two low-cardinality keys)."""
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q10_broadcast_join(spark, sf):
    """Small-dim join: part is broadcast (robots/proxy-table shape)."""
    li, p = t(spark, sf, "lineitem"), t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q11_multi_join(spark, sf):
    """customer ⋈ nation ⋈ region rollup per region (TPC-H Q5 shape)."""
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


def q12_window_topk(spark, sf):
    """Per-group top-k (per-host frontier pruning shape)."""
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t(spark, sf, "customer")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


def q13_union_ragged(spark, sf):
    """Tabulator semantics: union of ragged column sets, '' fill
    (table.rs:21-38 / unionByName allowMissingColumns)."""
    c = t(spark, sf, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = t(spark, sf, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("bal")
    )
    return c.unionByName(s, allowMissingColumns=True).fillna("", subset=["segment"])


def q14_rollup(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


def q15_month_agg(spark, sf):
    return (
        t(spark, sf, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


def q16_string_funcs(spark, sf):
    return (
        t(spark, sf, "part")
        .filter(F.col("p_size") > 40)
        .select(
            "p_partkey",
            F.lower(F.col("p_name")).alias("name_lc"),
            F.length(F.col("p_name")).alias("name_len"),
            F.upper(F.col("p_brand")).alias("brand_uc"),
            F.substring(F.col("p_type"), 1, 5).alias("type5"),
        )
    )


def q17_case_when(spark, sf):
    return (
        t(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def q18_tumbling_window(spark, sf):
    """Streaming-style tumbling window over event time (the batch
    equivalent of a Structured Streaming windowed agg)."""
    return (
        t(spark, sf, "events")
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("win_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


def q19_sessionize(spark, sf):
    """Session windows via gap detection (30 min). One lag window pass;
    the session COUNT is sum(new_sess) per user — identical to
    max(running-sum sess_id) since new_sess ∈ {0,1} and every user's
    first event starts a session, but it drops the second WindowExec
    (a full cumulative-sum pass over the event log) from the plan
    (r6: plans/r06/q19_sessionize_{before,after}.txt)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")  # ts is TIMESTAMP_NTZ
    gap = secs - F.lag(secs).over(w)
    ev = (
        t(spark, sf, "events")
        .withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    )
    return ev.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events")
    )


def q20_json_extract(spark, sf):
    return (
        t(spark, sf, "events")
        .select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# training-data operators (documents / embeddings)
# ---------------------------------------------------------------------------

def q21_exact_dedup(spark, sf):
    return D.exact_dedup(t(spark, sf, "documents"))


def q22_minhash_sig(spark, sf):
    return D.minhash_signatures(t(spark, sf, "documents"), n_hashes=4, k=3)


# Band-bucket size cap for every near-dup candidate generator: a bucket
# past this carries no pair information (near-identical boilerplate) and
# its O(|bucket|²) self-join would stall at corpus scale. Mirrored in
# the oracle SQL via QUALIFY so the driver verifies the cap semantics.
_MAX_BUCKET = 100


def q23_lsh_pairs(spark, sf):
    sigs = D.minhash_signatures(t(spark, sf, "documents"), n_hashes=8, k=2)
    return D.lsh_candidate_pairs(sigs, n_hashes=8, band_size=2, max_bucket=_MAX_BUCKET)


def q24_ngram_jaccard(spark, sf):
    """The production near-dup pipeline: LSH candidates (q23's banding,
    bucket-capped) → exact n-gram Jaccard verify. No cartesian product
    anywhere — the only shuffles are the band groupBy and the two
    candidate joins."""
    docs = t(spark, sf, "documents")
    sigs = D.minhash_signatures(docs, n_hashes=8, k=2)
    pairs = D.lsh_candidate_pairs(sigs, n_hashes=8, band_size=2, max_bucket=_MAX_BUCKET)
    return D.ngram_jaccard(docs, pairs, k=3)


def q25_simhash(spark, sf):
    return D.simhash(t(spark, sf, "documents"))


def q26_simhash_pairs(spark, sf):
    # hamming cap inside the join (pre-distinct) so candidate pairs are
    # pruned before the dedup shuffle; band buckets capped like q23
    return D.simhash_neardup_pairs(
        D.simhash(t(spark, sf, "documents")), max_hamming=8,
        max_bucket=_MAX_BUCKET,
    )


def _query_vec(spark, sf) -> list[float]:
    row = t(spark, sf, "embeddings").filter(F.col("vec_id") == 0).select("embedding").head()
    return [float(x) for x in row["embedding"]]


def q27_embedding_topk(spark, sf):
    return S.cosine_topk(t(spark, sf, "embeddings"), _query_vec(spark, sf), k=10)


def _centroids(spark, sf, n=8) -> list[list[float]]:
    rows = (
        t(spark, sf, "embeddings").filter(F.col("vec_id") < n).orderBy("vec_id").collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def q28_ivf_topk(spark, sf):
    cents = _centroids(spark, sf)
    assigned = S.ivf_assign(t(spark, sf, "embeddings"), cents)
    return S.ivf_topk(assigned, cents, _query_vec(spark, sf), k=10, nprobe=3)


def q29_embedding_neardup(spark, sf):
    cents = _centroids(spark, sf)
    assigned = S.ivf_assign(t(spark, sf, "embeddings"), cents)
    return S.embedding_neardup_pairs(
        assigned, threshold=0.35, max_bucket=_MAX_BUCKET
    )


def q30_token_count(spark, sf):
    return X.token_count(t(spark, sf, "documents"))


def q31_quality(spark, sf):
    return X.quality_features(t(spark, sf, "documents"))


def q32_lang_id(spark, sf):
    return X.lang_id(t(spark, sf, "documents"))


def q33_fingerprint(spark, sf):
    return X.fingerprint(t(spark, sf, "documents"), k=5)


def q34_word_freq(spark, sf):
    return X.word_freq(t(spark, sf, "documents"), min_count=5)


def q35_media_stats(spark, sf):
    docs = t(spark, sf, "documents")
    # NULL id routes to kind 'image' (coalesce 0) and NULL text to 0
    # bytes — verdict groups, never a NULL kind group the two engines
    # would invent differently
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.coalesce(F.col("doc_id"), F.lit(0)) % 3 + 1).cast("int"),
    )
    media = docs.select(
        kind.alias("kind"),
        F.octet_length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
            .alias("n_bytes"),
    )
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
    )


def q36_media_features(spark, sf):
    """Full decode pipeline (mapInPandas Arrow batches through the
    decoder), oracled: the stub decoder derives everything from
    md5(payload), which one DuckDB expression reproduces. The feature
    vector flattens to f0..f7 int columns (the driver's canonicalizer
    sorts/hashes rows; array<float> is unhashable in pandas and would
    couple the two engines' float-formatting — feature values are
    integer-valued by the stub contract)."""
    media = M.media_from_documents(t(spark, sf, "documents"))
    feats = M.extract_features(media)
    return feats.select(
        "media_id", "kind", "width", "height", "n_frames",
        *[
            F.element_at("feature", i + 1).cast("int").alias(f"f{i}")
            for i in range(8)
        ],
    )


def q41_media_resize(spark, sf):
    """Decode → aspect-preserving resize plan (fit into 64×64, no
    upscale). Geometry is pure expressions over the decoded dims, so
    the full mapInPandas-decode pipeline stays SQL-verifiable."""
    return M.resize_plan(M.media_from_documents(t(spark, sf, "documents")))


def q42_frame_sample(spark, sf):
    """Decode → stride-2 frame sampling: one row per kept frame index
    (JVM-side sequence + explode; the decode batch is the only Python
    crossing)."""
    return M.sample_frames(M.media_from_documents(t(spark, sf, "documents")))


def q37_hash_sample(spark, sf):
    """Deterministic 10% corpus sample (md5-threshold, reproducible on
    any engine/run/retry — df.sample never is)."""
    return SA.hash_sample(t(spark, sf, "documents"), rate=0.1).select("doc_id")


_STRAT_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25}


def q38_stratified_sample(spark, sf):
    """Language rebalancing: per-stratum deterministic keep-rates over
    the corpus's lang column (one codegen'd CASE, zero shuffles)."""
    out = SA.stratified_sample(
        t(spark, sf, "documents"), _STRAT_RATES, strat_col="lang",
        default_rate=0.05,
    )
    return out.groupBy("lang").agg(F.count("*").alias("n_kept"))


def q40_dup_clusters(spark, sf):
    """The full dedup endgame: LSH candidates (bucket-capped) → exact
    Jaccard verify → connected components. Near-duplication is
    transitive, so keeper selection needs the component label, not the
    pair list; components run as alternating large-star/small-star
    (O(log n) rounds of groupBy-min + explode). Every doc gets a
    cluster_id (= its component's min doc_id; isolated docs label
    themselves)."""
    docs = t(spark, sf, "documents")
    sigs = D.minhash_signatures(docs, n_hashes=8, k=2)
    pairs = D.lsh_candidate_pairs(sigs, n_hashes=8, band_size=2, max_bucket=_MAX_BUCKET)
    ver = D.ngram_jaccard(docs, pairs, k=3)
    verified = ver.filter(F.col("jaccard") >= 0.5).select("id_a", "id_b")
    out = D.connected_components(verified, vertices=docs)
    # harvest the verify stage's caches (attrs don't survive .filter)
    out.df_pipeline_caches = D.cache_handles(ver)
    return out


def q39_pack_sequences(spark, sf):
    """Sequence packing: docs in id order fill 512-token packs greedily
    (two-level distributed cumsum, not a single-task global window)."""
    packed = P.with_pack_ids(t(spark, sf, "documents"), budget=512)
    return P.pack_stats(packed)


def q43_repetition_stats(spark, sf):
    """Within-document 3-gram repetition fraction (RefinedWeb/Gopher
    repetition gate) — the shingle array and its distinct count stay
    inside whole-stage codegen; one scan, zero shuffles."""
    return DC.repetition_stats(t(spark, sf, "documents"), k=3)


# contamination probe: the 'benchmark' is a deterministic 2% hash-sample
# of the corpus (stand-in for an eval set; salt decorrelates it from the
# q37 sample), checked against every NON-benchmark doc. The flag is the
# thresholded contaminated-fraction form (shared distinct 5-grams /
# doc's distinct 5-grams > cutoff), decided in exact integer arithmetic
# on both engines.
_BENCH_RATE, _BENCH_SALT = 0.02, "bench"
_CONTAM_MAX_FRAC = 0.05


def q44_ngram_contamination(spark, sf):
    """Benchmark decontamination: per non-benchmark doc, the count of
    distinct 5-grams shared with the benchmark set, the doc's own
    distinct-5-gram count, their ratio, and the thresholded
    contaminated flag (ratio > 5%). The benchmark shingle set is
    broadcast (eval sets are MBs against a 100 TB corpus), the corpus
    is scanned once and never shuffled on shingle values; per-doc
    counts are map-side combinable."""
    docs = t(spark, sf, "documents")
    bench = SA.hash_sample(docs, _BENCH_RATE, salt=_BENCH_SALT)
    corpus = docs.join(bench.select("doc_id"), "doc_id", "left_anti")
    return DC.ngram_contamination(corpus, bench, k=5, max_frac=_CONTAM_MAX_FRAC)


def q45_source_mix(spark, sf):
    """Per-source corpus composition (docs, bytes, language spread,
    exact-dup rate) — the mixture-weighting inputs; one map-side-
    combinable aggregation pass over the corpus."""
    return DC.source_mix_report(t(spark, sf, "documents"))


def q46_pii_scrub(spark, sf):
    """PII redaction gate: the corpus text carries no PII, so a
    deterministic synthetic layer (email/IP/phone derived from doc_id —
    the SAME expression in the oracle) is appended first, giving the
    cross-engine check real nonzero spans to find and redact. The scrub
    itself is one scan, zero shuffles, all codegen regex."""
    did = F.col("doc_id")
    injected = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" reach me at user"),
                    did.cast("string"),
                    F.lit("@mail.example.org"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (did % 200).cast("string"),
                    F.lit(".0."),
                    (did % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(F.lit(" dial +1 555 867 530"), (did % 10).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return SC.pii_scrub(injected)


def q47_paragraph_dedup(spark, sf):
    """CCNet-style paragraph-level exact dedup: 20-word segments, first
    occurrence corpus-wide wins (min (doc_id, pos)); per-doc survival
    stats + retained-text hash. Combinable groupBy(hash).min + a
    skew-splittable join-back + one per-doc aggregation."""
    return SC.paragraph_dedup(t(spark, sf, "documents"), window_words=20)


def q48_chunk_documents(spark, sf):
    """Context-window shaping: 64-word chunks at stride 48 (16-word
    overlap). Pure per-row codegen (sequence + slice + explode), zero
    shuffles; integer chunk arithmetic is reproduced by the oracle."""
    return SC.chunk_documents(t(spark, sf, "documents"), chunk_words=64, stride=48)


def q50_dedup_keep_corpus(spark, sf):
    """The dedup decision artifact: q40's cluster labels → per-doc
    keep/drop flag + cluster size (keeper = the component's min doc_id).
    What a corpus build actually consumes: ``filter(is_keeper)``."""
    clusters = q40_dup_clusters(spark, sf)
    out = D.keep_corpus(clusters)
    out.df_pipeline_caches = D.cache_handles(clusters)
    return out


def q51_cross_source_overlap(spark, sf):
    """Source-pair syndication report: distinct 20-word segment hashes
    shared between each pair of sources — the de-weighting signal for
    mixture design. Self-join fan-out bounded by |sources| per hash
    (distinct-first), never |docs|."""
    return SC.cross_source_overlap(t(spark, sf, "documents"))


def q52_tfidf_topk(spark, sf):
    """Top-3 TF-IDF keywords per document (score = tf · ln(N/df), ties
    by word asc). tf/df are map-side-combinable aggs; the per-doc
    window is bounded by doc length."""
    return X.tfidf_topk(t(spark, sf, "documents"), k=3)


def q53_centroid_outliers(spark, sf):
    """Embedding quality gate: cosine of each vector to its label's
    centroid. Centroid = |labels|×D-cell agg, broadcast back; scoring
    is per-row codegen."""
    return S.label_centroid_cosine(t(spark, sf, "embeddings"))


def q54_quality_gate(spark, sf):
    """Perplexity-percentile corpus gate: rank by unigram avg-NLL
    (two-pass range rank, no global window) and keep the best 90% —
    an integer rank rule, so the keep set is engine-exact."""
    return X.quality_percentile_gate(t(spark, sf, "documents"), cut=0.9)


def q55_corpus_build(spark, sf):
    """The flagship end-to-end corpus build (operators/pipeline.py):
    scrub → paragraph dedup → repetition gate → decontamination gate →
    LM-quality percentile gate → hash sample → chunk → pack, composed
    over the documents table with the SAME constants as the per-stage
    queries (q44's benchmark sample and 5% contamination cutoff).
    Output is the packed training-chunk stream. Every gate is exact
    integer arithmetic, so the one DuckDB oracle chains the per-stage
    CTEs and must agree row-for-row."""
    return PL.corpus_build(
        t(spark, sf, "documents"),
        bench_rate=_BENCH_RATE,
        bench_salt=_BENCH_SALT,
        contam_max_frac=_CONTAM_MAX_FRAC,
    )


def _span_lift(spark, sf):
    """Deterministic flat-text → spans lift shared by q56/q59 (and the
    mod-7 rule hard-coded in their oracles): word indices ≡ 3 and ≡ 4
    (mod 7) become media spans whose refs are md5 of the word, the rest
    are text spans. ONE definition so the Spark side can't drift from
    itself — the oracle SQL mirrors the same rule."""
    is_media = lambda i: (i % 7).isin(3, 4)  # noqa: E731
    spans = F.transform(
        F.split(F.col("text"), " "),
        lambda w, i: F.struct(
            F.when(is_media(i), F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            w.alias("text"),
            F.when(is_media(i), F.concat(F.lit("m-"), F.md5(w)))
            .otherwise(F.lit("")).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return t(spark, sf, "documents").select("doc_id", spans.alias("spans"))


def q56_caption_align(spark, sf):
    """Interleaved media→caption alignment over the engine's span shape
    (BASELINE.json input_hint): the flat testdata documents are lifted
    into spans deterministically (``_span_lift``), then
    caption_candidates pairs each media span with its nearest text span
    (preceding wins ties). Two CONSECUTIVE media spans make both
    selection branches fire: the first one's preceding text wins its
    tie, the second must reach FORWARD across distance 2. The lift is
    the test harness; the operator itself consumes any DOCUMENTS-shaped
    spans column. Per-doc windows only — no corpus window, no Python."""
    return M.caption_candidates(_span_lift(spark, sf))


# q57 source gate: testdata has no exact-duplicate texts, so a
# deterministic syndication layer (25% of docs per the md5 coin become
# their source's 50-word boilerplate — the SAME expression in the
# oracle) gives the dup-fraction gate real signal; thresholds chosen so
# BOTH gates fire independently at sf0.01 (src19 fails mean-length
# only, src1 fails dup-fraction only).
_SRC_MIN_MEAN_WORDS, _SRC_MAX_DUP_FRAC = 52, "0.12"


def q57_source_gate(spark, sf):
    """Source-level reputation gate: drop whole sources whose mean doc
    length is too low or whose within-source exact-dup fraction is too
    high (the domain-level filter per-doc gates can't express). Two
    combinable aggs + an O(#sources) broadcast join-back."""
    did = F.col("doc_id")
    coin = F.substring(F.md5(F.concat(F.lit("dup"), did.cast("string"))), 1, 1)
    # coalesce: 'from ' || NULL source would NULL the whole injected
    # text (and the md5/count chain after it) — the degenerate-corpus
    # gate caught the NULL-source doc getting a NULL keep verdict
    boiler = F.concat(
        F.repeat(F.lit("syndicated boilerplate "), 24),
        F.lit("from "), F.coalesce(F.col("source"), F.lit("")),
    )
    injected = t(spark, sf, "documents").withColumn(
        "text",
        F.when(coin.isin("0", "1", "2", "3"), boiler).otherwise(F.col("text")),
    )
    return X.source_reputation_gate(
        injected,
        min_mean_words=_SRC_MIN_MEAN_WORDS,
        max_dup_frac=_SRC_MAX_DUP_FRAC,
    )


# per-source token budgets: src0 exceeds its source's total (~1.4k
# tokens at sf0.01 — keeps everything), src1/src2 cut at different
# depths, every other source fills the 400-token default
_MIX_BUDGETS = {"src0": 4000, "src1": 700, "src2": 150}


def q58_token_budget_mix(spark, sf):
    """Token-budget mixture construction: per source, keep documents in
    deterministic md5 order until the source's token budget fills (≤1
    doc overflow, the packing rule). Keyed two-level cumsum — never a
    single-task global window."""
    return SA.token_budget_sample(
        t(spark, sf, "documents"), _MIX_BUDGETS,
        default_budget=400, salt="budget",
    )


def q59_interleave_stats(spark, sf):
    """Per-doc interleaving profile (span counts, media fraction, first
    media offset) over the same deterministic span lift as q56 — the
    gate signals for multimodal context shaping. Zero shuffles."""
    return M.interleave_stats(_span_lift(spark, sf))


def q60_cross_source_neardup(spark, sf):
    """Cross-source NEAR-duplicate source pairs: the full
    MinHash→LSH→Jaccard near-dup pipeline (q23/q24's banding and verify,
    same parameters so the oracle reuses the shared CTE chain)
    restricted to pairs from DIFFERENT sources, one row per unordered
    source pair. Extends q51's exact-segment overlap to lightly-
    rewritten mirrors. Candidate-bounded everywhere — the cross-source
    filter runs on the capped LSH candidates, never on all pairs."""
    return SC.cross_source_neardup(
        t(spark, sf, "documents"), min_jaccard=0.5,
        n_hashes=8, band_size=2, sig_k=2, verify_k=3,
        max_bucket=_MAX_BUCKET,
    )


# q61 incremental dedup: testdata has no exact duplicates, so a
# deterministic boilerplate layer (25% of docs per the md5 coin become
# one of 7 boilerplate variants — the SAME expression in the oracle)
# plants both cross-snapshot hits (batch boiler vs corpus boiler) and
# in-batch dup groups. corpus = doc_id%10 < 8, batch = the rest — the
# "monthly snapshot arrives" split.
def q61_incremental_dedup(spark, sf):
    """Incremental exact dedup: register a new snapshot against the
    accumulated corpus. Broadcast-batch plan: the corpus side never
    shuffles — its scan probes the broadcast batch-hash set map-side,
    and only the matched hashes flow back."""
    did = F.col("doc_id")
    coin = F.substring(F.md5(F.concat(F.lit("inc"), did.cast("string"))), 1, 1)
    boiler = F.concat(
        F.lit("snapshot boilerplate variant "),
        F.pmod(did, F.lit(7)).cast("string"),
        F.repeat(F.lit(" filler"), 20),
    )
    injected = t(spark, sf, "documents").withColumn(
        "text",
        F.when(coin.isin("0", "1", "2", "3"), boiler).otherwise(F.col("text")),
    )
    corpus = injected.filter(F.pmod(did, F.lit(10)) < 8)
    batch = injected.filter(F.pmod(did, F.lit(10)) >= 8)
    return D.dedup_incremental(batch, corpus)


def q62_heuristic_gate(spark, sf):
    """The Gopher-style heuristic rule gate (word count, mean word
    length, symbol ratio, alphabetic-word fraction, stopword presence)
    with per-rule attribution booleans. A deterministic mutation layer
    (the SAME md5 coin expression in the oracle) plants failures for
    each rule: symbol spam, agglutinative soup, too-short docs, and
    ellipsis spam. Zero shuffles — pure per-row expressions."""
    did = F.col("doc_id")
    coin = F.substring(F.md5(F.concat(F.lit("q62"), did.cast("string"))), 1, 1)
    mutated = t(spark, sf, "documents").withColumn(
        "text",
        F.when(coin == "0", F.repeat(F.lit("#!? "), 40))
        .when(coin == "1", F.repeat(F.lit("pneumonoultramicroscopicsilicovolcanoconiosis "), 8))
        .when(coin == "2", F.lit("tiny doc"))
        .when(coin == "3", F.repeat(F.lit("wait... "), 30))
        .otherwise(F.col("text")),
    )
    return X.heuristic_quality_gate(mutated)


# q63 near-dup decontamination: a deterministic syndication layer makes
# ~19% of docs (md5 coin in 0..2) one of 4 benchmark-passage variants —
# same variant ⇒ shingle-set Jaccard ≈ 0.6 (shared 5-word template,
# distinct per-doc tail word), different variant ⇒ low. The benchmark is
# the q44-style hash sample; corpus docs sharing a sampled variant get
# flagged even though their exact tails differ.
def q63_neardup_decontam(spark, sf):
    """Near-duplicate decontamination: MinHash band probe of the corpus
    against a BROADCAST benchmark (band keys + shingle sets), Jaccard
    verify on banded candidates only. The corpus is never shuffled on
    band keys or shingles."""
    did = F.col("doc_id")
    coin = F.substring(F.md5(F.concat(F.lit("nd"), did.cast("string"))), 1, 1)
    boiler = F.concat(
        F.repeat(
            F.concat(F.lit("eval benchmark passage variant "),
                     F.pmod(did, F.lit(4)).cast("string"), F.lit(" ")),
            12,
        ),
        F.lit("tail"),
        F.pmod(did, F.lit(5)).cast("string"),
    )
    injected = t(spark, sf, "documents").withColumn(
        "text",
        F.when(coin.isin("0", "1", "2"), boiler).otherwise(F.col("text")),
    )
    bench = SA.hash_sample(injected, _BENCH_RATE, salt=_BENCH_SALT)
    corpus = injected.join(bench.select("doc_id"), "doc_id", "left_anti")
    return DC.neardup_contamination(
        corpus, bench, n_hashes=8, band_size=2, sig_k=2, verify_k=3,
        min_jaccard=0.5, max_bucket=_MAX_BUCKET,
    )


def q64_semantic_dedup(spark, sf):
    """SemDeDup: embedding near-dup pairs (same IVF bucket, capped;
    exact cosine verify) → connected components → per-vector keep
    verdicts. The q29 candidate plan feeding the q40 clustering plan —
    semantic duplication is transitive, so keepers need the component
    label."""
    cents = _centroids(spark, sf)
    assigned = S.ivf_assign(t(spark, sf, "embeddings"), cents)
    return S.semantic_dedup(assigned, threshold=0.35, max_bucket=_MAX_BUCKET)


# q65 weights: 64 buckets, dyadic-rational values (k/16, k ∈ [-20, 20])
# so every partial sum is exact in double — the score is independent of
# partition order AND bit-equal to the DuckDB oracle's sum.
_Q65_W = [((b * 37 + 11) % 41 - 20) / 16 for b in range(64)]


def q65_linear_classifier(spark, sf):
    """fastText-style hashed linear quality classifier: token → md5
    bucket → weight, score = bias + Σ weights (bag semantics), keep =
    score > 0 (the sigmoid-at-0.5 decision on the exact margin). Inline
    weight-array path: one scan, zero shuffles."""
    return X.linear_quality_score(t(spark, sf, "documents"), _Q65_W, bias=0.25)


def q66_ccnet_buckets(spark, sf):
    """CCNet head/middle/tail perplexity thirds per language: lm_score
    → two-pass range rank (language-leading key; per-language rank =
    global rank − broadcast offset, never a per-language window) →
    exact integer third boundaries."""
    return X.ccnet_buckets(t(spark, sf, "documents"))


# q69: the q61 snapshot split (doc_id%10) with the q63-style NEAR-dup
# injection — same-variant boiler docs land on both sides of the split
# with distinct per-doc tails, so batch boiler docs are fuzzy (not
# exact) copies of corpus ones.
def q69_incremental_neardup(spark, sf):
    """Incremental near-dup registration: the new snapshot's band keys
    and shingle sets broadcast; the accumulated corpus pays one
    signature shuffle, probes the bands map-side, and only banded
    candidates materialize verify sets."""
    did = F.col("doc_id")
    coin = F.substring(F.md5(F.concat(F.lit("inb"), did.cast("string"))), 1, 1)
    boiler = F.concat(
        F.repeat(
            F.concat(F.lit("ingest boilerplate variant "),
                     F.pmod(did, F.lit(4)).cast("string"), F.lit(" ")),
            12,
        ),
        F.lit("tail"),
        F.pmod(did, F.lit(5)).cast("string"),
    )
    injected = t(spark, sf, "documents").withColumn(
        "text",
        F.when(coin.isin("0", "1", "2"), boiler).otherwise(F.col("text")),
    )
    corpus = injected.filter(F.pmod(did, F.lit(10)) < 8)
    batch = injected.filter(F.pmod(did, F.lit(10)) >= 8)
    return D.dedup_incremental_neardup(
        batch, corpus, n_hashes=8, band_size=2, sig_k=2, verify_k=3,
        min_jaccard=0.5, max_bucket=_MAX_BUCKET,
    )


def q68_temperature_mix(spark, sf):
    """Multinomial temperature mixture rates (α = 0.5): per-source
    token share, temperature share p^α/Σp^α, and the boost multiplier
    a sampler applies — one combinable aggregation + two broadcast
    totals."""
    return SA.temperature_mixture_rates(t(spark, sf, "documents"), alpha=0.5)


# q67: testdata docs are single-line word streams, so a deterministic
# line layer reshapes each into 6-word lines (the q51 segment-slicing
# expression, joined with \n) and the md5 coin appends a duplicate of
# the FIRST line to ~25% of docs — the repeated nav/footer line the op
# exists to strip. Docs whose natural segments repeat dedupe too, in
# both engines alike.
def q67_line_dedup(spark, sf):
    """RefinedWeb within-document repeated-line removal: first
    occurrence survives in place, later exact copies drop. Zero
    shuffles — array_distinct is order-preserving per-row codegen."""
    docs = t(spark, sf, "documents")
    did = F.col("doc_id")
    coin = F.substring(F.md5(F.concat(F.lit("ld"), did.cast("string"))), 1, 1)
    ws = F.split(F.col("text"), " ")
    nl = F.ceil(F.size(ws) / F.lit(6.0)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.array_join(F.slice(ws, i * 6 + 1, F.lit(6)), " "),
    )
    lined = F.array_join(segs, "\n")
    injected = docs.withColumn(
        "text",
        F.when(
            coin.isin("0", "1", "2", "3"),
            F.concat(lined, F.lit("\n"), F.element_at(segs, 1)),
        ).otherwise(lined),
    )
    return SC.dedup_lines(injected)


def q49_lm_score(spark, sf):
    """Unigram-LM quality score (mean negative log-likelihood in nats
    under the corpus's own unigram distribution) — the cheap perplexity
    filter. Scoring joins PRE-AGGREGATED per-doc word counts against
    the frequency table, so stopword skew is bounded to one row per
    (doc, word)."""
    return X.lm_score(t(spark, sf, "documents"))


def q70_media_index(spark, sf):
    """Inverted media-asset index over the interleaved span shape —
    the media analogue of the URL seen-set (register each asset ref
    once, flag refs shared across documents). Same deterministic span
    lift as q56/q59 so the oracle reuses the mod-7 rule. One
    filtered explode + one map-side-combinable groupBy(media_ref)."""
    return M.media_ref_index(_span_lift(spark, sf))


# q71 bench split: every 23rd vector is the "benchmark" (eval set),
# the rest are the corpus; 0.32 sits inside the observed max-cosine
# tail at sf0.01 (p90 ≈ 0.323) so both verdict classes fire.
_Q71_BENCH_MOD, _Q71_COS_T = 23, 0.32


def q71_embedding_decontam(spark, sf):
    """Semantic decontamination: max cosine of every corpus vector
    against the broadcast benchmark set — the embedding-space sibling
    of q44's n-gram and q63's near-dup text checks (catches
    paraphrased/translated eval leakage that shares no shingles).
    Corpus scanned once, zero shuffles: the bench side collapses to a
    single broadcast row and the max-cosine fold runs in codegen."""
    emb = t(spark, sf, "embeddings")
    m = F.pmod(F.col("vec_id"), F.lit(_Q71_BENCH_MOD))
    return DC.embedding_decontamination(
        emb.filter(m != 0), emb.filter(m == 0), threshold=_Q71_COS_T
    )


def q72_semdedup_far(spark, sf):
    """SemDeDup with the paper's published keeper rule: per semantic
    cluster keep the member FARTHEST from the cluster centroid (lowest
    cosine, min-id tiebreak) — the most atypical member carries the
    most marginal information. Same candidate/closure chain as q64;
    the keeper swap adds one |clusters|xD combinable centroid agg and
    a min-struct argmin, never a second pairwise pass."""
    cents = _centroids(spark, sf)
    assigned = S.ivf_assign(t(spark, sf, "embeddings"), cents)
    return S.semantic_dedup(
        assigned, threshold=0.35, max_bucket=_MAX_BUCKET, keeper="farthest"
    )


# q73 shrinkage: pseudo-count 20 ≈ one source's doc count at sf0.01,
# so the prior visibly pulls small-sample means toward mu; 4.0 sits
# between the shrunk extremes (3.7 … 6.4 observed) so both keep
# classes fire.
_Q73_SHRINK_K, _Q73_MIN_PRIOR = 20, 4.0


def q73_source_prior(spark, sf):
    """Empirical-Bayes source-reputation prior over the q65 classifier
    margins: per-source mean shrunk toward the global mean with
    pseudo-count k — the graded domain-quality score feeding a crawl's
    host budgets and a corpus build's mixture weights. One combinable
    groupBy(source) after the zero-shuffle scoring scan; the global
    totals re-aggregate the per-source frame and broadcast back."""
    return X.source_prior_gate(
        t(spark, sf, "documents"), _Q65_W, bias=0.25,
        shrink_k=_Q73_SHRINK_K, min_prior=_Q73_MIN_PRIOR,
    )


# q74: terms from the synthetic corpus vocabulary so tf/df have real
# spread; Lucene-default k1/b. The oracle interpolates the PYTHON-
# computed float constants (repr) so both engines fold identical
# doubles.
_Q74_TERMS, _Q74_K, _Q74_K1, _Q74_B = ["spark", "join", "window"], 20, 1.2, 0.75


def q74_bm25_topk(spark, sf):
    """BM25 retrieval: the k docs most about a fixed query-term set
    under Lucene-idf BM25 — topic-targeted subset extraction. Only
    query-term occurrences are ever exploded (the corpus token
    relation never materializes); df and N/avgdl come back as
    broadcasts; the final top-k is TakeOrderedAndProject."""
    return X.bm25_topk(
        t(spark, sf, "documents"), _Q74_TERMS,
        k=_Q74_K, k1=_Q74_K1, b=_Q74_B,
    )


# q75: every 5th vector keeps its label (the seed set), the rest are
# scored; same vec_id<8 centroid rule as q64 so the oracle reuses the
# assign convention
_Q75_TRAIN_MOD, _Q75_KNN = 5, 5


def q75_knn_labels(spark, sf):
    """kNN label propagation: majority label among the 5 nearest
    same-IVF-bucket labeled vectors (rounded cosine, deterministic
    tiebreaks end-to-end) — seed-set classification over the q29/q64
    candidate plan, never corpus all-pairs. Unreachable test vectors
    (empty or capped-away bucket) get a NULL verdict row."""
    emb = t(spark, sf, "embeddings")
    m = F.pmod(F.col("vec_id"), F.lit(_Q75_TRAIN_MOD))
    return S.knn_label_vote(
        emb.filter(m == 0),
        emb.filter(m != 0).drop("label"),
        _centroids(spark, sf),
        k=_Q75_KNN, max_bucket=_MAX_BUCKET,
    )




# q76 split: 80/10/10, salted so the assignment is decorrelated from
# the q37/q44 samples of the same corpus
_Q76_FRACS, _Q76_NAMES, _Q76_SALT = (0.8, 0.1, 0.1), ("train", "val", "test"), "h76"


def q76_holdout_split(spark, sf):
    """Deterministic leakage-free train/val/test assignment: cumulative
    md5-interval membership — every doc in exactly one split, the same
    split on every run/engine/corpus revision. One codegen'd CASE over
    the scan, zero shuffles."""
    return SA.holdout_split(
        t(spark, sf, "documents"), _Q76_FRACS, _Q76_NAMES, salt=_Q76_SALT
    ).select("doc_id", "split")


def q77_doc_novelty(spark, sf):
    """Per-document novelty: fraction of its distinct 3-word shingles
    found in NO other document — the PREFER-side of the dedup signal
    (rank fresh content above the thousandth syndicated copy). Distinct
    (doc, shingle-md5) pairs feed both the document-frequency table and
    the per-doc verdict; raw shingle strings never shuffle."""
    return D.novelty_score(t(spark, sf, "documents"), k=3)


_Q78_SEED = "ep1"


def q78_epoch_order(spark, sf):
    """Deterministic global training-order shuffle: dense 0-based
    position in md5(seed || doc_id) order via the two-pass
    range-partitioned rank — reproducible across engines and retries,
    never an ORDER BY rand() and never a single-task global window."""
    return SA.epoch_order(t(spark, sf, "documents"), seed=_Q78_SEED)


# q79 quota: 10 of each source's 25 docs at sf0.01 — both keep classes
# fire in every source
_Q79_QUOTA = 10


def q79_source_quota(spark, sf):
    """Per-source quality quota: keep the best `quota` docs per source
    by classifier margin (anti-domination rule of a mixture build).
    Zero-shuffle scoring scan, then the ccnet_buckets rank machinery —
    source-leading two-pass rank minus broadcast per-source offsets,
    never a per-source window."""
    return X.source_quota(
        t(spark, sf, "documents"), _Q65_W, bias=0.25, quota=_Q79_QUOTA
    )


def q80_bigram_lm(spark, sf):
    """Bigram-LM quality score with add-0.5 smoothing — the next rung
    above q49's unigram scorer toward CCNet's 5-gram KenLM: word-salad
    with plausible unigrams scores high here. Bigrams are row-local
    (arrays_zip of two slices); both model tables derive from the
    per-(doc,w1,w2) counts so AQE reuses the exchanges."""
    return X.bigram_lm_score(t(spark, sf, "documents"), alpha=0.5)


def q81_dataset_card(spark, sf):
    """Per-source dataset card: volume, token mass, within-source
    exact-dup fraction, language mix, heuristic-gate pass rate — the
    release-notes report a mixture designer reads before choosing
    q58/q68 weights. One corpus scan (gate expressions + content hash),
    one groupBy(source), O(#sources x #langs) top-lang pick."""
    return X.dataset_card(t(spark, sf, "documents"))




def q82_contamination_attribution(spark, sf):
    """Decontamination audit: for every corpus doc sharing a 5-gram
    with the benchmark (the q44 split), WHICH benchmark doc it
    overlaps most — shared-shingle argmax with (count desc, bench id)
    ties. Bench side broadcast with ids attached; the corpus never
    shuffles on shingle values. The synthetic corpus has no natural
    5-gram overlap with its own 2% sample, so ~1/16 of corpus docs
    (md5-coin, the q62 mutation convention) get the lowest-id bench
    doc's text appended — the oracle plants identically, and the
    attribution rows are non-vacuous at every SF."""
    docs = t(spark, sf, "documents")
    bench = SA.hash_sample(docs, _BENCH_RATE, salt=_BENCH_SALT)
    donor = (
        bench.orderBy("doc_id").limit(1).select(F.col("text").alias("_bt"))
    )
    corpus = docs.join(bench.select("doc_id"), "doc_id", "left_anti")
    coin = F.substring(
        F.md5(F.concat(F.lit("q82"), F.col("doc_id").cast("string"))), 1, 1
    )
    mut = (
        corpus.crossJoin(F.broadcast(donor))
        .withColumn(
            "text",
            F.when(
                coin == "0", F.concat(F.col("text"), F.lit(" "), F.col("_bt"))
            ).otherwise(F.col("text")),
        )
        .drop("_bt")
    )
    return DC.contamination_attribution(mut, bench, k=5)


def q83_score_calibration(spark, sf):
    """Classifier calibration: corpus cut into rank-based score deciles
    (two-pass rank, exact integer boundaries), each reporting its
    heuristic-gate pass rate — the trust check before swapping a model
    gate in for the rule gate."""
    return X.score_calibration(
        t(spark, sf, "documents"), _Q65_W, bias=0.25, n_buckets=10
    )


# q84: 8 packs per shard over the q55 chunk/pack constants (64/48
# chunks into 512-token packs) so sf0.01 yields a handful of shards
_Q84_PPS = 8


def q84_shard_manifest(spark, sf):
    """Training-export integrity manifest: per shard (= pack_id DIV 8),
    pack/chunk/token counts plus an order-sensitive md5 digest over the
    chunk hashes in exact packing order — the sidecar a loader checks
    before reading terabytes. One combinable agg; only 32-byte hashes
    travel."""
    chunks = SC.chunk_documents(t(spark, sf, "documents"), 64, 48)
    packed = P.with_pack_ids(
        chunks, budget=512, order_cols=["doc_id", "chunk_id"],
        weight_col="n_words",
    )
    return P.shard_manifest(packed, packs_per_shard=_Q84_PPS)




_Q85_BITS, _Q85_DIM = 16, 64


def q85_hyperplane_lsh(spark, sf):
    """Hyperplane-LSH signatures (Charikar SimHash for vectors): bit k
    = sign of the dot product with md5-derived hyperplane k — the
    centroid-free cosine-ANN family beside the IVF path. Components
    quantized to dyadic rationals so every projection sum is exact in
    double on any engine; zero shuffles."""
    return S.hyperplane_lsh(
        t(spark, sf, "embeddings"), dim=_Q85_DIM, n_bits=_Q85_BITS
    )


_Q86_BASE, _Q86_SALT = 0.5, "mix"


def q86_mixture_apply(spark, sf):
    """The APPLY half of the temperature mixture: q68's per-source
    boosts joined back (broadcast, null-safe) and the 48-bit
    hash-fraction rule decides each doc — computing a mixture and
    sampling it, composed as one oracled query."""
    docs = t(spark, sf, "documents")
    rates = SA.temperature_mixture_rates(docs, alpha=0.5)
    return SA.apply_mixture_rates(
        docs, rates, base_rate=_Q86_BASE, salt=_Q86_SALT
    )




def q87_asof_join(spark, sf):
    """As-of join (kdb aj / merge_asof): every error event picks up the
    user's most recent purchase at-or-before it — union-tag carry
    forward, ONE shuffle on user_id, no range self-join. NULL payload
    when no prior purchase exists."""
    ev = t(spark, sf, "events")
    return R.asof_join(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "purchase"),
        key_cols=["user_id"], ts_col="ts", id_col="event_id",
        payload_cols=["value"],
    )


_Q88_TIERS = [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1e9, "high")]


def q88_range_join(spark, sf):
    """Range-bucket join: events banded into value tiers via a
    broadcast non-equi join (BroadcastNestedLoopJoin over a
    3-row literal table — the big side never shuffles), rolled up per
    tier with DECIMAL-exact value totals."""
    out = R.range_join_tiers(t(spark, sf, "events"), _Q88_TIERS)
    # exact integer cents, not a decimal/double sum: DuckDB's client
    # degrades DECIMAL to float64 and double sums are fold-order-
    # dependent; round(v*100) is the same long on both engines
    cents = F.round(F.col("value") * 100).cast("long")
    return out.groupBy("tier").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(cents).cast("long").alias("total_cents"),
    ).withColumn("total_value", F.col("total_cents") / 100.0)




_Q89_B, _Q89_A = 64, 0.5


def q89_dsir_importance(spark, sf):
    """DSIR importance weights (Xie et al. 2023): every doc scored by
    ln-likelihood-ratio of its hashed-unigram bag under the benchmark
    target vs the corpus itself — importance resampling toward a
    reference domain. Per-(doc,bucket) counts cached (feed the corpus
    distribution AND the scoring join); the 64-row model broadcasts
    back."""
    docs = t(spark, sf, "documents")
    target = SA.hash_sample(docs, _BENCH_RATE, salt=_BENCH_SALT)
    return X.dsir_importance(docs, target, n_buckets=_Q89_B, alpha=_Q89_A)


def q90_hll_distinct(spark, sf):
    """Deterministic HyperLogLog (p=6) distinct-word estimate per
    source, audited against the exact distinct: the sketch path is the
    100 TB shape (registers shuffle, tokens don't); the exact column
    exists ONLY as the in-query error audit. md5-hashed registers make
    the estimate engine-portable — Spark's approx_count_distinct is
    seed-opaque and un-oracle-able (operators/sketches.py)."""
    docs = t(spark, sf, "documents")
    # the exact audit forces a distinct anyway, so BOTH paths derive
    # from one cached (source, word) distinct relation — registers are
    # max-idempotent, so distinct input yields identical registers
    # (one token explode total; r5 multi-consumer rule)
    dw = (
        docs.select(
            F.col("source").alias("grp"),
            F.explode(SK._norm_words(F.col("text"))).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
        .cache()
    )
    est = SK.hll_estimate(
        SK.registers_over(dw, F.col("word"), ["grp"]), ["grp"]
    ).withColumnRenamed("grp", "source")
    exact = dw.groupBy(F.col("grp").alias("_g")).agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    # null-safe join: a NULL-source group must survive (playbook rule),
    # and both relations produce exactly one row per source value
    out = est.join(exact, est["source"].eqNullSafe(exact["_g"])).select(
        "source",
        "exact_distinct",
        "est_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )
    out.df_ordered_cache = dw
    return out


_Q91_HOSTS, _Q91_ITERS = 64, 4


def q91_pagerank_hosts(spark, sf):
    """Fixed-point integer PageRank over the deterministic host graph:
    the crawl-prioritization centrality (CommonCrawl host ranks; feeds
    the priority frontier, crab_spark/frontier.py). Integer micro-unit
    ranks are addition-order-independent — bit-exact parity with no
    float policy (operators/graph.py)."""
    edges = G.host_edges(t(spark, sf, "documents"), n_hosts=_Q91_HOSTS)
    return G.pagerank_fixed(spark, edges, n_hosts=_Q91_HOSTS, iters=_Q91_ITERS)


def q92_media_phash_pairs(spark, sf):
    """Near-duplicate media assets via banded Hamming join over the
    48-bit payload-phash (4×12-bit bands, capped buckets) — image-dedup
    analogue of SimHash text dedup; the hash is the FakeDecoder md5
    stub, the banding/verify machinery is the deliverable
    (operators/multimodal.py media_phash_pairs). The synthetic corpus
    has no byte-identical payloads, so ~1/16 of assets (md5-coin, the
    q82 planting convention) get a 'dup:' clone — the oracle plants
    identically and the pair rows are non-vacuous at every SF."""
    media = M.media_from_documents(t(spark, sf, "documents"))
    coin = (
        F.substring(F.md5(F.concat(F.lit("q92"), F.col("doc_id"))), 1, 1)
        == "0"
    )
    clones = media.where(coin).withColumn(
        "media_id", F.concat(F.lit("dup:"), F.col("doc_id"))
    )
    return M.media_phash_pairs(
        media.unionByName(clones), max_hamming=3, max_bucket=200
    )


_Q93_T = 60


def q93_cms_heavy_hitters(spark, sf):
    """Count-min-sketch (4×256) heavy hitters at threshold ≥60 with
    the exact count as overcount audit — integer-exact end to end;
    the sketch is 1,024 combinable cells broadcast to the candidate
    vocabulary (operators/sketches.py)."""
    return SK.cms_heavy_hitters(t(spark, sf, "documents"), _Q93_T)


def q94_bloom_audit(spark, sf):
    """False-positive audit of the md5 Bloom filter (m=4096, k=3) that
    models the frontier's URL-seen prefilter (north_rule;
    crab_spark/bloom.py sidecars): build from even doc_ids, probe the
    disjoint odd ids, count bloom-positives = wasted authoritative
    lookups. One-row summary, integer counts + round(6) rate."""
    docs = t(spark, sf, "documents")
    key = F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    build = docs.where(F.col("doc_id") % 2 == 0).select(key.alias("key"))
    probe = (
        docs.where(F.col("doc_id") % 2 == 1)
        .select(key.alias("key"))
        .distinct()
    )
    return SK.bloom_audit(build, probe)


def q95_hll_windowed(spark, sf):
    """Windowed distinct-user HLL over events — the batch dual of the
    streaming register pipeline (streaming/windows.py
    windowed_hll_registers, where the 64 registers per window are the
    stateful-agg state and this estimate is the stateless read-side
    view). Exact countDistinct rides along as the error audit, as in
    q90."""
    # one cached (window, user) distinct feeds registers AND the exact
    # audit (the q90 shared-distinct shape)
    dk = (
        t(spark, sf, "events")
        .select(
            F.window("ts", "1 hour").getField("start").alias("win_start"),
            F.coalesce(F.col("user_id").cast("string"), F.lit("")).alias("k"),
        )
        .distinct()
        .cache()
    )
    est = SK.hll_estimate(
        SK.registers_over(dk, F.col("k"), ["win_start"]), ["win_start"]
    )
    exact = dk.groupBy(F.col("win_start").alias("_ws")).agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    out = est.join(exact, est["win_start"].eqNullSafe(exact["_ws"])).select(
        "win_start",
        "exact_distinct",
        "est_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )
    out.df_ordered_cache = dk
    return out


_Q96_TOPK = 5


def q96_skew_report(spark, sf):
    """Hot-key diagnostics — the report you run BEFORE a 100 TB job to
    find the keys that will melt a shuffle: top-5 heaviest values per
    skew-relevant dimension (source, lang, content hash, host bucket,
    length bucket) with corpus share. Each dimension is one
    map-combinable agg + a distributed TakeOrdered LIMIT — never a
    single-partition window over the distinct-key stream (the content
    dimension alone has |corpus| keys). Five pruned-column scans by
    design: a single-pass multi-dimension explode would funnel every
    dimension's keys through ONE shuffle and bring the partition-wide
    rank back; parquet column pruning makes the extra scans the cheap
    side of that trade. NULL keys take the q46 coalesce-''
    convention."""
    docs = t(spark, sf, "documents")
    did = F.coalesce(F.col("doc_id").cast("string"), F.lit(""))
    dims = [
        ("source", F.coalesce(F.col("source"), F.lit(""))),
        ("lang", F.coalesce(F.col("lang"), F.lit(""))),
        ("content_md5", F.md5(F.coalesce(F.col("text"), F.lit("")))),
        (
            "host_bucket",
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("h|"), did)), 1, 2), 16, 10
                ).cast("int")
                % 64
            ).cast("string"),
        ),
        (
            "len_bucket",
            F.expr("coalesce(n_chars, 0) div 256").cast("string"),
        ),
    ]
    out = None
    for name, key in dims:
        part = (
            docs.select(key.alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(_Q96_TOPK)
            .select(F.lit(name).alias("dimension"), "key", "n")
        )
        out = part if out is None else out.unionByName(part)
    tot = docs.agg(F.count(F.lit(1)).alias("_t"))
    return out.crossJoin(F.broadcast(tot)).select(
        "dimension",
        "key",
        "n",
        F.round(F.col("n") / F.col("_t"), 6).alias("pct"),
    )


def q97_hll_overlap(spark, sf):
    """Pairwise source vocabulary overlap from HLL register algebra —
    union via register max, intersection by inclusion-exclusion; the
    whole |S|² matrix costs O(|S|²·64) rows after ONE corpus pass,
    where a value-level overlap join would reshuffle every distinct
    word per pair (operators/sketches.py hll_pair_overlap)."""
    return SK.hll_pair_overlap(t(spark, sf, "documents"))


_Q98_WMIN = 2


def q98_host_communities(spark, sf):
    """Host-graph communities: connected components over STRONG edges
    (weight ≥ 2 — single shared-fingerprint links are noise; pruning
    weak edges before clustering is standard community practice and
    keeps the labels non-trivial). Reuses the large-star/small-star
    O(log n) MapReduce components (operators/dedup.py, q40) on the
    q91 host graph; isolated hosts come back self-labeled via the
    vertices frame. Crawl use: a community = a mirror/boilerplate
    cluster whose hosts share one politeness budget."""
    edges = G.host_edges(t(spark, sf, "documents"), n_hosts=_Q91_HOSTS)
    strong = edges.where(F.col("w") >= _Q98_WMIN).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    hosts = spark.range(_Q91_HOSTS).select(
        F.col("id").cast("int").alias("host")
    )
    return D.connected_components(strong, vertices=hosts, id_col="host")


def q99_length_histogram(spark, sf):
    """Per-source token-length distribution in log₂ buckets
    (floor(log2(n))+1 via the exact ``length(bin(n))`` trick the HLL
    rho shares — no float log): the length-mix report that complements
    the q81 dataset card; one map-combinable agg. Bucket 0 = NULL
    text (both engines route the NULL comparison to the ELSE arm);
    n_tokens follows the q30 convention exactly."""
    n = F.size(X.tokens(F.col("text")))
    bucket = (
        F.when(n > 0, F.length(F.bin(n.cast("long"))))
        .otherwise(F.lit(0))
        .cast("int")
    )
    return (
        t(spark, sf, "documents")
        .select(F.col("source"), bucket.alias("log2_bucket"))
        .groupBy("source", "log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q100_event_funnel(spark, sf):
    """Ordered conversion funnel over the events stream: first 'view',
    then first 'click' within 24 h of it, then first 'purchase'
    within 24 h of that — the canonical product-analytics operator, expressed
    as three filtered min-aggs chained by user_id joins (every shuffle
    on the same key; no per-user window sort over the full event
    stream). Per-user rows with n_steps ∈ {1,2,3}; users without a
    'view' are outside the funnel denominator by definition. The
    user-scale step frames are cached (each feeds the next step AND
    the final assembly — the r5 multi-consumer rule)."""
    ev = t(spark, sf, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .cache()
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.expr("t_view + INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .cache()
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.expr("t_click + INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    out = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("n_steps"),
        )
    )
    out.df_pipeline_caches = [v, c]
    return out


_Q101_K = 3
_Q101_HOSTS = 64


def q101_anchor_topk(spark, sf):
    """Anchor-text index: top-3 anchor words per link-target host —
    the signal a crawl ranker (and every web search stack since
    Google's original paper) aggregates from parsed link spans
    (crawler.py navigate output feeds this in the live engine; here
    the q56 mod-7 span convention marks word index ≡ 5 (mod 7) as a
    link whose target host is the md5-route of the word and whose
    anchor is the PRECEDING word). One array transform per doc — the
    anchor pairs are built inside the array (never posexplode + carry
    the whole array per token row, which would be O(len²) bytes), then
    one combinable count and a row_number over 64 host partitions of
    PRE-AGGREGATED (host, anchor) counts — bounded by per-host anchor
    vocabulary, never corpus-scale."""
    arr = F.split(
        F.regexp_replace(
            F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " "
        ),
        " ",
    )
    pairs = F.filter(
        F.transform(
            arr,
            lambda w, i: F.struct(
                w.alias("tw"),
                # element_at is 1-based: index i reads arr[i-1], the
                # preceding word; i ≥ 5 after the filter, but the
                # transform evaluates every i, so guard i=0 (ANSI
                # element_at(arr, 0) errors)
                F.when(i > 0, F.element_at(arr, i))
                .otherwise(F.lit(""))
                .alias("anchor"),
                i.alias("i"),
            ),
        ),
        lambda s: (s["i"] % 7 == 5) & (s["tw"] != ""),
    )
    host = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("t|"), F.col("tw"))), 1, 2),
            16,
            10,
        ).cast("int")
        % _Q101_HOSTS
    )
    counts = (
        t(spark, sf, "documents")
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.tw").alias("tw"), F.col("p.anchor").alias("anchor"))
        .where(F.col("anchor") != "")
        .select(host.alias("host"), "anchor")
        .groupBy("host", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("host").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _Q101_K)
        .select("host", "anchor", "n", "rnk")
    )


def q102_hopping_window(spark, sf):
    """Hopping (sliding) event-time window — 1 h windows every 30 min,
    the overlapping-window dual of q18's tumbling agg: each event lands
    in exactly 2 windows, assigned by Spark's ``window(ts, size,
    slide)`` expression inside codegen (no self-union, no explode in
    the query plan we author — the WindowGenerate node emits the 2
    rows). Streaming dual: streaming/windows.py ``hopping_sums`` runs
    the identical expression under readStream with a watermark, pinned
    equal by test_streaming."""
    return (
        t(spark, sf, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(
            F.window("ts", "1 hour", "30 minutes")
            .getField("start")
            .alias("win_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q103_host_degrees(spark, sf):
    """Host-graph fan-out/fan-in profile over the q91 edge list:
    (host, out_deg, out_links, in_deg, in_links) for every host,
    zeros for isolated ones — the report that sizes per-host politeness
    budgets and flags hub hosts before a crawl (frontier.py's priority
    scoring consumes exactly these fan-out counts). The docs-scale
    pass happens once in host_edges; the cached ≤64² edge rows feed
    BOTH degree aggs (the r5 multi-consumer rule)."""
    edges = G.host_edges(
        t(spark, sf, "documents"), n_hosts=_Q101_HOSTS
    ).cache()
    outd = edges.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).alias("od"), F.sum("w").alias("ol")
    )
    ind = edges.groupBy(F.col("dst").alias("host")).agg(
        F.count(F.lit(1)).alias("idg"), F.sum("w").alias("il")
    )
    hosts = spark.range(_Q101_HOSTS).select(
        F.col("id").cast("int").alias("host")
    )
    out = (
        hosts.join(outd, "host", "left")
        .join(ind, "host", "left")
        .select(
            "host",
            F.coalesce(F.col("od"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("ol"), F.lit(0)).cast("long").alias("out_links"),
            F.coalesce(F.col("idg"), F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce(F.col("il"), F.lit(0)).cast("long").alias("in_links"),
        )
    )
    out.df_ordered_cache = edges
    return out


def q104_robots_gate(spark, sf):
    """The robots politeness gate as a PURE RELATIONAL plan — the
    10^10-URL scale path: prefix-only rules (the overwhelming majority
    of real robots lines) broadcast to the frontier and resolved by
    RFC 9309 longest-match-wins entirely in codegen, no Python
    crossing at all (robots.py's Arrow UDF handles the general
    ``*``/``$`` patterns; at frontier scale you pre-split rule sets and
    keep the prefix class on this path). Precedence is one integer:
    ``len(pattern)·2 + allow`` — max picks the longest match and Allow
    wins exact-length ties, exactly robots.rules_allow's order. URLs
    with no matching rule are allowed (RFC default). Deterministic
    fixture: doc URLs ``/p{id%10}/{id}`` on the q91 host route; per
    host one Disallow ``/p{h%7}``, one longer Allow carve
    ``/p{h%7}/1``, and a root Disallow on every 16th host. Output is
    the per-host gate audit (n_urls, n_allowed, n_blocked). Plan: the
    ≤192-row rule table broadcasts — the frontier side never shuffles
    for rule matching; the two aggs share the (host, path) key."""
    d0 = F.coalesce(F.col("doc_id"), F.lit(0))
    did = F.coalesce(F.col("doc_id").cast("string"), F.lit(""))
    host = (
        F.conv(F.substring(F.md5(F.concat(F.lit("h|"), did)), 1, 2), 16, 10)
        .cast("int")
        % _Q101_HOSTS
    )
    urls = t(spark, sf, "documents").select(
        host.alias("host"),
        F.concat(
            F.lit("/p"),
            (d0 % 10).cast("string"),
            F.lit("/"),
            d0.cast("string"),
        ).alias("path"),
    )
    h = F.col("id").cast("int")
    pfx = F.concat(F.lit("/p"), (h % 7).cast("string"))
    hosts = spark.range(_Q101_HOSTS)
    rules = (
        hosts.select(
            h.alias("host"),
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("allow"), pfx.alias("pattern")),
                    F.struct(
                        F.lit(1).alias("allow"),
                        F.concat(pfx, F.lit("/1")).alias("pattern"),
                    ),
                )
            ).alias("r"),
        )
        .select("host", F.col("r.allow").alias("allow"),
                F.col("r.pattern").alias("pattern"))
        .unionByName(
            hosts.where(h % 16 == 0).select(
                h.alias("host"),
                F.lit(0).alias("allow"),
                F.lit("/").alias("pattern"),
            )
        )
        .withColumnRenamed("host", "r_host")
    )
    score = F.length("pattern") * 2 + F.col("allow")
    best = (
        urls.join(
            F.broadcast(rules),
            (F.col("host") == F.col("r_host"))
            & F.col("path").startswith(F.col("pattern")),
            "left",
        )
        .groupBy("host", "path")
        .agg(F.max(score).alias("best"))
    )
    return best.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(
            F.when(F.col("best").isNull() | (F.col("best") % 2 == 1), 1)
            .otherwise(0)
        ).alias("n_allowed"),
        F.sum(
            F.when(F.col("best").isNotNull() & (F.col("best") % 2 == 0), 1)
            .otherwise(0)
        ).alias("n_blocked"),
    )


_Q105_BUDGET = 10_000


def q105_crawl_budget(spark, sf):
    """Per-host fetch-quota allocation for one crawl epoch: divide a
    global budget of 10,000 requests across hosts proportionally to
    their pending-URL counts by the largest-remainder (Hamilton)
    method — floor shares first, then the leftover units go to the
    hosts with the largest fractional remainders (host-asc tiebreak).
    INTEGER-EXACT end to end: share arithmetic is ``B·w div total`` /
    ``B·w mod total`` (no float apportionment, so both engines agree
    bit-for-bit and Σquota = B exactly — the invariant a scheduler
    actually needs; frontier.py's priority dequeue consumes quotas of
    exactly this shape). One docs-scale combinable count, then
    O(#hosts) window work on 64 rows."""
    did = F.coalesce(F.col("doc_id").cast("string"), F.lit(""))
    host = (
        F.conv(F.substring(F.md5(F.concat(F.lit("h|"), did)), 1, 2), 16, 10)
        .cast("int")
        % _Q101_HOSTS
    )
    pend = (
        t(spark, sf, "documents")
        .select(host.alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("pending"))
    )
    tot = pend.agg(F.sum("pending").alias("_tot"))
    b = F.lit(_Q105_BUDGET)
    shares = pend.crossJoin(F.broadcast(tot)).select(
        "host",
        "pending",
        F.expr(f"({_Q105_BUDGET} * pending) div _tot").alias("fl"),
        F.expr(f"({_Q105_BUDGET} * pending) % _tot").alias("rem"),
    )
    # leftover units = B - Σfloor; the window runs over ≤64 host rows
    left = shares.agg((b - F.sum("fl")).alias("_left"))
    w = W.orderBy(F.desc("rem"), F.asc("host"))
    return (
        shares.withColumn("rnk", F.row_number().over(w))
        .crossJoin(F.broadcast(left))
        .select(
            "host",
            "pending",
            (F.col("fl") + (F.col("rnk") <= F.col("_left")).cast("long"))
            .alias("quota"),
        )
    )


def q106_length_percentiles(spark, sf):
    """Per-source EXACT length percentiles (p50/p90/p99 of n_chars,
    rank-based — never interpolated, the repo's percentile rule): the
    distribution report behind corpus length gates, complementing
    q99's histogram. Scale shape: the cumulative window runs over the
    per-source VALUE DOMAIN (distinct lengths — bounded by max doc
    length, not corpus size) after a combinable (source, v) count;
    thresholds are ceil(q·n) in pure integer arithmetic, so both
    engines pick the identical element. NULL n_chars → 0 (q46
    convention); NULL source survives via the null-safe join."""
    docs = t(spark, sf, "documents").select(
        "source", F.coalesce(F.col("n_chars"), F.lit(0)).alias("v")
    )
    cnts = docs.groupBy("source", "v").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        W.partitionBy("source")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = cnts.withColumn("cum", F.sum("cnt").over(wcum))
    tot = cnts.groupBy(F.col("source").alias("_s")).agg(
        F.sum("cnt").alias("n_docs")
    )
    j = cum.join(tot, cum["source"].eqNullSafe(tot["_s"]))

    def pick(knum: int, kden: int, name: str):
        k = F.expr(f"({knum} * n_docs + {kden - 1}) div {kden}")
        return F.min(F.when(F.col("cum") >= k, F.col("v"))).alias(name)

    return j.groupBy("source").agg(
        F.max("n_docs").alias("n_docs"),
        pick(1, 2, "p50"),
        pick(9, 10, "p90"),
        pick(99, 100, "p99"),
    )


_Q107_NODES = 256


def q107_redirect_resolve(spark, sf):
    """Redirect-chain resolution: every corpus URL's chain is followed
    to its terminal (200) target and the collapsed mass reported per
    canonical destination — the crawl-dedup step that keeps a frontier
    from re-registering every hop of a 301 chain as a distinct page.
    The redirect table is the deterministic md5 fixture
    (graph.redirect_map — acyclic by construction, shared with the
    oracle); resolution is POINTER DOUBLING (graph.resolve_redirects):
    ceil(log2 L) self-join rounds, never an L-round walk. Docs-scale
    work is ONE combinable agg after a broadcast join of the resolved
    ≤256-row map; at URL scale the map is the fetched log's redirect
    pairs and the same doubling joins shuffle on the node key."""
    resolved = G.resolve_redirects(spark, n_nodes=_Q107_NODES)
    did = F.coalesce(F.col("doc_id").cast("string"), F.lit(""))
    start = (
        F.conv(F.substring(F.md5(F.concat(F.lit("u|"), did)), 1, 2), 16, 10)
        .cast("int")
        % _Q107_NODES
    )
    starts = t(spark, sf, "documents").select(start.alias("node"))
    return (
        starts.join(F.broadcast(resolved), "node")
        .groupBy("final")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("node").alias("n_starts"),
            # int in the output contract; the resolver carries hops as
            # long only for cycle-row doubling headroom
            F.max("hops").cast("int").alias("max_hops"),
        )
    )


_Q108_TRAP_PCT = 5  # a template holding >5% of the corpus' URLs is a trap


def q108_url_templates(spark, sf):
    """URL-template mining for crawler-trap detection: collapse every
    URL's digit runs to ``{n}`` and report per-template mass — the
    pre-crawl report that surfaces calendar/session-id traps (one
    template, unbounded distinct URLs) before the frontier drowns in
    them. URL fixture: ``/{source}/c{id%7}/item-{id}`` with an md5-coin
    20% minority carrying a synthetic session parameter (the trap
    class). One scan → template inside codegen (regexp_replace) → one
    combinable agg; the trap verdict is exact integer arithmetic
    (100·n_urls > pct·total) against a 1-row broadcast total."""
    d0 = F.coalesce(F.col("doc_id"), F.lit(0))
    did = F.coalesce(F.col("doc_id").cast("string"), F.lit(""))
    coin = (
        F.conv(F.substring(F.md5(F.concat(F.lit("t|"), did)), 1, 2), 16, 10)
        .cast("int")
    )
    path = F.concat(
        F.lit("/"),
        F.coalesce(F.col("lang"), F.lit("")),
        F.lit("/"),
        F.coalesce(F.col("source"), F.lit("")),
        F.lit("/c"),
        (d0 % 7).cast("string"),
        F.lit("/item-"),
        d0.cast("string"),
        F.when(
            coin % 5 == 0,
            F.concat(F.lit("?sid="), ((d0 * 7919) % 100000).cast("string")),
        ).otherwise(F.lit("")),
    )
    urls = t(spark, sf, "documents").select(
        F.regexp_replace(path, "[0-9]+", "{n}").alias("template"),
        path.alias("path"),
    )
    tot = urls.agg(F.count(F.lit(1)).alias("_tot"))
    agg = urls.groupBy("template").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("path").alias("n_paths"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "template",
        "n_urls",
        "n_paths",
        (F.col("n_urls") * 100 > F.lit(_Q108_TRAP_PCT) * F.col("_tot")).alias(
            "is_trap"
        ),
    )


def q109_cluster_reps(spark, sf):
    """Canonical-document selection per near-dup cluster: q40's
    connected components joined with q49's LM quality scores; the
    keeper is each cluster's best document under the q54 total order
    (empty-last, avg_nll asc, doc_id asc) — real dedup keeps the
    HIGHEST-QUALITY member, not the arbitrary min-id (q50's keep rule).
    Selection is one map-combinable min(struct) per cluster — never a
    per-cluster window over the corpus — so a boilerplate mega-cluster
    combines map-side like any other agg. Null-safe id join per the
    NULL-rule convention; the lm_score token cache rides out as the
    caller-unpersist handle."""
    docs = t(spark, sf, "documents")
    sigs = D.minhash_signatures(docs, n_hashes=8, k=2)
    pairs = D.lsh_candidate_pairs(
        sigs, n_hashes=8, band_size=2, max_bucket=_MAX_BUCKET
    )
    ver = D.ngram_jaccard(docs, pairs, k=3)
    verified = ver.filter(F.col("jaccard") >= 0.5).select("id_a", "id_b")
    comps = D.connected_components(verified, vertices=docs)
    clusters = comps.select(F.col("doc_id").alias("c_doc_id"), "cluster_id")
    scored = X.lm_score(docs)
    j = clusters.join(
        scored, F.col("c_doc_id").eqNullSafe(scored["doc_id"])
    ).select("cluster_id", "doc_id", "n_words", "avg_nll")
    agg = j.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                (F.col("n_words") == 0).alias("empty"),
                F.col("avg_nll").alias("nll"),
                F.col("doc_id").alias("d"),
            )
        ).alias("best"),
        F.count(F.lit(1)).alias("n_members"),
    )
    out = agg.select(
        "cluster_id",
        F.col("best.d").alias("keeper_id"),
        F.col("best.nll").alias("keeper_nll"),
        "n_members",
        (F.col("n_members") - 1).alias("n_dropped"),
    )
    # harvest EVERY stage's caches: the verify caches (lost to
    # .filter), the components star set (lost to .select), and the
    # lm_score token cache
    out.df_pipeline_caches = D.cache_handles(ver, comps, scored)
    return out


_Q110_SIG_MOD = 5  # content-signature buckets
_Q110_MIN_GAP = 60  # politeness floor on the recrawl interval (seconds)


def q110_recrawl_schedule(spark, sf):
    """Adaptive recrawl scheduling: per URL key, estimate the content
    change rate from the observation log and derive the next fetch
    due-time — the freshness policy a production crawler runs so hot
    pages are revisited often and static ones rarely. The events table
    is the observation log (user_id = URL key, ts = fetch time, a
    floor(value·100) mod-5 bucket = the content signature); a change is
    a signature different from the PREVIOUS observation (per-key lag
    window, ordered by ts then event_id). All arithmetic is integer
    (epoch seconds, div): interval = span div max(changes, 1), due =
    last + max(interval, 60 s floor). Scale shape: ONE key-partitioned
    window pass (per-key windows scale — the partition is the key) +
    one combinable agg; no global window, no Python."""
    # ts is TIMESTAMP_NTZ: hop through timestamp for the epoch cast
    # (the q19 precedent); floor seconds = DuckDB's epoch_us // 1e6
    e = F.col("ts").cast("timestamp").cast("long")
    sig = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100).cast(
        "long"
    ) % _Q110_SIG_MOD
    obs = t(spark, sf, "events").select(
        F.col("user_id").alias("url_key"),
        F.coalesce(e, F.lit(0)).alias("ep"),
        sig.alias("sig"),
        F.col("ts"),
        F.col("event_id"),
    )
    lagged = obs.withColumn(
        "prev_sig", F.lag("sig").over(
            W.partitionBy("url_key").orderBy("ts", "event_id")
        )
    )
    agg = lagged.groupBy("url_key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(
            (
                F.col("prev_sig").isNotNull()
                & (F.col("sig") != F.col("prev_sig"))
            ).cast("long")
        ).alias("n_changes"),
        (F.max("ep") - F.min("ep")).alias("span_sec"),
        F.max("ep").alias("_last"),
    )
    interval = F.expr("span_sec div greatest(n_changes, 1)")
    return agg.select(
        "url_key",
        "n_obs",
        "n_changes",
        "span_sec",
        interval.alias("interval_sec"),
        (
            F.col("_last")
            + F.greatest(interval, F.lit(_Q110_MIN_GAP))
        ).alias("next_due_epoch"),
    )


_Q111_SHARDS = 8


def q111_range_planner(spark, sf):
    """Range-partition planner for balanced SORTED output: equal-height
    boundaries over the sort key (n_chars) computed exactly — shard of
    a key value v is ``(cum_before(v) · N) div total`` (all rows of one
    value land in one shard, the range-partitioning invariant), then
    the per-shard audit (row count, key range, distinct keys) that a
    writer uses to size its output files. The q106 discipline: the
    cumulative window runs over the VALUE DOMAIN (distinct key values,
    bounded by max doc length — 313 at the graded SFs, never corpus
    rows), so the single ordered window is over a bounded relation; the
    docs-scale work is one combinable (v, count) agg. Integer-exact end
    to end; both engines place every value identically."""
    v = F.coalesce(F.col("n_chars"), F.lit(0))
    # cached: the value-domain counts feed BOTH the cumulative window
    # and the grand total — uncached, the corpus scan+agg ran twice
    # (plan-audited; the r5 multi-consumer rule)
    cnts = (
        t(spark, sf, "documents")
        .select(v.alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = cnts.withColumn("cum", F.sum("cnt").over(wcum))
    tot = cnts.agg(F.sum("cnt").alias("_tot"))
    out = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "v",
            "cnt",
            F.expr(f"((cum - cnt) * {_Q111_SHARDS}) div _tot").alias(
                "shard_id"
            ),
        )
        .groupBy("shard_id")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )
    out.df_ordered_cache = cnts
    return out


_Q112_K = 100


def q112_weighted_sample(spark, sf):
    """Exact-size weighted sample (Efraimidis–Spirakis exponential
    race, sampling.weighted_sample): k = 100 documents drawn WITHOUT
    replacement proportional to length (w = max(n_chars, 1) — "sample
    tokens, not documents", the budget rule real mixture pipelines
    use). Deterministic md5 uniforms; one codegen pass + ONE
    distributed top-k, no global sort."""
    return SA.weighted_sample(
        t(spark, sf, "documents"),
        k=_Q112_K,
        weight=F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(1)),
    )


_Q113_QUOTE = "qa qb qc qd qe qf qg qh qi qj qk ql"
_Q113_SHARED = 3


def q113_containment_pairs(spark, sf):
    """Quote/subset containment report (dedup.containment_pairs): the
    asymmetric relation the symmetric Jaccard suite misses — a short
    document wholly contained in a long one. Deterministic quote layer
    (the q57 syndication precedent, since the synthetic corpus has no
    real quotes): an md5 coin REPLACES ~1/64 of docs with a canonical
    12-word quote (fully-contained minima, containment 1.0) and
    APPENDS it to ~1/16 (the quoting majority) — the same expression
    in the oracle. max_bucket=512 keeps the planted buckets alive at
    the graded SFs; over-cap buckets drop whole per the cap_buckets
    convention."""
    did = F.coalesce(F.col("doc_id").cast("string"), F.lit(""))
    coin = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ct|"), did)), 1, 2), 16, 10)
        .cast("int")
    )
    txt = F.coalesce(F.col("text"), F.lit(""))
    injected = (
        F.when(coin % 64 == 0, F.lit(_Q113_QUOTE))
        .when(coin % 16 == 1, F.concat(txt, F.lit(" "), F.lit(_Q113_QUOTE)))
        .otherwise(txt)
    )
    docs = t(spark, sf, "documents").select("doc_id", injected.alias("text"))
    return D.containment_pairs(
        docs, k=8, min_shared=_Q113_SHARED, max_bucket=512
    )


_Q114_MIN_COUNT, _Q114_K = 5, 50


def q114_pmi_collocations(spark, sf):
    """Top-50 collocations by PMI over adjacent word pairs (text.
    pmi_collocations) — the phrase-mining signal tokenizer training
    and n-gram merging consume. min_count=5 floors hapax noise; one
    cached pair-count relation feeds both marginals and the total."""
    return X.pmi_collocations(
        t(spark, sf, "documents"), min_count=_Q114_MIN_COUNT, k=_Q114_K
    )


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

# Sweep-scoped cache lifecycle: operators attach caller-unpersist
# handles (``df_ordered_cache`` / ``df_pipeline_caches``) to their
# results so multi-consumer relations (token explodes, LSH candidates)
# materialize once. A sequential registry sweep (the driver's oracle
# run, test_oracle_parity) invokes many queries in ONE session and
# collects each result before building the next, so the previous
# query's caches are dead weight by the time the next entry runs.
# Each registry entry therefore releases the handles recorded by the
# prior entry on invocation — cached memory during a sweep is bounded
# by one query's working set instead of growing with the registry.
# unpersist() only drops the storage hint; if a caller DOES hold the
# previous DataFrame and acts on it later, it recomputes correctly.
_LIVE_CACHE_HANDLES: list[DataFrame] = []


def _release_live_caches() -> None:
    while _LIVE_CACHE_HANDLES:
        h = _LIVE_CACHE_HANDLES.pop()
        try:
            h.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def _registry_entry(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    @functools.wraps(fn)
    def run(spark: SparkSession, sf: str) -> DataFrame:
        _release_live_caches()
        out = fn(spark, sf)
        for attr in ("df_ordered_cache", "df_pipeline_caches"):
            h = getattr(out, attr, None)
            if h is None:
                continue
            hs = h if isinstance(h, (list, tuple)) else [h]
            _LIVE_CACHE_HANDLES.extend(x for x in hs if x is not None)
        return out

    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _registry_entry(fn)
    for name, fn in sorted(globals().items())
    if name.startswith("q") and name[1:3].isdigit() and callable(fn)
}

_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"


def _hexbytes_be(h: str, n: int) -> str:
    """DuckDB expression for the big-endian integer of the first ``n``
    bytes of hex digest ``h`` — the number Spark's
    ``conv(substr(h, 1, 2n), 16, 10)`` reads. BIGINT-cast per term so
    byte×2^40 never overflows INTEGER."""
    return (
        "("
        + " + ".join(
            f"CAST({_hexbyte(h, i)} AS BIGINT) * {256 ** (n - 1 - i)}"
            if i < n - 1
            else f"CAST({_hexbyte(h, i)} AS BIGINT)"
            for i in range(n)
        )
        + ")"
    )


def _hexbyte(h: str, i: int) -> str:
    """DuckDB expression for byte ``i`` of the hex digest string ``h``
    (md5 returns lowercase hex; each byte is one hex pair)."""
    p = 2 * i + 1
    return (
        f"((strpos('0123456789abcdef', substr({h}, {p}, 1))-1)*16"
        f" + strpos('0123456789abcdef', substr({h}, {p + 1}, 1))-1)"
    )

# SimHash in SQL: per-token 64-bit hash = md5_number_upper (first 8
# md5 bytes little-endian, matching the engine UDF), ±1 votes per bit,
# unsigned signature assembled in HUGEINT (docs with no tokens → 0)
_SIMHASH_CTE = """
 toks AS (SELECT doc_id, t
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\\s+')) AS t
                FROM documents)
          WHERE t <> ''),
 votes AS (SELECT doc_id, i.range AS bit,
                  sum(CASE WHEN (md5_number_upper(t) >> i.range) & 1 = 1
                           THEN 1 ELSE -1 END) AS vote
           FROM toks, range(64) i GROUP BY doc_id, i.range),
 usig AS (SELECT d.doc_id, coalesce(s.u, 0::HUGEINT) AS u
          FROM documents d LEFT JOIN (
            SELECT doc_id,
                   sum(CASE WHEN vote > 0 THEN 1::HUGEINT << bit
                            ELSE 0::HUGEINT END) AS u
            FROM votes GROUP BY doc_id) s
            ON d.doc_id IS NOT DISTINCT FROM s.doc_id)
"""
_SHINGLE_CTE = """
 w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') ws FROM documents),
 sh AS (SELECT doc_id, array_to_string(ws[i:i+{km1}], ' ') s
        FROM w, unnest(range(1, greatest(len(ws) - {k}, 0) + 2)) t(i))
"""

# Shared LSH candidate + shingle-set CTE chain (q24 verify, q40
# clustering): 2-word-shingle MinHash signatures → capped band buckets
# → candidate pairs → exact 3-gram shingle sets for the Jaccard verify.
_LSH_CAND_SETS = (
    _SHINGLE_CTE.format(k=2, km1=1)
    + """,
        sigs AS (SELECT doc_id, """
    + ", ".join(f"min(md5('{i}|' || s)) AS sig_{i}" for i in range(8))
    + """ FROM sh GROUP BY doc_id),
        bands AS (SELECT * FROM ("""
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, sig_{2*b} || '#' || sig_{2*b+1} AS band_key FROM sigs"
        for b in range(4)
    )
    + f""") QUALIFY count(*) OVER (PARTITION BY band_idx, band_key)
                        <= {_MAX_BUCKET}),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b
                   ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
        w3 AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') ws FROM documents),
        sh3 AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') s
                FROM w3, unnest(range(1, greatest(len(ws) - 3, 0) + 2)) t(i)),
        sets AS (SELECT doc_id, list_distinct(list(s)) sh FROM sh3 GROUP BY doc_id)"""
)

ORACLE_SQL: dict[str, str] = {
    "q01_scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-03-15'""",
    "q02_count_all": "SELECT count(*) AS n FROM orders",
    "q03_point_lookup": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey = 7""",
    "q04_topk_order": """
        SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        ORDER BY o_orderdate, o_orderkey LIMIT 100""",
    "q05_distinct": "SELECT DISTINCT event_type FROM events",
    "q06_first_wins": """
        SELECT o_custkey, first_orderkey FROM (
          SELECT o_custkey, o_orderkey AS first_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) rn
          FROM orders) WHERE rn = 1""",
    "q07_anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 400000)""",
    "q08_semi_join": """
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c_acctbal > 9000
          AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
    "q09_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""",
    "q10_broadcast_join": """
        SELECT p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""",
    "q11_multi_join": """
        SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 4) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""",
    "q12_window_topk": """
        SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) rnk
          FROM customer) WHERE rnk <= 3""",
    "q13_union_ragged": """
        SELECT c_name AS name, c_acctbal AS bal, c_mktsegment AS segment FROM customer
        UNION ALL
        SELECT s_name, s_acctbal, '' FROM supplier""",
    "q14_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q15_month_agg": """
        SELECT date_trunc('month', o_orderdate) AS mon, count(*) AS n,
               round(sum(o_totalprice), 4) AS total
        FROM orders GROUP BY 1""",
    "q16_string_funcs": """
        SELECT p_partkey, lower(p_name) AS name_lc, length(p_name) AS name_len,
               upper(p_brand) AS brand_uc, substring(p_type, 1, 5) AS type5
        FROM part WHERE p_size > 40""",
    "q17_case_when": """
        SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS bucket, count(*) AS n
        FROM orders GROUP BY 1""",
    "q18_tumbling_window": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
               count(*) AS n, round(avg(value), 4) AS avg_value
        FROM events GROUP BY 1, 2""",
    "q19_sessionize": """
        WITH g AS (
          SELECT user_id, event_id,
                 CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                        - CAST(floor(epoch(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events)
        SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM g GROUP BY user_id""",
    "q20_json_extract": """
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
               count(*) AS n
        FROM events GROUP BY 1""",
    "q21_exact_dedup": f"""
        SELECT md5({_NORM}) AS content_hash, min(doc_id) AS keeper,
               count(*) AS n_dups
        FROM documents GROUP BY 1""",
    "q22_minhash_sig": (
        "WITH " + _SHINGLE_CTE.format(k=3, km1=2) + """
        SELECT doc_id,
               min(md5('0|' || s)) AS sig_0, min(md5('1|' || s)) AS sig_1,
               min(md5('2|' || s)) AS sig_2, min(md5('3|' || s)) AS sig_3
        FROM sh GROUP BY doc_id"""
    ),
    "q23_lsh_pairs": (
        "WITH " + _SHINGLE_CTE.format(k=2, km1=1) + """,
        sigs AS (SELECT doc_id, """
        + ", ".join(f"min(md5('{i}|' || s)) AS sig_{i}" for i in range(8))
        + """ FROM sh GROUP BY doc_id),
        bands AS (SELECT * FROM ("""
        + " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band_idx, sig_{2*b} || '#' || sig_{2*b+1} AS band_key FROM sigs"
            for b in range(4)
        )
        + f""") QUALIFY count(*) OVER (PARTITION BY band_idx, band_key)
                        <= {_MAX_BUCKET})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id"""
    ),
    # same banded candidate set as q23, then exact 3-gram Jaccard
    # verify on just those pairs (the LSH → verify composition)
    "q24_ngram_jaccard": "WITH " + _LSH_CAND_SETS + """
        SELECT c.id_a, c.id_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                     len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM cand c
        JOIN sets a ON a.doc_id = c.id_a
        JOIN sets b ON b.doc_id = c.id_b""",
    # q24's verified pairs (jaccard ≥ 0.5) → connected components by
    # recursive min-reachability; every doc labeled with its
    # component's min doc_id (isolated docs label themselves)
    "q40_dup_clusters": "WITH RECURSIVE " + _LSH_CAND_SETS + """,
        ver AS (SELECT c.id_a, c.id_b
                FROM cand c
                JOIN sets a ON a.doc_id = c.id_a
                JOIN sets b ON b.doc_id = c.id_b
                WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                      len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5),
        e AS (SELECT id_a AS ea, id_b AS eb FROM ver
              UNION SELECT id_b, id_a FROM ver),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.n, e.eb FROM reach r JOIN e ON r.m = e.ea)
        SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n""",
    "q27_embedding_topk": """
        WITH q AS (SELECT embedding::DOUBLE[] qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, round((CASE WHEN embedding::DOUBLE[] IS NULL OR q.qe IS NULL OR list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0 OR list_dot_product(q.qe, q.qe) = 0 THEN NULL ELSE list_cosine_similarity(embedding::DOUBLE[], q.qe) END), 4) AS score
        FROM embeddings, q
        ORDER BY score DESC, vec_id LIMIT 10""",
    "q25_simhash": (
        "WITH " + _SIMHASH_CTE + """
        SELECT doc_id,
               CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                         THEN u - 18446744073709551616::HUGEINT
                         ELSE u END AS BIGINT) AS simhash
        FROM usig"""
    ),
    "q26_simhash_pairs": (
        "WITH " + _SIMHASH_CTE + f""",
        bands AS (SELECT doc_id, u, b.range AS band_idx,
                         (u >> (b.range * 8)) & 255 AS band_key
                  FROM usig, range(8) b
                  QUALIFY count(*) OVER (PARTITION BY b.range,
                          (u >> (b.range * 8)) & 255) <= {_MAX_BUCKET})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.u, b.u)) AS INT) AS hamming
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.u, b.u)) <= 8"""
    ),
    # IVF assignment (cosine argmax over the first-8 centroids), probe
    # the 3 closest buckets, exact top-10 within them — mirrors
    # similarity.ivf_assign/ivf_topk
    "q28_ivf_topk": """
        WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
                   FROM embeddings WHERE vec_id < 8),
        q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        assign AS (
          SELECT e.vec_id, any_value(e.embedding::DOUBLE[]) AS ve,
                 arg_max(c.cid, (CASE WHEN e.embedding::DOUBLE[] IS NULL OR c.ce IS NULL OR list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.ce, c.ce) = 0 THEN NULL ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.ce) END))
                   AS bucket
          FROM embeddings e, c GROUP BY e.vec_id),
        probe AS (SELECT c.cid FROM c, q
                  ORDER BY (CASE WHEN c.ce IS NULL OR q.qe IS NULL OR list_dot_product(c.ce, c.ce) = 0 OR list_dot_product(q.qe, q.qe) = 0 THEN NULL ELSE list_cosine_similarity(c.ce, q.qe) END) DESC LIMIT 3)
        SELECT a.vec_id, round((CASE WHEN a.ve IS NULL OR q.qe IS NULL OR list_dot_product(a.ve, a.ve) = 0 OR list_dot_product(q.qe, q.qe) = 0 THEN NULL ELSE list_cosine_similarity(a.ve, q.qe) END), 4) AS score
        FROM assign a, q
        WHERE a.bucket IN (SELECT cid FROM probe)
        ORDER BY score DESC, a.vec_id LIMIT 10""",
    # same-bucket candidate pairs (bucket-capped) + exact cosine ≥ threshold
    "q29_embedding_neardup": f"""
        WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
                   FROM embeddings WHERE vec_id < 8),
        assign AS (
          SELECT e.vec_id, any_value(e.embedding::DOUBLE[]) AS ve,
                 arg_max(c.cid, (CASE WHEN e.embedding::DOUBLE[] IS NULL OR c.ce IS NULL OR list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.ce, c.ce) = 0 THEN NULL ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.ce) END))
                   AS bucket
          FROM embeddings e, c GROUP BY e.vec_id
          QUALIFY count(*) OVER (PARTITION BY bucket) <= {_MAX_BUCKET})
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round((CASE WHEN a.ve IS NULL OR b.ve IS NULL OR list_dot_product(a.ve, a.ve) = 0 OR list_dot_product(b.ve, b.ve) = 0 THEN NULL ELSE list_cosine_similarity(a.ve, b.ve) END), 4) AS score
        FROM assign a JOIN assign b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round((CASE WHEN a.ve IS NULL OR b.ve IS NULL OR list_dot_product(a.ve, a.ve) = 0 OR list_dot_product(b.ve, b.ve) = 0 THEN NULL ELSE list_cosine_similarity(a.ve, b.ve) END), 4) >= 0.35""",
    "q30_token_count": """
        SELECT doc_id, len(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')) AS n_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
        FROM documents""",
    "q31_quality": """
        SELECT doc_id, length(text) AS n_chars,
           round(length(text)::DOUBLE /
                 greatest(len(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')), 1), 4) AS mean_word_len,
           round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE /
                 greatest(length(text), 1), 4) AS punct_ratio,
           round(length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE /
                 greatest(length(text), 1), 4) AS upper_ratio,
           round(length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE /
                 greatest(length(text), 1), 4) AS space_ratio
        FROM documents""",
    "q32_lang_id": (
        "WITH toks AS (SELECT doc_id, list_distinct(string_split("
        + _NORM
        + ", ' ')) tk FROM documents), s AS (SELECT doc_id, "
        + ", ".join(
            "len(list_intersect(tk, ["
            + ", ".join(f"'{w}'" for w in ws)
            + f"])) AS s_{lang}"
            for lang, ws in sorted(X.LANG_STOPWORDS.items())
        )
        + " FROM toks)\n        SELECT doc_id,\n"
        + "               CASE WHEN best IS NULL THEN NULL "
        + " ".join(
            f"WHEN s_{lang} = best THEN '{lang}'"
            for lang in sorted(X.LANG_STOPWORDS)[:-1]
        )
        + f" ELSE '{sorted(X.LANG_STOPWORDS)[-1]}' END AS pred_lang,\n"
        + "               best AS hits\n        FROM (SELECT *, greatest("
        + ", ".join(f"s_{lang}" for lang in sorted(X.LANG_STOPWORDS))
        + ") best FROM s)"
    ),
    "q33_fingerprint": (
        f"WITH n AS (SELECT doc_id, {_NORM} AS text FROM documents), "
        + _SHINGLE_CTE.format(k=5, km1=4).replace("FROM documents", "FROM n")
        + f"""
        SELECT n.doc_id, md5(n.text) AS content_hash,
               (SELECT min(md5(s)) FROM sh WHERE sh.doc_id IS NOT DISTINCT FROM n.doc_id) AS structural_hash
        FROM n"""
    ),
    "q34_word_freq": f"""
        WITH w AS (SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents)
        SELECT word, count(*) AS n FROM w WHERE word != ''
        GROUP BY word HAVING count(*) >= 5""",
    "q37_hash_sample": (
        "SELECT doc_id FROM documents WHERE md5(COALESCE(CAST(doc_id AS VARCHAR), '')) < '"
        + SA._hex_threshold(0.1) + "'"
    ),
    "q38_stratified_sample": (
        "SELECT lang, count(*) AS n_kept FROM documents "
        "WHERE md5(COALESCE(CAST(doc_id AS VARCHAR), '')) < CASE "
        + " ".join(
            f"WHEN lang = '{v}' THEN '{SA._hex_threshold(r)}'"
            for v, r in sorted(_STRAT_RATES.items())
        )
        + f" ELSE '{SA._hex_threshold(0.05)}' END GROUP BY lang"
    ),
    "q39_pack_sequences": """
        WITH t AS (SELECT doc_id, len(string_split(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'), ' ')) AS n FROM documents),
        c AS (SELECT doc_id, n,
                     sum(n) OVER (ORDER BY doc_id NULLS FIRST
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n AS cum_before
              FROM t)
        SELECT CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
               count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS pack_tokens
        FROM c GROUP BY 1""",
    # decode → resize plan: the stub decoder's dims (md5-derived, see
    # q36) fit into a 64×64 box aspect-preserved, floor(dim·scale)
    "q41_media_resize": f"""
        WITH m AS (SELECT COALESCE(CAST(doc_id AS VARCHAR), '') AS did,
                          md5(COALESCE(CAST(doc_id AS VARCHAR), '')) AS kh,
                          md5(coalesce(text, '')) AS ph
                   FROM documents),
        dec AS (SELECT 'm:' || did AS media_id,
                       ['image','audio','video'][({_hexbyte('kh', 0)} % 3) + 1] AS kind,
                       CAST(16 + {_hexbyte('ph', 0)} % 64 AS INT) AS width,
                       CAST(16 + {_hexbyte('ph', 1)} % 64 AS INT) AS height
                FROM m)
        SELECT media_id, kind, width AS src_w, height AS src_h,
               CAST(CASE WHEN width <= 64 AND height <= 64 THEN width
                         WHEN width * 64.0 >= height * 64.0 THEN 64
                         ELSE floor(width * 64.0 / height) END AS INT) AS out_w,
               CAST(CASE WHEN width <= 64 AND height <= 64 THEN height
                         WHEN width * 64.0 >= height * 64.0
                              THEN floor(height * 64.0 / width)
                         ELSE 64 END AS INT) AS out_h,
               round(s, 6) AS scale
        FROM (SELECT *, least(64.0 / width, 64.0 / height, 1.0) AS s FROM dec)""",
    # decode → stride-2 frame sample: one row per kept frame index
    "q42_frame_sample": f"""
        WITH m AS (SELECT COALESCE(CAST(doc_id AS VARCHAR), '') AS did,
                          md5(COALESCE(CAST(doc_id AS VARCHAR), '')) AS kh,
                          md5(coalesce(text, '')) AS ph
                   FROM documents),
        dec AS (SELECT 'm:' || did AS media_id,
                       ['image','audio','video'][({_hexbyte('kh', 0)} % 3) + 1] AS kind,
                       CAST(CASE WHEN {_hexbyte('kh', 0)} % 3 = 0 THEN 1
                                 ELSE 1 + {_hexbyte('ph', 2)} % 8 END AS INT) AS n_frames
                FROM m)
        SELECT media_id, kind, CAST(t.fi AS INT) AS frame_idx
        FROM dec, unnest(range(0, n_frames, 2)) t(fi)""",
    # the stub decoder's md5(payload)-derived metadata/features, as one
    # SQL expression (payload = utf-8 bytes of text, so md5(text) in
    # DuckDB hashes the identical bytes); kind routes by md5(doc_id)
    "q36_media_features": f"""
        WITH m AS (SELECT COALESCE(CAST(doc_id AS VARCHAR), '') AS did,
                          md5(COALESCE(CAST(doc_id AS VARCHAR), '')) AS kh,
                          md5(coalesce(text, '')) AS ph
                   FROM documents)
        SELECT 'm:' || did AS media_id,
               ['image','audio','video'][({_hexbyte('kh', 0)} % 3) + 1] AS kind,
               CAST(16 + {_hexbyte('ph', 0)} % 64 AS INT) AS width,
               CAST(16 + {_hexbyte('ph', 1)} % 64 AS INT) AS height,
               CAST(CASE WHEN {_hexbyte('kh', 0)} % 3 = 0 THEN 1
                         ELSE 1 + {_hexbyte('ph', 2)} % 8 END AS INT) AS n_frames,
               {', '.join(f"CAST({_hexbyte('ph', i)} AS INT) AS f{i}" for i in range(8))}
        FROM m""",
    "q35_media_stats": """
        WITH m AS (SELECT ['image','audio','video'][(coalesce(doc_id, 0) % 3 + 1)::INT] AS kind,
                          octet_length(encode(coalesce(text, ''))) AS n_bytes
                   FROM documents)
        SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               round(avg(n_bytes), 4) AS avg_bytes
        FROM m GROUP BY kind""",
    # within-doc 3-gram repetition over NORMALIZED text (k=3 → window 2)
    "q43_repetition_stats": (
        f"WITH n AS (SELECT doc_id, {_NORM} AS text FROM documents),"
        + _SHINGLE_CTE.format(k=3, km1=2).replace("FROM documents", "FROM n")
        + """
        SELECT doc_id, count(*) AS n_ngrams,
               count(DISTINCT s) AS n_distinct,
               round(1 - count(DISTINCT s)::DOUBLE / greatest(count(*), 1), 4)
                   AS rep_ratio
        FROM sh GROUP BY doc_id"""
    ),
    # benchmark = 2% salted hash-sample; contamination = distinct shared
    # 5-grams (k=5 → window 4) between each non-benchmark doc and the
    # benchmark's distinct shingle set
    "q44_ngram_contamination": (
        "WITH bench_ids AS (SELECT doc_id FROM documents "
        "WHERE md5('bench' || COALESCE(CAST(doc_id AS VARCHAR), '')) < '"
        + SA._hex_threshold(0.02)
        + f"'), n AS (SELECT doc_id, {_NORM} AS text FROM documents),"
        + _SHINGLE_CTE.format(k=5, km1=4).replace("FROM documents", "FROM n")
        + """,
        shd AS (SELECT DISTINCT doc_id, s FROM sh WHERE s != ''),
        bsh AS (SELECT DISTINCT s FROM shd
                WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
        corpus AS (SELECT doc_id FROM documents
                   WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)),
        nsh AS (SELECT doc_id, count(*) AS ns FROM shd GROUP BY doc_id),
        hits AS (SELECT shd.doc_id, count(*) AS n FROM shd
                 JOIN bsh USING (s)
                 WHERE shd.doc_id IN (SELECT doc_id FROM corpus)
                 GROUP BY shd.doc_id)
        SELECT c.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
               CAST(coalesce(s.ns, 0) AS BIGINT) AS n_shingles,
               round(coalesce(h.n, 0)::DOUBLE
                     / greatest(coalesce(s.ns, 0), 1), 4) AS contam_frac,
               coalesce(h.n, 0) * """
        + str(Fraction(str(_CONTAM_MAX_FRAC)).denominator)
        + " > "
        + str(Fraction(str(_CONTAM_MAX_FRAC)).numerator)
        + """ * coalesce(s.ns, 0) AS contaminated
        FROM corpus c
        LEFT JOIN hits h ON c.doc_id IS NOT DISTINCT FROM h.doc_id
        LEFT JOIN nsh s ON c.doc_id IS NOT DISTINCT FROM s.doc_id"""
    ),
    # per-source mixture-weighting rollup; dup rate over normalized-
    # content hashes
    "q45_source_mix": f"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               round(avg(length(text)), 2) AS mean_chars,
               count(DISTINCT lang) AS n_langs,
               round(1 - count(DISTINCT md5({_NORM}))::DOUBLE / count(*), 4)
                   AS dup_rate
        FROM documents GROUP BY source""",
    # deterministic injected PII (same expressions as the Spark side),
    # then RE2 detection counts + md5 of the redacted text. The pattern
    # strings are interpolated from the SAME Python constants the engine
    # uses, so both engines run byte-identical regexes.
    "q46_pii_scrub": f"""
        WITH inj AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 3 = 0
                    THEN ' reach me at user' || CAST(doc_id AS VARCHAR)
                         || '@mail.example.org' ELSE '' END
            || CASE WHEN doc_id % 5 = 0
                    THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                         || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                    THEN ' dial +1 555 867 530' || CAST(doc_id % 10 AS VARCHAR)
                    ELSE '' END AS text
          FROM documents),
        st AS (SELECT doc_id, coalesce(text, '') AS text,
                      regexp_replace(coalesce(text, ''), '{SC.EMAIL_RE}', '<EMAIL>', 'g')
                          AS after_email
               FROM inj),
        st2 AS (SELECT *, regexp_replace(after_email, '{SC.IPV4_RE}',
                                         '<IP>', 'g') AS after_ip
                FROM st),
        cnt AS (SELECT doc_id,
                       len(regexp_extract_all(text, '{SC.EMAIL_RE}')) AS n_emails,
                       len(regexp_extract_all(after_email, '{SC.IPV4_RE}')) AS n_ipv4,
                       len(regexp_extract_all(after_ip, '{SC.PHONE_RE}')) AS n_phones,
                       md5(regexp_replace(after_ip, '{SC.PHONE_RE}',
                                          '<PHONE>', 'g')) AS redacted_hash
                FROM st2)
        SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
               CAST(n_ipv4 AS BIGINT) AS n_ipv4,
               CAST(n_phones AS BIGINT) AS n_phones, redacted_hash,
               (n_emails + n_ipv4 + n_phones) > 0 AS any_pii
        FROM cnt""",
    # CCNet-style paragraph dedup: 20-word segments of the normalized
    # text, first occurrence corpus-wide wins (min (doc_id, pos) ==
    # row_number 1), per-doc survival stats + hash of retained text
    "q47_paragraph_dedup": f"""
        WITH nrm AS (SELECT doc_id, {_NORM} AS text FROM documents),
        w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM nrm),
        segs AS (SELECT doc_id, CAST(t.i AS INT) AS pos,
                        array_to_string(ws[t.i*20+1 : t.i*20+20], ' ') AS seg
                 FROM w, unnest(range(greatest(
                      CAST(ceil(len(ws) / 20.0) AS BIGINT), 1))) t(i)),
        segf AS (SELECT doc_id, pos, seg, md5(seg) AS h
                 FROM segs WHERE seg <> ''),
        marked AS (SELECT doc_id, pos, seg,
                          row_number() OVER (PARTITION BY h
                                             ORDER BY doc_id, pos) = 1 AS kept
                   FROM segf),
        per AS (SELECT doc_id, count(*) AS n_segs,
                       sum(CASE WHEN kept THEN 0 ELSE 1 END) AS n_dup_segs,
                       md5(coalesce(string_agg(CASE WHEN kept THEN seg END,
                                               ' ' ORDER BY pos), ''))
                           AS retained_hash
                FROM marked GROUP BY doc_id)
        SELECT d.doc_id, CAST(coalesce(p.n_segs, 0) AS BIGINT) AS n_segs,
               CAST(coalesce(p.n_dup_segs, 0) AS BIGINT) AS n_dup_segs,
               coalesce(p.retained_hash, md5('')) AS retained_hash
        FROM documents d LEFT JOIN per p USING (doc_id)""",
    # 64-word chunks at stride 48 over normalized text; n<=64 words is
    # one chunk, else 1 + ceil((n-64)/48) — same integer arithmetic
    "q48_chunk_documents": f"""
        WITH nrm AS (SELECT doc_id, {_NORM} AS text FROM documents
                     WHERE trim({_NORM}) <> ''),
        w AS (SELECT doc_id, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS n
              FROM nrm),
        c AS (SELECT doc_id, CAST(t.i AS INT) AS chunk_id,
                     ws[t.i*48+1 : t.i*48+64] AS cw
              FROM w, unnest(range(CASE WHEN n <= 64 THEN 1
                                        ELSE (n - 64 + 47) // 48 + 1 END)) t(i))
        SELECT doc_id, chunk_id, CAST(len(cw) AS BIGINT) AS n_words,
               md5(array_to_string(cw, ' ')) AS chunk_hash
        FROM c""",
    # unigram-LM mean negative log-likelihood under the corpus's own
    # unigram distribution (no smoothing needed — model fit on itself)
    "q49_lm_score": f"""
        WITH nrm AS (SELECT doc_id, {_NORM} AS text FROM documents),
        toks AS (SELECT doc_id, t.w FROM nrm,
                 unnest(string_split(text, ' ')) t(w) WHERE t.w <> ''),
        tf AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
        fr AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        tot AS (SELECT sum(n) AS t FROM fr),
        sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                      round(sum(c * -ln(n::DOUBLE / t)) / sum(c), 4) AS avg_nll
               FROM tf JOIN fr USING (w) CROSS JOIN tot GROUP BY doc_id)
        SELECT d.doc_id, coalesce(s.n_words, 0) AS n_words,
               coalesce(s.avg_nll, 0.0) AS avg_nll
        FROM documents d LEFT JOIN sc s USING (doc_id)""",
    # source-pair syndication at 20-word-segment granularity: distinct
    # (source, segment-hash) first, so the self-join fan-out per hash is
    # bounded by the source count
    "q51_cross_source_overlap": f"""
        WITH nrm AS (SELECT source, {_NORM} AS text FROM documents),
        w AS (SELECT source, string_split(text, ' ') AS ws FROM nrm),
        segs AS (SELECT source AS s,
                        array_to_string(ws[t.i*20+1 : t.i*20+20], ' ') AS seg
                 FROM w, unnest(range(greatest(
                      CAST(ceil(len(ws) / 20.0) AS BIGINT), 1))) t(i)),
        sh AS (SELECT DISTINCT s, md5(seg) AS h FROM segs WHERE seg <> '')
        SELECT a.s AS source_a, b.s AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b ON a.h = b.h AND a.s < b.s
        GROUP BY a.s, b.s""",
    # top-3 TF-IDF keywords; ties by word ascending (total order)
    "q52_tfidf_topk": f"""
        WITH nrm AS (SELECT doc_id, {_NORM} AS text FROM documents),
        toks AS (SELECT doc_id, t.w FROM nrm,
                 unnest(string_split(text, ' ')) t(w) WHERE t.w <> ''),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
        dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        nq AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
        sc AS (SELECT doc_id, w, tf, df,
                      round(tf * ln(nd::DOUBLE / df), 4) AS score
               FROM tf JOIN dfq USING (w) CROSS JOIN nq),
        rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, w ASC) AS rn FROM sc)
        SELECT doc_id, CAST(rn AS INT) AS "rank", w AS word,
               CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
        FROM rk WHERE rn <= 3""",
    # per-label centroid (position-wise mean) → cosine of each vector
    # to its label's centroid (1-based list indexing over range())
    "q53_centroid_outliers": """
        WITH cells AS (SELECT label, t.i AS pos,
                              avg(embedding[t.i + 1]::DOUBLE) AS m
                       FROM embeddings, unnest(range(len(embedding))) t(i)
                       GROUP BY label, t.i),
        cents AS (SELECT label, list(m ORDER BY pos) AS c
                  FROM cells GROUP BY label)
        SELECT e.vec_id, e.label,
               round((CASE WHEN e.embedding::DOUBLE[] IS NULL OR c.c IS NULL OR list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.c, c.c) = 0 THEN NULL ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.c) END), 4)
                   AS centroid_cos
        FROM embeddings e JOIN cents c USING (label)""",
}

# Composed oracles — DuckDB permits a WITH chain inside a derived table,
# so these wrap the already-verified q40 / q49 SQL verbatim (single
# source of truth for the shared semantics).
ORACLE_SQL["q50_dedup_keep_corpus"] = (
    """
    SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
           (doc_id = cluster_id) AS is_keeper
    FROM ("""
    + ORACLE_SQL["q40_dup_clusters"]
    + ")"
)
# rank-based percentile gate: row_number over the TOTAL order
# (n_words = 0, avg_nll, doc_id) — empty docs rank LAST, never gaming
# the gate with their coalesced 0.0 score; keep = rank < ceil(n·0.9)
# with DECIMAL arithmetic (the Spark side uses Fraction for the same
# decimal-exact ceil)
ORACLE_SQL["q54_quality_gate"] = (
    """
    WITH sc AS (SELECT * FROM ("""
    + ORACLE_SQL["q49_lm_score"]
    + """)),
    nq AS (SELECT count(*) AS nd FROM sc),
    rk AS (SELECT *, row_number()
                     OVER (ORDER BY (n_words = 0), avg_nll, doc_id NULLS FIRST) - 1 AS rk
           FROM sc)
    SELECT doc_id, n_words, avg_nll,
           round(rk::DOUBLE / greatest(nd - 1, 1), 6) AS quality_pct,
           rk < ceil(nd * 0.9) AS keep
    FROM rk CROSS JOIN nq"""
)

# q55: the full corpus-build arc as ONE CTE chain — each stage is the
# SAME SQL shape as its per-stage oracle (q46 scrub, q47 dedup, q43
# repetition, q44 contamination, q49 LM score, q54 rank gate, q37
# sample, q48 chunk, q39 pack), re-rooted on the previous stage's CTE.
# Gate cutoffs are exact integer cross-multiplications from the same
# Fraction constants the Spark pipeline uses; the percentile ceil runs
# in DuckDB DECIMAL (exact, matching the Spark side's Fraction ceil).
# All survivors have n_words > 0 (empty retained text is dropped at the
# dedup stage), so the q54 (n_words = 0) empty-last key is constant
# here and the rank order reduces to (avg_nll, doc_id).
_Q55_REP = Fraction("0.3")
_Q55_CONTAM = Fraction(str(_CONTAM_MAX_FRAC))
ORACLE_SQL["q55_corpus_build"] = f"""
    WITH bench_ids AS (SELECT doc_id FROM documents
                       WHERE md5('{_BENCH_SALT}' || COALESCE(CAST(doc_id AS VARCHAR), ''))
                             < '{SA._hex_threshold(_BENCH_RATE)}'),
    scrub AS (SELECT doc_id,
                     regexp_replace(regexp_replace(regexp_replace(
                         text, '{SC.EMAIL_RE}', '<EMAIL>', 'g'),
                         '{SC.IPV4_RE}', '<IP>', 'g'),
                         '{SC.PHONE_RE}', '<PHONE>', 'g') AS text
              FROM documents
              WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)),
    nrm AS (SELECT doc_id, {_NORM} AS text FROM scrub),
    w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM nrm),
    segs AS (SELECT doc_id, CAST(t.i AS INT) AS pos,
                    array_to_string(ws[t.i*20+1 : t.i*20+20], ' ') AS seg
             FROM w, unnest(range(greatest(
                  CAST(ceil(len(ws) / 20.0) AS BIGINT), 1))) t(i)),
    segf AS (SELECT doc_id, pos, seg, md5(seg) AS h
             FROM segs WHERE seg <> ''),
    marked AS (SELECT doc_id, pos, seg,
                      row_number() OVER (PARTITION BY h
                                         ORDER BY doc_id, pos) = 1 AS kept
               FROM segf),
    retn AS (SELECT doc_id, text FROM (
                 SELECT doc_id, string_agg(CASE WHEN kept THEN seg END,
                                           ' ' ORDER BY pos) AS text
                 FROM marked GROUP BY doc_id)
             WHERE text IS NOT NULL AND text <> ''),
    rw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM retn),
    rsh AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS s
            FROM rw, unnest(range(1, greatest(len(ws) - 3, 0) + 2)) t(i)),
    rep AS (SELECT doc_id, count(*) AS n, count(DISTINCT s) AS d
            FROM rsh GROUP BY doc_id),
    repk AS (SELECT doc_id FROM rep
             WHERE (n - d) * {_Q55_REP.denominator}
                   <= {_Q55_REP.numerator} * n),
    bn AS (SELECT doc_id, {_NORM} AS text FROM documents
           WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
    bw AS (SELECT string_split(text, ' ') AS ws FROM bn),
    bshf AS (SELECT DISTINCT array_to_string(ws[i:i+4], ' ') AS s
             FROM bw, unnest(range(1, greatest(len(ws) - 5, 0) + 2)) t(i)),
    cw AS (SELECT r.doc_id, string_split(r.text, ' ') AS ws
           FROM retn r JOIN repk USING (doc_id)),
    cshf AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS s
             FROM cw, unnest(range(1, greatest(len(ws) - 5, 0) + 2)) t(i)),
    cn AS (SELECT doc_id, count(*) AS ns FROM cshf
           WHERE s <> '' GROUP BY doc_id),
    chit AS (SELECT doc_id, count(*) AS nh FROM cshf
             JOIN (SELECT s FROM bshf WHERE s <> '') b USING (s)
             GROUP BY doc_id),
    surv AS (SELECT r.doc_id, r.text
             FROM retn r JOIN repk USING (doc_id)
             LEFT JOIN cn USING (doc_id) LEFT JOIN chit USING (doc_id)
             WHERE coalesce(chit.nh, 0) * {_Q55_CONTAM.denominator}
                   <= {_Q55_CONTAM.numerator} * coalesce(cn.ns, 0)),
    toks AS (SELECT doc_id, t.w FROM surv,
             unnest(string_split(text, ' ')) t(w) WHERE t.w <> ''),
    tfq AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    frq AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
    tot AS (SELECT sum(n) AS t FROM frq),
    scq AS (SELECT doc_id,
                   round(sum(c * -ln(n::DOUBLE / t)) / sum(c), 4) AS avg_nll
            FROM tfq JOIN frq USING (w) CROSS JOIN tot GROUP BY doc_id),
    nq AS (SELECT count(*) AS nd FROM scq),
    rkq AS (SELECT doc_id,
                   row_number() OVER (ORDER BY avg_nll, doc_id) - 1 AS rk
            FROM scq),
    keepq AS (SELECT doc_id FROM rkq CROSS JOIN nq
              WHERE rk < ceil(nd * 0.9)),
    samp AS (SELECT doc_id FROM keepq
             WHERE md5('mix' || COALESCE(CAST(doc_id AS VARCHAR), ''))
                   < '{SA._hex_threshold(0.5)}'),
    chw AS (SELECT s.doc_id, string_split(s.text, ' ') AS ws,
                   len(string_split(s.text, ' ')) AS n
            FROM surv s JOIN samp USING (doc_id)),
    ch AS (SELECT doc_id, CAST(t.i AS INT) AS chunk_id,
                  ws[t.i*48+1 : t.i*48+64] AS cw
           FROM chw, unnest(range(CASE WHEN n <= 64 THEN 1
                                       ELSE (n - 64 + 47) // 48 + 1 END)) t(i)),
    chx AS (SELECT doc_id, chunk_id, CAST(len(cw) AS BIGINT) AS n_words,
                   md5(array_to_string(cw, ' ')) AS chunk_hash
            FROM ch),
    packed AS (SELECT *, sum(n_words) OVER (ORDER BY doc_id, chunk_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_words AS cum_before
               FROM chx)
    SELECT doc_id, chunk_id, n_words, chunk_hash,
           CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id
    FROM packed"""

# q56: the same deterministic span lift (word index ≡ 3 or 4 mod 7 ⇒
# media), then nearest-text-span selection via two IGNORE NULLS
# running-value windows per document — the SQL mirror of
# caption_candidates
ORACLE_SQL["q56_caption_align"] = """
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tok AS (SELECT doc_id, t.i AS off, ws[t.i + 1] AS w
            FROM s, unnest(range(len(ws))) t(i)),
    lab AS (SELECT doc_id, off, w,
                   CASE WHEN off % 7 IN (3, 4) THEN 'media' ELSE 'text' END AS kind
            FROM tok),
    j AS (SELECT doc_id, off, w, kind,
            last_value(CASE WHEN kind = 'text' THEN off END IGNORE NULLS)
                OVER prevw AS poff,
            last_value(CASE WHEN kind = 'text' THEN w END IGNORE NULLS)
                OVER prevw AS ptxt,
            first_value(CASE WHEN kind = 'text' THEN off END IGNORE NULLS)
                OVER nextw AS noff,
            first_value(CASE WHEN kind = 'text' THEN w END IGNORE NULLS)
                OVER nextw AS ntxt
          FROM lab
          WINDOW prevw AS (PARTITION BY doc_id ORDER BY off
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 nextw AS (PARTITION BY doc_id ORDER BY off
                           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT doc_id, 'm-' || md5(w) AS media_ref, CAST(off AS INT) AS media_offset,
           CASE WHEN poff IS NOT NULL AND (noff IS NULL OR off - poff <= noff - off)
                THEN ptxt ELSE ntxt END AS caption,
           CAST(CASE WHEN poff IS NOT NULL
                          AND (noff IS NULL OR off - poff <= noff - off)
                THEN poff ELSE noff END AS INT) AS caption_offset,
           CAST(CASE WHEN poff IS NOT NULL
                          AND (noff IS NULL OR off - poff <= noff - off)
                THEN off - poff ELSE noff - off END AS INT) AS distance
    FROM j WHERE kind = 'media' AND (poff IS NOT NULL OR noff IS NOT NULL)"""

# q57: the same dup-injection layer, then the two-level dup count
# (GROUP BY (source, text-hash) → GROUP BY source) and the exact
# integer keep rule (Fraction 0.12 = 3/25 cross-multiplied)
ORACLE_SQL["q57_source_gate"] = f"""
    WITH inj AS (SELECT doc_id, source,
            CASE WHEN substr(md5('dup' || CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0', '1', '2', '3')
                 THEN repeat('syndicated boilerplate ', 24) || 'from ' || coalesce(source, '')
                 ELSE text END AS text
          FROM documents),
    pt AS (SELECT source, md5(text) AS th, count(*) AS n,
                  sum(len(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' '))) AS wsum
           FROM inj GROUP BY source, md5(text)),
    rep AS (SELECT source, sum(n) AS src_n_docs, sum(wsum) AS words,
                   count(*) AS dist
            FROM pt GROUP BY source),
    g AS (SELECT source, CAST(src_n_docs AS BIGINT) AS src_n_docs,
                 round(words::DOUBLE / src_n_docs, 4) AS src_mean_words,
                 round((src_n_docs - dist)::DOUBLE / src_n_docs, 4)
                     AS src_dup_frac,
                 (words >= {_SRC_MIN_MEAN_WORDS} * src_n_docs)
                 AND ((src_n_docs - dist) * {Fraction(_SRC_MAX_DUP_FRAC).denominator}
                      <= {Fraction(_SRC_MAX_DUP_FRAC).numerator} * src_n_docs)
                     AS keep
          FROM rep)
    SELECT d.doc_id, d.source, g.src_n_docs, g.src_mean_words,
           g.src_dup_frac, g.keep
    FROM documents d JOIN g ON d.source IS NOT DISTINCT FROM g.source"""

# q58: one window-function running sum per source in md5 order — the
# oracle form of the keyed two-level cumsum; keep iff the tokens
# BEFORE the doc are under its source's budget
ORACLE_SQL["q58_token_budget_mix"] = f"""
    WITH ord AS (SELECT doc_id, source,
                        CAST(len(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens,
                        md5('budget' || COALESCE(CAST(doc_id AS VARCHAR), '')) AS h
                 FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 coalesce(sum(n_tokens) OVER (
                     PARTITION BY source ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_before
          FROM ord)
    SELECT doc_id, source, n_tokens, CAST(cum_before AS BIGINT) AS cum_before
    FROM c
    WHERE cum_before < CASE source
        {' '.join(f"WHEN '{s}' THEN {b}" for s, b in sorted(_MIX_BUDGETS.items()))}
        ELSE 400 END"""

# q59: the q56 span lift reduced to per-doc aggregates (offset ≡ 3 or 4
# mod 7 ⇒ media span)
ORACLE_SQL["q59_interleave_stats"] = """
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tok AS (SELECT doc_id, t.i AS off FROM s, unnest(range(len(ws))) t(i)),
    agg AS (SELECT doc_id, count(*) AS n_spans,
                   sum(CASE WHEN off % 7 IN (3, 4) THEN 1 ELSE 0 END) AS n_media,
                   min(CASE WHEN off % 7 IN (3, 4) THEN off END) AS fmo
            FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST(n_spans AS INT) AS n_spans,
           CAST(n_media AS INT) AS n_media,
           round(n_media::DOUBLE / greatest(n_spans, 1), 4) AS media_frac,
           CAST(fmo AS INT) AS first_media_offset
    FROM agg"""

# q60: q40's verified near-dup pairs (shared _LSH_CAND_SETS chain,
# round(·,6) ≥ 0.5) restricted to cross-source pairs, counted per
# unordered source pair
ORACLE_SQL["q60_cross_source_neardup"] = "WITH " + _LSH_CAND_SETS + """,
    ver AS (SELECT c.id_a, c.id_b
            FROM cand c
            JOIN sets a ON a.doc_id = c.id_a
            JOIN sets b ON b.doc_id = c.id_b
            WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                  len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5)
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_neardup_pairs
    FROM ver v JOIN documents da ON da.doc_id = v.id_a
               JOIN documents db ON db.doc_id = v.id_b
    WHERE da.source <> db.source
    GROUP BY 1, 2"""

# q61: the injection coin + boilerplate expression verbatim, then the
# snapshot split (doc_id%10), batch hashes probed against the corpus'
# distinct hash set, in-batch first-wins via GROUP BY min — the SQL
# form of dedup_incremental's broadcast-batch plan
ORACLE_SQL["q61_incremental_dedup"] = f"""
    WITH inj AS (SELECT doc_id,
            CASE WHEN substr(md5('inc' || CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0', '1', '2', '3')
                 THEN 'snapshot boilerplate variant '
                      || CAST(doc_id % 7 AS VARCHAR) || repeat(' filler', 20)
                 ELSE text END AS text
          FROM documents),
    h AS (SELECT doc_id, md5(COALESCE({_NORM}, '')) AS content_hash FROM inj),
    corpus AS (SELECT DISTINCT content_hash FROM h WHERE doc_id % 10 < 8),
    batch AS (SELECT doc_id, content_hash FROM h WHERE doc_id % 10 >= 8),
    k AS (SELECT content_hash, min(doc_id) AS keeper FROM batch GROUP BY 1),
    sel AS (SELECT b.doc_id, b.content_hash,
                   b.content_hash IN (SELECT content_hash FROM corpus)
                       AS in_corpus,
                   b.doc_id = k.keeper AS batch_keeper
            FROM batch b JOIN k USING (content_hash))
    SELECT doc_id, content_hash, in_corpus, batch_keeper,
           (NOT in_corpus) AND batch_keeper AS keep
    FROM sel"""

# q62: the mutation coin verbatim, then the five Gopher rules in the
# SAME exact integer cross-multiplications as heuristic_quality_gate's
# defaults (min_words 5, max 100000, mean word len in [2/1, 12/1],
# symbol ratio ≤ 1/10, alpha frac ≥ 4/5, ≥2 distinct stopword hits)
_Q62_STOPS = "[" + ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS["en"]) + "]"
ORACLE_SQL["q62_heuristic_gate"] = f"""
    WITH mut AS (SELECT doc_id,
            CASE substr(md5('q62' || CAST(doc_id AS VARCHAR)), 1, 1)
              WHEN '0' THEN repeat('#!? ', 40)
              WHEN '1' THEN repeat(
                  'pneumonoultramicroscopicsilicovolcanoconiosis ', 8)
              WHEN '2' THEN 'tiny doc'
              WHEN '3' THEN repeat('wait... ', 30)
              ELSE text END AS text
          FROM documents),
    n AS (SELECT doc_id,
                 regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')
                     AS t
          FROM mut),
    f AS (SELECT doc_id, string_split(t, ' ') AS ws,
                 CAST(length(replace(t, ' ', '')) AS BIGINT) AS word_chars,
                 CAST(length(t) - length(replace(t, '#', '')) AS BIGINT)
                 + (length(t) - length(replace(t, '...', ''))) // 3
                     AS n_symbols
          FROM n),
    g AS (SELECT doc_id, word_chars, n_symbols,
                 CAST(len(list_filter(ws, w -> w != '')) AS BIGINT) AS n_words,
                 CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                      AS BIGINT) AS n_alpha,
                 CAST(len(list_intersect(list_distinct(ws), {_Q62_STOPS}))
                      AS BIGINT) AS hits
          FROM f),
    r AS (SELECT doc_id, n_words, word_chars,
                 n_words >= 5 AND n_words <= 100000 AS rule_word_count,
                 word_chars >= 2 * n_words AND word_chars <= 12 * n_words
                     AS rule_mean_word_len,
                 n_symbols * 10 <= 1 * n_words AS rule_symbol_ratio,
                 n_alpha * 5 >= 4 * n_words AS rule_alpha_words,
                 hits >= 2 AS rule_stopwords
          FROM g)
    SELECT doc_id, n_words,
           round(word_chars::DOUBLE / greatest(n_words, 1), 4)
               AS mean_word_len,
           rule_word_count, rule_mean_word_len, rule_symbol_ratio,
           rule_alpha_words, rule_stopwords,
           rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
           AND rule_alpha_words AND rule_stopwords AS keep
    FROM r"""


def _q63_side(tag: str, src: str, cap: bool) -> str:
    """One side of the q63 MinHash probe: 2-word shingles → 8 seeded-md5
    signature mins → 4 band keys (corpus side QUALIFY-capped at
    _MAX_BUCKET, mirroring cap_buckets; the broadcast bench side
    uncapped, mirroring neardup_contamination)."""
    sigs = ", ".join(f"min(md5('{i}|' || s)) AS sig_{i}" for i in range(8))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, sig_{2*b} || '#' || sig_{2*b+1}"
        f" AS band_key FROM {tag}sig"
        for b in range(4)
    )
    qualify = (
        f" QUALIFY count(*) OVER (PARTITION BY band_idx, band_key)"
        f" <= {_MAX_BUCKET}" if cap else ""
    )
    return f"""
    {tag}w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {src}),
    {tag}sh AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS s
                FROM {tag}w,
                     unnest(range(1, greatest(len(ws) - 2, 0) + 2)) t(i)),
    {tag}sig AS (SELECT doc_id, {sigs} FROM {tag}sh GROUP BY doc_id),
    {tag}band AS (SELECT * FROM ({bands}){qualify}),
    {tag}3 AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS s
               FROM {tag}w,
                    unnest(range(1, greatest(len(ws) - 3, 0) + 2)) t(i)),
    {tag}set AS (SELECT doc_id, list_distinct(list(s)) AS sh
                 FROM {tag}3 GROUP BY doc_id)"""


# q63: the syndication coin verbatim, the q44-convention benchmark
# hash-sample, then both sides' MinHash bands (corpus capped), banded
# candidates, and the 3-gram Jaccard verify on candidates only — the
# SQL form of neardup_contamination's broadcast-bench probe
ORACLE_SQL["q63_neardup_decontam"] = f"""
    WITH inj AS (SELECT doc_id,
            CASE WHEN substr(md5('nd' || CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0', '1', '2')
                 THEN repeat('eval benchmark passage variant '
                             || CAST(doc_id % 4 AS VARCHAR) || ' ', 12)
                      || 'tail' || CAST(doc_id % 5 AS VARCHAR)
                 ELSE text END AS text
          FROM documents),
    bench_ids AS (SELECT doc_id FROM documents
                  WHERE md5('{_BENCH_SALT}'
                            || COALESCE(CAST(doc_id AS VARCHAR), ''))
                        < '{SA._hex_threshold(_BENCH_RATE)}'),
    corpus AS (SELECT doc_id, text FROM inj
               WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)),
    bench AS (SELECT doc_id, text FROM inj
              WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
    {_q63_side('c', 'corpus', cap=True)},
    {_q63_side('b', 'bench', cap=False)},
    cand AS (SELECT DISTINCT c.doc_id AS doc_id, b.doc_id AS bid
             FROM cband c JOIN bband b USING (band_idx, band_key)),
    j AS (SELECT cand.doc_id,
                 round(len(list_intersect(cs.sh, bs.sh))::DOUBLE /
                       len(list_distinct(list_concat(cs.sh, bs.sh))), 6)
                     AS jc
          FROM cand JOIN cset cs USING (doc_id)
                    JOIN bset bs ON bs.doc_id = cand.bid),
    per AS (SELECT doc_id,
                   sum(CASE WHEN jc >= 0.5 THEN 1 ELSE 0 END) AS n,
                   max(jc) AS mx
            FROM j GROUP BY doc_id)
    SELECT c.doc_id, CAST(coalesce(per.n, 0) AS BIGINT) AS n_neardup_bench,
           coalesce(per.mx, 0.0) AS max_jaccard,
           coalesce(per.n, 0) > 0 AS contaminated
    FROM corpus c LEFT JOIN per USING (doc_id)"""

# q64: q29's assign/cap/verify CTEs verbatim, then the q40-style
# recursive min-label propagation over embeddings vertices and the
# q50-style size/keeper projection — the SQL form of semantic_dedup's
# pairs → components → keep_corpus composition
# Shared SemDeDup CTE chain (q64 min-id keeper, q72 farthest keeper):
# IVF assign → capped same-bucket pairs → cosine verify → recursive-CTE
# transitive closure → (vec_id, cluster_id) labels in `lab`.
_SEMDEDUP_LAB = f"""
    WITH RECURSIVE c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < 8),
    assign AS (
      SELECT e.vec_id, any_value(e.embedding::DOUBLE[]) AS ve,
             arg_max(c.cid, (CASE WHEN e.embedding::DOUBLE[] IS NULL OR c.ce IS NULL OR list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.ce, c.ce) = 0 THEN NULL ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.ce) END))
               AS bucket
      FROM embeddings e, c GROUP BY e.vec_id
      QUALIFY count(*) OVER (PARTITION BY bucket) <= {_MAX_BUCKET}),
    ver AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM assign a JOIN assign b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE round((CASE WHEN a.ve IS NULL OR b.ve IS NULL OR list_dot_product(a.ve, a.ve) = 0 OR list_dot_product(b.ve, b.ve) = 0 THEN NULL ELSE list_cosine_similarity(a.ve, b.ve) END), 4) >= 0.35),
    e AS (SELECT id_a AS ea, id_b AS eb FROM ver
          UNION SELECT id_b, id_a FROM ver),
    reach(n, m) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.n, e.eb FROM reach r JOIN e ON r.m = e.ea),
    lab AS (SELECT n AS vec_id, min(m) AS cluster_id FROM reach GROUP BY n)"""

ORACLE_SQL["q64_semantic_dedup"] = _SEMDEDUP_LAB + """
    SELECT vec_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
           (vec_id = cluster_id) AS is_keeper
    FROM lab"""

# q65: the weight list verbatim (dyadic rationals → exact double sums
# regardless of aggregation order), bucket = first two md5 bytes mod 64
# — the same _hexbyte convention as the sampling oracles
_Q65_WLIST = "[" + ", ".join(repr(w) for w in _Q65_W) + "]"
_Q65_BKT = f"(({_hexbyte('h', 0)} * 256 + {_hexbyte('h', 1)}) % {len(_Q65_W)})"
ORACLE_SQL["q65_linear_classifier"] = f"""
    WITH nrm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    toks AS (SELECT doc_id, w FROM nrm, unnest(string_split(t, ' ')) s(w)
             WHERE w <> ''),
    b AS (SELECT doc_id, md5(w) AS h FROM toks),
    s AS (SELECT doc_id, count(*) AS n_tokens,
                 sum(list_extract({_Q65_WLIST}, {_Q65_BKT} + 1)) AS sw
          FROM b GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           round(0.25 + coalesce(s.sw, 0.0), 6) AS score,
           (0.25 + coalesce(s.sw, 0.0)) > 0 AS keep
    FROM documents d LEFT JOIN s ON d.doc_id IS NOT DISTINCT FROM s.doc_id"""

# q66: the q49 LM chain verbatim, then per-language rank over the SAME
# total order the engine uses (empty-last, avg_nll, doc_id) and the
# exact integer third boundaries (rank·3 < n / < 2n)
ORACLE_SQL["q66_ccnet_buckets"] = (
    """
    WITH lm AS (SELECT * FROM ("""
    + ORACLE_SQL["q49_lm_score"]
    + """)),
    j AS (SELECT d.doc_id, d.lang, lm.n_words, lm.avg_nll
          FROM documents d JOIN lm USING (doc_id)),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY lang
                     ORDER BY (n_words = 0), avg_nll, doc_id) - 1
                     AS lang_rank,
                 count(*) OVER (PARTITION BY lang) AS lang_n
          FROM j)
    SELECT doc_id, lang, n_words, avg_nll,
           CAST(lang_rank AS BIGINT) AS lang_rank,
           CAST(lang_n AS BIGINT) AS lang_n,
           CASE WHEN lang_rank * 3 < lang_n THEN 'head'
                WHEN lang_rank * 3 < 2 * lang_n THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r"""
)

# q67: the injection (6-word segments + coin-gated duplicate first
# line) rebuilt in SQL from the q51 slicing pattern, then first-wins
# line dedup as a per-(doc, line) row_number over positions — the SQL
# form of order-preserving array_distinct
ORACLE_SQL["q67_line_dedup"] = """
    WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents),
    segs AS (SELECT doc_id, i,
                    array_to_string(ws[i*6+1 : i*6+6], ' ') AS seg
             FROM w, unnest(range(CAST(ceil(len(ws) / 6.0) AS BIGINT))) t(i)),
    lined AS (SELECT doc_id,
                     string_agg(seg, chr(10) ORDER BY i) AS txt,
                     min(CASE WHEN i = 0 THEN seg END) AS first_seg
              FROM segs GROUP BY doc_id),
    inj AS (SELECT doc_id,
                   CASE WHEN substr(md5('ld' || CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0', '1', '2', '3')
                        THEN txt || chr(10) || first_seg ELSE txt END AS text
            FROM lined),
    l AS (SELECT doc_id, ls[i+1] AS line, i
          FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM inj),
               unnest(range(len(ls))) t(i)),
    k AS (SELECT doc_id, line, i,
                 row_number() OVER (PARTITION BY doc_id, line ORDER BY i) AS rn
          FROM l)
    SELECT doc_id,
           string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY i)
               AS text,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
    FROM k GROUP BY doc_id"""

# q68: same aggregation in SQL — token counts per source from the
# whitespace-collapsed split (the q30 convention), pow(share, 0.5) and
# the same 6-dp rounding
ORACLE_SQL["q68_temperature_mix"] = f"""
    WITH per AS (SELECT source, count(*) AS n_docs,
                        sum(len(list_filter(string_split(
                            regexp_replace(coalesce(text, ''),
                                           '\\s+', ' ', 'g'), ' '),
                            w -> w <> ''))) AS n_tokens
                 FROM documents GROUP BY source),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    sh AS (SELECT source, n_docs, n_tokens,
                  n_tokens::DOUBLE / t AS p,
                  pow(n_tokens::DOUBLE / t, 0.5) AS pa
           FROM per CROSS JOIN tot),
    z AS (SELECT sum(pa) AS z FROM sh)
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(p, 6) AS token_share,
           round(pa / z.z, 6) AS temp_share,
           CASE WHEN p > 0 THEN round(pa / z.z / p, 6) ELSE 0.0 END AS boost
    FROM sh CROSS JOIN z"""

# q69: the injection + split verbatim, then the q63 side-builder for
# both halves (corpus bands capped, batch side the broadcast mirror),
# candidates, Jaccard verify, per-BATCH-doc aggregation
ORACLE_SQL["q69_incremental_neardup"] = f"""
    WITH inj AS (SELECT doc_id,
            CASE WHEN substr(md5('inb' || CAST(doc_id AS VARCHAR)), 1, 1)
                      IN ('0', '1', '2')
                 THEN repeat('ingest boilerplate variant '
                             || CAST(doc_id % 4 AS VARCHAR) || ' ', 12)
                      || 'tail' || CAST(doc_id % 5 AS VARCHAR)
                 ELSE text END AS text
          FROM documents),
    corpus AS (SELECT doc_id, text FROM inj WHERE doc_id % 10 < 8),
    batch AS (SELECT doc_id, text FROM inj WHERE doc_id % 10 >= 8),
    {_q63_side('c', 'corpus', cap=True)},
    {_q63_side('b', 'batch', cap=False)},
    cand AS (SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
             FROM bband b JOIN cband c USING (band_idx, band_key)),
    j AS (SELECT cand.bid,
                 round(len(list_intersect(cs.sh, bs.sh))::DOUBLE /
                       len(list_distinct(list_concat(cs.sh, bs.sh))), 6)
                     AS jc
          FROM cand JOIN cset cs ON cs.doc_id = cand.cid
                    JOIN bset bs ON bs.doc_id = cand.bid),
    per AS (SELECT bid,
                   sum(CASE WHEN jc >= 0.5 THEN 1 ELSE 0 END) AS n,
                   max(jc) AS mx
            FROM j GROUP BY bid)
    SELECT b2.doc_id,
           CAST(coalesce(per.n, 0) AS BIGINT) AS n_neardup_corpus,
           coalesce(per.mx, 0.0) AS max_jaccard,
           coalesce(per.n, 0) > 0 AS is_neardup
    FROM batch b2 LEFT JOIN per ON per.bid = b2.doc_id"""

# q70: the q56/q59 span-lift rule (word index ≡ 3,4 mod 7 → media span,
# ref = 'm-' || md5(word)), then the asset-level rollup
ORACLE_SQL["q70_media_index"] = """
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tok AS (SELECT doc_id, t.i AS off, ws[t.i + 1] AS w
            FROM s, unnest(range(len(ws))) t(i)),
    media AS (SELECT doc_id, 'm-' || md5(w) AS media_ref
              FROM tok WHERE off % 7 IN (3, 4))
    SELECT media_ref,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc,
           count(DISTINCT doc_id) > 1 AS is_shared
    FROM media GROUP BY media_ref"""

# q71: max cosine against the mod-23 benchmark slice; the verdict
# compares the ROUNDED max on both sides so a hash-matching value can
# never disagree with its own flag
ORACLE_SQL["q71_embedding_decontam"] = f"""
    WITH bench AS (SELECT embedding::DOUBLE[] AS b FROM embeddings
                   WHERE vec_id % {_Q71_BENCH_MOD} = 0),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id % {_Q71_BENCH_MOD} <> 0),
    sc AS (SELECT c.vec_id,
                  round(max((CASE WHEN c.v IS NULL OR bench.b IS NULL OR list_dot_product(c.v, c.v) = 0 OR list_dot_product(bench.b, bench.b) = 0 THEN NULL ELSE list_cosine_similarity(c.v, bench.b) END)), 4)
                      AS max_bench_cos
           FROM corpus c CROSS JOIN bench GROUP BY c.vec_id)
    SELECT vec_id, max_bench_cos,
           max_bench_cos >= {_Q71_COS_T} AS is_contaminated
    FROM sc"""

# q72: the shared SemDeDup closure (`lab`), then per-cluster centroids
# (positional avg), each member's rounded cosine to its centroid, and
# the farthest-member keeper (min rounded cos, min-id tiebreak;
# NULL cos ranks last via the 2.0 sentinel — same as the Spark side)
ORACLE_SQL["q72_semdedup_far"] = _SEMDEDUP_LAB + """,
    mem AS (SELECT l.vec_id, l.cluster_id, e.embedding::DOUBLE[] AS v
            FROM lab l JOIN embeddings e USING (vec_id)),
    cells AS (SELECT cluster_id, t.i AS pos, avg(v[t.i + 1]) AS m
              FROM mem, unnest(range(len(v))) t(i)
              GROUP BY cluster_id, t.i),
    cent AS (SELECT cluster_id, list(m ORDER BY pos) AS ce
             FROM cells GROUP BY cluster_id),
    sc AS (SELECT mem.vec_id, mem.cluster_id,
                  round((CASE WHEN mem.v IS NULL OR cent.ce IS NULL OR list_dot_product(mem.v, mem.v) = 0 OR list_dot_product(cent.ce, cent.ce) = 0 THEN NULL ELSE list_cosine_similarity(mem.v, cent.ce) END), 4)
                      AS centroid_cos
           FROM mem JOIN cent USING (cluster_id))
    SELECT vec_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
           centroid_cos,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY coalesce(centroid_cos, 2.0), vec_id) = 1
               AS is_keeper
    FROM sc"""

# q73: the q65 chain verbatim as a CTE, then the per-source shrinkage
# with the IDENTICAL IEEE op order as the Spark expression — keep
# compares the UNROUNDED prior on both sides
ORACLE_SQL["q73_source_prior"] = f"""
    WITH q65 AS ({ORACLE_SQL["q65_linear_classifier"]}),
    per AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
                   sum(q65.score) AS s
            FROM q65 JOIN documents d
              ON q65.doc_id IS NOT DISTINCT FROM d.doc_id
            GROUP BY d.source),
    tot AS (SELECT sum(s) AS ts, sum(n_docs) AS tn FROM per)
    SELECT source, n_docs,
           round(s / CAST(n_docs AS DOUBLE), 6) AS mean_score,
           round((s + {_Q73_SHRINK_K}.0 * (ts / CAST(tn AS DOUBLE))) /
                 (CAST(n_docs AS DOUBLE) + {_Q73_SHRINK_K}.0), 6)
               AS prior_score,
           (s + {_Q73_SHRINK_K}.0 * (ts / CAST(tn AS DOUBLE))) /
                 (CAST(n_docs AS DOUBLE) + {_Q73_SHRINK_K}.0)
               >= {_Q73_MIN_PRIOR} AS keep
    FROM per CROSS JOIN tot"""

# q74: BM25 with the Spark expression's exact IEEE constant folds
# (repr-interpolated) and the same (score desc, doc_id) total order at
# the LIMIT cut
ORACLE_SQL["q74_bm25_topk"] = f"""
    WITH nrm AS (SELECT doc_id, {{_NORM}} AS t FROM documents),
    tk AS (SELECT doc_id, w FROM nrm, unnest(string_split(t, ' ')) s(w)
           WHERE w <> ''),
    dln AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
    dl0 AS (SELECT d.doc_id, CAST(coalesce(dln.dl, 0) AS BIGINT) AS dl
            FROM documents d LEFT JOIN dln USING (doc_id)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(dl) AS DOUBLE) AS sdl FROM dl0),
    tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM tk
           WHERE w IN ({{terms}}) GROUP BY doc_id, w),
    dfr AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
    sc AS (SELECT tf.doc_id, dl0.dl,
                  ln(1.0 + (CAST(tot.n AS DOUBLE) - dfr.df + 0.5)
                         / (dfr.df + 0.5))
                  * (tf.tf * {{k1p1}}
                     / (tf.tf + {{k1}} * ({{omb}} + {{b}}
                        * CAST(dl0.dl AS DOUBLE) / (tot.sdl / CAST(tot.n AS DOUBLE)))))
                      AS term
           FROM tf JOIN dl0 USING (doc_id) CROSS JOIN tot JOIN dfr USING (w))
    SELECT doc_id, dl, round(sum(term), 4) AS score
    FROM sc GROUP BY doc_id, dl
    ORDER BY score DESC, doc_id LIMIT {{klim}}""".format(
    _NORM=_NORM,
    terms=", ".join(f"'{w}'" for w in sorted(set(_Q74_TERMS))),
    k1p1=repr(float(_Q74_K1) + 1.0), k1=repr(float(_Q74_K1)),
    omb=repr(1.0 - float(_Q74_B)), b=repr(float(_Q74_B)), klim=_Q74_K,
)

# q75: train/test IVF assignment (q64's arg_max convention, cap on the
# TRAIN side only), rounded-cosine top-k with (cos desc, tid) ties,
# majority vote on (votes desc, label), NULL verdicts preserved by the
# final left join
ORACLE_SQL["q75_knn_labels"] = f"""
    WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < 8),
    te AS (SELECT e.vec_id, any_value(e.embedding::DOUBLE[]) AS v,
                  arg_max(c.cid, (CASE WHEN e.embedding::DOUBLE[] IS NULL OR c.ce IS NULL OR list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.ce, c.ce) = 0 THEN NULL ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.ce) END))
                      AS bucket
           FROM embeddings e, c WHERE e.vec_id % {_Q75_TRAIN_MOD} <> 0
           GROUP BY e.vec_id),
    tr AS (SELECT t.vec_id AS tid, any_value(t.label) AS label,
                  any_value(t.embedding::DOUBLE[]) AS v,
                  arg_max(c.cid, (CASE WHEN t.embedding::DOUBLE[] IS NULL OR c.ce IS NULL OR list_dot_product(t.embedding::DOUBLE[], t.embedding::DOUBLE[]) = 0 OR list_dot_product(c.ce, c.ce) = 0 THEN NULL ELSE list_cosine_similarity(t.embedding::DOUBLE[], c.ce) END))
                      AS bucket
           FROM embeddings t, c WHERE t.vec_id % {_Q75_TRAIN_MOD} = 0
           GROUP BY t.vec_id
           QUALIFY count(*) OVER (PARTITION BY bucket) <= {_MAX_BUCKET}),
    top AS (SELECT te.vec_id, tr.tid, tr.label,
                   round((CASE WHEN te.v IS NULL OR tr.v IS NULL OR list_dot_product(te.v, te.v) = 0 OR list_dot_product(tr.v, tr.v) = 0 THEN NULL ELSE list_cosine_similarity(te.v, tr.v) END), 4) AS cos
            FROM te JOIN tr USING (bucket)
            QUALIFY row_number() OVER (PARTITION BY te.vec_id
                                       ORDER BY cos DESC, tr.tid)
                    <= {_Q75_KNN}),
    votes AS (SELECT vec_id, label, CAST(count(*) AS BIGINT) AS v
              FROM top GROUP BY vec_id, label),
    pick AS (SELECT vec_id, label AS pred_label, v FROM votes
             QUALIFY row_number() OVER (PARTITION BY vec_id
                                        ORDER BY v DESC, label) = 1),
    nn AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_neighbors
           FROM top GROUP BY vec_id)
    SELECT te.vec_id, pick.pred_label, pick.v AS n_votes,
           CAST(coalesce(nn.n_neighbors, 0) AS BIGINT) AS n_neighbors
    FROM te LEFT JOIN pick USING (vec_id) LEFT JOIN nn USING (vec_id)"""

# q76: the identical cumulative md5-interval CASE (thresholds computed
# by the same float accumulation the operator runs)
ORACLE_SQL["q76_holdout_split"] = (
    "SELECT doc_id, CASE WHEN md5('" + _Q76_SALT
    + "' || COALESCE(CAST(doc_id AS VARCHAR), '')) < '"
    + SA._hex_threshold(_Q76_FRACS[0])
    + "' THEN 'train' WHEN md5('" + _Q76_SALT
    + "' || COALESCE(CAST(doc_id AS VARCHAR), '')) < '"
    + SA._hex_threshold(_Q76_FRACS[0] + _Q76_FRACS[1])
    + "' THEN 'val' ELSE 'test' END AS split FROM documents"
)

# q77: distinct (doc, shingle-md5) pairs -> document frequency ->
# per-doc novel fraction; NULL-/shingle-less docs keep a NULL novelty
ORACLE_SQL["q77_doc_novelty"] = (
    "WITH " + _SHINGLE_CTE.format(k=3, km1=2) + """,
    ds AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh WHERE s <> ''),
    dfreq AS (SELECT h, CAST(count(*) AS BIGINT) AS nd FROM ds GROUP BY h),
    per AS (SELECT ds.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_novel
            FROM ds JOIN dfreq USING (h) GROUP BY ds.doc_id)
    SELECT d.doc_id, CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN n_shingles > 0
                THEN round(n_novel / CAST(n_shingles AS DOUBLE), 6)
           END AS novelty
    FROM documents d LEFT JOIN per USING (doc_id)"""
)

# q78: row_number over the same (md5-key, id) total order
ORACLE_SQL["q78_epoch_order"] = f"""
    SELECT doc_id,
           md5('{_Q78_SEED}' || COALESCE(CAST(doc_id AS VARCHAR), ''))
               AS shuffle_key,
           CAST(row_number() OVER (
                ORDER BY md5('{_Q78_SEED}'
                             || COALESCE(CAST(doc_id AS VARCHAR), '')),
                         doc_id) - 1 AS BIGINT) AS epoch_pos
    FROM documents"""

# q79: the q65 margin + per-source row_number over the same
# (score desc, id) order the engine ranks by
ORACLE_SQL["q79_source_quota"] = f"""
    WITH q65 AS ({{q65}}),
    s AS (SELECT q65.doc_id, d.source, q65.score
          FROM q65 JOIN documents d
            ON q65.doc_id IS NOT DISTINCT FROM d.doc_id),
    r AS (SELECT doc_id, source, score,
                 CAST(row_number() OVER (PARTITION BY source
                                         ORDER BY score DESC, doc_id) - 1
                      AS BIGINT) AS src_rank
          FROM s)
    SELECT doc_id, source, score, src_rank,
           src_rank < {_Q79_QUOTA} AS keep FROM r"""

# q80: row-local bigrams, both model tables re-grouped from the
# per-(doc,w1,w2) counts, add-alpha smoothing with repr'd constants
ORACLE_SQL["q80_bigram_lm"] = """
    WITH w AS (SELECT doc_id,
                      list_filter(string_split(regexp_replace(
                          lower(coalesce(text, '')), '\\s+', ' ', 'g'), ' '),
                          x -> x <> '') AS ws
               FROM documents),
    bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
           FROM w, unnest(range(1, len(ws))) t(i)),
    dc AS (SELECT doc_id, w1, w2, count(*) AS c FROM bg GROUP BY ALL),
    big AS (SELECT w1, w2, sum(c) AS n12 FROM dc GROUP BY ALL),
    ctx AS (SELECT w1, sum(n12) AS n1 FROM big GROUP BY ALL),
    v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS nv FROM dc),
    sc AS (SELECT dc.doc_id, dc.c,
                  ln((big.n12 + {a}) / (ctx.n1 + {a} * v.nv)) AS lp
           FROM dc JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
    per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                   round(sum(c * -lp) / sum(c), 4) AS avg_nll
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           coalesce(avg_nll, 0.0) AS avg_nll
    FROM documents d LEFT JOIN per USING (doc_id)""".format(a=repr(0.5))

# q81: gate rules inlined over the raw corpus (q62's rule SQL without
# its planted-mutation CTE), plus content hash / language mix rollup
ORACLE_SQL["q81_dataset_card"] = f"""
    WITH n AS (SELECT doc_id, source, lang,
                      regexp_replace(lower(coalesce(text, '')),
                                     '\\s+', ' ', 'g') AS t
               FROM documents),
    f AS (SELECT doc_id, source, lang, md5(t) AS chash,
                 string_split(t, ' ') AS ws,
                 CAST(length(replace(t, ' ', '')) AS BIGINT) AS word_chars,
                 CAST(length(t) - length(replace(t, '#', '')) AS BIGINT)
                 + (length(t) - length(replace(t, '...', ''))) // 3
                     AS n_symbols
          FROM n),
    g AS (SELECT doc_id, source, lang, chash, word_chars, n_symbols,
                 CAST(len(list_filter(ws, w -> w != '')) AS BIGINT) AS n_words,
                 CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                      AS BIGINT) AS n_alpha,
                 CAST(len(list_intersect(list_distinct(ws), {_Q62_STOPS}))
                      AS BIGINT) AS hits
          FROM f),
    e AS (SELECT doc_id, source, lang, chash, n_words,
                 (n_words >= 5 AND n_words <= 100000)
                 AND (word_chars >= 2 * n_words AND word_chars <= 12 * n_words)
                 AND (n_symbols * 10 <= 1 * n_words)
                 AND (n_alpha * 5 >= 4 * n_words)
                 AND (hits >= 2) AS keep
          FROM g),
    per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT chash) AS BIGINT) AS n_distinct,
                   CAST(sum(n_words) AS BIGINT) AS n_words_total,
                   sum(CASE WHEN keep THEN 1 ELSE 0 END) AS nk,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM e GROUP BY source),
    lc AS (SELECT source, lang, count(*) AS c FROM e GROUP BY source, lang),
    top AS (SELECT source, lang AS top_lang, c AS top_n FROM lc
            QUALIFY row_number() OVER (PARTITION BY source
                                       ORDER BY c DESC,
                                                lang ASC NULLS LAST) = 1)
    SELECT per.source, n_docs, n_distinct,
           round(1.0 - n_distinct / CAST(n_docs AS DOUBLE), 6)
               AS dup_fraction,
           n_words_total,
           round(n_words_total / CAST(n_docs AS DOUBLE), 4) AS mean_words,
           round(nk / CAST(n_docs AS DOUBLE), 6) AS keep_rate,
           n_langs, top_lang,
           round(top_n / CAST(n_docs AS DOUBLE), 6) AS top_lang_share
    FROM per JOIN top ON per.source IS NOT DISTINCT FROM top.source"""

# splice the q65 chain into q79 (plain replace: the SQL contains list
# literals whose brackets str.format would not survive)
ORACLE_SQL["q79_source_quota"] = ORACLE_SQL["q79_source_quota"].replace(
    "{q65}", ORACLE_SQL["q65_linear_classifier"]
)

# q82: the q44 shingle split with bench ids kept, per-(doc,bench)
# shared counts, argmax with (n_shared desc, bench_id) ties
ORACLE_SQL["q82_contamination_attribution"] = (
    "WITH bench_ids AS (SELECT doc_id FROM documents "
    "WHERE md5('bench' || COALESCE(CAST(doc_id AS VARCHAR), '')) < '"
    + SA._hex_threshold(_BENCH_RATE)
    + """'),
    donor AS (SELECT text AS bt FROM documents
              WHERE doc_id = (SELECT min(doc_id) FROM bench_ids)),
    mut AS (SELECT doc_id,
                   CASE WHEN doc_id NOT IN (SELECT doc_id FROM bench_ids)
                             AND substr(md5('q82' || CAST(doc_id AS VARCHAR)),
                                        1, 1) = '0'
                        THEN text || ' ' || (SELECT bt FROM donor)
                        ELSE text END AS text
            FROM documents),"""
    + f" n AS (SELECT doc_id, {_NORM} AS text FROM mut),"
    + _SHINGLE_CTE.format(k=5, km1=4).replace("FROM documents", "FROM n")
    + """,
    shd AS (SELECT DISTINCT doc_id, s FROM sh WHERE s != ''),
    bsh AS (SELECT doc_id AS bench_id, s FROM shd
            WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
    csh AS (SELECT doc_id, s FROM shd
            WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)),
    m AS (SELECT csh.doc_id, bsh.bench_id, CAST(count(*) AS BIGINT)
                     AS n_shared
          FROM csh JOIN bsh USING (s) GROUP BY csh.doc_id, bsh.bench_id),
    top AS (SELECT * FROM m
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY n_shared DESC, bench_id)
                    = 1),
    nsh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
            FROM csh GROUP BY doc_id)
    SELECT top.doc_id, top.bench_id, n_shared, n_shingles,
           round(n_shared / CAST(n_shingles AS DOUBLE), 6) AS overlap_frac
    FROM top JOIN nsh USING (doc_id)"""
)

# q83: q65 margins + the q81 gate-rule chain, rank-based integer
# decile boundaries over the shared (score, id) total order
ORACLE_SQL["q83_score_calibration"] = f"""
    WITH q65 AS ({ORACLE_SQL["q65_linear_classifier"]}),
    n AS (SELECT doc_id,
                 regexp_replace(lower(coalesce(text, '')),
                                '\\s+', ' ', 'g') AS t
          FROM documents),
    f AS (SELECT doc_id, string_split(t, ' ') AS ws,
                 CAST(length(replace(t, ' ', '')) AS BIGINT) AS word_chars,
                 CAST(length(t) - length(replace(t, '#', '')) AS BIGINT)
                 + (length(t) - length(replace(t, '...', ''))) // 3
                     AS n_symbols
          FROM n),
    g AS (SELECT doc_id, word_chars, n_symbols,
                 CAST(len(list_filter(ws, w -> w != '')) AS BIGINT) AS n_words,
                 CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                      AS BIGINT) AS n_alpha,
                 CAST(len(list_intersect(list_distinct(ws), {_Q62_STOPS}))
                      AS BIGINT) AS hits
          FROM f),
    gate AS (SELECT doc_id,
                    (n_words >= 5 AND n_words <= 100000)
                    AND (word_chars >= 2 * n_words
                         AND word_chars <= 12 * n_words)
                    AND (n_symbols * 10 <= 1 * n_words)
                    AND (n_alpha * 5 >= 4 * n_words)
                    AND (hits >= 2) AS keep
             FROM g),
    j AS (SELECT q65.doc_id, q65.score, gate.keep
          FROM q65 JOIN gate USING (doc_id)),
    r AS (SELECT *,
                 CAST(row_number() OVER (ORDER BY score, doc_id) - 1
                      AS BIGINT) AS rk,
                 CAST(count(*) OVER () AS BIGINT) AS nn
          FROM j)
    SELECT (rk * 10) // nn AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(score) AS min_score, max(score) AS max_score,
           round(sum(score) / count(*), 6) AS mean_score,
           round(sum(CASE WHEN keep THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS gate_keep_rate
    FROM r GROUP BY 1"""

# q84: the q48 chunk chain + the q39-style cumsum pack assignment in
# (doc_id, chunk_id) order, shard = pack DIV 8, order-sensitive digest
ORACLE_SQL["q84_shard_manifest"] = f"""
    WITH nrm AS (SELECT doc_id, {_NORM} AS text FROM documents
                 WHERE trim({_NORM}) <> ''),
    w AS (SELECT doc_id, string_split(text, ' ') AS ws,
                 len(string_split(text, ' ')) AS n
          FROM nrm),
    c AS (SELECT doc_id, CAST(t.i AS INT) AS chunk_id,
                 ws[t.i*48+1 : t.i*48+64] AS cw
          FROM w, unnest(range(CASE WHEN n <= 64 THEN 1
                                    ELSE (n - 64 + 47) // 48 + 1 END)) t(i)),
    ch AS (SELECT doc_id, chunk_id, CAST(len(cw) AS BIGINT) AS n_words,
                  md5(array_to_string(cw, ' ')) AS chunk_hash
           FROM c),
    cum AS (SELECT *,
                   coalesce(sum(n_words) OVER (
                       ORDER BY doc_id NULLS FIRST, chunk_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb
            FROM ch),
    p AS (SELECT *, cb // 512 AS pack_id FROM cum),
    s AS (SELECT *, pack_id // {_Q84_PPS} AS shard_id FROM p)
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_words) AS BIGINT) AS n_tokens,
           md5(string_agg(chunk_hash, ''
                          ORDER BY pack_id, doc_id NULLS FIRST, chunk_id))
               AS digest
    FROM s GROUP BY shard_id"""

# q85: the identical driver-computed sign matrix, dyadic quantization,
# and per-bit dot-product sign, as literal lists in SQL
def _q85_oracle() -> str:
    signs = S.hyperplane_signs(_Q85_BITS, _Q85_DIM)
    bits = " + ".join(
        f"CASE WHEN list_dot_product(q, [{', '.join(repr(x) for x in signs[k])}])"
        f" > 0 THEN {1 << k} ELSE 0 END"
        for k in range(_Q85_BITS)
    )
    return f"""
    WITH qv AS (SELECT vec_id,
                       list_transform(embedding::DOUBLE[],
                                      v -> floor(v * 4096) / 4096) AS q,
                       embedding IS NULL AS isn
                FROM embeddings)
    SELECT vec_id,
           CASE WHEN isn THEN NULL
                ELSE CAST({bits} AS BIGINT) END AS sig
    FROM qv"""


ORACLE_SQL["q85_hyperplane_lsh"] = _q85_oracle()

# q86: the q68 rate chain as a CTE, the same null-safe broadcast-shaped
# join, and the identical exact 48-bit hash-fraction predicate
ORACLE_SQL["q86_mixture_apply"] = f"""
    WITH rates AS ({ORACLE_SQL["q68_temperature_mix"]})
    SELECT d.doc_id, d.source,
           least({_Q86_BASE} * coalesce(r.boost, 0.0), 1.0) AS rate,
           (CAST(('0x' || substr(md5('{_Q86_SALT}'
                 || COALESCE(CAST(d.doc_id AS VARCHAR), '')), 1, 12))
                 AS BIGINT) / 281474976710656.0)
               < least({_Q86_BASE} * coalesce(r.boost, 0.0), 1.0) AS keep
    FROM documents d LEFT JOIN rates r
      ON d.source IS NOT DISTINCT FROM r.source"""

# q87: the identical union-tag carry-forward (right rows side 0 sort
# before left ties; latest (ts, id) right row wins)
ORACLE_SQL["q87_asof_join"] = """
    WITH u AS (
      SELECT user_id, ts, 0 AS side, event_id, value FROM events
      WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS side, event_id, NULL AS value FROM events
      WHERE event_type = 'error'),
    c AS (SELECT *,
                 last_value(CASE WHEN side = 0 THEN
                     struct_pack(eid := event_id, pts := ts, val := value)
                 END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS pay
          FROM u)
    SELECT event_id, user_id, ts,
           pay.eid AS asof_event_id, pay.pts AS asof_ts,
           pay.val AS asof_value
    FROM c WHERE side = 1"""

# q88: the same [lo, hi) banding + DECIMAL-exact totals
ORACLE_SQL["q88_range_join"] = (
    "WITH tiers AS (SELECT * FROM (VALUES "
    + ", ".join(f"({lo!r}, {hi!r}, '{name}')" for lo, hi, name in _Q88_TIERS)
    + """) t(tier_lo, tier_hi, tier))
    SELECT tier, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS total_value
    FROM events e LEFT JOIN tiers
      ON e.value >= tier_lo AND e.value < tier_hi
    GROUP BY tier"""
)

# q89: same md5-bucket rule as q65, bench split as q44, full-outer
# source x target model, add-alpha log-ratio with repr'd constants
ORACLE_SQL["q89_dsir_importance"] = f"""
    WITH nrm AS (SELECT doc_id,
                        regexp_replace(lower(coalesce(text, '')),
                                       '\\s+', ' ', 'g') AS t
                 FROM documents),
    toks AS (SELECT doc_id, md5(s.w) AS h FROM nrm,
             unnest(string_split(t, ' ')) s(w) WHERE s.w <> ''),
    bt AS (SELECT doc_id, {_Q65_BKT.replace('% 64', f'% {_Q89_B}')} AS b
           FROM toks),
    dc AS (SELECT doc_id, b, count(*) AS c FROM bt GROUP BY ALL),
    srcb AS (SELECT b, sum(c) AS s FROM dc GROUP BY b),
    bench_ids AS (SELECT doc_id FROM documents
                  WHERE md5('bench' || COALESCE(CAST(doc_id AS VARCHAR), ''))
                        < '{{bthr}}'),
    tgtb AS (SELECT b, count(*) AS t FROM bt
             WHERE doc_id IN (SELECT doc_id FROM bench_ids) GROUP BY b),
    model AS (SELECT coalesce(srcb.b, tgtb.b) AS b,
                     CAST(coalesce(s, 0) AS BIGINT) AS s,
                     CAST(coalesce(t, 0) AS BIGINT) AS t
              FROM srcb FULL JOIN tgtb ON srcb.b = tgtb.b),
    tot AS (SELECT sum(s) AS ts, sum(t) AS tt FROM model),
    sc AS (SELECT dc.doc_id, dc.c,
                  ln((model.t + {{a}}) / (tot.tt + {{ab}}))
                  - ln((model.s + {{a}}) / (tot.ts + {{ab}})) AS lw
           FROM dc JOIN model USING (b) CROSS JOIN tot),
    per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                   round(sum(c * lw), 4) AS importance
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
           coalesce(importance, 0.0) AS importance
    FROM documents d LEFT JOIN per USING (doc_id)"""
ORACLE_SQL["q89_dsir_importance"] = (
    ORACLE_SQL["q89_dsir_importance"]
    .replace("{bthr}", SA._hex_threshold(_BENCH_RATE))
    .replace("{a}", repr(_Q89_A))
    .replace("{ab}", repr(_Q89_A * _Q89_B))
)


# The HLL register math replayed byte-for-byte — h32 = first 4 md5
# bytes big-endian (Spark conv), bucket = low 6 bits, rho via
# minimal-binary length (both engines' bin()), dyadic 2^-M sums exact
# in double, alpha pinned as one string→double literal, ln verified
# identical over its whole 64-value domain. ``src`` must expose
# (g, k): group value and key string.
def _hll_oracle(src_cte: str, g_alias: str) -> str:
    return f"""{src_cte},
    h AS (SELECT g, md5(k) AS hh FROM src),
    hv AS (SELECT g, {_hexbytes_be('hh', 4)} AS h32 FROM h),
    rb AS (SELECT g, CAST(h32 % 64 AS INT) AS bucket, h32 // 64 AS v
           FROM hv),
    rr AS (SELECT g, bucket,
                  CASE WHEN v > 0 THEN 27 - length(bin(v)) ELSE 27 END AS rho
           FROM rb),
    regs AS (SELECT g, bucket, max(rho) AS m FROM rr GROUP BY g, bucket),
    pg AS (SELECT g,
                  sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << m)) AS sp,
                  count(*) AS np
           FROM regs GROUP BY g),
    est AS (SELECT g,
                   CAST('0.7093409548395029' AS DOUBLE) * 4096
                     / (sp + (64 - np)) AS raw,
                   64 - np AS z
            FROM pg),
    fin AS (SELECT g,
                   round(CASE WHEN raw <= 160.0 AND z > 0
                              THEN 64 * ln(CAST(64 AS DOUBLE) / z)
                              ELSE raw END, 4) AS est_distinct
            FROM est),
    ex AS (SELECT g, count(DISTINCT k) AS exact_distinct FROM src GROUP BY g)
    SELECT ex.g AS {g_alias}, CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           fin.est_distinct,
           round(abs(fin.est_distinct - ex.exact_distinct)
                 / ex.exact_distinct, 4) AS rel_err
    FROM fin JOIN ex ON fin.g IS NOT DISTINCT FROM ex.g"""


ORACLE_SQL["q90_hll_distinct"] = _hll_oracle(
    f"""WITH w AS (SELECT source, unnest(string_split({_NORM}, ' ')) AS word
               FROM documents),
    src AS (SELECT source AS g, word AS k FROM w WHERE word <> '')""",
    "source",
)

ORACLE_SQL["q95_hll_windowed"] = _hll_oracle(
    """WITH src AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS g,
                           COALESCE(CAST(user_id AS VARCHAR), '') AS k
                    FROM events)""",
    "win_start",
)


# q91: the identical fixed-point integer PageRank, one CTE pair per
# iteration (DuckDB's recursive CTEs disallow aggregates over the
# recursive reference, so the fixed iteration count unrolls) — every
# step is staged integer floor-division, bit-exact, no float policy
def _pagerank_oracle(n_hosts: int, iters: int, scale: int) -> str:
    tele = (15 * scale) // 100 // n_hosts
    init = scale // n_hosts
    src = f"CAST({_hexbyte('hh', 0)} % {n_hosts} AS INT)"
    dst = f"CAST({_hexbyte('dd', 0)} % {n_hosts} AS INT)"
    parts = [
        """m AS (SELECT md5('h|' || COALESCE(CAST(doc_id AS VARCHAR), '')) AS hh,
                        md5('d|' || COALESCE(lower(text), '')) AS dd
                 FROM documents)""",
        f"edges AS (SELECT {src} AS src, {dst} AS dst, count(*) AS w FROM m GROUP BY 1, 2)",
        "outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY src)",
        "ew AS (SELECT e.src, e.dst, e.w, o.w_out FROM edges e JOIN outw o USING (src))",
        f"hosts AS (SELECT CAST(range AS INT) AS host FROM range({n_hosts}))",
        f"r0 AS (SELECT host, CAST({init} AS BIGINT) AS r FROM hosts)",
    ]
    for k in range(iters):
        parts.append(
            f"d{k} AS (SELECT ((85 * COALESCE((SELECT sum(r) FROM r{k} "
            f"WHERE host NOT IN (SELECT src FROM edges)), 0)) // 100) "
            f"// {n_hosts} AS dang)"
        )
        parts.append(
            f"c{k} AS (SELECT e.dst AS host, "
            f"sum(((85 * r.r) // 100) * e.w // e.w_out) AS c "
            f"FROM r{k} r JOIN ew e ON r.host = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k + 1} AS (SELECT h.host, CAST({tele} + "
            f"(SELECT dang FROM d{k}) + COALESCE(c.c, 0) AS BIGINT) AS r "
            f"FROM hosts h LEFT JOIN c{k} c ON h.host = c.host)"
        )
    return (
        "WITH " + ",\n    ".join(parts) + f"\n    SELECT host, r AS rank_fp FROM r{iters}"
    )


ORACLE_SQL["q91_pagerank_hosts"] = _pagerank_oracle(
    _Q91_HOSTS, _Q91_ITERS, G.PR_SCALE
)


# q92: payload md5 = md5 of the utf-8 text (the q41/q42 'ph'
# convention), 48-bit big-endian phash, the q26 QUALIFY bucket-cap
# mirror, intra-kind banded pairs
ORACLE_SQL["q92_media_phash_pairs"] = f"""
    WITH m0 AS (SELECT md5(COALESCE(CAST(doc_id AS VARCHAR), '')) AS kh,
                       md5(coalesce(text, '')) AS ph,
                       COALESCE(CAST(doc_id AS VARCHAR), '') AS did
                FROM documents),
    rows0 AS (SELECT 'm:' || did AS media_id,
                     ['image','audio','video'][({_hexbyte('kh', 0)} % 3) + 1]
                       AS kind,
                     {_hexbytes_be('ph', 6)} AS phash,
                     did
              FROM m0),
    clones AS (SELECT 'dup:' || did AS media_id, kind, phash FROM rows0
               WHERE substr(md5('q92' || did), 1, 1) = '0'),
    sigs AS (SELECT DISTINCT media_id, kind, phash FROM
             (SELECT media_id, kind, phash FROM rows0
              UNION ALL SELECT media_id, kind, phash FROM clones)),
    bands AS (SELECT media_id, kind, phash, b.range AS band_idx,
                     (phash >> (b.range * 12)) & 4095 AS band_key
              FROM sigs, range(4) b
              QUALIFY count(*) OVER (PARTITION BY kind, b.range,
                      (phash >> (b.range * 12)) & 4095) <= 200)
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.kind AS kind,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.kind = b.kind AND a.band_idx = b.band_idx
     AND a.band_key = b.band_key AND a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3"""


# q93: the 4x256 count-min sketch replayed — cell = first md5 byte of
# 'row|word', integer sums/mins end to end
ORACLE_SQL["q93_cms_heavy_hitters"] = f"""
    WITH w AS (SELECT unnest(string_split({_NORM}, ' ')) AS word
               FROM documents),
    wf AS (SELECT word FROM w WHERE word <> ''),
    ck AS (SELECT j.range AS row_id, word,
                  md5(CAST(j.range AS VARCHAR) || '|' || word) AS ch
           FROM wf CROSS JOIN range(4) j),
    cells AS (SELECT row_id, {_hexbyte('ch', 0)} AS col_id, count(*) AS cnt
              FROM ck GROUP BY 1, 2),
    exact AS (SELECT word, count(*) AS exact_cnt FROM wf GROUP BY word),
    cand AS (SELECT word, exact_cnt, j.range AS row_id,
                    md5(CAST(j.range AS VARCHAR) || '|' || word) AS ch
             FROM exact CROSS JOIN range(4) j),
    candk AS (SELECT word, exact_cnt, row_id, {_hexbyte('ch', 0)} AS col_id
              FROM cand),
    est AS (SELECT word, exact_cnt, min(cnt) AS cms_cnt
            FROM candk JOIN cells USING (row_id, col_id)
            GROUP BY word, exact_cnt)
    SELECT word, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cms_cnt AS BIGINT) AS cms_cnt
    FROM est WHERE cms_cnt >= {_Q93_T}"""


# q94: the Bloom bitset replayed — bit_i = first-2-md5-bytes of
# 'i|key' mod 4096, positive = all 3 bits set; probes are disjoint
# from the build set so every positive is a false positive
ORACLE_SQL["q94_bloom_audit"] = f"""
    WITH b AS (SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS key
               FROM documents WHERE doc_id % 2 = 0),
    p AS (SELECT DISTINCT 'doc://' || CAST(doc_id AS VARCHAR) AS key
          FROM documents WHERE doc_id % 2 = 1),
    bh AS (SELECT md5(CAST(i.range AS VARCHAR) || '|' || key) AS hh
           FROM b CROSS JOIN range(3) i),
    bbits AS (SELECT DISTINCT CAST(
                ({_hexbyte('hh', 0)} * 256 + {_hexbyte('hh', 1)}) % 4096
              AS INT) AS bit FROM bh),
    ph AS (SELECT key, md5(CAST(i.range AS VARCHAR) || '|' || key) AS hh
           FROM p CROSS JOIN range(3) i),
    pbits AS (SELECT key, CAST(
                ({_hexbyte('hh', 0)} * 256 + {_hexbyte('hh', 1)}) % 4096
              AS INT) AS bit FROM ph),
    pos AS (SELECT key FROM pbits JOIN bbits USING (bit)
            GROUP BY key HAVING count(*) = 3)
    SELECT (SELECT count(*) FROM b) AS n_build,
           (SELECT count(*) FROM p) AS n_probe,
           (SELECT count(*) FROM pos) AS n_false_pos,
           round(CAST((SELECT count(*) FROM pos) AS DOUBLE)
                 / (SELECT count(*) FROM p), 6) AS fp_rate"""


# q96: five per-dimension top-5 hot-key subqueries UNION ALLed, share
# against the 1-row total — (n DESC, key ASC) total order makes the
# LIMIT cut deterministic on both engines
def _q96_oracle() -> str:
    did = "COALESCE(CAST(doc_id AS VARCHAR), '')"
    host_hash = _hexbyte(f"md5('h|' || {did})", 0)
    dims = {
        "source": "COALESCE(source, '')",
        "lang": "COALESCE(lang, '')",
        "content_md5": "md5(coalesce(text, ''))",
        "host_bucket": f"CAST({host_hash} % 64 AS VARCHAR)",
        "len_bucket": "CAST(COALESCE(n_chars, 0) // 256 AS VARCHAR)",
    }
    parts = [
        f"""d_{name} AS (SELECT '{name}' AS dimension, key, n FROM (
            SELECT {expr} AS key, count(*) AS n FROM documents
            GROUP BY 1 ORDER BY n DESC, key ASC LIMIT {_Q96_TOPK}) q)"""
        for name, expr in dims.items()
    ]
    union = " UNION ALL ".join(f"SELECT * FROM d_{n}" for n in dims)
    return (
        "WITH tot AS (SELECT count(*) AS t FROM documents),\n    "
        + ",\n    ".join(parts)
        + f"\n    SELECT dimension, key, n, round(n / t, 6) AS pct"
        + f"\n    FROM ({union}) u CROSS JOIN tot"
    )


ORACLE_SQL["q96_skew_report"] = _q96_oracle()


# q97: register algebra replayed — dense 64-register rows per source,
# pair union = greatest(), the same dense-form estimate CASE on both
# sides (empty registers enter the harmonic sum as 2^0)
def _q97_est(s: str, z: str) -> str:
    alpha = "CAST('0.7093409548395029' AS DOUBLE) * 4096"
    return (
        f"round(CASE WHEN ({alpha} / {s}) <= 160.0 AND {z} > 0 "
        f"THEN 64 * ln(CAST(64 AS DOUBLE) / {z}) "
        f"ELSE {alpha} / {s} END, 4)"
    )


ORACLE_SQL["q97_hll_overlap"] = f"""
    WITH w AS (SELECT source, unnest(string_split({_NORM}, ' ')) AS word
               FROM documents),
    src AS (SELECT source AS g, word AS k FROM w
            WHERE word <> '' AND source IS NOT NULL),
    h AS (SELECT g, md5(k) AS hh FROM src),
    hv AS (SELECT g, {_hexbytes_be('hh', 4)} AS h32 FROM h),
    rb AS (SELECT g, CAST(h32 % 64 AS INT) AS bucket, h32 // 64 AS v
           FROM hv),
    rr AS (SELECT g, bucket,
                  CASE WHEN v > 0 THEN 27 - length(bin(v)) ELSE 27 END AS rho
           FROM rb),
    regs AS (SELECT g, bucket, max(rho) AS m FROM rr GROUP BY g, bucket),
    dense AS (SELECT s.g, b.range AS bucket, COALESCE(r.m, 0) AS rho
              FROM (SELECT DISTINCT g FROM regs) s
              CROSS JOIN range(64) b
              LEFT JOIN regs r ON r.g = s.g AND r.bucket = b.range),
    p AS (SELECT a.g AS src_a, b.g AS src_b, a.rho AS ra, b.rho AS rb2,
                 greatest(a.rho, b.rho) AS ru
          FROM dense a JOIN dense b ON a.bucket = b.bucket AND a.g < b.g),
    s AS (SELECT src_a, src_b,
                 sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << ra)) AS sa,
                 sum(CASE WHEN ra = 0 THEN 1 ELSE 0 END) AS za,
                 sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << rb2)) AS sb,
                 sum(CASE WHEN rb2 = 0 THEN 1 ELSE 0 END) AS zb,
                 sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << ru)) AS su,
                 sum(CASE WHEN ru = 0 THEN 1 ELSE 0 END) AS zu
          FROM p GROUP BY src_a, src_b)
    SELECT src_a, src_b, {_q97_est('sa', 'za')} AS est_a,
           {_q97_est('sb', 'zb')} AS est_b,
           {_q97_est('su', 'zu')} AS est_union,
           round({_q97_est('sa', 'za')} + {_q97_est('sb', 'zb')}
                 - {_q97_est('su', 'zu')}, 4) AS est_intersect
    FROM s"""


# q98: the q91 edge derivation + weight threshold, then the q40
# recursive-CTE transitive closure over the 64-host domain
ORACLE_SQL["q98_host_communities"] = f"""
    WITH RECURSIVE m AS (
        SELECT md5('h|' || COALESCE(CAST(doc_id AS VARCHAR), '')) AS hh,
               md5('d|' || COALESCE(lower(text), '')) AS dd
        FROM documents),
    edges AS (SELECT CAST({_hexbyte('hh', 0)} % {_Q91_HOSTS} AS INT) AS src,
                     CAST({_hexbyte('dd', 0)} % {_Q91_HOSTS} AS INT) AS dst,
                     count(*) AS w
              FROM m GROUP BY 1, 2),
    strong AS (SELECT src, dst FROM edges
               WHERE w >= {_Q98_WMIN} AND src <> dst),
    e AS (SELECT src AS ea, dst AS eb FROM strong
          UNION SELECT dst, src FROM strong),
    reach(n, m2) AS (
        SELECT CAST(range AS INT), CAST(range AS INT) FROM range({_Q91_HOSTS})
        UNION
        SELECT r.n, e.eb FROM reach r JOIN e ON r.m2 = e.ea)
    SELECT n AS host, min(m2) AS cluster_id FROM reach GROUP BY n"""


# q99: the q30 token count bucketed by minimal-binary length (exact
# integer log2), NULL text → bucket 0 on both engines
ORACLE_SQL["q99_length_histogram"] = """
    WITH n AS (SELECT source,
                      len(string_split(regexp_replace(text, '\\s+', ' ', 'g'),
                                       ' ')) AS nt
               FROM documents)
    SELECT source,
           CAST(CASE WHEN nt > 0 THEN length(bin(nt)) ELSE 0 END AS INT)
             AS log2_bucket,
           count(*) AS n_docs
    FROM n GROUP BY 1, 2"""


# q100: the identical three-step chain — strict > for step order,
# <= for the 24 h window (chosen so every reach level 1/2/3 is
# populated at the graded SFs — 90/35/25 users at sf0.01), LEFT joins assemble per-user reach
ORACLE_SQL["q100_event_funnel"] = """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL 24 HOUR
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            AND e.ts <= c.t_click + INTERVAL 24 HOUR
          GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + (c.t_click IS NOT NULL)::INT
                  + (p.t_purchase IS NOT NULL)::INT AS INT) AS n_steps
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""


# q101: the mod-7 link convention replayed with parallel unnests (arr,
# position range) zipping per DuckDB semantics; anchor = arr[i]
# (1-based ⇒ the preceding word; i ≥ 5 under the filter), host = first
# md5 byte of 't|'||word mod 64. row_number is BIGINT in DuckDB —
# cast to match Spark's INT.
ORACLE_SQL["q101_anchor_topk"] = f"""
    WITH a AS (SELECT string_split(
                   regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'),
                   ' ') AS arr
               FROM documents),
    p AS (SELECT arr, unnest(arr) AS w,
                 CAST(unnest(range(len(arr))) AS INT) AS i
          FROM a),
    l AS (SELECT w AS tw, arr[i] AS anchor FROM p
          WHERE i % 7 = 5 AND w <> ''),
    k AS (SELECT tw, anchor, md5('t|' || tw) AS th FROM l
          WHERE anchor <> ''),
    c AS (SELECT CAST({_hexbyte('th', 0)} % {_Q101_HOSTS} AS INT) AS host,
                 anchor, count(*) AS n
          FROM k GROUP BY 1, 2)
    SELECT host, anchor, n, rnk FROM (
        SELECT host, anchor, n,
               CAST(row_number() OVER (
                   PARTITION BY host ORDER BY n DESC, anchor ASC
               ) AS INT) AS rnk
        FROM c)
    WHERE rnk <= {_Q101_K}"""


# q102: each event belongs to the two 30-min-grid hour windows that
# cover it — time_bucket's 2000-01-01 origin sits on Spark's epoch-
# aligned 30-min grid, so the starts coincide (the q18 precedent)
ORACLE_SQL["q102_hopping_window"] = """
    WITH s AS (SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                              time_bucket(INTERVAL 30 MINUTE, ts)
                                - INTERVAL 30 MINUTE]) AS win_start,
                      value
               FROM events WHERE ts IS NOT NULL)
    SELECT win_start, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM s GROUP BY 1"""


# q103: the q91/q98 edge derivation, then one degree agg per
# direction, LEFT-joined onto the full 64-host domain
ORACLE_SQL["q103_host_degrees"] = f"""
    WITH m AS (
        SELECT md5('h|' || COALESCE(CAST(doc_id AS VARCHAR), '')) AS hh,
               md5('d|' || COALESCE(lower(text), '')) AS dd
        FROM documents),
    edges AS (SELECT CAST({_hexbyte('hh', 0)} % {_Q101_HOSTS} AS INT) AS src,
                     CAST({_hexbyte('dd', 0)} % {_Q101_HOSTS} AS INT) AS dst,
                     count(*) AS w
              FROM m GROUP BY 1, 2),
    o AS (SELECT src, count(*) AS od, sum(w) AS ol FROM edges GROUP BY src),
    i AS (SELECT dst, count(*) AS idg, sum(w) AS il FROM edges GROUP BY dst)
    SELECT CAST(h.range AS INT) AS host,
           CAST(COALESCE(o.od, 0) AS BIGINT) AS out_deg,
           CAST(COALESCE(o.ol, 0) AS BIGINT) AS out_links,
           CAST(COALESCE(i.idg, 0) AS BIGINT) AS in_deg,
           CAST(COALESCE(i.il, 0) AS BIGINT) AS in_links
    FROM range({_Q101_HOSTS}) h
    LEFT JOIN o ON o.src = h.range
    LEFT JOIN i ON i.dst = h.range"""


# q104: identical fixture + the same one-integer precedence encoding;
# LEFT join keeps no-rule URLs (best NULL ⇒ allowed)
ORACLE_SQL["q104_robots_gate"] = f"""
    WITH d AS (SELECT coalesce(doc_id, 0) AS d0,
                      md5('h|' || COALESCE(CAST(doc_id AS VARCHAR), '')) AS hh
               FROM documents),
    u AS (SELECT CAST({_hexbyte('hh', 0)} % {_Q101_HOSTS} AS INT) AS host,
                 '/p' || CAST(d0 % 10 AS VARCHAR) || '/'
                      || CAST(d0 AS VARCHAR) AS path
          FROM d),
    hosts AS (SELECT CAST(range AS INT) AS host FROM range({_Q101_HOSTS})),
    rules AS (
        SELECT host, 0 AS allow,
               '/p' || CAST(host % 7 AS VARCHAR) AS pattern FROM hosts
        UNION ALL
        SELECT host, 1, '/p' || CAST(host % 7 AS VARCHAR) || '/1' FROM hosts
        UNION ALL
        SELECT host, 0, '/' FROM hosts WHERE host % 16 = 0),
    m AS (SELECT u.host, u.path, max(len(r.pattern) * 2 + r.allow) AS best
          FROM u LEFT JOIN rules r
            ON r.host = u.host AND starts_with(u.path, r.pattern)
          GROUP BY u.host, u.path)
    SELECT host, count(*) AS n_urls,
           CAST(sum(CASE WHEN best IS NULL OR best % 2 = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
           CAST(sum(CASE WHEN best IS NOT NULL AND best % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
    FROM m GROUP BY host"""


# q105: the identical integer apportionment — floor shares via // ,
# remainders ranked (desc, host asc), leftover = B − Σfloor; sums cast
# from DuckDB's HUGEINT back to BIGINT
ORACLE_SQL["q105_crawl_budget"] = f"""
    WITH d AS (SELECT md5('h|' || COALESCE(CAST(doc_id AS VARCHAR), ''))
                 AS hh
               FROM documents),
    p AS (SELECT CAST({_hexbyte('hh', 0)} % {_Q101_HOSTS} AS INT) AS host,
                 count(*) AS pending
          FROM d GROUP BY 1),
    s AS (SELECT host, pending,
                 ({_Q105_BUDGET} * pending) // t.tot AS fl,
                 ({_Q105_BUDGET} * pending) % t.tot AS rem
          FROM p, (SELECT CAST(sum(pending) AS BIGINT) AS tot FROM p) t),
    r AS (SELECT host, pending, fl,
                 row_number() OVER (ORDER BY rem DESC, host ASC) AS rnk,
                 (SELECT CAST({_Q105_BUDGET} - sum(fl) AS BIGINT) FROM s)
                   AS lft
          FROM s)
    SELECT host, pending,
           CAST(fl + CASE WHEN rnk <= lft THEN 1 ELSE 0 END AS BIGINT)
             AS quota
    FROM r"""


# q106: identical rank rule — cumulative counts over the per-source
# value domain, threshold ceil(q·n) as (q_num·n + q_den−1) // q_den
ORACLE_SQL["q106_length_percentiles"] = """
    WITH c AS (SELECT source, coalesce(n_chars, 0) AS v, count(*) AS cnt
               FROM documents GROUP BY 1, 2),
    w AS (SELECT source, v, cnt,
                 sum(cnt) OVER (PARTITION BY source ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM c),
    t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs
          FROM c GROUP BY 1)
    SELECT t.source, t.n_docs,
           CAST(min(CASE WHEN w.cum >= (1 * t.n_docs + 1) // 2
                         THEN w.v END) AS BIGINT) AS p50,
           CAST(min(CASE WHEN w.cum >= (9 * t.n_docs + 9) // 10
                         THEN w.v END) AS BIGINT) AS p90,
           CAST(min(CASE WHEN w.cum >= (99 * t.n_docs + 99) // 100
                         THEN w.v END) AS BIGINT) AS p99
    FROM w JOIN t ON w.source IS NOT DISTINCT FROM t.source
    GROUP BY 1, 2"""


# q107: the identical fixture map (coin byte, mod-4 terminals, 1-3
# step-down redirects) walked by a recursive CTE — each node keeps the
# row where its cursor lands on a terminal; hops counts the steps. The
# Spark side resolves the same chains by pointer doubling.
ORACLE_SQL["q107_redirect_resolve"] = f"""
    WITH RECURSIVE nodes AS (
        SELECT CAST(range AS INT) AS u,
               md5('r|' || CAST(range AS VARCHAR)) AS rh
        FROM range({_Q107_NODES})),
    mp AS (SELECT u,
                  (u = 0 OR {_hexbyte('rh', 0)} % 4 = 0) AS term,
                  CASE WHEN (u = 0 OR {_hexbyte('rh', 0)} % 4 = 0) THEN u
                       ELSE greatest(u - (1 + {_hexbyte('rh', 0)} % 3), 0)
                  END AS nxt
           FROM nodes),
    walk AS (
        SELECT u AS node, u AS cur, 0 AS hops FROM mp
        UNION ALL
        SELECT w.node, m.nxt, w.hops + 1
        FROM walk w JOIN mp m ON m.u = w.cur
        WHERE NOT m.term),
    fin AS (SELECT w.node, w.cur AS final, w.hops
            FROM walk w JOIN mp m ON m.u = w.cur
            WHERE m.term),
    st AS (SELECT md5('u|' || COALESCE(CAST(doc_id AS VARCHAR), ''))
             AS uh
           FROM documents),
    sn AS (SELECT CAST({_hexbyte('uh', 0)} % {_Q107_NODES} AS INT) AS node
           FROM st)
    SELECT CAST(f.final AS INT) AS final,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT s.node) AS BIGINT) AS n_starts,
           CAST(max(f.hops) AS INT) AS max_hops
    FROM sn s JOIN fin f ON f.node = s.node
    GROUP BY 1"""


# q108: identical path fixture + digit-run collapse; DuckDB needs the
# explicit 'g' flag to match Spark's replace-all default
ORACLE_SQL["q108_url_templates"] = f"""
    WITH d AS (SELECT coalesce(doc_id, 0) AS d0, source, lang,
                      md5('t|' || COALESCE(CAST(doc_id AS VARCHAR), ''))
                        AS th
               FROM documents),
    p AS (SELECT '/' || coalesce(lang, '') || '/' || coalesce(source, '')
               || '/c' || CAST(d0 % 7 AS VARCHAR)
               || '/item-' || CAST(d0 AS VARCHAR)
               || CASE WHEN {_hexbyte('th', 0)} % 5 = 0
                       THEN '?sid=' || CAST((d0 * 7919) % 100000 AS VARCHAR)
                       ELSE '' END AS path
          FROM d),
    a AS (SELECT regexp_replace(path, '[0-9]+', '{{n}}', 'g') AS template,
                 count(*) AS n_urls, count(DISTINCT path) AS n_paths
          FROM p GROUP BY 1),
    t AS (SELECT count(*) AS tot FROM p)
    SELECT template, CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_paths AS BIGINT) AS n_paths,
           (n_urls * 100 > {_Q108_TRAP_PCT} * tot) AS is_trap
    FROM a CROSS JOIN t"""


# q109: the q40 components and q49 scores chained verbatim (q50/q54
# precedent — single source of truth for the shared semantics); keeper
# by row_number over the q54 total order, which picks the identical
# tuple min(struct) selects on the Spark side
ORACLE_SQL["q109_cluster_reps"] = (
    """
    WITH cl AS (SELECT * FROM ("""
    + ORACLE_SQL["q40_dup_clusters"]
    + """)),
    sc AS (SELECT * FROM ("""
    + ORACLE_SQL["q49_lm_score"]
    + """)),
    j AS (SELECT cl.cluster_id, sc.doc_id, sc.n_words, sc.avg_nll
          FROM cl JOIN sc ON cl.doc_id IS NOT DISTINCT FROM sc.doc_id),
    r AS (SELECT cluster_id, doc_id, avg_nll,
                 row_number() OVER (PARTITION BY cluster_id
                     ORDER BY (n_words = 0), avg_nll, doc_id NULLS FIRST)
                   AS rn,
                 count(*) OVER (PARTITION BY cluster_id) AS nm
          FROM j)
    SELECT cluster_id, doc_id AS keeper_id, avg_nll AS keeper_nll,
           CAST(nm AS BIGINT) AS n_members,
           CAST(nm - 1 AS BIGINT) AS n_dropped
    FROM r WHERE rn = 1"""
)


# q110: identical signature/lag/epoch arithmetic — epoch_us // 1e6 is
# DuckDB's floor-seconds (matches Spark's timestamp→long cast); the
# lag window pins NULLS FIRST (Spark's ASC default, q39/q54 precedent)
ORACLE_SQL["q110_recrawl_schedule"] = f"""
    WITH o AS (SELECT user_id AS url_key,
                      coalesce(epoch_us(ts) // 1000000, 0) AS ep,
                      CAST(floor(coalesce(value, 0.0) * 100) AS BIGINT)
                        % {_Q110_SIG_MOD} AS sig,
                      lag(CAST(floor(coalesce(value, 0.0) * 100) AS BIGINT)
                          % {_Q110_SIG_MOD})
                        OVER (PARTITION BY user_id
                              ORDER BY ts NULLS FIRST,
                                       event_id NULLS FIRST) AS prev_sig
               FROM events),
    a AS (SELECT url_key,
                 CAST(count(*) AS BIGINT) AS n_obs,
                 CAST(sum(CASE WHEN prev_sig IS NOT NULL
                                AND sig <> prev_sig
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                 max(ep) - min(ep) AS span_sec,
                 max(ep) AS lst
          FROM o GROUP BY 1)
    SELECT url_key, n_obs, n_changes,
           CAST(span_sec AS BIGINT) AS span_sec,
           CAST(span_sec // greatest(n_changes, 1) AS BIGINT)
             AS interval_sec,
           CAST(lst + greatest(span_sec // greatest(n_changes, 1),
                               {_Q110_MIN_GAP}) AS BIGINT)
             AS next_due_epoch
    FROM a"""


# q111: identical equal-height rule — shard(v) = (cum_before·N) div
# total over the value-domain cumulative window
ORACLE_SQL["q111_range_planner"] = f"""
    WITH c AS (SELECT coalesce(n_chars, 0) AS v, count(*) AS cnt
               FROM documents GROUP BY 1),
    w AS (SELECT v, cnt,
                 sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cum
          FROM c),
    t AS (SELECT sum(cnt) AS tot FROM c),
    s AS (SELECT v, cnt,
                 ((cum - cnt) * {_Q111_SHARDS}) // tot AS shard_id
          FROM w CROSS JOIN t)
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CAST(min(v) AS BIGINT) AS lo,
           CAST(max(v) AS BIGINT) AS hi,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM s GROUP BY 1"""


# q112: identical md5-uniform + exponential-race arithmetic; 9 dp
# rounding (see sampling.weighted_sample for the parity analysis) and
# the (race, id) total order make the k-row set engine-identical
ORACLE_SQL["q112_weighted_sample"] = f"""
    WITH d AS (SELECT doc_id,
                      greatest(coalesce(n_chars, 0), 1) AS w,
                      md5('ws|' || COALESCE(CAST(doc_id AS VARCHAR), ''))
                        AS h
               FROM documents),
    r AS (SELECT doc_id, CAST(w AS BIGINT) AS w,
                 round(-ln(({_hexbytes_be('h', 6)} + 1.0)
                           / 281474976710657.0) / w, 9) AS race
          FROM d)
    SELECT doc_id, w, race FROM r
    ORDER BY race ASC, doc_id NULLS FIRST LIMIT {_Q112_K}"""


# q113: identical quote injection + k=8 shingle/cap/pair arithmetic;
# bucket cap mirrored as a bucket-count join (whole-bucket drop)
ORACLE_SQL["q113_containment_pairs"] = f"""
    WITH b0 AS (SELECT doc_id, coalesce(text, '') AS t0,
                       md5('ct|' || COALESCE(CAST(doc_id AS VARCHAR), ''))
                         AS ch
                FROM documents),
    inj AS (SELECT doc_id,
                   CASE WHEN {_hexbyte('ch', 0)} % 64 = 0
                        THEN '{_Q113_QUOTE}'
                        WHEN {_hexbyte('ch', 0)} % 16 = 1
                        THEN t0 || ' ' || '{_Q113_QUOTE}'
                        ELSE t0 END AS text
            FROM b0),
    w AS (SELECT doc_id, string_split(text, ' ') ws FROM inj),
    shl AS (SELECT doc_id, array_to_string(ws[i:i+7], ' ') s
            FROM w, unnest(range(1, greatest(len(ws) - 8, 0) + 2)) t(i)),
    sh AS (SELECT DISTINCT doc_id, md5(s) AS h FROM shl),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    bc AS (SELECT h, count(*) AS bn FROM sh GROUP BY 1),
    kept AS (SELECT sh.doc_id, sh.h FROM sh JOIN bc USING (h)
             WHERE bc.bn <= 512),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2
           HAVING count(*) >= {_Q113_SHARED})
    SELECT pr.id_a, pr.id_b, CAST(pr.shared AS BIGINT) AS shared,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           round(pr.shared / least(sa.n, sb.n)::DOUBLE, 6) AS containment
    FROM pr JOIN sz sa ON sa.doc_id = pr.id_a
            JOIN sz sb ON sb.doc_id = pr.id_b"""


# q114: identical tokenization (q80's list_filter CTE), counts,
# marginals, and the same double-division + 6 dp PMI rounding with
# (pmi DESC, w1, w2) total order
ORACLE_SQL["q114_pmi_collocations"] = f"""
    WITH w AS (SELECT list_filter(string_split(regexp_replace(
                          lower(coalesce(text, '')), '\\s+', ' ', 'g'), ' '),
                          x -> x <> '') AS ws
               FROM documents),
    p AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
          FROM w, unnest(range(1, len(ws))) t(i)),
    bg AS (SELECT w1, w2, count(*) AS n12 FROM p GROUP BY ALL),
    m1 AS (SELECT w1, sum(n12) AS c1 FROM bg GROUP BY 1),
    m2 AS (SELECT w2, sum(n12) AS c2 FROM bg GROUP BY 1),
    nt AS (SELECT CAST(sum(n12) AS DOUBLE) AS nn FROM bg)
    SELECT bg.w1, bg.w2, CAST(bg.n12 AS BIGINT) AS n12,
           CAST(m1.c1 AS BIGINT) AS c1, CAST(m2.c2 AS BIGINT) AS c2,
           round(ln((bg.n12::DOUBLE * nt.nn)
                    / (m1.c1::DOUBLE * m2.c2::DOUBLE)), 6) AS pmi
    FROM bg JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN nt
    WHERE bg.n12 >= {_Q114_MIN_COUNT}
    ORDER BY pmi DESC, bg.w1 ASC, bg.w2 ASC
    LIMIT {_Q114_K}"""
