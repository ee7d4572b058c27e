"""The end-to-end corpus-build pipeline — every curation operator the
suite ships, COMPOSED the way a real pretraining-data build runs them
(the reference's own e2e is its Makefile pipeline,
examples/test_server/Makefile:1-9; this is the data-curation analogue):

    pii-scrub → paragraph dedup (first-wins) → repetition gate →
    benchmark decontamination gate → unigram-LM quality-percentile
    gate → deterministic hash sample → overlapping chunking →
    sequence packing

Each stage is individually oracled (q46, q47, q43, q44, q49/q54, q37,
q48, q39); composing them is where column contracts and row-identity
bugs hide — a doc dropped by one gate must never resurface downstream,
later stages must consume the RETAINED text (not the original), and the
quality percentile must rank over exactly the surviving population.
q55 runs this composition against one DuckDB oracle that chains the
same CTEs.

Every gate decision is exact integer arithmetic (Fraction
cross-multiplication for the repetition and contamination cutoffs, the
rank-based ceil for the percentile), so the surviving doc set — and
therefore every downstream row — is engine-portable with no
float-rounding coin flips.

Scale shape: nothing here adds a single operator beyond the composed
stages' own plans — the dedup join stays skew-splittable, the
benchmark shingles stay broadcast, the percentile stays the two-pass
range rank, packing stays the two-level cumsum. Gates compose as
left-semi joins on doc_id (combinable, AQE-planned); the corpus is
scanned start-to-finish without ever collecting to the driver (the two
driver-visible scalars — the survivor count for the percentile ceil
and the per-partition pack offsets — are O(1) and O(#partitions)).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import decontam as DC
from . import sampling as SA
from . import scrub as SC
from . import text as X
from .packing import with_pack_ids


def corpus_build(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_rate: float = 0.02,
    bench_salt: str = "bench",
    window_words: int = 20,
    rep_k: int = 3,
    rep_max: float = 0.3,
    contam_k: int = 5,
    contam_max_frac: float = 0.05,
    quality_cut: float = 0.9,
    sample_rate: float = 0.5,
    sample_salt: str = "mix",
    chunk_words: int = 64,
    stride: int = 48,
    pack_budget: int = 512,
) -> DataFrame:
    """Run the full curation arc over ``docs`` and return the packed
    training chunks: (doc_id, chunk_id, n_words, chunk_hash, pack_id).

    Stage semantics (the DuckDB oracle chains the same steps):

    1. benchmark = deterministic ``bench_rate`` hash-sample (the eval
       stand-in, q44's convention); benchmark docs leave the corpus.
    2. scrub: PII spans redacted in place (``scrub.redacted``).
    3. paragraph dedup: ``window_words``-word segments, first
       occurrence corpus-wide wins; each doc is reassembled from its
       surviving segments. Docs retaining nothing are dropped.
    4. repetition gate: drop docs whose ``rep_k``-gram duplicated
       fraction exceeds ``rep_max`` (computed on the retained text;
       exact: (n − d)·denom ≤ numer·n keeps).
    5. decontamination gate: drop docs whose distinct ``contam_k``-gram
       overlap fraction with the benchmark exceeds ``contam_max_frac``.
    6. quality gate: unigram-LM avg-NLL percentile over the SURVIVORS;
       keep the best ``ceil(n·quality_cut)`` by rank.
    7. sample: deterministic ``sample_rate`` hash-sample of the keepers
       (decorrelated from the benchmark sample by ``sample_salt``).
    8. chunk: ``chunk_words``-word windows at ``stride``.
    9. pack: greedy fill into ``pack_budget``-word packs in
       (doc_id, chunk_id) order (two-level distributed cumsum).

    The returned frame carries ``df_pipeline_caches`` — the cached
    intermediates of the rank and cumsum passes — for callers that want
    to unpersist after their terminal action.
    """
    did = F.col(id_col)
    # project the benchmark side to the pipeline's internal "text"
    # column up front — every later stage (incl. the contamination
    # gate's benchmark_shingles) reads "text", regardless of the
    # caller's text_col
    bench = SA.hash_sample(docs, bench_rate, key_col=id_col, salt=bench_salt).select(
        did, F.col(text_col).alias("text")
    )
    corpus = docs.join(bench.select(id_col), id_col, "left_anti")
    scrubbed = corpus.select(did, SC.redacted(F.col(text_col)).alias("text"))
    retained = SC.paragraph_retained(
        scrubbed, text_col="text", id_col=id_col, window_words=window_words
    ).filter(F.col("text") != "")

    rfr = Fraction(str(rep_max))
    rep = DC.repetition_stats(retained, text_col="text", id_col=id_col, k=rep_k)
    rep_keep = rep.filter(
        (F.col("n_ngrams") - F.col("n_distinct")) * F.lit(rfr.denominator)
        <= F.lit(rfr.numerator) * F.col("n_ngrams")
    ).select(id_col)
    gated = retained.join(rep_keep, id_col, "left_semi")

    contam = DC.ngram_contamination(
        gated, bench, text_col="text", id_col=id_col,
        k=contam_k, max_frac=contam_max_frac,
    )
    clean_ids = contam.filter(~F.col("contaminated")).select(id_col)
    survivors = gated.join(clean_ids, id_col, "left_semi")

    quality = X.quality_percentile_gate(
        survivors, cut=quality_cut, text_col="text", id_col=id_col
    )
    keep_ids = quality.filter(F.col("keep")).select(id_col)
    keepers = survivors.join(keep_ids, id_col, "left_semi")

    sampled = SA.hash_sample(
        keepers, sample_rate, key_col=id_col, salt=sample_salt
    )
    chunks = SC.chunk_documents(
        sampled, chunk_words=chunk_words, stride=stride,
        text_col="text", id_col=id_col,
    )
    packed = with_pack_ids(
        chunks, budget=pack_budget,
        order_cols=[id_col, "chunk_id"], weight_col="n_words",
    )
    out = packed.select(id_col, "chunk_id", "n_words", "chunk_hash", "pack_id")
    out.df_pipeline_caches = [quality.df_ordered_cache, packed.df_ordered_cache]
    return out
