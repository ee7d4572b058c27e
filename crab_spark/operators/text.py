"""Text analysis operators — all pure built-in expressions (codegen'd);
nothing here crosses into Python.

- token/word stats, quality scoring (length/punct/stopword ratios),
- language-ID by stopword-hit heuristic over a tiny per-language
  function-word table (broadcast-joined, or inlined as expressions),
- document fingerprinting (normalized-content hash + a positional
  rolling-style hash built from shingle hashes).
"""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import fan_out
from .dedup import normalized, word_shingles

# Function-word profiles: the 20 highest-frequency function words per
# language, drawn from the standard public stopword lists (the
# NLTK/snowball-style sets every lang-ID heuristic uses). Equal-size
# profiles keep the argmax unbiased; 20 words (vs the r3 7-word lists)
# materially reduces misclassification of short and code-mixed docs
# (r3 verdict item 8). Words shared across languages (de/la/un between
# fr and es) are fine — distinctive words dominate the count, and ties
# break by language-code order, deterministically, in both the Spark
# expression and the SQL oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "an", "is", "are", "was", "and", "of", "to", "in",
           "that", "it", "for", "on", "with", "as", "this", "be", "by",
           "from"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den",
           "von", "mit", "nicht", "auf", "sich", "im", "für", "des",
           "dem", "auch", "werden"],
    "fr": ["le", "les", "et", "est", "une", "des", "dans", "que", "pour",
           "pas", "sur", "au", "avec", "ne", "ce", "il", "qui", "plus",
           "sont", "mais"],
    "es": ["el", "la", "los", "las", "es", "y", "un", "de", "en", "no",
           "por", "con", "para", "se", "del", "al", "como", "más", "pero",
           "sus"],
    "zh": ["的", "是", "和", "了", "在", "有", "不", "我", "这", "他",
           "们", "为", "与", "对", "中", "也", "就", "要", "会", "个"],
}


def tokens(text: Column) -> Column:
    """ASCII-whitespace tokens: runs of whitespace collapse to one
    separator before the split, so newline/tab-separated corpora (all
    real crawl text) count words correctly — a bare split(' ') counted
    a 500-line document as ONE token and broke every consumer of word
    counts (pack budgets, source reputation, token-budget mixes).
    Sites that feed normalized() text collapse twice — harmless, one
    extra codegen'd regexp pass. Oracle mirror:
    ``string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' ')``."""
    return F.split(F.regexp_replace(text, r"\s+", " "), " ")


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                tokenizer=None) -> DataFrame:
    """Whitespace tokens + a subword count. Default: the chars/4
    rule-of-thumb, pure codegen (and SQL-oracle-able). Pass a trained
    ``operators.tokenizer.BPETokenizer`` for EXACT subword counts via
    one Arrow-batched UDF — same output schema, so pack budgeting and
    downstream consumers don't change."""
    t = tokens(F.col(text_col))
    if tokenizer is not None:
        from .tokenizer import token_count_udf

        bpe = token_count_udf(tokenizer)(F.col(text_col))
    else:
        bpe = F.ceil(F.length(text_col) / F.lit(4)).cast("long")
    # fan_out: per-row tokenize/count work must not fuse into a
    # single-task scan (one-row-group inputs); no-op at real scale
    docs = fan_out(docs.select(id_col, text_col), id_col)
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        bpe.alias("n_bpe_est"),
    )


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cheap quality signals: length, mean word length, punctuation
    ratio, uppercase ratio, whitespace ratio — all rounded for
    engine-portable comparison."""
    text = F.col(text_col)
    n = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double")
    space = F.length(F.regexp_replace(text, r"[^ ]", "")).cast("double")
    n_words = F.size(tokens(text)).cast("double")
    # fan_out: five regexp passes per row fuse into the scan stage —
    # spread single-row-group inputs first (no-op at real scale)
    docs = fan_out(docs.select(id_col, text_col), id_col)
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.round(n / F.greatest(n_words, F.lit(1.0)), 4).alias("mean_word_len"),
        F.round(punct / F.greatest(n, F.lit(1.0)), 4).alias("punct_ratio"),
        F.round(upper / F.greatest(n, F.lit(1.0)), 4).alias("upper_ratio"),
        F.round(space / F.greatest(n, F.lit(1.0)), 4).alias("space_ratio"),
    )


def heuristic_quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: Fraction | str = "2",
    max_mean_word_len: Fraction | str = "12",
    max_symbol_ratio: Fraction | str = "0.1",
    min_alpha_frac: Fraction | str = "0.8",
    min_stopword_hits: int = 2,
    stopwords: list[str] | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The published heuristic rule-set gate (Gopher, Rae et al. 2021
    §A1.1 / RefinedWeb) — the cheap first filter every pretraining
    pipeline runs before any model-based scoring. Five rules, each
    surfaced as its own boolean so a corpus report can attribute WHY
    documents were dropped (a keep-only gate hides whether a source
    died of word-soup or of symbol spam):

    - ``rule_word_count``: min_words ≤ #words ≤ max_words
    - ``rule_mean_word_len``: mean word length within
      [min_mean_word_len, max_mean_word_len]
    - ``rule_symbol_ratio``: (#'#' + #'...') / #words ≤ max_symbol_ratio
    - ``rule_alpha_words``: fraction of words containing a letter
      ≥ min_alpha_frac
    - ``rule_stopwords``: ≥ min_stopword_hits DISTINCT function words
      present (default: the English profile of LANG_STOPWORDS)

    Every ratio rule is decided in EXACT integer arithmetic (Fraction
    cross-multiplication — the q44/q54/q57 convention), so the keep set
    is engine-portable with no float-rounding coin flips. Defaults are
    rescaled to this synthetic corpus's 10–99-word documents; a real
    deployment passes Gopher's published 50/100k/3/10 constants.

    Scale shape: one scan, zero shuffles — everything is per-row
    expressions over the tokenized text (the two array lambdas are
    interpreted, not codegen'd, but per-row over ≤doc-length arrays;
    the hot md5/regexp work stays in codegen)."""
    a = Fraction(str(min_mean_word_len))
    b = Fraction(str(max_mean_word_len))
    s = Fraction(str(max_symbol_ratio))
    al = Fraction(str(min_alpha_frac))
    stops = stopwords if stopwords is not None else LANG_STOPWORDS["en"]

    # NULL text = empty (q46 convention): n_words 0 → the word-count
    # rule rejects it with a False verdict, never a NULL keep
    norm = normalized(F.coalesce(F.col(text_col), F.lit("")))
    ws = F.split(norm, " ")
    n_words = F.size(F.filter(ws, lambda w: w != "")).cast("long")
    word_chars = F.length(F.regexp_replace(norm, " ", "")).cast("long")
    n_hash = (F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit("")))).cast("long")
    n_ellipsis = (
        (F.length(norm) - F.length(F.replace(norm, F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    n_symbols = n_hash + n_ellipsis
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long")
    hits = F.size(
        F.array_intersect(F.array_distinct(ws), F.array(*[F.lit(w) for w in stops]))
    ).cast("long")

    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mwl = (word_chars * a.denominator >= a.numerator * n_words) & (
        word_chars * b.denominator <= b.numerator * n_words
    )
    r_symbol = n_symbols * s.denominator <= s.numerator * n_words
    r_alpha = n_alpha * al.denominator >= al.numerator * n_words
    r_stop = hits >= min_stopword_hits
    # fan_out: per-row rule evaluation fuses into the scan (no-op at scale)
    docs = fan_out(docs)
    return docs.select(
        F.col(id_col),
        *keep_cols,
        n_words.alias("n_words"),
        F.round(word_chars / F.greatest(n_words, F.lit(1)), 4).alias("mean_word_len"),
        r_words.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_symbol.alias("rule_symbol_ratio"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_mwl & r_symbol & r_alpha & r_stop).alias("keep"),
    )


class StopwordModel:
    """Reference ``lang_id`` model: the SAME stopword-hit heuristic as
    the expression path, executed in pandas — the template a real
    model swap-in (fastText & co.) follows, and the equivalence-test
    fixture proving both paths agree. A model object must be picklable
    and expose ``predict(texts: pd.Series) -> pd.DataFrame`` with
    columns ``pred_lang`` (str) and ``hits`` (int)."""

    def __init__(self, profiles: dict[str, list[str]] | None = None):
        self.profiles = {
            lang: frozenset(ws)
            for lang, ws in (profiles or LANG_STOPWORDS).items()
        }

    def predict(self, texts):
        import re

        import pandas as pd

        langs = sorted(self.profiles)
        preds, hits = [], []
        for t in texts:
            # ASCII whitespace class, NOT \s: Python's \s is
            # unicode-aware (NBSP, U+3000) while the expression path's
            # normalized() uses Java \s (ASCII-only) — the equivalence
            # contract requires identical tokenization on both paths
            toks = set(
                re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).split(" ")
            )
            scores = [len(toks & self.profiles[lang]) for lang in langs]
            best = max(scores)
            # argmax with ties broken by language-code order — the
            # identical rule as the expression path's coalesce chain
            preds.append(next(l for l, s in zip(langs, scores) if s == best))
            hits.append(best)
        return pd.DataFrame({"pred_lang": preds, "hits": hits})


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model=None,
) -> DataFrame:
    """Language ID. Default path: stopword-hit heuristic — score(lang)
    = number of distinct tokens that are that language's function
    words; predict argmax (ties broken by language code order). Pure
    expressions — the profile table is tiny and inlined; at scale you'd
    broadcast-join a profile table instead. This is the oracle-able
    path q32 verifies.

    Pass ``model`` (see ``StopwordModel`` for the contract — mirrors
    the tokenizer plug of ``token_count``) to swap in a real
    model-based classifier: one Arrow-batched crossing per batch, SAME
    output schema (id, pred_lang, hits), so downstream consumers
    (stratified sampling, the source-mix report) don't change."""
    if model is not None:
        import pandas as pd  # noqa: F401 — contract dependency
        from pyspark.sql import types as T

        pred_t = T.StructType(
            [
                T.StructField("pred_lang", T.StringType(), True),
                T.StructField("hits", T.IntegerType(), True),
            ]
        )

        @F.pandas_udf(pred_t)
        def predict(texts):
            out = model.predict(texts)
            return out[["pred_lang", "hits"]].astype(
                {"pred_lang": str, "hits": "int32"}
            )

        # NULL text stays NULL on BOTH paths (the expression path's
        # scores are NULL for NULL input): mask the model verdict so
        # the StopwordModel equivalence contract holds row-for-row
        notnull = F.col(text_col).isNotNull()
        docs = fan_out(docs.select(id_col, text_col), id_col)
        return docs.select(
            F.col(id_col), notnull.alias("_nn"),
            predict(F.col(text_col)).alias("_p"),
        ).select(
            id_col,
            F.when(F.col("_nn"), F.col("_p.pred_lang")).alias("pred_lang"),
            F.when(F.col("_nn"), F.col("_p.hits")).alias("hits"),
        )
    toks = tokens(normalized(F.col(text_col)))
    scores = [
        F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in ws])))
        .alias(f"_s_{lang}")
        for lang, ws in LANG_STOPWORDS.items()
    ]
    langs = sorted(LANG_STOPWORDS)
    # fan_out: the per-row distinct-token ∩ profile work fuses into the
    # scan stage — spread single-row-group inputs (no-op at real scale)
    scored = fan_out(docs.select(id_col, text_col), id_col).select(
        F.col(id_col), *scores
    )
    best = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"_s_{l}") == best, F.lit(l)) for l in langs]
    )
    return scored.select(F.col(id_col), pred.alias("pred_lang"), best.alias("hits"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                k: int = 5) -> DataFrame:
    """Document fingerprint: md5 of normalized content (exact identity)
    plus a winnowing-style structural print — the min shingle hash per
    document over k-word windows (rolling-hash flavored, built from the
    same shingle machinery as MinHash)."""
    norm = normalized(F.col(text_col))
    sh = word_shingles(norm, k)
    # fan_out: per-row shingle + md5 HOF work fuses into the scan
    # stage — spread single-row-group inputs (no-op at real scale)
    return fan_out(docs.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.md5(norm).alias("content_hash"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("structural_hash"),
    )


def lm_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Unigram-LM quality score: per-document mean negative log
    likelihood (nats) under the corpus's own unigram distribution — the
    cheap stand-in for the perplexity-bucket filter of a pretraining
    pipeline (gibberish / rare-token soup scores high, stopword-heavy
    boilerplate scores low). No smoothing needed: the model is fit on
    the same corpus, so every word has mass.

    Scale shape: the token relation feeds two map-side-combinable
    aggregations (per-(doc, word) counts and the global word
    frequencies); the scoring join runs on the PRE-AGGREGATED per-doc
    counts, so a hot stopword contributes one row per document, not one
    per occurrence — the remaining skew is the standard AQE skew-join
    case. The vocabulary total is a 1-row broadcast."""
    toks = (
        fan_out(docs.select(id_col, text_col), id_col)
        .select(
            F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("w")
        )
        .filter(F.col("w") != "")
    )
    # cached: doc_counts feeds the frequency table, the totals chain,
    # AND the scoring join; deriving alone is not enough — exchange
    # reuse fails whenever AQE picks broadcasts or pruning diverges
    # (plan audit measured 3 corpus explodes per q49 run). The cache
    # pins ONE token explode; df_ordered_cache is the caller-unpersist
    # handle.
    doc_counts = (
        toks.groupBy(id_col, "w").agg(F.count("*").alias("c")).cache()
    )
    freqs = doc_counts.groupBy("w").agg(F.sum("c").alias("n"))
    total = freqs.agg(F.sum("n").alias("_tot"))
    scored = (
        doc_counts.join(freqs, "w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.round(
                F.sum(F.col("c") * -F.log(F.col("n") / F.col("_tot")))
                / F.sum("c"),
                4,
            ).alias("avg_nll"),
        )
    )
    out = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("avg_nll", F.lit(0.0)).alias("avg_nll"),
        )
    )
    out.df_ordered_cache = doc_counts
    return out


def word_freq(docs: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Corpus-wide word frequency (explode → groupBy). The classic
    map-side-combinable aggregation: partial counts per partition,
    single shuffle on the word. The input is fanned out first so the
    tokenize+explode work never fuses into a single-task scan of a
    one-row-group table (no-op at real scale)."""
    return (
        fan_out(docs.select(text_col))
        .select(F.explode(tokens(normalized(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF keywords per document (the classic content-tagging
    / topic-sampling signal). score = tf × ln(N / df); ties break by
    word ascending, so the per-doc ranking is total and the SQL oracle
    reproduces it exactly.

    Scale shape: tf and df are both map-side-combinable aggregations
    over the token relation; N is a 1-row broadcast; the per-doc top-k
    window partitions by doc_id — each partition is one document's
    DISTINCT words, bounded by doc length, so no skewed giant windows.
    The tf⋈df join is the same pre-aggregated shape as lm_score (one
    row per (doc, word), AQE skew-safe)."""
    toks = (
        fan_out(docs.select(id_col, text_col), id_col)
        .select(
            F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("w")
        )
        .filter(F.col("w") != "")
    )
    # cached: tf feeds the df table AND the scoring join, and deriving
    # alone does not survive AQE/pruning canonicalization (the
    # bigram_lm lesson) — without the cache the corpus token explode
    # ran once per consumer
    tf = toks.groupBy(id_col, "w").agg(F.count("*").alias("tf")).cache()
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("_n"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("w").asc()
    )
    out = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 4),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            id_col,
            F.col("rk").alias("rank"),
            F.col("w").alias("word"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )
    out.df_ordered_cache = tf
    return out


def quality_percentile_gate(
    docs: DataFrame,
    cut: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-percentile filter: rank every document by its
    unigram-LM avg-NLL (lm_score) and keep the bottom ``cut`` fraction
    — the standard 'drop the worst decile' corpus gate. The percentile
    is rank-based over the TOTAL order (avg_nll, doc_id), never an
    interpolated float quantile, so the keep set is deterministic and
    engine-portable (float quantile interpolation differs across
    engines; ranks don't).

    Scale shape: the rank comes from util.ordered_index — the two-pass
    range-partitioned rank, NO single-task global window; the doc count
    is known from the same pass.

    Empty/whitespace-only documents (n_words == 0, whose avg_nll
    coalesces to 0.0 — nominally the BEST score) are ranked LAST, not
    first: an empty doc passing a quality gate while displacing a real
    document is exactly backwards. The oracle orders by the same
    (n_words = 0, avg_nll, doc_id) key."""
    from ..util import ordered_index

    scored = lm_score(docs, text_col=text_col, id_col=id_col).withColumn(
        "_empty", F.col("n_words") == 0
    )
    ranked = ordered_index(scored, ["_empty", "avg_nll", id_col], "_rk", start=0)
    cache = ranked.df_ordered_cache
    n = ranked.count()  # cached by ordered_index; count is free-ish
    out = ranked.select(
        id_col,
        "n_words",
        "avg_nll",
        F.round(F.col("_rk") / F.greatest(F.lit(n - 1), F.lit(1)), 6).alias(
            "quality_pct"
        ),
        # keep the best ceil(n·cut) documents — an integer rank rule,
        # reproduced verbatim by the oracle (no float quantile). Fraction
        # makes the ceil decimal-exact: float 500*0.9 is 450.0000…06 and
        # would ceil to 451, while SQL DECIMAL (and any human) says 450.
        (F.col("_rk") < F.lit(math.ceil(Fraction(str(cut)) * n))).alias("keep"),
    )
    out.df_ordered_cache = cache
    return out


def source_reputation_gate(
    docs: DataFrame,
    min_mean_words: int = 5,
    max_dup_frac: Fraction | str = "0.2",
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Source-level (host/domain-level) corpus gate — the CommonCrawl-
    style reputation filter: a SOURCE is kept only when (a) its mean
    document length clears ``min_mean_words`` whitespace words and (b)
    its within-source exact-duplicate fraction stays at or under
    ``max_dup_frac``. Low-quality or heavily-syndicated hosts get
    dropped wholesale — per-doc gates can't see that a domain is 90%
    boilerplate, this one can.

    Both rules are decided in EXACT integer arithmetic (Fraction
    cross-multiplication, the q54 convention), so the keep set is
    engine-portable: keep ⇔ sum_words ≥ min_mean_words·n_docs AND
    (n_docs − n_distinct_texts)·denom ≤ num·n_docs.

    Output: one row per document (doc_id, source, src_n_docs,
    src_mean_words, src_dup_frac, keep) — what a corpus build consumes
    is ``filter(keep)``.

    Scale shape: dup counting is two map-side-combinable aggregations
    (groupBy(source, text-hash) then groupBy(source) — never a distinct
    over raw text); the per-source reputation table is O(#sources),
    broadcast back onto the corpus. Zero corpus-wide shuffles beyond
    the two combinable aggs."""
    frac = Fraction(str(max_dup_frac))
    n_words = F.size(tokens(F.col(text_col))).cast("long")
    # fan_out: per-row tokenize + md5 fuses into the scan (no-op at scale)
    docs = fan_out(docs.select(id_col, source_col, text_col))
    per_text = (
        docs.select(
            F.col(source_col).alias("source"),
            n_words.alias("_w"),
            F.md5(F.col(text_col)).alias("_th"),
        )
        .groupBy("source", "_th")
        .agg(F.count("*").alias("_n"), F.sum("_w").alias("_wsum"))
    )
    rep = per_text.groupBy("source").agg(
        F.sum("_n").alias("src_n_docs"),
        F.sum("_wsum").alias("_words"),
        F.count("*").alias("_distinct"),
    )
    dups = F.col("src_n_docs") - F.col("_distinct")
    rep = rep.select(
        "source",
        "src_n_docs",
        F.round(F.col("_words") / F.col("src_n_docs"), 4).alias("src_mean_words"),
        F.round(dups / F.col("src_n_docs"), 4).alias("src_dup_frac"),
        (
            (F.col("_words") >= F.lit(min_mean_words) * F.col("src_n_docs"))
            & (dups * F.lit(frac.denominator)
               <= F.lit(frac.numerator) * F.col("src_n_docs"))
        ).alias("keep"),
    )
    # null-safe equality: a NULL source is a legitimate reputation
    # group (per_text/rep aggregate it like any other) and its docs
    # must still get a gate verdict — a plain "source" equi-join would
    # silently drop them
    lhs = docs.select(F.col(id_col), F.col(source_col).alias("source"))
    return lhs.join(
        F.broadcast(rep.withColumnRenamed("source", "_rsrc")),
        lhs["source"].eqNullSafe(F.col("_rsrc")),
    ).select(id_col, "source", "src_n_docs", "src_mean_words",
             "src_dup_frac", "keep")


def linear_quality_score(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    join_weights: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Hashed-bag-of-words linear quality classifier — the
    fastText-style model-based filter (Joulin et al. 2016) that
    DCLM/FineWeb-class pipelines run after the heuristic gate: each
    token hashes into one of ``len(weights)`` buckets, the document's
    score is ``bias + Σ weights[bucket(token)]`` over ALL occurrences
    (bag semantics), and ``keep = score > 0`` — which IS the
    sigmoid-at-0.5 decision, since sigmoid is monotone; the raw margin
    stays engine-exact while probabilities would round differently
    per libm. The token bucket is the first two md5 bytes mod
    |weights| (the engine's deterministic-hash convention), so a
    trained weight vector is portable across engines and runs.

    Reproducibility contract: pass weights that are exactly
    representable dyadic rationals (k/2^m, e.g. quantized to 1/256)
    and every partial sum is EXACT in double — the score is
    independent of Spark's partition-order-dependent summation AND
    bit-equal to the SQL oracle. Arbitrary floats still work but the
    last ulp may then depend on aggregation order.

    Scale shape: the default inline path is ONE scan, zero shuffles —
    the weight array is a codegen literal and the per-token fold runs
    inside F.aggregate (fine for the D ≤ ~64k of a distilled gate).
    ``join_weights=True`` is the real-model path (fastText D = 2M
    buckets would bloat every task's codegen): explode → bucket →
    BROADCAST-join the (bucket, weight) table → map-side-combinable
    groupBy(doc) sum; the corpus still never shuffles on anything but
    doc_id. NULL/empty text scores exactly ``bias`` (q46 convention:
    a verdict, not a dropped row)."""
    d = len(weights)
    if d == 0:
        raise ValueError("weights must be non-empty")
    # fan_out: per-token md5 bucketing fuses into the scan (no-op at scale)
    docs = fan_out(docs, id_col)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    tks = F.filter(tokens(normalized(txt)), lambda w: w != "")

    def bucket(w: Column) -> Column:
        return F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long") % d

    if not join_weights:
        wlit = F.array(*[F.lit(float(x)) for x in weights])
        score = F.lit(float(bias)) + F.aggregate(
            tks,
            F.lit(0.0),
            lambda acc, w: acc
            + F.element_at(wlit, (bucket(w) + 1).cast("int")),
        )
        return docs.select(
            F.col(id_col),
            *keep_cols,
            F.size(tks).cast("long").alias("n_tokens"),
            F.round(score, 6).alias("score"),
            (score > 0).alias("keep"),
        )
    wdf = docs.sparkSession.createDataFrame(
        [(i, float(x)) for i, x in enumerate(weights)], "bkt long, w double"
    )
    tok = docs.select(F.col(id_col), F.explode(tks).alias("t"))
    summed = (
        tok.select(F.col(id_col), bucket(F.col("t")).alias("bkt"))
        .join(F.broadcast(wdf), "bkt")
        .groupBy(id_col)
        .agg(F.sum("w").alias("_sw"), F.count("*").alias("_nt"))
    )
    score = F.lit(float(bias)) + F.coalesce("_sw", F.lit(0.0))
    return (
        docs.select(id_col, *keep_cols)
        .join(summed, id_col, "left")
        .select(
            F.col(id_col),
            *keep_cols,
            F.coalesce("_nt", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(score, 6).alias("score"),
            (score > 0).alias("keep"),
        )
    )


def ccnet_buckets(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within
    each language, rank documents by unigram-LM avg-NLL (lm_score) and
    split into equal thirds — head (most fluent; what CCNet keeps for
    pretraining), middle, tail. The split is RANK-based over the total
    order (empty-last, avg_nll, doc_id) with exact integer boundary
    rules (rank·3 < n / rank·3 < 2n), never an interpolated float
    quantile — deterministic and engine-portable, the q54 convention.
    Empty documents rank last within their language (an empty doc in
    'head' is exactly backwards).

    Scale shape: lm_score's audited pre-aggregated plan, then
    ``ordered_index`` (two-pass range-partitioned rank — NO
    per-language window, so the one giant language every real crawl
    has can't funnel into a single task; the rank key leads with the
    language, making per-language rank = global rank − the language's
    broadcast min-rank offset). Per-language stats are one combinable
    agg, O(#languages), broadcast back. NULL languages form their own
    bucket group (null-safe join) instead of silently dropping."""
    from ..util import ordered_index

    scored = (
        lm_score(docs, text_col=text_col, id_col=id_col)
        .join(docs.select(id_col, lang_col), id_col)
        .withColumn("_empty", F.col("n_words") == 0)
    )
    ranked = ordered_index(
        scored, [lang_col, "_empty", "avg_nll", id_col], "_rk", start=0
    )
    cache = ranked.df_ordered_cache
    stats = ranked.groupBy(lang_col).agg(
        F.min("_rk").alias("_off"), F.count("*").alias("_n")
    )
    joined = ranked.join(
        F.broadcast(stats.withColumnRenamed(lang_col, "_lang")),
        F.col(lang_col).eqNullSafe(F.col("_lang")),
    )
    rk = F.col("_rk") - F.col("_off")
    out = joined.select(
        F.col(id_col),
        F.col(lang_col),
        "n_words",
        "avg_nll",
        rk.cast("long").alias("lang_rank"),
        F.col("_n").cast("long").alias("lang_n"),
        F.when(rk * 3 < F.col("_n"), F.lit("head"))
        .when(rk * 3 < 2 * F.col("_n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    out.df_ordered_cache = cache
    return out


def source_prior_gate(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    shrink_k: int = 20,
    min_prior: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Empirical-Bayes SOURCE quality prior — the domain-reputation
    layer (RefinedWeb's URL/domain scoring, CommonCrawl host priors)
    that per-doc gates can't express: a source with three brilliant
    docs shouldn't outrank one with three thousand good ones. Each
    doc is scored by the hashed linear classifier
    (``linear_quality_score``), then per source the raw mean is shrunk
    toward the GLOBAL mean with pseudo-count ``shrink_k``::

        prior = (sum_scores + k * mu) / (n_docs + k),  mu = global mean

    so small sources sit near mu until they earn their own evidence.
    Returns one row per source: (source, n_docs, mean_score,
    prior_score, keep = prior >= min_prior) — the allowlist a crawl's
    host-budget scorer and a corpus build's mixture step both consume
    (complements source_reputation_gate's hard length/dup rules with
    a graded, model-based score).

    Reproducibility: with dyadic-rational weights every per-source
    sum is EXACT in double; mu and the prior are then fixed chains of
    IEEE ops, bit-equal on any engine, so ``keep`` compares the
    UNROUNDED prior (display columns round to 6 dp).

    Scale shape: the doc scan is the classifier's zero-shuffle inline
    path with ``source`` carried through; then ONE map-side-combinable
    groupBy(source). The global totals re-aggregate the per-source
    frame (|sources| rows) and come back as a broadcast single-row
    cross join — the corpus is scanned once and shuffled once, on
    source."""
    scored = linear_quality_score(
        docs.select(id_col, source_col, text_col),
        weights, bias=bias, text_col=text_col, id_col=id_col,
        keep_cols=(source_col,),
    )
    per_src = scored.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("score").alias("_sum"),
    )
    tot = per_src.agg(
        F.sum("_sum").alias("_ts"), F.sum("n_docs").alias("_tn")
    )
    mu = F.col("_ts") / F.col("_tn").cast("double")
    prior = (F.col("_sum") + F.lit(float(shrink_k)) * mu) / (
        F.col("n_docs").cast("double") + F.lit(float(shrink_k))
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        F.round(F.col("_sum") / F.col("n_docs").cast("double"), 6).alias(
            "mean_score"
        ),
        F.round(prior, 6).alias("prior_score"),
        (prior >= F.lit(float(min_prior))).alias("keep"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set (Robertson &
    Zaragoza 2009; the Lucene ``ln(1 + (N-df+.5)/(df+.5))`` idf, which
    never goes negative) — the retrieval scorer a curation pipeline
    uses to pull topic-targeted subsets out of a web corpus ("find the
    k docs most about X"), one notch smarter than tfidf_topk's
    per-doc keywords because it length-normalizes via k1/b. Returns
    the top-k (doc_id, dl, score) under the TOTAL order
    (score desc, doc_id) — deterministic at the cut, engine-portable.

    Scale shape: the document length is per-row codegen (size, no
    explode) and only QUERY-TERM occurrences are exploded — the
    corpus's token relation never materializes, so the tf shuffle
    carries at most |q| rows per doc. df (|q| rows) and the N/avgdl
    totals (1 row) come back as broadcasts; the final top-k is
    TakeOrderedAndProject (distributed heads, no global window)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = sorted({t.lower() for t in query_terms})
    toks = F.filter(tokens(normalized(F.col(text_col))), lambda w: w != "")
    # fan_out: per-row tokenize+filter fuses into the scan (no-op at scale)
    docs = fan_out(docs.select(id_col, text_col), id_col)
    base = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        F.filter(toks, lambda w: w.isin(*q)).alias("_q"),
    )
    tot = base.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("dl").cast("double").alias("_sdl"),
    )
    tf = (
        base.select(id_col, "dl", F.explode("_q").alias("w"))
        .groupBy(id_col, "dl", "w")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count("*").cast("double").alias("df"))
    avgdl = F.col("_sdl") / F.col("_n").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    term = idf * (
        F.col("tf") * F.lit(float(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl)
        )
    )
    return (
        tf.join(F.broadcast(df_), "w")
        .crossJoin(F.broadcast(tot))
        .withColumn("_t", term)
        .groupBy(id_col, "dl")
        .agg(F.round(F.sum("_t"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def source_quota(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    quota: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source quality quota: keep at most ``quota`` documents per
    source, the best first by the hashed-linear-classifier margin —
    the anti-domination rule of a mixture build (one mega-crawl of a
    single domain must not crowd out every other source, however good
    its mean score is; complements the graded `source_prior_gate`,
    which scores sources but caps nothing). Returns one row per doc:
    (id, source, score, src_rank, keep = src_rank < quota) with a
    0-based dense per-source rank under the deterministic total order
    (score desc, id asc).

    Scale shape: the classifier's zero-shuffle scoring scan, then the
    ccnet_buckets rank machinery — `ordered_index` over the
    SOURCE-LEADING key (source, -score, id), so per-source rank =
    global rank − the source's broadcast min-rank offset and the one
    giant source every real crawl has can never funnel into a single
    window task. NULL sources form their own quota group (null-safe
    offset join), never silently dropped."""
    from ..util import ordered_index

    scored = linear_quality_score(
        docs.select(id_col, source_col, text_col),
        weights, bias=bias, text_col=text_col, id_col=id_col,
        keep_cols=(source_col,),
    ).withColumn("_ns", -F.col("score"))
    ranked = ordered_index(scored, [source_col, "_ns", id_col], "_rk")
    cache = ranked.df_ordered_cache
    offs = ranked.groupBy(source_col).agg(F.min("_rk").alias("_off"))
    joined = ranked.join(
        F.broadcast(offs.withColumnRenamed(source_col, "_src")),
        F.col(source_col).eqNullSafe(F.col("_src")),
    )
    rk = F.col("_rk") - F.col("_off")
    out = joined.select(
        F.col(id_col),
        F.col(source_col),
        "score",
        rk.cast("long").alias("src_rank"),
        (rk < quota).alias("keep"),
    )
    out.df_ordered_cache = cache
    return out


def bigram_lm_score(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram-LM quality score with add-α smoothing — the next rung
    above q49's unigram scorer toward the 5-gram KenLM CCNet actually
    runs: per-document mean negative log likelihood (nats) of each
    bigram under the corpus's own smoothed bigram model,
    P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V), V = the distinct
    continuation vocabulary. Word-salad that passes a unigram filter
    (common words in impossible order) scores high here.

    Scale shape: bigrams are row-local (arrays_zip of two slices — the
    corpus token relation never self-joins); per-(doc,w1,w2) counts
    are one map-side-combinable aggregation, and BOTH model tables
    derive from that frame (bigram counts re-group it; context counts
    re-group the bigram counts — AQE reuses the exchanges instead of
    re-exploding the corpus, the q49 discipline). The scoring joins
    run on PRE-AGGREGATED counts, so a hot bigram is one row per
    containing doc; V is a 1-row broadcast. Docs with <2 tokens get
    (0, 0.0), the q49 empty-doc convention."""
    txt = normalized(F.coalesce(F.col(text_col), F.lit("")))
    # NO higher-order lambdas here: each F.filter/F.transform lambda
    # gets fresh variable ids per reference, which defeats exchange
    # canonicalization — the count exchange below would never be
    # REUSED and the corpus explode would run once per model table
    # (measured 8 Generate nodes before this form). After whitespace
    # collapse '' tokens only occur at the array ends, so dropping
    # pairs containing '' AFTER pairing equals filtering tokens first.
    ws = tokens(txt)
    n = F.size(ws)
    pair_len = F.greatest(n - 1, F.lit(0))
    p = (
        fan_out(docs.select(id_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice(ws, 1, pair_len).alias("w1"),
                    F.slice(ws, 2, pair_len).alias("w2"),
                )
            ).alias("bg"),
        )
        .select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    # the count relation feeds THREE consumers (scoring join, bigram
    # table, vocab total); exchange-reuse alone cannot dedupe them
    # (per-branch column pruning changes the canonical subplan), so
    # cache it — the corpus explode + partial agg run ONCE and every
    # model table reads the cached (doc,w1,w2,c) partitions. Exposed
    # as df_ordered_cache for caller-side unpersist (the with_pack_ids
    # convention).
    dc = p.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("c")).cache()
    big = dc.groupBy("w1", "w2").agg(F.sum("c").alias("n12"))
    ctx = big.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = dc.agg(F.countDistinct("w2").cast("double").alias("_v"))
    a = float(alpha)
    lp = F.log(
        (F.col("n12") + F.lit(a)) / (F.col("n1") + F.lit(a) * F.col("_v"))
    )
    per = (
        dc.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * -lp) / F.sum("c"), 4).alias("avg_nll"),
        )
    )
    out = (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("avg_nll", F.lit(0.0)).alias("avg_nll"),
        )
    )
    out.df_ordered_cache = dc
    return out


def dataset_card(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source dataset card — the one-page summary a corpus release
    ships (Datasheets for Datasets / HF dataset cards): volume, token
    mass, within-source exact-duplicate fraction, language mix, and
    the heuristic-gate pass rate, per source. This is the report a
    mixture designer reads BEFORE choosing q58/q68 weights, and the
    regression surface a recrawl diffs against.

    One row per source: (source, n_docs, n_distinct, dup_fraction,
    n_words_total, mean_words, keep_rate, n_langs, top_lang,
    top_lang_share). NULL sources report as their own row; NULL langs
    count as a language value for top_lang but not for n_langs
    (count-distinct semantics, both engines).

    Scale shape: ONE corpus scan — the heuristic gate's zero-shuffle
    per-row expressions with (source, lang, content-hash) carried
    through via keep_cols — then one groupBy(source) (count-distinct
    is the standard two-phase expand) plus an O(#sources × #langs)
    top-lang pick; the tiny post-aggregate window and null-safe join
    never see corpus-sized data."""
    enriched = docs.withColumn(
        "_chash", F.md5(normalized(F.coalesce(F.col(text_col), F.lit(""))))
    )
    g = heuristic_quality_gate(
        enriched, text_col=text_col, id_col=id_col,
        keep_cols=(source_col, lang_col, "_chash"),
    )
    per = g.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("_chash").cast("long").alias("n_distinct"),
        F.sum("n_words").cast("long").alias("n_words_total"),
        F.sum(F.col("keep").cast("long")).alias("_n_keep"),
        F.countDistinct(lang_col).cast("long").alias("n_langs"),
    )
    lc = g.groupBy(source_col, lang_col).agg(F.count("*").alias("_lc"))
    w = Window.partitionBy(source_col).orderBy(
        F.col("_lc").desc(), F.col(lang_col).asc_nulls_last()
    )
    top = (
        lc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(source_col).alias("_src"),
            F.col(lang_col).alias("top_lang"),
            F.col("_lc").alias("_top_n"),
        )
    )
    return per.join(
        top, F.col(source_col).eqNullSafe(F.col("_src"))
    ).select(
        source_col,
        "n_docs",
        "n_distinct",
        F.round(1.0 - F.col("n_distinct") / F.col("n_docs"), 6).alias("dup_fraction"),
        "n_words_total",
        F.round(F.col("n_words_total") / F.col("n_docs"), 4).alias("mean_words"),
        F.round(F.col("_n_keep") / F.col("n_docs"), 6).alias("keep_rate"),
        "n_langs",
        "top_lang",
        F.round(F.col("_top_n") / F.col("n_docs"), 6).alias("top_lang_share"),
    )


def score_calibration(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classifier-calibration report: rank the corpus by the hashed
    linear classifier's margin, cut it into ``n_buckets`` equal
    rank-based buckets (deciles by default), and report each bucket's
    heuristic-gate pass rate — the sanity check a pipeline runs before
    trusting a model gate (a classifier whose top decile passes the
    rule gate no more often than its bottom decile learned something
    other than quality). One row per bucket: (bucket, n_docs,
    min_score, max_score, mean_score, gate_keep_rate).

    Determinism: bucket boundaries are EXACT integer arithmetic over
    the two-pass rank ((rank·n_buckets) DIV n — the q54/q66
    convention, never an interpolated quantile), under the total order
    (score, id) both engines share; scores are the classifier's
    rounded dyadic-exact margins.

    Scale shape: two zero-shuffle scans (classifier + gate) joined on
    the id, then `ordered_index`'s range-partitioned rank — no global
    single-task window — and one combinable aggregation over
    ``n_buckets`` groups; the row count is a broadcast 1-row total."""
    from ..util import ordered_index

    s = linear_quality_score(
        docs.select(id_col, text_col), weights, bias=bias,
        text_col=text_col, id_col=id_col,
    ).select(id_col, "score")
    g = heuristic_quality_gate(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.col("keep").alias("_gate")
    )
    j = s.join(g, id_col)
    ranked = ordered_index(j, ["score", id_col], "_rk")
    cache = ranked.df_ordered_cache
    tot = ranked.agg(F.count("*").alias("_n"))
    out = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "bucket",
            F.expr(f"(_rk * {int(n_buckets)}) DIV _n").cast("long"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.round(F.sum("score") / F.count("*"), 6).alias("mean_score"),
            F.round(
                F.sum(F.col("_gate").cast("long")) / F.count("*"), 6
            ).alias("gate_keep_rate"),
        )
    )
    out.df_ordered_cache = cache
    return out


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): score every corpus document by how much
    more likely its hashed-unigram bag is under the TARGET distribution
    (a small high-quality/reference set) than under the corpus's own —
    importance = Σ_w c_w · (ln p̂_target(bucket(w)) − ln p̂_corpus(bucket(w))),
    add-α smoothed over ``n_buckets`` md5 buckets (the q65 bucket rule).
    Rank-selecting by this score IS importance resampling toward the
    target domain; composes with `quality_percentile_gate` / q54 for
    the keep rule.

    Scale shape: per-(doc, bucket) counts are one map-side-combinable
    aggregation, CACHED because they feed both the corpus distribution
    and the scoring join (the bigram_lm lesson — word-lambda plans
    defeat exchange reuse); the model is an ``n_buckets``-row frame
    (full-outer source×target, totals a 1-row cross join) that
    BROADCASTS back, so a hot bucket costs one row per containing doc.
    The target side (MBs against 100 TB) aggregates separately.
    Docs with no tokens get (0, 0.0), the q49 convention."""
    a = float(alpha)

    def toks(frame):
        # fan_out: per-token md5 bucketing fuses into the scan (no-op at scale)
        t = fan_out(frame.select(id_col, text_col), id_col).select(
            F.col(id_col),
            F.explode(tokens(normalized(F.coalesce(F.col(text_col), F.lit("")))))
                .alias("w"),
        ).filter(F.col("w") != "")
        return t.select(
            F.col(id_col),
            (F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
             % n_buckets).alias("b"),
        )

    dc = toks(docs).groupBy(id_col, "b").agg(F.count("*").alias("c")).cache()
    src = dc.groupBy("b").agg(F.sum("c").alias("s"))
    tgt = toks(target).groupBy("b").agg(F.count("*").alias("t"))
    model = (
        src.join(tgt, "b", "full")
        .select(
            "b",
            F.coalesce("s", F.lit(0)).cast("long").alias("s"),
            F.coalesce("t", F.lit(0)).cast("long").alias("t"),
        )
    )
    tot = model.agg(F.sum("s").alias("_S"), F.sum("t").alias("_T"))
    lw = F.log((F.col("t") + F.lit(a)) / (F.col("_T") + F.lit(a * n_buckets))) - \
        F.log((F.col("s") + F.lit(a)) / (F.col("_S") + F.lit(a * n_buckets)))
    scored = (
        dc.join(F.broadcast(model.crossJoin(F.broadcast(tot))), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("c") * lw), 4).alias("importance"),
        )
    )
    out = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("importance", F.lit(0.0)).alias("importance"),
        )
    )
    out.df_ordered_cache = dc
    return out


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: top-k adjacent word pairs by pointwise
    mutual information, PMI = ln(n12·N / (c1·c2)) over position-
    specific marginals (c1 = pair-left count, c2 = pair-right count),
    with a ``min_count`` frequency floor so hapax noise (PMI is
    maximal for pairs seen once) never tops the list. The standard
    phrase-mining signal (Church & Hanks 1990) a tokenizer-training or
    ngram-merge step consumes.

    Scale shape: the bigram relation is row-local (arrays_zip of two
    slices — the bigram_lm_score extraction, never a token self-join);
    pair counts are ONE map-combinable agg, CACHED because both
    marginals and the grand total derive from it (the r5
    multi-consumer rule; df_ordered_cache is the caller-unpersist
    handle); the final top-k is a distributed TakeOrdered over the
    min_count-floored pairs. Floats: PMI rounds to 6 dp with (w1, w2)
    tie-breaks, the weighted_sample parity discipline."""
    txt = normalized(F.coalesce(F.col(text_col), F.lit("")))
    ws = tokens(txt)
    n = F.size(ws)
    pair_len = F.greatest(n - 1, F.lit(0))
    pairs = (
        fan_out(docs.select(text_col))
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(ws, 1, pair_len).alias("w1"),
                    F.slice(ws, 2, pair_len).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12")).cache()
    c1 = bg.groupBy("w1").agg(F.sum("n12").alias("c1"))
    c2 = bg.groupBy("w2").agg(F.sum("n12").alias("c2"))
    nt = bg.agg(F.sum("n12").cast("double").alias("_n"))
    out = (
        bg.filter(F.col("n12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nt))
        .select(
            "w1",
            "w2",
            "n12",
            "c1",
            "c2",
            F.round(
                F.log(
                    (F.col("n12").cast("double") * F.col("_n"))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
    out.df_ordered_cache = bg
    return out
