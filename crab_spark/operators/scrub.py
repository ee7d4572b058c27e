"""Scrubbing & restructuring operators — PII redaction, paragraph-level
corpus dedup, and overlapping chunking. All hot paths are pure built-in
expressions (whole-stage codegen); nothing crosses into Python.

- ``pii_scrub``: regex detection + redaction of emails / IPv4s / phone
  numbers — the privacy gate every released corpus runs. One scan, zero
  shuffles: counts and the redacted text are per-row expressions. The
  patterns are RE2-safe (no backrefs / lookaround) so the identical
  pattern strings run in Spark's Java regex and DuckDB's RE2 oracle.

- ``paragraph_dedup``: CCNet-style paragraph-level exact dedup — the
  document is segmented into fixed word-windows, every segment is
  hashed, and the FIRST occurrence corpus-wide (min (doc_id, pos))
  survives; later copies (boilerplate, mirrored nav blocks, syndicated
  paragraphs) are dropped. Scale shape: the first-wins rule is a
  map-side-combinable groupBy(hash).min joined back on the hash —
  deliberately NOT a window over partitionBy(hash): AQE's skew
  splitting applies only to joins, so a mega-common boilerplate
  segment (one 20-word nav block in 10⁷ docs) would pin every copy
  into ONE unsplittable window partition, while the join form both
  combines map-side and skew-splits at runtime. Then one per-doc
  reassembly aggregation. Empty segments are filtered before any
  shuffle.

- ``chunk_documents``: fixed-size overlapping word chunks (the
  context-window shaping step before tokenization/packing). Pure
  per-row expressions — sequence + slice + explode, zero shuffles;
  chunk boundaries are integer arithmetic so the DuckDB oracle
  reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import fan_out

from .dedup import normalized

# RE2-compatible (and Java-regex-compatible) PII patterns: character
# classes and bounded repetition only — no backreferences, no
# lookaround — so Spark and the DuckDB oracle match the same spans.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}"

# redaction is applied email → ip → phone. The patterns are NOT
# disjoint (an email local part can contain a dotted quad or a
# phone-shaped digit run: '1.2.3.4@x.com'), so counts are taken
# SEQUENTIALLY on the progressively-redacted text — n_ipv4 counts IPs
# the email pass left behind — making every count reconcile exactly
# with the <TOKEN> occurrences in the redacted output.
REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def redacted(text: Column) -> Column:
    """The text with every PII span replaced by its token."""
    out = text
    for pat, tok in REDACTIONS:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + a hash of the redacted text (the hash
    keeps the output narrow; the redacted column itself is one more
    ``redacted()`` call at the write site). One scan, zero shuffles.
    NULL text counts as '' (0 hits, md5('') hash, any_pii False) — a
    verdict, not a NULL row (this op NAMED the convention; the
    degenerate-corpus gate caught it not following it)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    # fan_out: four regexp passes per row fuse into the scan (no-op at scale)
    docs = fan_out(docs.select(id_col, text_col))
    return docs.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")).alias(
            "redacted_hash"
        ),
    ).withColumn(
        "any_pii",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")) > 0,
    )


def word_windows(text: Column, window_words: int) -> Column:
    """Array of fixed ``window_words``-word segment strings over the
    normalized text (last segment ragged). Empty text yields one empty
    segment — callers filter. Pure codegen: split → sequence → slice →
    array_join, no Python, no shuffle."""
    words = F.split(normalized(text), " ")
    n_seg = F.ceil(F.size(words) / F.lit(window_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_seg - 1, F.lit(0))),
        lambda i: F.array_join(
            F.slice(words, i * window_words + 1, window_words), " "
        ),
    )


def _first_wins_marked(
    docs: DataFrame, text_col: str, id_col: str, window_words: int
) -> DataFrame:
    """Non-empty posexploded word-window segments with the corpus-wide
    first-wins ``kept`` flag — the shared core of ``paragraph_dedup``
    (audit stats) and ``paragraph_retained`` (surviving text). The
    first-wins rule is a map-side-combinable groupBy(hash).min joined
    back on the hash (AQE skew-splittable), never a window — see the
    module docstring."""
    segs = (
        fan_out(docs.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.posexplode(word_windows(F.col(text_col), window_words)).alias(
                "pos", "seg"
            ),
        )
        .filter(F.col("seg") != "")
        .withColumn("h", F.md5("seg"))
    )
    first = segs.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_seen")
    )
    return segs.join(first, "h").withColumn(
        "kept",
        F.struct(F.col(id_col), F.col("pos")) == F.col("first_seen"),
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 20,
) -> DataFrame:
    """Corpus-wide paragraph (word-window) exact dedup, first-wins.

    Returns one row per input document: segment count, duplicated-
    segment count (segments whose hash was first seen in an earlier
    (doc_id, pos)), and ``retained_hash`` — md5 of the document
    reassembled from only its surviving segments (md5('') when nothing
    survives), so the dedup is verifiable without shipping full text.

    Plan: groupBy(hash).min (map-side combinable — the per-hash winner
    reduces inside each map task before the shuffle) joined back on the
    hash, where AQE skew-splits the boilerplate mega-hashes a window
    over partitionBy(hash) would serialize; then one per-doc
    aggregation. The winner rule min(doc_id, pos) is total and
    engine-portable, so the DuckDB oracle reproduces it exactly."""
    marked = _first_wins_marked(docs, text_col, id_col, window_words)
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").alias("n_segs"),
        F.sum((~F.col("kept")).cast("long")).alias("n_dup_segs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("kept"), F.struct("pos", "seg")))
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            )
        ).alias("retained_hash"),
    )
    empty_hash = "d41d8cd98f00b204e9800998ecf8427e"  # md5('')
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_segs", F.lit(0)).cast("long").alias("n_segs"),
            F.coalesce("n_dup_segs", F.lit(0)).cast("long").alias("n_dup_segs"),
            F.coalesce("retained_hash", F.lit(empty_hash)).alias("retained_hash"),
        )
    )


def paragraph_retained(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 20,
) -> DataFrame:
    """The retained TEXT per document after corpus-wide first-wins
    paragraph dedup — the composition form the corpus-build pipeline
    consumes (``paragraph_dedup`` returns the audit stats + hash of the
    same text; ``md5(paragraph_retained.text) == retained_hash`` by
    construction). Documents with no surviving segments return ``''``
    (callers typically filter them out). Same plan shape as
    ``paragraph_dedup``: one skew-splittable join + one per-doc
    aggregation."""
    marked = _first_wins_marked(docs, text_col, id_col, window_words)
    per_doc = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("kept"), F.struct("pos", "seg")))
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("text")
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(id_col, F.coalesce("text", F.lit("")).alias("text"))
    )


def cross_source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    window_words: int = 20,
) -> DataFrame:
    """Which sources mirror each other: for every unordered source
    pair, the number of distinct word-window segment hashes (same
    ``word_windows`` segmentation as paragraph_dedup) present in BOTH —
    the syndication/boilerplate-copy signal that drives source
    de-weighting in mixture design. Exact whole-document matches across
    sources are rare; shared PARAGRAPHS are the real-world signal.
    Returns (source_a, source_b, n_shared).

    Scale shape: distinct (source, hash) first — one map-side-
    combinable shuffle — then a self-join on hash whose per-hash
    fan-out is bounded by the source count (a hash appears once per
    source after the distinct), so the worst bucket is |sources|²,
    never |docs|²."""
    # cached: the self-join's two sides are the SAME relation, but the
    # word_windows lambda defeats exchange canonicalization (the
    # bigram_lm lesson) and the corpus segment explode ran once per
    # side; MEMORY_AND_DISK cache = one pass, spill-safe
    sh = (
        fan_out(docs.select(source_col, text_col))
        .select(
            F.col(source_col).alias("s"),
            F.explode(word_windows(F.col(text_col), window_words)).alias("seg"),
        )
        .filter(F.col("seg") != "")
        .select("s", F.md5("seg").alias("h"))
        .distinct()
        .cache()
    )
    a, b = sh.alias("a"), sh.alias("b")
    out = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("source_a"), F.col("b.s").alias("source_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    out.df_ordered_cache = sh
    return out


def chunk_documents(
    docs: DataFrame,
    chunk_words: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size chunks: chunk ``i`` covers words
    [i*stride, i*stride + chunk_words); a document of n ≤ chunk_words
    words is one chunk, else 1 + ceil((n - chunk_words) / stride)
    chunks (integer arithmetic — engine-portable). Output is
    (doc_id, chunk_id, n_words, chunk_hash); the chunk text itself is
    one more slice+join at the write site. Zero shuffles."""
    if not 0 < stride <= chunk_words:
        raise ValueError("require 0 < stride <= chunk_words")
    words = F.split(normalized(F.col(text_col)), " ")
    n = F.size(words)
    # empty/whitespace-only/NULL docs produce NO chunks: split('') is
    # [''] (size 1), which used to emit a phantom (n_words=1, md5(''))
    # chunk that consumed pack budget downstream
    docs = docs.filter(F.trim(normalized(F.col(text_col))) != "")
    extra = F.floor(
        (n - F.lit(chunk_words) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    n_chunks = F.when(n <= chunk_words, F.lit(1)).otherwise(extra + 1)
    chunked = fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(words, i * stride + 1, chunk_words),
            )
        ).alias("chunk_id", "cw"),
    )
    return chunked.select(
        id_col,
        "chunk_id",
        F.size("cw").cast("long").alias("n_words"),
        F.md5(F.array_join("cw", " ")).alias("chunk_hash"),
    )


def chunk_text(
    text: Column, chunk_id: Column, chunk_words: int, stride: int
) -> Column:
    """The text of chunk ``chunk_id`` of a document — the slice+join
    ``chunk_documents`` deliberately defers to the write site (its
    output carries only ``chunk_hash``; carrying the text through the
    dedup/gate/pack shuffles would multiply every exchange by the
    payload size). By construction
    ``md5(chunk_text(...)) == chunk_hash`` when evaluated against the
    SAME text the chunks were cut from."""
    words = F.split(normalized(text), " ")
    return F.array_join(
        F.slice(words, chunk_id * F.lit(stride) + 1, chunk_words), " "
    )


def cross_source_neardup(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    sig_k: int = 2,
    verify_k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate DOCUMENT pairs across DIFFERENT sources — the
    syndication signal ``cross_source_overlap`` (exact shared segments)
    cannot see when mirrors lightly rewrite: full MinHash→LSH→Jaccard
    near-dup detection restricted to cross-source pairs, aggregated to
    one row per unordered source pair (source_a < source_b,
    n_neardup_pairs). Thresholding uses the same round(·,6) ≥ cutoff
    convention as the q40 cluster pipeline so any engine reproduces the
    keep set exactly.

    Scale shape — everything reuses the audited near-dup plans
    (dedup.minhash_signatures / lsh_candidate_pairs / ngram_jaccard):
    banded signatures with capped buckets (never all-pairs), the
    cross-source restriction applied on the CANDIDATE pairs (two joins
    against the O(#docs) (id, source) projection, broadcast-eligible
    per AQE) BEFORE the expensive shingle-set verify, then one
    combinable count per source pair. The verify join fans out per
    candidate pair, not per document."""
    from .dedup import lsh_candidate_pairs, minhash_signatures, ngram_jaccard

    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col, n_hashes=n_hashes, k=sig_k
    )
    pairs = lsh_candidate_pairs(
        sigs, id_col=id_col, n_hashes=n_hashes, band_size=band_size,
        max_bucket=max_bucket,
    )
    src = docs.select(F.col(id_col), F.col(source_col))
    cross = (
        pairs.join(
            src.withColumnRenamed(id_col, "id_a")
            .withColumnRenamed(source_col, "_sa"), "id_a")
        .join(
            src.withColumnRenamed(id_col, "id_b")
            .withColumnRenamed(source_col, "_sb"), "id_b")
        .filter(F.col("_sa") != F.col("_sb"))
    )
    ver = ngram_jaccard(docs, cross.select("id_a", "id_b"),
                        text_col=text_col, id_col=id_col, k=verify_k)
    # re-attach sources to the few SURVIVING pairs from the O(#docs)
    # (id, source) projection — joining back to `cross` would
    # re-execute the whole sigs→bands→self-join LSH subplan (the
    # dominant cost) a second time just to recover two small columns
    survivors = ver.filter(F.col("jaccard") >= F.lit(min_jaccard)).select(
        "id_a", "id_b"
    )
    out = (
        survivors.join(
            src.withColumnRenamed(id_col, "id_a")
            .withColumnRenamed(source_col, "_sa"), "id_a")
        .join(
            src.withColumnRenamed(id_col, "id_b")
            .withColumnRenamed(source_col, "_sb"), "id_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count("*").alias("n_neardup_pairs"))
    )
    # no silent caps: when max_bucket trimmed LSH buckets, the audit
    # frame lsh_candidate_pairs attached must reach THIS op's caller
    # too — a dropped boilerplate mega-bucket undercounts syndication
    out.dropped_buckets = getattr(pairs, "dropped_buckets", None)
    # ...and so must the verify stage's cache handles (attrs don't
    # survive the survivors filter/joins)
    from .dedup import cache_handles

    # pairs' own banded-frame cache went into `cross` (attrs don't
    # survive .select), so harvest it from the pairs object directly
    out.df_pipeline_caches = cache_handles(ver, pairs)
    return out


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repeated-line removal — the RefinedWeb/Gopher
    line-level cleanup (Penedo et al. 2023 §4.2): navigation menus,
    cookie banners and SEO footers repeat the same exact line inside
    one document; every occurrence after the FIRST is dropped and the
    survivors keep their original order. This is the within-doc
    complement of ``paragraph_dedup`` (cross-doc first-wins): there the
    unit is a word-window across the corpus, here it is an exact
    newline-delimited line within a single row.

    Output: (id, text = cleaned, n_lines, n_removed). NULL text is
    treated as '' (q46 convention: 0/0 counts, never a NULL verdict).

    Scale shape: ONE scan, ZERO shuffles — `array_distinct` is
    documented order-preserving (keeps first occurrences), so the
    whole op is per-row codegen over the line array; no explode, no
    window, nothing leaves the row. The oracle reproduces first-wins
    with a per-(doc, line) row_number over positions."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    kept = F.array_distinct(lines)
    # fan_out: per-row line splitting/dedup fuses into the scan (no-op at scale)
    docs = fan_out(docs.select(id_col, text_col))
    return docs.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_removed"),
    )
