"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (this container has no image/audio codecs —
see ``FakeDecoder``): the *Spark-side* contract is real and tested —
schema, batch shape, partition sizing, and the mapInPandas signature
are exactly what a PIL/ffmpeg-backed decoder would drop into.

Scale notes: media bytes dominate row size, so
``spark.sql.files.maxPartitionBytes`` governs batch memory, and the
metadata-only projections below never touch the binary column (column
pruning keeps the scan cheap — verify via ReadSchema in explain()).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class FakeDecoder:
    """Deterministic stand-in for PIL/ffmpeg decode. Derives metadata
    and an 8-dim feature from the md5 digest of the payload bytes —
    deterministic AND reproducible by one SQL expression, so the driver
    can oracle the full decode pipeline (q36) instead of a rows-only
    check. Swap with a real decoder by replacing decode_batch — the
    engine contract (pandas in, pandas out, MEDIA_FEATURES schema) is
    unchanged.

    Stub contract (digest = md5(payload), b_i = digest byte i):
    width = 16 + b0 % 64, height = 16 + b1 % 64,
    n_frames = 1 for images else 1 + b2 % 8, feature = float(b_0..b_7)
    (integer-valued floats: exactly representable, no rounding-policy
    coupling between engines)."""

    def decode_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        widths, heights, frames, feats = [], [], [], []
        for payload, kind in zip(pdf["payload"], pdf["kind"]):
            if payload is None:
                widths.append(None); heights.append(None)
                frames.append(None); feats.append(None)
                continue
            d = hashlib.md5(bytes(payload)).digest()
            widths.append(16 + d[0] % 64)
            heights.append(16 + d[1] % 64)
            frames.append(1 if kind == "image" else 1 + d[2] % 8)
            feats.append([float(b) for b in d[:8]])
        return pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": pd.array(widths, dtype="Int32"),
                "height": pd.array(heights, dtype="Int32"),
                "n_frames": pd.array(frames, dtype="Int32"),
                "feature": feats,
            }
        )


def media_from_documents(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Manufacture a deterministic media table from a text corpus (the
    sandbox stand-in for real crawled bytes): payload = utf-8 bytes of
    the text, kind round-robins by id hash. Real crawls would append
    fetched bytes here instead."""
    # kind routes by the first byte of md5(doc_id) — a hash any engine
    # reproduces (xxhash64 would be Spark-only and un-oracle-able).
    # NULL id/text coalesce to '' (the q46 convention): a NULL doc_id
    # otherwise NULLs the media_id AND the kind route, and a NULL text
    # NULLs the payload — the degenerate-corpus gate caught both
    # engines inventing different groups for those rows
    from ..util import fan_out

    # fan_out: md5 routing + payload encode per row fuse into the scan
    # (no-op at real scale); the downstream decode mapInPandas then
    # also runs at full parallelism instead of one task
    docs = fan_out(docs.select(id_col, text_col))
    did = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    txt = F.coalesce(F.col(text_col), F.lit(""))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (
            F.conv(F.substring(F.md5(did), 1, 2), 16, 10)
            .cast("int") % 3 + 1
        ).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("m:"), did).alias("media_id"),
        did.alias("doc_id"),
        kind.alias("kind"),
        F.encode(txt, "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(txt).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, decoder: FakeDecoder | None = None) -> DataFrame:
    """Decode/feature-extract via mapInPandas — one decoder call per
    Arrow batch. This is the real production shape: swap FakeDecoder
    for a PIL/ffmpeg decoder, nothing else changes."""
    decoder = decoder or FakeDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decoder.decode_batch(pdf)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=MEDIA_FEATURES
    )


def resize_plan(media: DataFrame, decoder: FakeDecoder | None = None,
                max_w: int = 64, max_h: int = 64) -> DataFrame:
    """Aspect-preserving resize planning: decode (mapInPandas, Arrow
    batches) → fit each item into a (max_w, max_h) box without
    upscaling. The geometry runs as pure expressions over the decoded
    dims — scale = min(max_w/w, max_h/h, 1), out = floor(dim·scale) —
    so the whole pipeline is SQL-oracle-able; a real deployment would
    pass out_w/out_h back into the decoder's resample step (the one
    part that must stay a pixel-touching UDF)."""
    feats = extract_features(media, decoder)
    w = F.col("width").cast("double")
    h = F.col("height").cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    # exact geometry, NOT floor(dim·scale): max/dim rounds DOWN in
    # float, so floor(dim·(max/dim)) lands on max-1 for many sizes
    # (e.g. floor(49·(16/49)) = 15) — the binding axis must hit its box
    # edge exactly; the other axis is floor(other·max_bind/bind) with
    # the multiply BEFORE the divide (exact in doubles below 2^53)
    no_up = (F.col("width") <= max_w) & (F.col("height") <= max_h)
    w_binds = w * F.lit(float(max_h)) >= h * F.lit(float(max_w))
    out_w = (
        F.when(no_up, F.col("width"))
        .when(w_binds, F.lit(max_w))
        .otherwise(F.floor(w * F.lit(float(max_h)) / h))
    )
    out_h = (
        F.when(no_up, F.col("height"))
        .when(w_binds, F.floor(h * F.lit(float(max_w)) / w))
        .otherwise(F.lit(max_h))
    )
    return feats.select(
        "media_id", "kind",
        F.col("width").alias("src_w"),
        F.col("height").alias("src_h"),
        out_w.cast("int").alias("out_w"),
        out_h.cast("int").alias("out_h"),
        F.round(scale, 6).alias("scale"),
    )


def sample_frames(media: DataFrame, decoder: FakeDecoder | None = None,
                  stride: int = 2) -> DataFrame:
    """Frame sampling plan: decode → one row per kept frame index
    (0, stride, 2·stride, … < n_frames). Images contribute their single
    frame. The explode is JVM-side (sequence), so the only Python
    crossing is the decode batch; a real pipeline feeds (media_id,
    frame_idx) pairs back into a frame-extraction UDF."""
    feats = extract_features(media, decoder)
    idx = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(max(stride, 1))
    )
    return feats.select(
        "media_id", "kind",
        F.explode(idx).alias("frame_idx"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — never reads the payload column (column
    pruning: ReadSchema excludes `payload`)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
    )


def caption_candidates(docs: DataFrame, spans_col: str = "spans",
                       id_col: str = "doc_id") -> DataFrame:
    """Interleaved media→caption alignment: for every ``media`` span,
    the nearest ``text`` span in the same document by span-offset
    distance (the PRECEDING span wins ties — captions usually lead
    their figure). Media spans in documents with no text span at all
    are dropped: there is no caption candidate to emit.

    Input is the engine's interleaved DOCUMENTS shape (BASELINE.json
    input_hint): ``spans: array<struct<kind,text,media_ref,offset>>``.
    Output: (doc_id, media_ref, media_offset, caption, caption_offset,
    distance) — the (image, alt-text) pair stream a multimodal training
    pipeline consumes.

    Scale shape: one explode, then two running-value window passes
    partitioned BY DOCUMENT and ordered by offset — each window is
    bounded by a single document's span count (same contract as the
    per-doc TF-IDF window, text.py tfidf_topk), never corpus-wide; no
    self-join, no Python crossing."""
    from pyspark.sql import Window

    s = docs.select(F.col(id_col), F.explode(spans_col).alias("s")).select(
        id_col,
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    txt = F.when(F.col("kind") == "text",
                 F.struct(F.col("offset"), F.col("text")))
    # (offset, kind, text, media_ref): offset alone leaves the window
    # order nondeterministic when two spans share an offset — last()/
    # first() would then pick whichever the shuffle sorted adjacent,
    # and two runs (or Spark vs the oracle) could emit different
    # captions. The full-tuple order pins one answer on any engine.
    base = Window.partitionBy(id_col).orderBy(
        "offset", "kind", "text", "media_ref"
    )
    prev = F.last(txt, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = F.first(txt, ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    prefer_prev = prev.isNotNull() & (
        nxt.isNull()
        | ((F.col("offset") - prev["offset"]) <= (nxt["offset"] - F.col("offset")))
    )
    chosen = F.when(prefer_prev, prev).otherwise(nxt)
    return (
        s.withColumn("_c", chosen)
        .filter((F.col("kind") == "media") & F.col("_c").isNotNull())
        .select(
            id_col,
            "media_ref",
            F.col("offset").alias("media_offset"),
            F.col("_c.text").alias("caption"),
            F.col("_c.offset").alias("caption_offset"),
            F.abs(F.col("_c.offset") - F.col("offset")).alias("distance"),
        )
    )


def interleave_stats(docs: DataFrame, spans_col: str = "spans",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document interleaving profile over the engine's span shape:
    span count, media-span count, media fraction, and the offset of the
    first media span (NULL for text-only docs) — the density signals a
    multimodal pipeline gates on (drop docs that are all images, or
    whose first image sits past the context window).

    Pure per-row codegen (size/filter over the spans array), zero
    shuffles, never touches span text or payloads."""
    s = F.col(spans_col)
    media_offsets = F.transform(
        F.filter(s, lambda x: x["kind"] == F.lit("media")),
        lambda x: x["offset"],
    )
    n_spans = F.size(s)
    n_media = F.size(media_offsets)
    return docs.select(
        id_col,
        n_spans.alias("n_spans"),
        n_media.alias("n_media"),
        F.round(
            n_media.cast("double") / F.greatest(n_spans, F.lit(1)), 4
        ).alias("media_frac"),
        F.array_min(media_offsets).alias("first_media_offset"),
    )


def media_ref_index(docs: DataFrame, spans_col: str = "spans",
                    id_col: str = "doc_id") -> DataFrame:
    """Inverted media-asset index over the interleaved span shape
    (BASELINE.json input_hint): one row per distinct ``media_ref``
    with its total occurrence count, distinct-document count, first
    (min) document, and an ``is_shared`` verdict for refs reused
    across documents. This is the media analogue of the URL seen-set
    (reference crab/src/storage.rs register-once semantics applied to
    asset refs instead of link URLs): a crawl's media pipeline keys on
    it to fetch each asset once, cache hot assets, and skip per-doc
    re-downloads; a training pipeline uses ``is_shared`` to spot
    boilerplate imagery (logos, tracking pixels) worth dropping.

    Scale shape: media spans are filtered BEFORE the explode (text
    spans never leave their row), then ONE map-side-combinable
    groupBy(media_ref); the exact distinct-doc count rides the same
    key via Spark's two-phase distinct-aggregate expansion. No join,
    no window, no Python crossing."""
    m = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(
            F.filter(F.col(spans_col), lambda x: x["kind"] == F.lit("media"))
        ).alias("s"),
    ).select("_d", F.col("s.media_ref").alias("media_ref"))
    return m.groupBy("media_ref").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("_d").cast("long").alias("n_docs"),
        F.min("_d").alias("first_doc"),
        (F.countDistinct("_d") > 1).alias("is_shared"),
    )


def media_phash(media: DataFrame) -> DataFrame:
    """Per-asset 48-bit perceptual-hash stand-in: (media_id, kind,
    phash48). With no image codec in the sandbox the "perceptual" hash
    is the first 6 payload-md5 bytes (big-endian — the FakeDecoder
    contract: every decoded property derives from the payload md5), so
    only byte-identical assets are near; swap a real pHash/aHash into
    the decode stage and the banding/verify machinery downstream is
    unchanged — that machinery, not the hash, is the Spark-side
    deliverable (same honesty rule as FakeDecoder itself).

    Duplicate media_ids (the q46 NULL-coalesce convention can fold
    several NULL-id docs onto 'm:') dedupe here so pair generation
    never self-pairs."""
    return media.select(
        "media_id",
        "kind",
        F.conv(F.substring(F.md5(F.col("payload")), 1, 12), 16, 10)
        .cast("long")
        .alias("phash48"),
    ).distinct()


def media_phash_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = 200,
) -> DataFrame:
    """Near-duplicate asset pairs by banded Hamming join over the
    48-bit phash: 4 × 12-bit bands guarantee every pair with
    hamming ≤ 3 shares an exact band (same pigeonhole as
    simhash_neardup_pairs, operators/dedup.py); over-cap band buckets
    drop whole and attach as ``.dropped_buckets`` (one tracking-pixel
    asset referenced everywhere must not become an all-pairs stall).
    Returns (id_a, id_b, kind, hamming) — pairs are intra-kind only
    (an image is never a near-dup of an audio clip).

    Scale: one band-key shuffle over ≤4 rows/asset, in-bucket pairing
    capped, Hamming verify is two codegen bit_counts — the identical
    cost model as text SimHash, applied to the media table.
    """
    from .dedup import cap_buckets

    sigs = media_phash(media)
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("phash48"), b * 12)
                .bitwiseAND(F.lit((1 << 12) - 1))
                .alias("band_key"),
            )
            for b in range(4)
        ]
    )
    keyed = sigs.select(
        "media_id", "kind", "phash48", F.explode(chunks).alias("b")
    ).select(
        "media_id",
        "kind",
        "phash48",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"),
    )
    dropped = None
    if max_bucket is not None:
        keyed, dropped = cap_buckets(
            keyed, ["kind", "band_idx", "band_key"], max_bucket
        )
    a, b = keyed.alias("a"), keyed.alias("b")
    hamming = F.bit_count(F.col("a.phash48").bitwiseXOR(F.col("b.phash48")))
    out = (
        a.join(b, ["kind", "band_idx", "band_key"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .filter(hamming <= max_hamming)
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("kind"),
            hamming.alias("hamming"),
        )
        .distinct()
    )
    out.dropped_buckets = dropped
    return out
