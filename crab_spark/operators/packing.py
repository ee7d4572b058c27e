"""Sequence packing — concatenating documents into fixed token budgets
(the sample-packing step of LLM pretraining data prep).

Semantics: documents in a deterministic order (``order_col`` ascending)
fill packs greedily; a document lands in pack ``floor(cum_before /
budget)`` where ``cum_before`` is the token count of everything before
it. A pack may overflow by at most one document — the standard
"don't split documents" packing rule, and exactly expressible as a
running sum, so the DuckDB oracle is one window function.

Distributed shape: a naive ``sum() OVER (ORDER BY ...)`` funnels the
corpus through ONE task. This implementation is the two-level cumsum:
range-partition by the order key, per-partition window cumsum
(parallel), per-partition totals cumsum'd on a #partitions-row frame
(tiny), broadcast back as offsets. The ranged frame is cached because
both levels must observe the identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens as ws_tokens


def with_pack_ids(
    docs: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    tokenizer=None,
    order_cols: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Adds (n_tokens, pack_id) to each document. Default token measure
    is the whitespace count (codegen'd); pass an
    ``operators.tokenizer.BPETokenizer`` to budget in EXACT subword
    tokens (one Arrow crossing, evaluated once per doc inside the
    ranged cache — the cumsum machinery is unchanged).

    ``order_cols`` replaces the single ``order_col`` with a composite
    packing order (e.g. (doc_id, chunk_id) for chunk streams), and
    ``weight_col`` budgets on a precomputed count column instead of
    tokenizing ``text_col`` — the corpus-build pipeline packs chunks
    that already carry ``n_words``."""
    spark = docs.sparkSession
    order = list(order_cols) if order_cols else [order_col]
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if weight_col is not None:
        tokens = F.col(weight_col)
    elif tokenizer is not None:
        from .tokenizer import token_count_udf

        tokens = token_count_udf(tokenizer)(F.col(text_col))
    else:
        # NULL text counts like '' (one '' token — the oracle's
        # len(string_split(...)) convention); a NULL count would ripple
        # NULL pack ids through the whole cumsum
        tokens = F.size(ws_tokens(F.coalesce(F.col(text_col), F.lit(""))))
    ranged = (
        docs.withColumn("n_tokens", tokens.cast("long"))
        .repartitionByRange(num_partitions, *[F.col(c) for c in order])
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    # level 2: one row per partition, cumsum over ≤ num_partitions rows
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot"))
    w_tot = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_tot), F.lit(0))
    ).select("_pid", "_off")
    # level 1: parallel per-partition running sum + broadcast offset
    w = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "_cum_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("_off"),
        )
        .withColumn("pack_id", F.floor(F.col("_cum_before") / budget))
        .drop("_pid", "_off", "_cum_before")
    )
    out.df_ordered_cache = ranged  # caller may unpersist after its action
    return out


def write_training_shards(
    packed: DataFrame,
    docs: DataFrame,
    out_dir: str,
    packs_per_shard: int = 64,
    chunk_words: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
) -> int:
    """The training-export sink: materialize packed chunks as JSONL
    shards — the file layout a pretraining data loader consumes. Takes
    the ``corpus_build``/``chunk_documents``+``with_pack_ids`` output
    (id, chunk_id, n_words, chunk_hash, pack_id) plus the SAME docs
    frame the chunks were cut from (chunk text is reconstructed here,
    at the write site — carrying it through the dedup/gate/pack
    shuffles would multiply every exchange by the payload). Returns
    the number of shard directories written.

    Layout & guarantees:

    - ``shard = floor(pack_id / packs_per_shard)`` — a pack NEVER
      splits across shards, so a loader can stream one shard file and
      see whole packs in order.
    - exactly ONE file per ``shard=<k>/`` directory: the frame is
      hash-repartitioned on shard before a partitionBy(shard) write,
      so each shard's rows live in a single task. Shard size is the
      operator's file-size knob (packs_per_shard × budget tokens).
    - rows within a shard file are sorted (pack_id, id, chunk_id) —
      the exact packing order, so concatenating a shard reproduces the
      training stream deterministically.
    - ``verify=True`` (default) asserts ``md5(text) == chunk_hash``
      per row inside the write job (pure codegen, fails the job on
      first mismatch): a caller that passes the WRONG docs frame —
      e.g. the original corpus instead of the scrubbed/retained text
      the pipeline actually chunked — gets an error, not a silently
      corrupt corpus.

    Scale shape: one co-keyed join on the id (AQE-planned; docs side
    is scanned once, text column only), per-row codegen slicing, one
    shuffle on shard. No driver-side iteration; the returned count is
    a local directory listing.
    """
    import os

    from .scrub import chunk_text

    src = docs.select(F.col(id_col), F.col(text_col).alias("_txt"))
    txt = chunk_text(F.col("_txt"), F.col("chunk_id"), chunk_words, stride)
    if verify:
        txt = F.when(
            F.assert_true(
                F.md5(txt) == F.col("chunk_hash"),
                F.concat(
                    F.lit("chunk_hash mismatch (wrong docs frame or "
                          "chunk params?) at "),
                    F.col(id_col).cast("string"),
                    F.lit("/"),
                    F.col("chunk_id").cast("string"),
                ),
            ).isNull(),
            txt,
        )
    out = (
        packed.join(src, id_col)
        .select(
            F.floor(F.col("pack_id") / packs_per_shard).alias("shard"),
            "pack_id",
            F.col(id_col),
            "chunk_id",
            "n_words",
            txt.alias("text"),
        )
    )
    (
        out.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pack_id", id_col, "chunk_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out_dir)
    )
    return sum(
        1 for d in os.listdir(out_dir) if d.startswith("shard=")
    )


def pack_stats(packed: DataFrame) -> DataFrame:
    """Per-pack rollup: document count + token fill."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


def shard_manifest(
    packed: DataFrame,
    packs_per_shard: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Integrity manifest for the training-shard export — the sidecar
    a data loader (or a re-run) checks BEFORE reading terabytes of
    JSONL: per shard, the pack/chunk/token counts plus an
    order-sensitive digest (md5 over the chunk hashes concatenated in
    exact packing order), so a re-shard that changes any chunk, drops
    one, or reorders two is one string compare away from detection.
    Input is the `chunk_documents` + `with_pack_ids` frame
    (id, chunk_id, n_words, chunk_hash, pack_id); shard =
    pack_id DIV packs_per_shard, `write_training_shards`' layout rule.

    Scale shape: ONE combinable aggregation on shard_id. The digest's
    collect_list is bounded by the shard size a caller already chose
    for its files (packs_per_shard × pack budget — the same rows
    write_training_shards puts in one file), sorted row-locally after
    the shuffle; only 32-byte hashes travel, never chunk text."""
    if packs_per_shard < 1:
        raise ValueError("packs_per_shard must be >= 1")
    return (
        packed.withColumn(
            "shard_id", F.expr(f"pack_id DIV {int(packs_per_shard)}").cast("long")
        )
        .groupBy("shard_id")
        .agg(
            F.countDistinct("pack_id").cast("long").alias("n_packs"),
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("n_words").cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("pack_id", id_col, "chunk_id", "chunk_hash")
                            )
                        ),
                        lambda s: s["chunk_hash"],
                    ),
                )
            ).alias("digest"),
        )
    )
