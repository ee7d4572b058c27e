"""Deduplication operators for web-scale corpora.

Design notes for 100 TB:
- exact dedup is a hash-groupBy: one shuffle on the content hash; with
  AQE the skew (empty/boilerplate docs hashing equal) is split at runtime.
- MinHash+LSH is the scalable near-dup path: signatures are computed
  scan-side with pure built-in expressions (split → shingle via
  transform/slice → md5 → min), i.e. inside whole-stage codegen, no
  Python. LSH banding turns O(n²) similarity into groupBy(band) +
  within-bucket pairing, so the only shuffle is on band keys. Candidate
  pairs are then *verified* with exact n-gram Jaccard — only on the
  tiny candidate set.
- SimHash is the bit-parallel alternative (Charikar); Hamming-adjacent
  buckets via bit-band keys. The signature needs popcount-style math →
  one Arrow-batched numpy UDF, still columnar.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import fan_out


def cache_handles(*frames) -> list[DataFrame]:
    """Harvest the caller-unpersist cache handles (``df_ordered_cache``
    / ``df_pipeline_caches``) attached to the given frame OBJECTS.
    Plain Python attributes do not survive DataFrame transformations
    (``.filter``/``.select`` return new objects), so a composition site
    must collect them from the intermediate objects it holds and
    re-attach the union to its own result — otherwise the registry
    sweep's lifecycle wrapper never sees (and never unpersists) the
    inner caches."""
    out: list[DataFrame] = []
    for f in frames:
        h = getattr(f, "df_ordered_cache", None)
        if h is not None:
            out.append(h)
        out.extend(
            x
            for x in (getattr(f, "df_pipeline_caches", None) or [])
            if x is not None
        )
    return out


def cap_buckets(
    keyed: DataFrame, keys: list[str], max_bucket: int
) -> tuple[DataFrame, DataFrame]:
    """Drop candidate-generation buckets larger than ``max_bucket``.

    In-bucket pairing is O(|bucket|²) *before* any similarity filter, so
    one boilerplate mega-bucket (every page sharing a nav template, every
    empty doc) turns a banded near-dup pass into an all-pairs stall at
    corpus scale — AQE splits the shuffle, not the pair count. Standard
    MinHashLSH practice: a bucket past the cap carries no information
    ("these are all alike" — exact dedup already catches true dups), so
    it is dropped WHOLE and reported, never silently.

    One count window over the band shuffle (no extra join; no sort —
    unbounded-frame count). Returns (kept, dropped) where dropped is the
    distinct (keys..., n) of over-cap buckets for logging/auditing.
    """
    w = Window.partitionBy(*keys)
    sized = keyed.withColumn("_bsz", F.count(F.lit(1)).over(w))
    kept = sized.filter(F.col("_bsz") <= max_bucket).drop("_bsz")
    dropped = (
        sized.filter(F.col("_bsz") > max_bucket)
        .select(*keys, F.col("_bsz").alias("n"))
        .distinct()
    )
    return kept, dropped


def normalized(text: Column) -> Column:
    """lower + collapse whitespace — the canonical text form shared by
    all content hashes."""
    return F.regexp_replace(F.lower(text), r"\s+", " ")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5 of normalized text → keeper = min id.
    Returns (content_hash, keeper, n_dups)."""
    return (
        docs.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_dups"))
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as an array column — all JVM-side:
    split → sequence → slice → concat_ws.

    NULL text shingles like '' text (one '' shingle): split(NULL) is
    NULL and concat_ws over a NULL slice silently produced '' on the
    Spark side while the SQL mirror produced NULL — the
    degenerate-corpus gate caught the two engines disagreeing on every
    NULL-text doc. Coalescing here (and string_split(coalesce(text,''))
    in _SHINGLE_CTE) pins ONE rule everywhere, and keeps the ≥1-row-
    per-doc invariant ngram_contamination's no-second-join shape
    relies on."""
    words = F.split(F.coalesce(text, F.lit("")), " ")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig_i = min over shingles of
    md5(i || '|' || shingle). Seeded-md5 min is not the classic
    universal-hash family but has the same collision property we need
    (equal sets ⇒ equal mins; Jaccard-proportional match rate) and is
    reproducible in any engine (the DuckDB oracle runs the same md5).
    Returns (id, sig_0..sig_{n-1}).

    Physical shape — explode + groupBy(min), deliberately: the
    shuffle-free alternative (``array_min(transform(shingles, md5))``
    row-wise) looks cheaper on paper but higher-order functions are
    INTERPRETED expressions in Spark, outside whole-stage codegen —
    measured 7× slower end-to-end at sf0.1 (15 s vs 2 s for the same
    2.2M md5 calls). Exploding keeps md5 inside codegen; the groupBy's
    min is map-side combinable, so the shuffle carries one partial
    signature per (doc × map task), not the shingles.

    The input is fanned out first (util.fan_out): a single-row-group
    parquet table plans as ONE scan task, and since the shingle explode
    + per-shingle md5s fuse into the scan stage, the whole CPU cost ran
    serially (measured 13.7 s → 2.3 s at sf1.0, local[32]). Partitioning
    BY id means the groupBy below reuses the exchange; at real scale
    (many input splits) fan_out is a no-op."""
    sh = fan_out(docs.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Explode a MinHash signature frame into its LSH band keys —
    one row per (id, band): band_key = the band's ``band_size``
    signature hashes joined with '#'. The shared banding step of
    ``lsh_candidate_pairs`` (self-join near-dup) and
    ``decontam.neardup_contamination`` (corpus×benchmark probe)."""
    if n_hashes % band_size:
        # trailing hashes would silently never contribute to banding —
        # the caller believes all n_hashes shape the recall curve
        raise ValueError(
            f"n_hashes={n_hashes} not divisible by band_size={band_size}: "
            f"the last {n_hashes % band_size} hash(es) would be silently "
            "ignored (no silent caps)"
        )
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "#", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature (rows of `band_size` hashes); docs sharing any
    band key are candidate pairs. Returns distinct (id_a, id_b), a < b.

    Scale shape: one shuffle on (band_idx, band_key); within-bucket
    pairing is a self-join per bucket. ``max_bucket`` caps bucket size
    (see cap_buckets — the self-join is O(|bucket|²), so ONE boilerplate
    mega-bucket otherwise stalls the whole pass at corpus scale); the
    dropped buckets are attached to the result as ``.dropped_buckets``
    for logging — no silent caps."""
    keyed = band_keys(signatures, id_col, n_hashes, band_size)
    dropped = None
    if max_bucket is not None:
        keyed, dropped = cap_buckets(keyed, ["band_idx", "band_key"], max_bucket)
    # Self-join strategy: force a SHUFFLE join, never broadcast. Left
    # alone, the planner broadcasts one side — and a BroadcastExchange
    # subtree is never deduped against the streamed side's Exchange, so
    # the whole signature pipeline (shingle explode + n_hashes md5-mins,
    # the dominant cost) ran TWICE per query (plan nodes 1-13 ≡ 14-26 in
    # plans/r06/q23_lsh_pairs_before.txt). With a shuffled-hash join the
    # two sides' band-key Exchanges are IDENTICAL subtrees and exchange
    # reuse computes the signatures once (ReusedExchange in the after
    # plan). This is also the only shape that exists at corpus scale,
    # where the banded relation is far past any broadcast threshold.
    a = keyed.alias("a")
    b = keyed.alias("b")
    out = (
        a.join(b.hint("shuffle_hash"), ["band_idx", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    out.dropped_buckets = dropped
    return out


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify stage
    after LSH). Returns (id_a, id_b, jaccard).

    Scale shape: the shingle-set relation is built ONLY for docs that
    appear in a candidate pair (semi-join prune — the verify set is
    candidate-sized, not corpus-sized) and CACHED, because it feeds
    both sides of the pair join and lambda plans defeat exchange
    reuse (the bigram_lm lesson: the corpus shingling used to run
    once per join side, over ALL docs). df_ordered_cache is the
    caller-unpersist handle."""
    # pairs is ALSO cached: it feeds the id-set prune and the verify
    # join, and for LSH callers it is the whole sigs->bands->self-join
    # chain — re-referencing it uncached would re-run that chain per
    # consumer. Both caches are candidate-sized.
    p = pairs.cache()
    ids = (
        p.select(F.col("id_a").alias("_id"))
        .union(p.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    sh = (
        docs.join(ids, docs[id_col] == ids["_id"], "left_semi")
        .select(
            F.col(id_col).alias("_id"),
            F.array_distinct(word_shingles(F.col(text_col), k)).alias("_sh"),
        )
        .cache()
    )
    j = (
        p.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = j.select(
        "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
    )
    out.df_ordered_cache = sh
    # the pairs cache rides the wrapper-recognized attr so the registry
    # lifecycle releases it too (df_pairs_cache was invisible to it);
    # harvest the incoming frame's own handles as well (e.g. the banded
    # self-join cache lsh_candidate_pairs now attaches)
    out.df_pipeline_caches = [p] + cache_handles(pairs)
    return out


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: connected components,
    labeled by each component's minimum id. Near-duplication is
    transitive in practice (A≈B, B≈C ⇒ one document survives), so
    keeper selection needs components, not pairs.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — each
    round is two groupBy-min + explode passes over the edge set, and
    the edge set contracts toward per-component stars in O(log n)
    rounds (plain min-label propagation needs O(diameter) rounds — a
    boilerplate chain can make the diameter linear). Convergence is
    checked by edge-set size + sum fixpoint; iteration state is
    cached and the previous round unpersisted, so lineage stays O(1)
    deep.

    pairs: DataFrame[id_a, id_b]. vertices (optional): DataFrame with
    ``id_col`` — isolated ids (in no pair) come back self-labeled.
    Returns (id_col, cluster_id).
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        # undirected neighborhoods: emit both directions
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # m(u) = min(Γ(u) ∪ {u}); connect every strictly-larger
        # neighbor to m
        m = sym.groupBy("u").agg(F.min(F.least("u", "v")).alias("m"))
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient every edge larger→smaller, so Γ≤(u) is the whole
        # neighborhood; connect u and all its smaller neighbors to
        # m = min(Γ≤(u) ∪ {u})
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        return (
            o.join(m, "u")
            .select(
                F.col("m"),
                F.explode(F.array(F.col("u"), F.col("v"))).alias("n"),
            )
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _sig(e: DataFrame) -> tuple:
        # (count, Σ xxhash64(u,v) mod 2³¹) — a multiset signature that
        # cannot overflow. The previous (Σu, Σv, Σu·v) form crashed
        # under the session's default ANSI mode on hash-style long ids
        # (xxhash64 keys ~±9.2e18: u·v overflows a long immediately,
        # and even the plain sums overflow with enough edges). Each
        # term here is < 2³¹ and the decimal(38,0) sum is safe to
        # ~4.6e28 edges. Collisions don't matter: the signature only
        # FILTERS — convergence is confirmed by exact set equality.
        h = F.pmod(F.xxhash64(F.col("u"), F.col("v")), F.lit(1 << 31))
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(h.cast("decimal(38,0)")).alias("sh"),
        ).collect()[0]
        return (int(r["n"]), r["sh"])

    prev = _sig(edges)
    cur = edges
    for _ in range(max_iters):
        # localCheckpoint (eager) TRUNCATES the logical plan each round.
        # Without it the plan tree multiplies every iteration (each star
        # references its input several times) and Catalyst analysis time
        # grows exponentially — the classic iterative-DataFrame trap;
        # measured: un-truncated, a 20-edge chain took >15 min in
        # analysis alone. On a cluster, swap for reliable checkpoint()
        # if executor loss during the loop must be survivable.
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _sig(nxt)
        # the cheap 4-value signature filters; on a match, CONFIRM with
        # exact set equality (exceptAll over two checkpointed star sets,
        # runs once at convergence) — aggregate signatures can collide
        # across distinct edge sets, and a colliding early exit would
        # silently return non-minimal labels
        converged = sig == prev and nxt.exceptAll(cur).isEmpty()
        cur.unpersist()
        cur = nxt
        if converged:
            break
        prev = sig
    else:
        # loop exhausted max_iters without the fixpoint check passing:
        # labels may be non-minimal. Star contraction converges in
        # O(log n) rounds, so hitting this means max_iters was set far
        # below log2(longest chain) — surface it instead of silently
        # returning a possibly-wrong labeling.
        warnings.warn(
            f"connected_components did not converge within max_iters="
            f"{max_iters}; returned cluster labels may be non-minimal. "
            "Raise max_iters (rounds needed ≈ log2 of the largest "
            "component's diameter).", stacklevel=2,
        )
    # star edges point node → component min; add the roots themselves
    labels = cur.select(F.col("u").alias(id_col), F.col("v").alias("cluster_id"))
    roots = cur.select(F.col("v").alias(id_col)).distinct().withColumn(
        "cluster_id", F.col(id_col)
    )
    out = labels.unionByName(roots).groupBy(id_col).agg(
        F.min("cluster_id").alias("cluster_id")
    )
    if vertices is not None:
        isolated = (
            vertices.select(id_col).distinct()
            .join(out, id_col, "left_anti")
            .withColumn("cluster_id", F.col(id_col))
        )
        out = out.unionByName(isolated)
    # the final star set stays cached until the caller's action — it is
    # the whole lineage of `out` (repo convention: caller unpersists
    # via df_ordered_cache when done)
    out.df_ordered_cache = cur
    return out


_SIMHASH_BITS = 64


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash (Charikar 2002) over whitespace tokens, Arrow
    batch at a time. Token hash = first 8 bytes of md5, little-endian —
    exactly DuckDB's ``md5_number_upper``, so the signature is
    reproducible in any engine and the driver's SQL oracle can verify it
    bit-for-bit. The signed bit-vote sum runs vectorized in numpy."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    shifts = np.arange(_SIMHASH_BITS, dtype=np.uint64)
    for row, text in enumerate(texts):
        if not text:
            continue
        tokens = text.lower().split()
        if not tokens:
            continue
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                for t in tokens
            ),
            dtype=np.uint64,
            count=len(tokens),
        )
        bits = (hashes[:, None] >> shifts[None, :]) & np.uint64(1)  # (n_tok, 64)
        # +1/-1 votes in SIGNED math: a uint64 sum underflows for
        # minority-vote bits (2·ones < n_tok) and every such bit would
        # wrongly read as set
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(tokens)
        sig = ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
        out[row] = np.int64(sig.astype(np.uint64).view(np.int64))
    return pd.Series(out)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    # fan_out: the per-token md5 vote loop is the whole cost and would
    # otherwise run inside a single-task scan stage (see
    # minhash_signatures); no-op when the scan already parallelizes
    return fan_out(docs.select(id_col, text_col), id_col).select(
        F.col(id_col), simhash_udf(F.col(text_col)).alias("simhash")
    )


def simhash_neardup_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 8,
    max_hamming: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Hamming-near pairs via bit-banding: split the 64-bit signature
    into n_bands chunks; ≤(n_bands-1)-bit-different docs share ≥1 exact
    chunk. Returns candidate (id_a, id_b, hamming).

    Default 8×8-bit bands (not 4×16): on boilerplate-heavy corpora wide
    bands collide massively (measured 81k candidate pairs from 500 docs
    at 16-bit bands); 8-bit bands guarantee detection of every pair with
    hamming ≤ 7 while keeping buckets small. ``max_hamming`` applies the
    Hamming cap INSIDE the join output, before the distinct() shuffle.
    ``max_bucket`` drops over-full band buckets before pairing (see
    cap_buckets); dropped buckets attach as ``.dropped_buckets``."""
    if _SIMHASH_BITS % n_bands:
        # a non-dividing band count leaves the top bits un-banded: two
        # signatures differing only there collide in EVERY band, and
        # the "hamming <= n_bands-1 always detected" guarantee silently
        # stops holding
        raise ValueError(
            f"n_bands={n_bands} must divide {_SIMHASH_BITS}: the top "
            f"{_SIMHASH_BITS % n_bands} bit(s) would be silently ignored"
        )
    width = _SIMHASH_BITS // n_bands
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    keyed = sigs.select(id_col, "simhash", F.explode(chunks).alias("b")).select(
        id_col, "simhash", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )
    dropped = None
    if max_bucket is not None:
        keyed, dropped = cap_buckets(keyed, ["band_idx", "band_key"], max_bucket)
    a, b = keyed.alias("a"), keyed.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # shuffle join (see lsh_candidate_pairs): a broadcast side would
    # re-run the whole simhash UDF pipeline a second time, and at
    # corpus scale the banded relation can't broadcast anyway
    joined = a.join(b.hint("shuffle_hash"), ["band_idx", "band_key"]).filter(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if max_hamming is not None:
        joined = joined.filter(hamming <= max_hamming)
    out = joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        hamming.alias("hamming"),
    ).distinct()
    out.dropped_buckets = dropped
    return out


def dedup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental exact dedup: register a NEW batch of documents
    against an already-accumulated corpus — the continuously-ingesting
    pipeline's monthly-snapshot step (each CommonCrawl drop dedups
    against everything kept so far), and the documents-table analogue
    of the frontier's ``register`` (frontier.py:91). One row per batch
    document: ``in_corpus`` (its content already exists in the corpus),
    ``batch_keeper`` (it is the min-id holder of its content WITHIN the
    batch — first-wins, the q06/q47 convention), and
    ``keep = NOT in_corpus AND batch_keeper`` — the rows an ingest
    appends. NULL text hashes as the empty string (the q46 NULL-safety
    convention) so NULL-text rows get a verdict instead of silently
    vanishing through an equi-join.

    Scale shape — the corpus is the 100 TB side and must NEVER
    shuffle. With ``broadcast_batch=True`` (the snapshot ≪ corpus
    case): the batch's distinct hash set is broadcast, the corpus scan
    probes it MAP-SIDE (left-semi, hash column only — column-pruned),
    and only the matched hashes (≤ |batch| after the combinable
    distinct) flow back as a second broadcast onto the batch. Zero
    corpus exchanges, two batch-sized ones. With
    ``broadcast_batch=False`` (a batch too large to broadcast): both
    sides shuffle ON THE HASH ONLY (two thin columns), the standard
    co-partitioned anti-join. The in-batch keeper is a map-side
    combinable groupBy(min) + join-back, never a window
    (the q47 skew rule)."""
    c_hash = F.md5(F.coalesce(normalized(F.col(text_col)), F.lit("")))
    bh = batch.select(F.col(id_col), c_hash.alias("content_hash"))
    ch = corpus.select(c_hash.alias("content_hash"))
    if broadcast_batch:
        cand = bh.select("content_hash").distinct()
        hits = (
            ch.join(F.broadcast(cand), "content_hash", "left_semi")
            .distinct()
            .withColumn("_in_corpus", F.lit(True))
        )
        flagged = bh.join(F.broadcast(hits), "content_hash", "left")
    else:
        hits = ch.distinct().withColumn("_in_corpus", F.lit(True))
        flagged = bh.join(hits, "content_hash", "left")
    keepers = bh.groupBy("content_hash").agg(F.min(id_col).alias("_keeper"))
    return (
        flagged.join(keepers, "content_hash")
        .select(
            id_col,
            "content_hash",
            F.coalesce("_in_corpus", F.lit(False)).alias("in_corpus"),
            (F.col(id_col) == F.col("_keeper")).alias("batch_keeper"),
        )
        .withColumn("keep", ~F.col("in_corpus") & F.col("batch_keeper"))
    )


def keep_corpus(clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The dedup ENDGAME artifact: given component labels
    (``connected_components`` output — (id, cluster_id) with cluster_id
    = the component's min id), emit the keep/drop decision per document
    plus the cluster size that justified it. Downstream corpus builds
    filter ``is_keeper`` and join back to the docs table.

    Scale shape: one map-side-combinable groupBy(cluster_id) for the
    sizes, then a broadcast-or-shuffle join back on cluster_id (cluster
    count ≤ doc count; sizes frame is the aggregated small side). The
    keeper rule (id == cluster_id) is pure per-row codegen."""
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        clusters.join(sizes, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col(id_col) == F.col("cluster_id")).alias("is_keeper"),
        )
    )




def dedup_incremental_neardup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    sig_k: int = 2,
    verify_k: int = 3,
    min_jaccard: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental NEAR-dup registration — ``dedup_incremental``'s
    fuzzy counterpart: a new snapshot is probed against the accumulated
    corpus for lightly-rewritten copies (syndicated rewrites, template
    churn) that exact content hashes miss. One row per BATCH document:
    ``n_neardup_corpus`` (corpus docs with shingle-set Jaccard ≥
    ``min_jaccard``), ``max_jaccard`` (over all banded candidates, 0.0
    when none), ``is_neardup`` = n_neardup_corpus > 0 — an ingest
    appends ``NOT is_neardup`` rows (compose with the exact op and, for
    in-batch fuzzy groups, ``lsh_candidate_pairs`` on the batch alone —
    the batch is the small side by construction).

    Scale shape — the mirror-image of ``decontam.
    neardup_contamination`` (there the 100 TB side gets the verdicts;
    here the broadcast side does): the BATCH's band keys and shingle
    sets are broadcast (a snapshot ≪ the accumulated corpus); the
    corpus pays its ONE audited signature shuffle (explode +
    map-combinable groupBy(min), the q22 plan — a maintained ingest
    would persist this table instead of recomputing), probes the
    broadcast band keys map-side, and only banded candidates — bounded
    by |batch bands| × ``max_bucket`` under the corpus-side bucket cap
    — materialize shingle sets for the verify. The corpus is never
    shuffled on band keys or shingles; dropped corpus buckets attach
    as ``.dropped_buckets``."""
    bsig = minhash_signatures(
        batch, text_col=text_col, id_col=id_col, n_hashes=n_hashes, k=sig_k
    )
    bkeys = band_keys(bsig, id_col, n_hashes, band_size).withColumnRenamed(
        id_col, "_bid"
    )
    csig = minhash_signatures(
        corpus, text_col=text_col, id_col=id_col, n_hashes=n_hashes, k=sig_k
    )
    ckeys = band_keys(csig, id_col, n_hashes, band_size)
    dropped = None
    if max_bucket is not None:
        ckeys, dropped = cap_buckets(ckeys, ["band_idx", "band_key"], max_bucket)
    # cached: cand feeds both the verify join and the semi-join prune
    # (the neardup_contamination rationale) — one corpus band pass,
    # candidate-sized cache
    cand = (
        ckeys.join(F.broadcast(bkeys), ["band_idx", "band_key"])
        .select(F.col(id_col).alias("_cid"), "_bid")
        .distinct()
        .cache()
    )
    sets = lambda frame, key, out: frame.select(  # noqa: E731
        key,
        F.array_distinct(word_shingles(F.col(text_col), verify_k)).alias(out),
    )
    cand_corpus = corpus.join(
        F.broadcast(cand.select(F.col("_cid").alias(id_col)).distinct()),
        id_col,
        "left_semi",
    )
    csets = sets(cand_corpus, F.col(id_col).alias("_cid"), "_csh")
    bsets = sets(batch, F.col(id_col).alias("_bid"), "_bsh")
    inter = F.size(F.array_intersect("_csh", "_bsh")).cast("double")
    union = F.size(F.array_union("_csh", "_bsh")).cast("double")
    j = (
        cand.join(csets, "_cid")
        .join(F.broadcast(bsets), "_bid")
        .select("_bid", F.round(inter / union, 6).alias("_j"))
    )
    per = j.groupBy("_bid").agg(
        F.sum((F.col("_j") >= F.lit(min_jaccard)).cast("long")).alias(
            "n_neardup_corpus"
        ),
        F.max("_j").alias("max_jaccard"),
    )
    out = (
        batch.select(id_col)
        .join(per.withColumnRenamed("_bid", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_neardup_corpus", F.lit(0)).cast("long").alias(
                "n_neardup_corpus"
            ),
            F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce("n_neardup_corpus", F.lit(0)) > 0).alias("is_neardup"),
        )
    )
    out.dropped_buckets = dropped
    # the candidate cache must reach the lifecycle wrapper
    out.df_pipeline_caches = [cand]
    return out


def novelty_score(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document novelty: the fraction of a document's DISTINCT
    k-word shingles that appear in NO other document — the inverse of
    the duplication signal, used to PREFER content (rank fresh
    reporting above the thousandth syndicated copy) where the dedup
    ops only drop it. A boilerplate-heavy page scores near 0, a unique
    document near 1. Returns one row per input doc:
    (id, n_shingles, n_novel, novelty), with novelty NULL when the doc
    produced no shingles (NULL text) — never an ANSI 0/0.

    Scale shape: distinct (doc, shingle-md5) pairs — ONE shuffle on the
    pair, map-side combinable — then the document-frequency table
    derives from those pairs (groupBy hash; AQE reuses nothing here but
    the relation is already deduped, so a hot boilerplate shingle is
    one row per containing doc, not one per occurrence); the verdict
    join runs on the 16-byte hash, the standard AQE skew-join case.
    The raw shingle strings never shuffle."""
    # NULL/empty text shingles to '' (concat_ws over a NULL slice):
    # filter it so those docs get the (0, 0, NULL) verdict, not a
    # phantom md5('') shingle shared across every empty doc
    # cached: the distinct pair relation feeds BOTH the document-
    # frequency table and the verdict join, and word_shingles' lambda
    # gets fresh variable ids per plan reference, so exchange-reuse
    # alone would re-run the corpus explode per consumer (the
    # bigram_lm_score lesson). Exposed as df_ordered_cache for
    # caller-side unpersist.
    ds = (
        docs.select(
            F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("s")
        )
        .filter(F.col("s") != "")
        .select(F.col(id_col), F.md5("s").alias("h"))
        .distinct()
        .cache()
    )
    dfreq = ds.groupBy("h").agg(F.count("*").alias("nd"))
    per = (
        ds.join(dfreq, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("nd") == 1).cast("long")).alias("n_novel"),
        )
    )
    out = (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.col("n_novel") / F.col("n_shingles"), 6),
            ).alias("novelty"),
        )
    )
    out.df_ordered_cache = ds
    return out


def containment_pairs(
    docs: DataFrame,
    k: int = 8,
    min_shared: int = 3,
    max_bucket: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric CONTAINMENT detection (quote / subset finding): for
    every doc pair sharing ≥ ``min_shared`` distinct k-word shingles,
    report ``containment`` = shared / |smaller shingle set| — near 1.0
    when one document quotes or wholly contains the other. Symmetric
    Jaccard (ngram_jaccard) scores exactly this relation near 0 when
    sizes differ wildly (a 12-word quote inside a 10k-word page), so
    the near-dup suite misses it; containment is the standard measure
    for quote attribution and subset dedup.

    Scale shape: distinct (doc, md5-shingle) pairs — ONE shuffle —
    CACHED (feeds the inverted index AND both size join-backs);
    per-shingle buckets capped at ``max_bucket`` (an over-cap shingle
    is boilerplate: bucket dropped WHOLE and reported via
    ``.dropped_buckets``, the cap_buckets convention); the pair agg
    keys on (id_a, id_b) and the ≥ min_shared filter bounds the
    output. Never all-pairs: fan-out per shingle ≤ max_bucket²/2.
    NULL ids drop from pairs (NULL < x is NULL) but keep their size
    row — mirrored by the oracle."""
    sh = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), k))
            ).alias("s"),
        )
        .select("_id", F.md5("s").alias("h"))
        .distinct()
        .cache()
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    capped, dropped = cap_buckets(sh, ["h"], max_bucket)
    shared = (
        capped.select(F.col("_id").alias("id_a"), "h")
        .join(capped.select(F.col("_id").alias("id_b"), "h"), "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    out = (
        shared.join(
            sizes.withColumnRenamed("_id", "id_a")
            .withColumnRenamed("n", "n_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("_id", "id_b")
            .withColumnRenamed("n", "n_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "shared",
            "n_a",
            "n_b",
            F.round(
                F.col("shared") / F.least("n_a", "n_b").cast("double"), 6
            ).alias("containment"),
        )
    )
    out.df_ordered_cache = sh
    out.dropped_buckets = dropped
    return out
