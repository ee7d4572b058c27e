"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: the exact baseline — pure built-in expressions
  (zip_with/aggregate), whole-stage codegen, one TakeOrderedAndProject.
  At 100 TB this is a full scan but embarrassingly parallel and
  shuffle-free until the final top-k merge (k × partitions rows).
- ``ivf_topk``: the scale path — IVF (inverted-file) bucketing: assign
  every vector to its nearest of C centroids once (write-time), probe
  only the nprobe closest buckets at query time ⇒ scan cost drops by
  ~C/nprobe. Centroids here are chosen deterministically (first C
  vectors by id) — on a real corpus you'd k-means them; the plumbing
  (assignment, bucket pruning via partition filter, per-bucket top-k)
  is identical.
- ``embedding_neardup_pairs``: all-pairs near-duplicate detection via
  the IVF buckets (vectors in the same bucket are candidate pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an error, not a value) for zero-norm vectors: the
    session's default ANSI mode makes a bare division THROW on the
    first all-zero embedding (an empty doc embedded to zeros is routine
    at corpus scale), killing the whole scan. NULL propagates the right
    way everywhere downstream: desc ordering puts it last (top-k),
    threshold filters drop it (near-dup), and ivf_assign maps the
    all-NULL score row to a NULL bucket."""
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query
    vector. Deterministic tiebreak on id."""
    q = _lit_vec(query_vec)
    # fan_out: the per-row dot product (interpreted HOF) fuses into the
    # scan stage — spread single-row-group inputs (no-op at real scale)
    emb = fan_out(emb.select(id_col, vec_col), id_col)
    return (
        emb.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), round_to).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine). Pure
    expressions: a literal array of centroid vectors, array_position of
    the max score. Adds a ``bucket`` column — at write time you'd
    partitionBy(bucket) so probes prune at the file level."""
    cents = F.array(*[_lit_vec(c) for c in centroids])
    # fan_out: C interpreted cosine evaluations per row fuse into the
    # scan stage — spread single-row-group inputs (no-op at real scale)
    emb = fan_out(emb, id_col)
    scores = F.transform(cents, lambda c: cosine(F.col(vec_col), c))
    # array_position returns 0 when nothing matched — i.e. every score
    # was NULL (NULL or zero-norm embedding). nullif maps that row to a
    # NULL bucket instead of the silent -1 sentinel that used to
    # negative-index (and corrupt) the LAST centroid in fit_centroids.
    bucket = F.nullif(
        F.expr(
            "array_position(transform(_scores, s -> s = array_max(_scores)), true) - 1"
        ),
        F.lit(-1),
    )
    return (
        emb.withColumn("_scores", scores)
        .withColumn("bucket", bucket.cast("int"))
        .drop("_scores")
    )


def fit_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column with plain DataFrame
    aggregations — makes the IVF path end-to-end instead of
    caller-supplied centroids.

    - init: the first ``n_centroids`` vectors by id (deterministic; at
      corpus scale you'd k-means|| a sample, the update loop is
      unchanged)
    - assign: ``ivf_assign`` (cosine argmax, pure expressions)
    - update: element-wise bucket means via posexplode → one
      groupBy(bucket, dim) shuffle of C×D cells per iteration; empty
      buckets keep their previous centroid

    Driver state is O(C×D) floats; everything row-scale stays
    distributed. Means are unnormalized (spherical k-means would
    renormalize; cosine argmax is scale-invariant so assignment is
    identical either way).
    """
    init_rows = (
        emb.orderBy(id_col).limit(n_centroids).select(id_col, vec_col).collect()
    )
    cents = [[float(x) for x in r[vec_col]] for r in init_rows]
    for _ in range(max(iters, 0)):
        assigned = ivf_assign(emb, cents, id_col=id_col, vec_col=vec_col)
        cells = (
            assigned.filter(F.col("bucket").isNotNull())  # degenerate rows
            .select("bucket", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("bucket", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("mean"))
            .collect()
        )
        nxt = [list(c) for c in cents]
        for r in cells:
            nxt[int(r["bucket"])][int(r["dim"])] = float(r["mean"])
        if nxt == cents:
            break
        cents = nxt
    return cents


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Probe only the nprobe buckets whose centroids are closest to the
    query, then exact top-k within them. Approximate: recall < 1 when a
    true neighbor lives in an unprobed bucket (tested against the brute
    force baseline)."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-12)
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]
    qcol = _lit_vec(query_vec)
    return (
        assigned.filter(F.col("bucket").isin(probe))  # partition-prunable
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), qcol), round_to).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def embedding_neardup_pairs(
    assigned: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs: candidates = same IVF bucket (one
    shuffle on bucket), verify = exact cosine ≥ threshold.

    ``max_bucket`` drops over-full buckets before pairing — the in-bucket
    self-join is O(|bucket|²) and a degenerate centroid (all-zero
    embeddings, one dominant cluster) otherwise turns this into
    all-pairs at corpus scale. Dropped buckets attach to the result as
    ``.dropped_buckets`` (no silent caps)."""
    from .dedup import cap_buckets

    dropped = None
    if max_bucket is not None:
        assigned, dropped = cap_buckets(assigned, ["bucket"], max_bucket)
    a = assigned.select(
        F.col("bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        F.col("bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    out = (
        # shuffle join (see dedup.lsh_candidate_pairs): a broadcast side
        # would re-run the whole IVF-assignment pipeline a second time,
        # and at corpus scale the vector relation can't broadcast anyway
        a.join(b.hint("shuffle_hash"), "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine(F.col("va"), F.col("vb")), round_to))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
    out.dropped_buckets = dropped
    return out


def label_centroid_cosine(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 4,
) -> DataFrame:
    """Embedding quality gate: cosine of every vector to its label's
    centroid (mean vector) — low scorers are mislabeled/outlier
    candidates, the standard filter before training on labeled
    embeddings. Returns (id, label, centroid_cos).

    Scale shape: the centroid is a posexplode → groupBy(label, pos)
    avg — |labels|×D cells, map-side combinable — reassembled into one
    array per label (array_sort over a D-element collect_list, bounded
    by the embedding dim) and BROADCAST back; the scoring join is then
    per-row codegen, zero additional shuffles of the vector table."""
    cells = (
        emb.select(
            F.col(label_col).alias("l"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        .groupBy("l", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
    )
    cents = cells.groupBy("l").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda x: x["m"],
        ).alias("centroid")
    )
    return (
        emb.join(F.broadcast(cents), emb[label_col] == cents["l"])
        .select(
            F.col(id_col),
            F.col(label_col),
            F.round(cosine(F.col(vec_col), F.col("centroid")), round_to).alias(
                "centroid_cos"
            ),
        )
    )


def semantic_dedup(
    assigned: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_bucket: int | None = None,
    max_iters: int = 50,
    keeper: str = "min_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): documents whose EMBEDDINGS are near-identical
    are semantic duplicates even when their surface text shares no
    shingles (translations, templated rewrites, boilerplate
    paraphrases) — the dedup layer MinHash can't see. Composes the
    audited pieces end-to-end: same-IVF-bucket candidate pairs with
    exact cosine ≥ ``threshold`` (embedding_neardup_pairs), transitive
    closure into clusters (connected_components — semantic duplication
    chains exactly like textual near-duplication, so keeper selection
    needs the component label, not the pair list), then per-vector
    keep verdicts (keep_corpus). Returns one row per input vector:
    (id, cluster_id = component min id, cluster_size, is_keeper).

    Scale shape: inherits each stage's audited plan — bucketed O(|b|²)
    pairing capped by ``max_bucket`` (dropped buckets re-attached here
    as ``.dropped_buckets``), O(log n) large-star/small-star rounds
    with bounded lineage, one combinable agg + join-back for sizes.
    The vector table itself is shuffled once (on bucket); components
    operate on the pair list, which LSH-capping keeps ≪ corpus-sized.

    Keeper rules (``keeper``):

    - ``"min_id"`` (default): keep the component's min id — the
      engine-wide first-wins convention (q06/q47/q50). Output:
      (id, cluster_id, cluster_size, is_keeper).
    - ``"farthest"``: SemDeDup's published refinement — per cluster,
      keep the member FARTHEST from the cluster centroid (lowest
      cosine; min id breaks ties), the paper's argument being that
      the most atypical member carries the most marginal information.
      Output adds ``centroid_cos``. Extra cost over min_id: one
      posexplode → groupBy(cluster_id, pos) avg for the centroids
      (|clusters| × D cells, map-side combinable — the same shape as
      label_centroid_cosine), a shuffle join back on cluster_id, and
      one combinable min-struct agg for the per-cluster argmin; the
      vector table is never compared pairwise again. Singletons are
      their own centroid (cos 1.0) and always keep. Zero-norm
      vectors cosine to NULL; the argmin orders them LAST via a +2.0
      sentinel (a real cosine can't exceed 1), matching the oracle's
      coalesce."""
    from .dedup import connected_components, keep_corpus

    if keeper not in ("min_id", "farthest"):
        raise ValueError(f"unknown keeper rule: {keeper!r}")
    pairs = embedding_neardup_pairs(
        assigned, threshold=threshold, id_col=id_col, vec_col=vec_col,
        round_to=round_to, max_bucket=max_bucket,
    )
    comps = connected_components(
        pairs.select("id_a", "id_b"),
        vertices=assigned.select(id_col),
        id_col=id_col,
        max_iters=max_iters,
    )
    from .dedup import cache_handles

    if keeper == "min_id":
        out = keep_corpus(comps, id_col=id_col)
        out.dropped_buckets = pairs.dropped_buckets
        # comps' star-set cache is lost to keep_corpus's transforms
        out.df_pipeline_caches = cache_handles(comps)
        return out

    mem = comps.join(assigned.select(id_col, vec_col), id_col)
    cells = (
        mem.select(
            F.col("cluster_id"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        .groupBy("cluster_id", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
    )
    cents = cells.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda x: x["m"],
        ).alias("_centroid")
    )
    scored = mem.join(cents, "cluster_id").select(
        id_col,
        "cluster_id",
        F.round(cosine(F.col(vec_col), F.col("_centroid")), round_to).alias(
            "centroid_cos"
        ),
    )
    pick = scored.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size"),
        F.min(
            F.struct(
                F.coalesce(F.col("centroid_cos"), F.lit(2.0)).alias("c"),
                F.col(id_col).alias("i"),
            )
        )["i"].alias("_keep_id"),
    )
    out = scored.join(pick, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        "centroid_cos",
        (F.col(id_col) == F.col("_keep_id")).alias("is_keeper"),
    )
    out.dropped_buckets = pairs.dropped_buckets
    out.df_pipeline_caches = cache_handles(comps)
    return out


def knn_label_vote(
    train: DataFrame,
    test: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """k-nearest-neighbor label assignment over the IVF buckets — the
    embedding-space classifier a curation pipeline uses to propagate a
    small labeled seed set (topic, quality tier, language) onto the
    whole corpus. For every test vector: its k nearest LABELED vectors
    in the SAME bucket by rounded cosine (train id breaks ties), then
    a majority vote (vote count desc, label asc — total order, so the
    prediction is deterministic and engine-portable). Returns one row
    per test vector (a verdict, not a dropped row): (id, pred_label,
    n_votes, n_neighbors); vectors whose bucket holds no labeled
    neighbors (or was capped away) predict NULL with n_neighbors 0.

    Scale shape: candidates are same-bucket only — the q29/q64
    candidate plan, O(|bucket|·|test∩bucket|), never corpus all-pairs
    — with the labeled side cap_buckets-capped (dropped buckets attach
    as ``.dropped_buckets``; no silent caps). The per-test top-k
    window is bounded by the bucket cap; the vote is one combinable
    agg over ≤k rows per test vector."""
    from pyspark.sql import Window

    tr = ivf_assign(
        train.select(id_col, vec_col, label_col), centroids,
        id_col=id_col, vec_col=vec_col,
    )
    te = ivf_assign(
        test.select(id_col, vec_col), centroids,
        id_col=id_col, vec_col=vec_col,
    )
    dropped = None
    if max_bucket is not None:
        from .dedup import cap_buckets

        tr, dropped = cap_buckets(tr, ["bucket"], max_bucket)
    tr = tr.select(
        "bucket",
        F.col(id_col).alias("_tid"),
        F.col(vec_col).alias("_tv"),
        F.col(label_col).alias("_tl"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos").desc(), F.col("_tid")
    )
    top = (
        te.join(tr, "bucket")
        .withColumn("cos", F.round(cosine(F.col(vec_col), F.col("_tv")), round_to))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )
    votes = top.groupBy(id_col, "_tl").agg(F.count("*").cast("long").alias("v"))
    pick = votes.groupBy(id_col).agg(
        F.min(F.struct((-F.col("v")).alias("nv"), F.col("_tl").alias("l"))).alias("_p"),
    )
    nn = top.groupBy(id_col).agg(F.count("*").cast("long").alias("_nn"))
    out = (
        te.select(id_col)
        .join(pick, id_col, "left")
        .join(nn, id_col, "left")
        .select(
            id_col,
            F.col("_p.l").alias("pred_label"),
            (-F.col("_p.nv")).cast("long").alias("n_votes"),
            F.coalesce(F.col("_nn"), F.lit(0)).cast("long").alias("n_neighbors"),
        )
    )
    out.dropped_buckets = dropped
    return out


def hyperplane_signs(n_bits: int, dim: int, seed: str = "hp") -> list[list[float]]:
    """The deterministic random-hyperplane sign matrix for
    `hyperplane_lsh`: sign s[k][i] = +1 iff the first byte of
    md5(seed|k|i) is even. Computed DRIVER-side in Python (n_bits x dim
    literals — model-sized state, the centroid convention) so the
    identical matrix is embeddable in any engine's expression — the
    DuckDB oracle uses these exact lists."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}|{k}|{i}".encode()).hexdigest()[:2], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for k in range(n_bits)
    ]


def hyperplane_lsh(
    emb: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: str = "hp",
    quant: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Hyperplane LSH (Charikar 2002 SimHash for vectors): bit k of a
    vector's signature is the sign of its dot product with random
    hyperplane k — vectors at small angles share most bits, so the
    signature buckets are a cosine-ANN family that needs NO trained
    centroids (the k-means-free alternative to the IVF path; real
    pipelines run it when the corpus drifts faster than centroids can
    be refit). Returns (id, sig) with sig = the n_bits-bit signature
    as a long; banding it for near-dup pairing composes exactly like
    the text simhash (split sig into nibble band keys → bucket join).

    Reproducibility: components are QUANTIZED to k/quant (a power of
    two) before the fold, so every projection is a sum of dyadic
    rationals — EXACT in double regardless of engine or fold order
    (the q65 weight convention), and the sign can never flip on a
    last-ulp disagreement. The sign matrix is md5-derived and
    driver-computed (`hyperplane_signs`), identical in the oracle.

    Scale shape: zero shuffles, zero joins — n_bits row-local folds
    over the embedding array (interpreted higher-order exprs; a real
    deployment at D in the thousands would swap ONE mapInPandas numpy
    matmul, same output contract). NULL embeddings keep a NULL sig."""
    if quant < 1 or (quant & (quant - 1)):
        raise ValueError("quant must be a positive power of two")
    signs = hyperplane_signs(n_bits, dim, seed)
    q = F.transform(
        F.col(emb_col).cast("array<double>"),
        lambda v: F.floor(v * quant) / quant,
    )
    sig = F.lit(0).cast("long")
    for k in range(n_bits):
        proj = F.aggregate(
            F.zip_with(
                q,
                F.array(*[F.lit(s) for s in signs[k]]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << k)).otherwise(F.lit(0)).cast("long")
    return emb.select(
        F.col(id_col),
        F.when(F.col(emb_col).isNotNull(), sig).alias("sig"),
    )
