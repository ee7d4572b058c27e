"""Training-data operator tests: property checks for the ops whose
semantics aren't SQL-expressible (simhash, IVF, media decode), numpy
cross-validation for the vector math, and plan-shape assertions
(pushdown/pruning) that encode the 100 TB design contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crab_spark.operators import dedup as D
from crab_spark.operators import multimodal as M
from crab_spark.operators import similarity as S
from crab_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "The  Quick Brown fox jumps over the lazy dog"),  # case/ws-dup of 0
        (3, "completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    got = {r["keeper"]: r["n_dups"] for r in D.exact_dedup(docs).collect()}
    # 0, 2, 4 normalize to the same content → keeper 0 with 3 members
    assert got[0] == 3 and got[1] == 1 and got[3] == 1


def test_minhash_identical_sets_equal_sigs(docs):
    sigs = {r["doc_id"]: (r["sig_0"], r["sig_1"]) for r in
            D.minhash_signatures(docs, n_hashes=2, k=2).collect()}
    assert sigs[0] == sigs[4]          # identical text ⇒ identical signature
    assert sigs[0] != sigs[3]          # disjoint shingles ⇒ ≠ (w.h.p.)


def test_minhash_signatures_stay_in_codegen(docs):
    """Signatures must run the md5 work inside whole-stage codegen
    (explode + map-combinable groupBy(min)). Higher-order functions
    (transform/array_min) are interpreted expressions — a 'shuffle-free'
    HOF formulation measured 7× slower at sf0.1 — so the contract is:
    exactly ONE exchange (the doc-key agg), and the hash expressions
    inside a WholeStageCodegen span."""
    from crab_spark.plans import formatted_plan

    plan = formatted_plan(D.minhash_signatures(docs, n_hashes=4, k=2))
    # shape: Generate (explode shingles) → partial min agg (map-side
    # combine) → ONE doc-key exchange → final agg; md5 lives in the
    # aggregate functions, not in an interpreted HOF projection
    assert "Generate" in plan and "partial_min(md5(" in plan
    assert "array_min" not in plan


def test_lsh_finds_neardups(docs):
    sigs = D.minhash_signatures(docs, n_hashes=8, k=2)
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.lsh_candidate_pairs(sigs, n_hashes=8, band_size=2).collect()}
    assert (0, 4) in pairs             # exact dups always collide
    assert (0, 1) in pairs             # 8/9-shingle overlap: some band matches
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_values(spark, docs):
    pairs = spark.createDataFrame([(0, 4), (0, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           D.ngram_jaccard(docs, pairs, k=3).collect()}
    assert got[(0, 4)] == 1.0
    assert got[(0, 3)] == 0.0


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sh[0] == sh[4]              # identical text
    ham01 = bin((sh[0] ^ sh[1]) & (2**64 - 1)).count("1")
    ham03 = bin((sh[0] ^ sh[3]) & (2**64 - 1)).count("1")
    assert ham01 < ham03               # near-dup closer than unrelated


def test_simhash_neardup_banding(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             D.simhash_neardup_pairs(D.simhash(docs)).collect()}
    assert pairs[(0, 4)] == 0
    assert (0, 1) in pairs


def test_connected_components_chains_and_isolates(spark):
    """Alternating large-star/small-star CC: transitive chains collapse
    to one cluster labeled by the component min; isolated vertices
    label themselves; a 60-edge path (diameter 60) converges in the
    O(log n) round budget."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (12, 11)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 12, 99)], "doc_id long"
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in D.connected_components(pairs, vertices=verts).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    got2 = {r["doc_id"]: r["cluster_id"]
            for r in D.connected_components(chain).collect()}
    assert len(got2) == 21 and set(got2.values()) == {0}


def test_connected_components_random_graph_matches_union_find(spark):
    """Seeded random graph vs an independent pure-Python union-find:
    component labels (min id per component) must agree exactly."""
    import random

    rng = random.Random(7)
    n = 40
    edges = list({(a, b) for a, b in
                  ((rng.randrange(n), rng.randrange(n)) for _ in range(30))
                  if a != b})
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    want = {}
    for v in range(n):
        root = find(v)
        want.setdefault(root, []).append(v)
    expect = {v: min(members) for members in want.values() for v in members}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = D.connected_components(pairs, vertices=verts)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == expect
    out.df_ordered_cache.unpersist()


@pytest.fixture(scope="module")
def mega_docs(spark):
    """300 identical boilerplate docs (one mega band-bucket in every
    generator) + 2 docs with identical DISTINCTIVE text (the planted
    pair a capped pass must still find)."""
    rows = [(i, "same boilerplate nav header footer text on every page")
            for i in range(300)]
    rows += [(1000, "unique alpha beta gamma delta epsilon zeta payload"),
             (1001, "unique alpha beta gamma delta epsilon zeta payload")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_bucket_cap_bounds_mega_buckets(mega_docs):
    """100 TB contract: a boilerplate mega-bucket must not generate
    O(|bucket|²) candidate pairs. With the cap, the 300-doc bucket is
    dropped WHOLE (and reported via .dropped_buckets), the planted pair
    in a small bucket survives."""
    sigs = D.minhash_signatures(mega_docs, n_hashes=8, k=2)
    pairs = D.lsh_candidate_pairs(sigs, n_hashes=8, band_size=2, max_bucket=50)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1000, 1001) in got
    assert len(got) < 300              # vs 300·299/2 ≈ 45k uncapped
    dropped = pairs.dropped_buckets.collect()
    assert dropped and all(r["n"] > 50 for r in dropped)
    # no silent caps: every dropped row names its bucket and size
    assert {r["n"] for r in dropped} == {300}


def test_simhash_bucket_cap_bounds_mega_buckets(mega_docs):
    pairs = D.simhash_neardup_pairs(
        D.simhash(mega_docs), max_hamming=3, max_bucket=50
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1000, 1001) in got
    assert len(got) < 300
    assert pairs.dropped_buckets.count() >= 1


def test_embedding_bucket_cap_bounds_mega_buckets(spark):
    """One degenerate IVF bucket with 300 vectors is dropped; the
    planted near-dup pair in a small bucket survives the cap."""
    rows = [(i, 0, [1.0, 0.0, 0.0]) for i in range(300)]
    rows += [(1000, 1, [0.0, 1.0, 0.1]), (1001, 1, [0.0, 1.0, 0.11])]
    assigned = spark.createDataFrame(
        rows, "vec_id long, bucket int, embedding array<float>"
    )
    pairs = S.embedding_neardup_pairs(assigned, threshold=0.9, max_bucket=50)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1000, 1001)}
    dropped = pairs.dropped_buckets.collect()
    assert len(dropped) == 1 and dropped[0]["n"] == 300


def test_simhash_odd_token_count_not_all_ones(spark):
    """Regression: uint64 vote underflow made every odd-token-count doc
    hash to 0xffff... so unrelated docs collided at hamming 0. Two
    unrelated docs with ODD token counts must stay far apart."""
    d = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),            # 5 tokens
         (1, "zebra quark mango violin sunset")],          # 5 tokens, unrelated
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(d).collect()}
    assert sh[0] != -1 and sh[1] != -1  # not the all-ones signature
    ham = bin((sh[0] ^ sh[1]) & (2**64 - 1)).count("1")
    assert ham > 10


def test_simhash_banding_prunes_candidates(spark, sf_dir):
    """8×8-bit bands must not blow up on same-template text: candidate
    pairs ≪ all pairs (the 100 TB contract — banding exists to avoid
    O(n²)), while planted near-dups still surface."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    cands = D.simhash_neardup_pairs(D.simhash(docs), max_hamming=8)
    n_cands = cands.count()
    assert n_cands < 0.05 * n * (n - 1) / 2


def test_hamming_cap_applied_before_distinct(docs):
    got = D.simhash_neardup_pairs(D.simhash(docs), max_hamming=0).collect()
    # 0/2/4 normalize identically (simhash lowercases + splits) — all
    # three pairs at hamming 0, nothing else survives the cap
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 2), (0, 4), (2, 4)}


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(80, 16).astype(np.float32)
    vecs[5] = vecs[3] + 0.01 * rng.randn(16).astype(np.float32)  # near-dup pair
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    ), vecs


def test_cosine_topk_matches_numpy(emb):
    df, vecs = emb
    q = vecs[0].astype(np.float64)
    sims = (vecs.astype(np.float64) @ q) / (
        np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    want = sorted(range(80), key=lambda i: (-round(sims[i], 4), i))[:10]
    got = [r["vec_id"] for r in S.cosine_topk(df, [float(x) for x in vecs[0]], k=10).collect()]
    assert got == want


def test_ivf_recall_vs_bruteforce(emb):
    df, vecs = emb
    cents = [[float(x) for x in vecs[i]] for i in range(8)]
    q = [float(x) for x in vecs[3]]
    brute = {r["vec_id"] for r in S.cosine_topk(df, q, k=5).collect()}
    assigned = S.ivf_assign(df, cents)
    approx = {r["vec_id"] for r in S.ivf_topk(assigned, cents, q, k=5, nprobe=4).collect()}
    # probe-4-of-8 must recover most of the true top-5 (incl. 3 and 5)
    assert 3 in approx and len(brute & approx) >= 3


def test_fit_centroids_improves_recall(emb):
    """Fitted centroids (k-means) must give IVF recall at least as good
    as the naive first-C-vectors init at the same nprobe, and still find
    the planted near-dup pair."""
    df, vecs = emb
    q = [float(x) for x in vecs[3]]
    brute = {r["vec_id"] for r in S.cosine_topk(df, q, k=5).collect()}
    naive = [[float(x) for x in vecs[i]] for i in range(8)]
    fitted = S.fit_centroids(df, n_centroids=8, iters=4)
    assert len(fitted) == 8 and fitted != naive

    def recall(cents):
        assigned = S.ivf_assign(df, cents)
        got = {r["vec_id"] for r in S.ivf_topk(assigned, cents, q, k=5, nprobe=2).collect()}
        return len(brute & got)

    assert recall(fitted) >= recall(naive)
    pairs = {(r["id_a"], r["id_b"]) for r in
             S.embedding_neardup_pairs(S.ivf_assign(df, fitted), threshold=0.99).collect()}
    assert (3, 5) in pairs


def test_embedding_neardup_finds_planted_pair(emb):
    df, vecs = emb
    # centroids disjoint from the planted pair: near-identical vectors
    # then share an argmax bucket (using 3 or 5 AS a centroid would
    # split them — each would win its own bucket exactly)
    cents = [[float(x) for x in vecs[i]] for i in range(70, 78)]
    pairs = {(r["id_a"], r["id_b"]): r["score"] for r in
             S.embedding_neardup_pairs(S.ivf_assign(df, cents), threshold=0.99).collect()}
    assert (3, 5) in pairs and pairs[(3, 5)] >= 0.99


def test_lang_id_hits(spark):
    d = spark.createDataFrame(
        [(0, "the cat is on the mat and a dog"),
         (1, "der Hund ist ein Tier und das ist gut"),
         (2, "le chat est un animal et la vie")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in X.lang_id(d).collect()}
    assert got == {0: "en", 1: "de", 2: "fr"}


def test_lang_id_confusion_on_planted_multilingual_docs(spark):
    """r4 fidelity pass (r3 verdict item 8): the widened 20-word
    profiles must classify planted docs in all five languages — incl.
    SHORT docs and a code-mixed doc — with zero confusion; lang-ID
    gates the stratified-sampling rates that decide corpus mixture."""
    docs = [
        # full sentences
        ("en_long", "it was the best of times and it was the worst of "
                    "times for this city by the river", "en"),
        ("de_long", "das wetter ist heute nicht gut und wir werden mit "
                    "dem zug in die stadt fahren um für das fest "
                    "einzukaufen", "de"),
        ("fr_long", "il est dans la maison avec les enfants qui sont "
                    "plus heureux que jamais mais ne veulent pas sortir "
                    "pour le moment", "fr"),
        ("es_long", "los niños juegan en el parque con sus amigos pero "
                    "no pueden quedarse más tiempo por la lluvia como "
                    "siempre", "es"),
        ("zh_long", "我 们 的 朋 友 是 一 个 好 人 他 们 也 要 去 中 国 "
                    "为 了 工 作", "zh"),
        # short docs — the r3 7-word profiles misfired here
        ("en_short", "this is the plan for it", "en"),
        ("de_short", "das ist nicht für dich", "de"),
        ("fr_short", "ce sont les plus grands", "fr"),
        ("es_short", "no es para los niños", "es"),
        # code-mixed: english frame quoting a french phrase — the frame
        # dominates by count
        ("mixed", "the report is in english and it says that the "
                  "phrase le chat est petit was found in the corpus "
                  "by this tool", "en"),
    ]
    d = spark.createDataFrame([(i, t) for i, t, _ in docs],
                              "doc_id string, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in X.lang_id(d).collect()}
    want = {i: lang for i, _, lang in docs}
    assert got == want, {k: (got[k], want[k]) for k in want if got[k] != want[k]}


def test_lang_id_model_path_equivalence(spark, sf_dir):
    """The pluggable model path (mirroring the tokenizer plug): a
    StopwordModel — the reference implementation of the model contract
    — must agree with the default expression path row-for-row on real
    corpus text, including pred ties and hit counts, and produce the
    IDENTICAL output schema so downstream consumers don't change."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    expr = X.lang_id(docs)
    modeled = X.lang_id(docs, model=X.StopwordModel())
    assert expr.columns == modeled.columns == ["doc_id", "pred_lang", "hits"]
    e = {r["doc_id"]: (r["pred_lang"], r["hits"]) for r in expr.collect()}
    m = {r["doc_id"]: (r["pred_lang"], r["hits"]) for r in modeled.collect()}
    assert e == m
    # and a non-heuristic model slots in: constant-prediction stub
    class ConstModel:
        def predict(self, texts):
            import pandas as pd
            return pd.DataFrame(
                {"pred_lang": ["xx"] * len(texts), "hits": [0] * len(texts)}
            )

    got = X.lang_id(docs.limit(3), model=ConstModel()).collect()
    assert {r["pred_lang"] for r in got} == {"xx"}


def test_repetition_stats_planted(spark):
    """Planted repetition: a doc that is one phrase looped scores near
    1-ish rep_ratio; a repetition-free doc scores 0."""
    from crab_spark.operators import decontam as DC

    d = spark.createDataFrame(
        [("loop", "buy now " * 20 + "buy now"),
         ("clean", "every word here is used exactly once today friend")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in DC.repetition_stats(d, k=3).collect()}
    assert got["clean"]["rep_ratio"] == 0.0
    assert got["clean"]["n_ngrams"] == got["clean"]["n_distinct"]
    # 42 words -> 40 trigrams, only 2 distinct ("buy now buy"/"now buy now")
    assert got["loop"]["n_distinct"] == 2
    assert got["loop"]["rep_ratio"] > 0.9


def test_ngram_contamination_planted_and_broadcast(spark):
    """A doc quoting a benchmark 5-gram is flagged; clean docs aren't.
    Plan contract: the benchmark shingle side is BROADCAST (eval sets
    are tiny next to a 100 TB corpus) — the corpus is never shuffled on
    shingle values."""
    from crab_spark.operators import decontam as DC
    from crab_spark.plans import formatted_plan

    bench = spark.createDataFrame(
        [("eval1", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    docs = spark.createDataFrame(
        [("leak", "my essay says the quick brown fox jumps over things"),
         ("clean", "completely different words with no overlap at all here"),
         ("partial", "a quick brown fox appears but shares no five gram")],
        "doc_id string, text string",
    )
    out = DC.ngram_contamination(docs, bench, k=5)
    got = {r["doc_id"]: (r["n_contaminated"], r["contaminated"])
           for r in out.collect()}
    # "the quick brown fox jumps" and "quick brown fox jumps over" leak
    assert got["leak"] == (2, True)
    assert got["clean"] == (0, False)
    assert got["partial"] == (0, False)
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_ngram_contamination_threshold_boundary(spark):
    """The thresholded fraction flag at its exact boundary: a doc whose
    contaminated fraction EQUALS max_frac is NOT contaminated (strict
    >, exact integer arithmetic); one shingle fewer tips it over."""
    from crab_spark.operators import decontam as DC

    bench = spark.createDataFrame(
        [("eval1", "alpha beta")], "doc_id string, text string"
    )
    docs = spark.createDataFrame(
        # k=2: 'at' has 4 distinct 2-grams, 1 shared -> frac = 0.25 == max_frac
        #      'over' has 3 distinct 2-grams, 1 shared -> 1/3 > 0.25
        [("at", "alpha beta gamma delta epsilon"),
         ("over", "alpha beta gamma delta")],
        "doc_id string, text string",
    )
    out = DC.ngram_contamination(docs, bench, k=2, max_frac=0.25)
    got = {r["doc_id"]: r for r in out.collect()}
    assert (got["at"]["n_contaminated"], got["at"]["n_shingles"]) == (1, 4)
    assert got["at"]["contam_frac"] == 0.25
    assert got["at"]["contaminated"] is False
    assert (got["over"]["n_contaminated"], got["over"]["n_shingles"]) == (1, 3)
    assert got["over"]["contaminated"] is True
    # default max_frac=0.0 keeps the strict any-hit rule
    strict = {r["doc_id"]: r["contaminated"]
              for r in DC.ngram_contamination(docs, bench, k=2).collect()}
    assert strict == {"at": True, "over": True}


def test_source_mix_report_values(spark):
    from crab_spark.operators import decontam as DC

    d = spark.createDataFrame(
        [("a", "same text", "en", "s1"), ("b", "same text", "de", "s1"),
         ("c", "other", "en", "s1"), ("d", "unique here", "fr", "s2")],
        "doc_id string, text string, lang string, source string",
    )
    got = {r["source"]: r for r in DC.source_mix_report(d).collect()}
    assert got["s1"]["n_docs"] == 3 and got["s1"]["n_langs"] == 2
    # 3 docs, 2 distinct contents -> dup rate 1 - 2/3
    assert got["s1"]["dup_rate"] == round(1 - 2 / 3, 4)
    assert got["s2"]["n_docs"] == 1 and got["s2"]["dup_rate"] == 0.0


def test_quality_features_values(spark):
    d = spark.createDataFrame([(0, "Ab c, d!")], "doc_id long, text string")
    r = X.quality_features(d).collect()[0]
    assert r["n_chars"] == 8
    assert r["punct_ratio"] == round(2 / 8, 4)  # ',' and '!'
    assert r["upper_ratio"] == round(1 / 8, 4)
    assert r["space_ratio"] == round(2 / 8, 4)


def test_bpe_tokenizer_deterministic_and_exact(spark, docs):
    """The pluggable BPE path: training is deterministic, encoding is
    lossless, and the Arrow UDF count equals the driver-side count —
    token budgets mean real tokens (r2 verdict stretch 9)."""
    from crab_spark.operators.tokenizer import BPETokenizer

    texts = [r["text"] for r in docs.collect()]
    t1 = BPETokenizer.train(texts, n_merges=50)
    t2 = BPETokenizer.train(texts, n_merges=50)
    assert t1.merges == t2.merges and len(t1.merges) > 0
    for w in ["quick", "engines", "jumps"]:
        assert "".join(t1.encode_word(w)).replace("</w>", "") == w
    got = {r["doc_id"]: r["n_bpe_est"]
           for r in X.token_count(docs, tokenizer=t1).collect()}
    want = {r["doc_id"]: t1.count(r["text"]) for r in docs.collect()}
    assert got == want
    # drop-in: same schema as the heuristic path
    assert (X.token_count(docs).columns
            == X.token_count(docs, tokenizer=t1).columns)


def test_packing_with_bpe_tokens_matches_definition(spark, docs):
    """q39's packing with exact BPE counts still matches the
    greedy-fill definition (pack = floor(cum_before / budget))."""
    from crab_spark.operators import packing as P
    from crab_spark.operators.tokenizer import BPETokenizer

    texts = [(r["doc_id"], r["text"]) for r in docs.orderBy("doc_id").collect()]
    tok = BPETokenizer.train([t for _, t in texts], n_merges=30)
    packed = P.with_pack_ids(docs, budget=20, tokenizer=tok)
    got = {r["doc_id"]: (r["n_tokens"], r["pack_id"]) for r in packed.collect()}
    cum = 0
    for did, text in texts:
        n = tok.count(text)
        assert got[did] == (n, cum // 20), (did, got[did], n, cum)
        cum += n
    packed.df_ordered_cache.unpersist()


def test_media_pipeline_deterministic(docs):
    media = M.media_from_documents(docs)
    f1 = {r["media_id"]: (r["width"], r["height"], r["n_frames"], tuple(r["feature"]))
          for r in M.extract_features(media).collect()}
    f2 = {r["media_id"]: (r["width"], r["height"], r["n_frames"], tuple(r["feature"]))
          for r in M.extract_features(media).collect()}
    assert f1 == f2 and len(f1) == 5
    assert all(len(v[3]) == 8 for v in f1.values())
    # images are single-frame by contract
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    for mid, (w, h, nf, _) in f1.items():
        assert w and h
        if kinds[mid] == "image":
            assert nf == 1


def test_resize_plan_aspect_fit_no_upscale(docs):
    """Resize planning: out dims fit (16, 16) box, aspect preserved
    (uniform scale, floor), and nothing upscales."""
    plan = M.resize_plan(M.media_from_documents(docs), max_w=16, max_h=16)
    rows = plan.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["out_w"] <= 16 and r["out_h"] <= 16
        assert r["scale"] <= 1.0
        assert r["out_w"] <= r["src_w"] and r["out_h"] <= r["src_h"]
        # exact geometry: the BINDING axis hits the box edge exactly
        # (floor(dim·(max/dim)) used to land on max-1 — e.g. src 49 → 15)
        w, h = r["src_w"], r["src_h"]
        if w <= 16 and h <= 16:
            assert (r["out_w"], r["out_h"]) == (w, h)
        elif w * 16 >= h * 16:
            assert r["out_w"] == 16 and r["out_h"] == (h * 16) // w
        else:
            assert r["out_h"] == 16 and r["out_w"] == (w * 16) // h


def test_resize_plan_binding_axis_exact(spark):
    """Regression: a 49-wide image fit into a 16-box must come out
    exactly 16 wide, not 15 (float max/dim underflow)."""
    from crab_spark.operators.multimodal import FakeDecoder
    import crab_spark.operators.multimodal as MM

    class FixedDecoder(FakeDecoder):
        def decode_batch(self, pdf):
            import pandas as pd
            n = len(pdf)
            return pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"],
                 "width": pd.array([49] * n, dtype="Int32"),
                 "height": pd.array([10] * n, dtype="Int32"),
                 "n_frames": pd.array([1] * n, dtype="Int32"),
                 "feature": [[0.0] * 8] * n}
            )

    media = spark.createDataFrame(
        [("m:1", "image", b"x", 1, "{}")],
        "media_id string, kind string, payload binary, n_bytes long, meta string",
    )
    got = MM.resize_plan(media, decoder=FixedDecoder(), max_w=16, max_h=16).collect()[0]
    assert (got["out_w"], got["out_h"]) == (16, 3)


def test_sample_frames_stride_and_bounds(docs):
    """Frame sampling: indices are 0, stride, … < n_frames; images
    contribute exactly frame 0."""
    feats = {r["media_id"]: (r["kind"], r["n_frames"])
             for r in M.extract_features(M.media_from_documents(docs)).collect()}
    got: dict[str, list[int]] = {}
    for r in M.sample_frames(M.media_from_documents(docs), stride=2).collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, (kind, n) in feats.items():
        assert sorted(got[mid]) == list(range(0, n, 2))
        if kind == "image":
            assert got[mid] == [0]


def test_media_stats_prunes_payload(docs):
    """The metadata rollup must never read the binary column —
    ReadSchema in the physical plan excludes `payload` (100 TB contract:
    stats over media tables are metadata-only scans)."""
    import tempfile

    from crab_spark.plans import assert_read_schema_excludes

    media = M.media_from_documents(docs)
    with tempfile.TemporaryDirectory() as td:
        media.write.parquet(f"{td}/media")
        stats = M.media_stats(media.sparkSession.read.parquet(f"{td}/media"))
        assert_read_schema_excludes(stats, "payload")
        got = {r["kind"]: r["n"] for r in stats.collect()}
        assert sum(got.values()) == 5


def test_q24_plan_has_no_cartesian_product(spark, sf_dir):
    """The LSH → Jaccard verify composition must never fall back to a
    cartesian product (the anti-pattern banding exists to avoid)."""
    from crab_spark.plans import assert_no_cartesian
    from crab_spark.queries import QUERIES

    assert_no_cartesian(QUERIES["q24_ngram_jaccard"](spark, sf_dir))


def test_duplicate_parser_type_id_raises(spark):
    from crab_spark.parsers import ParserRegistry, SpanParser

    with pytest.raises(ValueError, match="duplicate parser"):
        ParserRegistry([SpanParser(type_id=1, name="a"), SpanParser(type_id=1, name="b")])


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """q01 contract: predicate + projection reach the parquet scan."""
    from crab_spark.plans import assert_pushed_filter, plan_lines

    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_shipdate") < "1995-03-15")
        .select("l_orderkey", "l_quantity")
    )
    assert_pushed_filter(df, "LessThan(l_shipdate")
    read = plan_lines(df, "ReadSchema")[0]
    assert "l_extendedprice" not in read and "l_orderkey" in read


def test_corpus_datasource_matches_generator(spark):
    """The crab_corpus Python Data Source must yield exactly the
    corpus_df rows (schema + values), partitioned by page chunks."""
    from crab_spark.corpus import corpus_df
    from crab_spark.sources import register_sources

    register_sources(spark)
    df = spark.read.format("crab_corpus").option("n_pages", 12).load()

    def key(r):
        return (r["url"], r["type_id"],
                tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]))

    assert {key(r) for r in df.collect()} == {key(r) for r in corpus_df(spark, 12).collect()}


def test_hash_sample_deterministic_and_nested(spark, docs):
    from crab_spark.operators import sampling as SA

    big = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"] for r in SA.hash_sample(big, 0.2).collect()}
    s2 = {r["doc_id"] for r in SA.hash_sample(big, 0.2).collect()}
    assert s1 == s2                      # reproducible, unlike df.sample
    s_small = {r["doc_id"] for r in SA.hash_sample(big, 0.05).collect()}
    assert s_small <= s1                 # thresholds nest: rate↑ ⇒ superset
    assert 0.1 < len(s1) / 2000 < 0.3    # close to the nominal rate
    salted = {r["doc_id"] for r in SA.hash_sample(big, 0.2, salt="b").collect()}
    assert salted != s1                  # salt decorrelates samples


def test_stratified_sample_rates(spark):
    from crab_spark.operators import sampling as SA

    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = SA.stratified_sample(df, {"de": 1.0, "en": 0.1}, strat_col="lang")
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == 1000          # rate 1.0 keeps the whole stratum
    assert 40 < counts.get("en", 0) < 220
    none_kept = SA.stratified_sample(df, {}, strat_col="lang", default_rate=0.0)
    assert none_kept.count() == 0


def test_pack_sequences_matches_global_cumsum(spark):
    """The two-level distributed cumsum must equal the single-window
    definition, and packs must respect the don't-split-documents rule."""
    from pyspark.sql import Window as W2

    from crab_spark.operators import packing as P

    rows = [(i, " ".join(["w"] * (7 + (i * 13) % 90))) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    packed = P.with_pack_ids(docs, budget=256, num_partitions=8)
    got = {r["doc_id"]: (r["pack_id"], r["n_tokens"]) for r in packed.collect()}

    w = W2.orderBy("doc_id").rowsBetween(W2.unboundedPreceding, -1)
    ref = (
        docs.withColumn("n", F.size(F.split("text", " ")).cast("long"))
        .withColumn("cb", F.coalesce(F.sum("n").over(w), F.lit(0)))
        .withColumn("pid", F.floor(F.col("cb") / 256))
    )
    want = {r["doc_id"]: (r["pid"], r["n"]) for r in ref.collect()}
    assert got == want
    # fill invariant: through pack k (non-last) the cumulative token
    # count reaches (k+1)·budget — each pack closes only once the budget
    # line is crossed (an individual pack may undershoot when its
    # predecessor overflowed past its line; that overflow counts)
    stats = {r["pack_id"]: r["pack_tokens"] for r in P.pack_stats(packed).collect()}
    running = 0
    for k in sorted(stats):
        running += stats[k]
        if k != max(stats):
            assert running >= 256 * (k + 1), (k, running)
    packed.df_ordered_cache.unpersist()


# ---------------------------------------------------------------------------
# scrub operators: PII redaction, paragraph dedup, chunking, LM score
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_redaction(spark):
    from crab_spark.operators import scrub as SC

    rows = [
        (0, "mail me at a.b+c@example.co.uk or visit 192.168.1.1 now"),
        (1, "call +1 555 123 4567 today"),
        (2, "nothing sensitive here"),
        (3, "two mails: x@y.io and z@w.org; ip 10.0.0.1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in SC.pii_scrub(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_ipv4"], got[0]["n_phones"]) == (1, 1, 0)
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) == (0, 0, 1)
    assert not got[2]["any_pii"]
    assert (got[3]["n_emails"], got[3]["n_ipv4"]) == (2, 1)
    # redaction replaces the full span: redacted text of doc 1 has no digits
    red = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", SC.redacted(F.col("text")).alias("r")
    )
    red_map = {r["doc_id"]: r["r"] for r in red.collect()}
    assert red_map[1] == "call <PHONE> today"
    assert red_map[0] == "mail me at <EMAIL> or visit <IP> now"
    assert red_map[3] == "two mails: <EMAIL> and <EMAIL>; ip <IP>"


def test_paragraph_dedup_first_wins(spark):
    from crab_spark.operators import scrub as SC

    seg_a = " ".join(f"a{i}" for i in range(4))   # 4-word segment
    seg_b = " ".join(f"b{i}" for i in range(4))
    seg_c = " ".join(f"c{i}" for i in range(4))
    rows = [
        (0, f"{seg_a} {seg_b}"),          # first occurrence of A, B
        (1, f"{seg_a} {seg_c}"),          # A is a dup here (doc 0 wins)
        (2, f"{seg_b}"),                  # B dup (doc 0 pos 1 wins)
        (3, ""),                          # empty: zero segments
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in
           SC.paragraph_dedup(docs, window_words=4).collect()}
    assert (got[0]["n_segs"], got[0]["n_dup_segs"]) == (2, 0)
    assert (got[1]["n_segs"], got[1]["n_dup_segs"]) == (2, 1)
    assert (got[2]["n_segs"], got[2]["n_dup_segs"]) == (1, 1)
    assert (got[3]["n_segs"], got[3]["n_dup_segs"]) == (0, 0)
    import hashlib
    assert got[3]["retained_hash"] == hashlib.md5(b"").hexdigest()
    # doc 1 retains only seg_c
    assert got[1]["retained_hash"] == hashlib.md5(seg_c.encode()).hexdigest()


def test_chunk_documents_boundaries(spark):
    from crab_spark.operators import scrub as SC

    rows = [
        (0, " ".join(f"w{i}" for i in range(10))),  # n=10 <= 8? no: chunks
        (1, " ".join(f"v{i}" for i in range(8))),   # exactly one chunk
        (2, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = SC.chunk_documents(docs, chunk_words=8, stride=4).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # n=10: 1 + ceil((10-8)/4) = 2 chunks; second covers words 4..9 (6 words)
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["n_words"] for r in c0] == [8, 6]
    assert [r["chunk_id"] for r in c0] == [0, 1]
    assert [r["n_words"] for r in by_doc[1]] == [8]
    assert [r["n_words"] for r in by_doc[2]] == [1]
    with pytest.raises(ValueError):
        SC.chunk_documents(docs, chunk_words=4, stride=8)


def test_lm_score_orders_rare_above_common(spark):
    """Docs made of corpus-rare words must score higher avg-NLL than
    docs of corpus-common words; n_words matches the whitespace count."""
    common = "the " * 50
    rows = [(i, common.strip()) for i in range(5)]
    rows.append((90, "zyzzyva axolotl quux"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in X.lm_score(docs).collect()}
    assert got[90]["avg_nll"] > got[0]["avg_nll"]
    assert got[0]["n_words"] == 50 and got[90]["n_words"] == 3
    # empty-corpus degenerate: all-common doc scores near -log(250/253)
    import math
    expect_common = -math.log(250 / 253)
    assert abs(got[0]["avg_nll"] - round(expect_common, 4)) < 5e-4


# ---------------------------------------------------------------------------
# corpus curation: keep-list, cross-source overlap, tf-idf, centroid
# gate, percentile gate
# ---------------------------------------------------------------------------


def test_keep_corpus_sizes_and_keepers(spark):
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 0), (4, 4)],
        "doc_id long, cluster_id long",
    )
    got = {r["doc_id"]: r.asDict() for r in D.keep_corpus(clusters).collect()}
    assert got[0]["is_keeper"] and got[0]["cluster_size"] == 3
    assert not got[1]["is_keeper"] and got[1]["cluster_size"] == 3
    assert got[2]["is_keeper"] and got[2]["cluster_size"] == 1
    assert sum(r["is_keeper"] for r in got.values()) == 3


def test_cross_source_overlap_planted(spark):
    from crab_spark.operators import scrub as SC

    shared = " ".join(f"s{i}" for i in range(4))     # one shared 4-word segment
    rows = [
        (0, "A", f"{shared}"),
        (1, "B", f"{shared}"),
        (2, "B", "totally different words here"),
        (3, "C", "other content entirely present"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in SC.cross_source_overlap(docs, window_words=4).collect()}
    assert got == {("A", "B"): 1}


def test_tfidf_topk_distinctive_word_wins(spark):
    rows = [
        (0, "common common common zebra"),
        (1, "common common common"),
        (2, "common words only common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = X.tfidf_topk(docs, k=1).collect()
    top = {r["doc_id"]: r["word"] for r in got}
    # 'zebra' appears in 1 of 3 docs → highest idf; 'common' has idf 0
    assert top[0] == "zebra"
    for r in got:
        assert r["rank"] == 1


def test_label_centroid_cosine_known_geometry(spark):
    from crab_spark.operators import similarity as S2

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),   # label-0 centroid = (.5, .5)
        (2, [1.0, 1.0], 1),   # label-1 centroid = itself → cos 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["vec_id"]: r["centroid_cos"] for r in
           S2.label_centroid_cosine(emb).collect()}
    assert abs(got[0] - 0.7071) < 1e-4 and abs(got[1] - 0.7071) < 1e-4
    assert abs(got[2] - 1.0) < 1e-9


def test_quality_percentile_gate_keep_count(spark):
    rows = [(i, ("rare" + str(i) + " ") * 3 if i < 3 else "the common text")
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.quality_percentile_gate(docs, cut=0.8)
    rowsc = out.collect()
    kept = [r for r in rowsc if r["keep"]]
    assert len(kept) == 8  # ceil(10 * 0.8) exactly, decimal-exact
    # the unique-word docs (highest NLL) are the dropped ones
    dropped = {r["doc_id"] for r in rowsc if not r["keep"]}
    assert dropped <= {0, 1, 2}
    out.df_ordered_cache.unpersist()


def test_quality_gate_empty_docs_rank_last(spark):
    """r4 ADVICE regression: empty/whitespace-only docs coalesce
    avg_nll to 0.0 (nominally the BEST score) — they must rank LAST,
    never displacing a real document from the keep set."""
    rows = [(i, f"meaningful text number {i} words") for i in range(8)]
    rows += [(8, ""), (9, "   ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.quality_percentile_gate(docs, cut=0.8)
    rowsc = out.collect()
    assert {r["doc_id"] for r in rowsc if not r["keep"]} == {8, 9}
    # and they sit at the bottom of the percentile order
    empty_pcts = [r["quality_pct"] for r in rowsc if r["doc_id"] in (8, 9)]
    assert min(empty_pcts) > max(
        r["quality_pct"] for r in rowsc if r["doc_id"] < 8
    )
    out.df_ordered_cache.unpersist()


def test_new_op_plan_contracts(spark, sf_dir):
    """Scale contracts as plan assertions: the centroid join broadcasts
    (labels×D cells, never a shuffle of the vector table); the
    cross-source self-join and the TF-IDF pipeline never degenerate
    into cartesian/nested-loop joins."""
    from crab_spark.operators import scrub as SC
    from crab_spark.operators import similarity as S2
    from crab_spark.plans import (
        assert_broadcast_join,
        assert_no_cartesian,
        formatted_plan,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cent = S2.label_centroid_cosine(emb)
    assert_broadcast_join(cent)
    assert_no_cartesian(cent)
    assert_no_cartesian(SC.cross_source_overlap(docs))
    pd_plan = formatted_plan(SC.paragraph_dedup(docs))
    assert "CartesianProduct" not in pd_plan
    # first-wins must be groupBy(min)+join, never a window over
    # partitionBy(hash): AQE skew-splits only joins, so a window would
    # pin every copy of a boilerplate mega-segment into one
    # unsplittable partition (scrub.paragraph_dedup docstring)
    assert "Window" not in pd_plan
    assert "partial_min" in pd_plan  # map-side combine of the winner
    # tfidf attaches the 1-row doc-count via a broadcast cross join —
    # that SHOWS UP as BroadcastNestedLoopJoin and is the correct plan
    # for a scalar attach; the forbidden shape is a true CartesianProduct
    # (both sides row-scale)
    assert "CartesianProduct" not in formatted_plan(X.tfidf_topk(docs))


def test_caption_candidates_planted(spark):
    """Interleaved alignment over hand-built spans: preceding text wins
    ties, the nearer side wins otherwise, forward reach works when no
    text precedes, and media in text-free documents is dropped."""
    from crab_spark.schemas import DOCUMENTS

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        # d1: media at 1 → nearer prev 'a'; media at 2 → nearer next 'b'
        ("d1", [sp("text", "a", "", 0), sp("media", "", "m1", 1),
                sp("media", "", "m2", 2), sp("text", "b", "", 3)], 0),
        # d2: exact tie (1 away both sides) → PRECEDING 'x' wins
        ("d2", [sp("text", "x", "", 0), sp("media", "", "m3", 1),
                sp("text", "y", "", 2)], 0),
        # d3: media first, text only ahead → forward caption 'z'
        ("d3", [sp("media", "", "m4", 0), sp("text", "z", "", 2)], 0),
        # d4: no text span at all → no candidate emitted
        ("d4", [sp("media", "", "m5", 0), sp("media", "", "m6", 1)], 0),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS)
    got = {r["media_ref"]: r for r in M.caption_candidates(docs).collect()}
    assert set(got) == {"m1", "m2", "m3", "m4"}
    assert (got["m1"]["caption"], got["m1"]["distance"]) == ("a", 1)
    assert (got["m2"]["caption"], got["m2"]["distance"]) == ("b", 1)
    assert (got["m3"]["caption"], got["m3"]["caption_offset"]) == ("x", 0)
    assert (got["m4"]["caption"], got["m4"]["distance"]) == ("z", 2)


def test_source_reputation_gate_planted(spark):
    """Each gate fires independently: 'dupey' fails only the dup
    fraction, 'short' fails only the mean length, 'good' passes both;
    and the per-source join-back is broadcast."""
    from crab_spark.plans import assert_broadcast_join

    long = "one two three four five six seven eight"
    rows = (
        [(i, "good", long + f" unique{i}") for i in range(3)]
        + [(10, "dupey", long), (11, "dupey", long), (12, "dupey", long),
           (13, "dupey", long + " extra")]      # 2 dups of 4 → 0.5
        + [(20, "short", "tiny text"), (21, "short", "also tiny")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = X.source_reputation_gate(docs, min_mean_words=5, max_dup_frac="0.2")
    assert_broadcast_join(out)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["keep"] and got[0]["src_n_docs"] == 3
    assert not got[10]["keep"] and abs(got[10]["src_dup_frac"] - 0.5) < 1e-9
    assert got[10]["src_mean_words"] > 5           # fails ONLY on dups
    assert not got[20]["keep"] and got[20]["src_dup_frac"] == 0.0
    assert got[20]["src_mean_words"] == 2.0        # fails ONLY on length
    assert len(got) == 9                           # one row per document


def test_token_budget_sample_planted(spark):
    """Greedy per-source budget fill in md5 order: keep iff tokens
    BEFORE the doc are under budget (≤1-doc overflow), absent sources
    take the default (0 = excluded); cum_before matches a from-scratch
    Python replay of the same definition."""
    import hashlib

    from crab_spark.operators import sampling as SA2

    rows = [(i, "s", " ".join(["w"] * 10)) for i in range(5)]          # 10 tokens
    rows += [(10 + i, "t", " ".join(["w"] * 7)) for i in range(3)]     # 7 tokens
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = SA2.token_budget_sample(
        docs, {"s": 25, "t": 7}, default_budget=0, salt="b",
    ).collect()
    got = {r["doc_id"]: r["cum_before"] for r in out}
    # python replay: md5('b'||id) order within source, running sum rule
    def replay(ids, per, budget):
        order = sorted(ids, key=lambda i: hashlib.md5(f"b{i}".encode()).hexdigest())
        cum, keep = 0, {}
        for i in order:
            if cum < budget:
                keep[i] = cum
            cum += per
        return keep
    want = replay(range(5), 10, 25) | replay(range(10, 13), 7, 7)
    assert got == want
    # budget 25 over 10-token docs keeps exactly 3 (cum_before 0,10,20)
    assert sorted(v for k, v in got.items() if k < 5) == [0, 10, 20]
    # budget == one doc's tokens keeps exactly the first 't' doc
    assert sorted(v for k, v in got.items() if k >= 10) == [0]


def test_cross_source_neardup_planted(spark):
    """Near-identical docs in DIFFERENT sources count; the same pair
    within ONE source is excluded; an unrelated doc pairs with nobody.
    Base text is long enough that one swapped word keeps Jaccard ≥ 0.5
    while distinct texts share no shingles."""
    from crab_spark.operators import scrub as SC

    base = " ".join(f"w{i}" for i in range(20))
    near = base.replace("w19", "zz")                 # jaccard 17/19 ≈ 0.89
    rows = [
        (0, "A", base),
        (1, "B", near),                              # cross-source near-dup
        (2, "B", base),                              # near-dup of 0 AND 1
        (3, "C", "entirely unrelated words only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["source_a"], r["source_b"]): r["n_neardup_pairs"]
           for r in SC.cross_source_neardup(docs).collect()}
    # pairs: (0,1) A-B, (0,2) A-B count; (1,2) is within B — excluded
    assert got == {("A", "B"): 2}


def test_lang_id_model_path_unicode_whitespace(spark):
    """The StopwordModel must tokenize EXACTLY like the expression
    path's Java regex \\s (ASCII-only): non-ASCII whitespace (NBSP,
    ideographic space) is NOT a separator on either path, so
    "the\\u00a0cat" stays one (non-stopword) token. Guards the
    equivalence contract where the sf0.001 ASCII corpus can't."""
    rows = [
        (0, "the cat is　here and the dog"),   # NBSP + U+3000
        (1, "le chat est une des dans que pour"),  # fr with NBSP
        (2, " 　"),                            # only exotic ws
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r["doc_id"]: (r["pred_lang"], r["hits"])
            for r in X.lang_id(d).collect()}
    modeled = {r["doc_id"]: (r["pred_lang"], r["hits"])
               for r in X.lang_id(d, model=X.StopwordModel()).collect()}
    assert expr == modeled
    # and the tokenization really is ASCII-\s: "is<U+3000>here" stays
    # ONE token, so en hits are just {"the", "and"} — not "is"
    assert expr[0][1] == 2


def test_source_reputation_gate_null_source(spark):
    """NULL source is a legitimate reputation group: its documents get
    a gate verdict (null-safe join-back) instead of silently vanishing
    from the one-row-per-document output."""
    long = "one two three four five six seven eight"
    rows = [
        (0, "good", long + " u0"), (1, "good", long + " u1"),
        (10, None, long), (11, None, long), (12, None, long + " x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = X.source_reputation_gate(docs, min_mean_words=5, max_dup_frac="0.2")
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 5                       # one row per doc, NULLs kept
    assert got[10]["source"] is None
    assert got[10]["src_n_docs"] == 3
    # 1 dup of 3 → 1/3 > 0.2 → the NULL group fails the dup gate
    assert not got[10]["keep"] and got[0]["keep"]


def test_token_budget_sample_null_source(spark):
    """NULL-source rows form their own mixture group under
    default_budget — they must match their offsets row via the
    null-safe join, not disappear from the output."""
    from crab_spark.operators import sampling as SA2

    rows = [(i, "s", " ".join(["w"] * 10)) for i in range(2)]
    rows += [(10 + i, None, " ".join(["w"] * 5)) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = SA2.token_budget_sample(
        docs, {"s": 100}, default_budget=8, salt="b",
    ).collect()
    got = {r["doc_id"]: (r["source"], r["cum_before"]) for r in out}
    assert all(k < 10 for k in got if got[k][0] == "s")
    nulls = {k: v for k, v in got.items() if v[0] is None}
    # budget 8 over 5-token docs: first doc (cum 0) and second (cum 5)
    # keep, third (cum 10) is cut
    assert sorted(c for _, c in nulls.values()) == [0, 5]


def test_cross_source_neardup_single_lsh_subplan(spark):
    """The LSH candidate chain (sigs -> bands -> self-join) must
    EXECUTE once even though it now has multiple plan references (the
    verify's id-set prune plus the verify join): ngram_jaccard caches
    the pairs and shingle-set relations, so the executed plan reads
    them back via InMemoryTableScan instead of re-running the chain,
    and the source re-attach comes from the O(#docs) (id, source)
    projection, never a join back to the candidate frame."""
    from crab_spark.operators import scrub as SC

    base = " ".join(f"w{i}" for i in range(20))
    rows = [(0, "A", base), (1, "B", base.replace("w19", "zz"))]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = SC.cross_source_neardup(docs)
    out.collect()
    ep = out._jdf.queryExecution().executedPlan().toString()
    assert ep.count("InMemoryTableScan") >= 2, ep


def test_cosine_ansi_safe_on_zero_norm_vectors(spark):
    """An all-zero embedding (empty doc) must yield a NULL cosine, not
    an ANSI DIVIDE_BY_ZERO that kills the whole scan: top-k ranks it
    last, near-dup thresholds drop it, ivf_assign maps it to a NULL
    bucket, and fit_centroids ignores it (the old -1 sentinel
    negative-indexed and corrupted the LAST centroid)."""
    from crab_spark.operators import similarity as SIM

    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0]),
            (3, [0.9, 0.1]), (4, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = SIM.cosine_topk(emb, [1.0, 0.0], k=5).collect()
    assert [r["vec_id"] for r in top][:2] == [0, 3]     # zero/NULL rank last
    assigned = SIM.ivf_assign(emb, [[1.0, 0.0], [0.0, 1.0]])
    got = {r["vec_id"]: r["bucket"] for r in assigned.collect()}
    assert got[0] == 0 and got[1] == 1
    assert got[2] is None and got[4] is None            # degenerate → NULL
    pairs = SIM.embedding_neardup_pairs(assigned, threshold=0.5).collect()
    assert all(2 not in (r["id_a"], r["id_b"]) for r in pairs)
    cents = SIM.fit_centroids(emb, n_centroids=2, iters=3)
    # centroid 1 must be the mean of bucket-1 members, NOT garbage from
    # the degenerate rows: vec 1 is its only member
    assert abs(cents[1][1] - 1.0) < 1e-9 and abs(cents[1][0]) < 1e-9


def test_connected_components_hash_scale_ids(spark):
    """Cluster ids at xxhash64 scale (~±9.2e18): the convergence
    signature must not overflow under the session's default ANSI mode
    (the old Σu·v form threw ARITHMETIC_OVERFLOW on the first
    iteration for any id ≥ ~3.04e9)."""
    from crab_spark.operators.dedup import connected_components

    a, b, c = 9_100_000_000_000_000_000, -9_000_000_000_000_000_000, 42
    edges = spark.createDataFrame([(a, b), (b, c)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(edges).collect()}
    assert set(got.values()) == {b}                     # min id labels all


def test_banding_rejects_non_dividing_params(spark):
    """No silent caps: trailing hashes/bits that would never contribute
    to banding are an error, not a silent recall change."""
    import pytest as _pt

    from crab_spark.operators.dedup import (
        lsh_candidate_pairs, simhash_neardup_pairs,
    )

    sigs = spark.createDataFrame(
        [(1, 1, 2, 3, 4, 5, 6, 7, 8)],
        "doc_id long, sig_0 long, sig_1 long, sig_2 long, sig_3 long, "
        "sig_4 long, sig_5 long, sig_6 long, sig_7 long",
    )
    with _pt.raises(ValueError, match="not divisible"):
        lsh_candidate_pairs(sigs, n_hashes=8, band_size=3)
    sim = spark.createDataFrame([(1, 7)], "doc_id long, simhash long")
    with _pt.raises(ValueError, match="must divide"):
        simhash_neardup_pairs(sim, n_bands=6)


def test_token_counts_whitespace_not_just_spaces(spark):
    """Real crawl text separates words with newlines/tabs: every
    counting site must collapse whitespace runs before splitting (a
    bare split(' ') counted a 500-line doc as ONE token and broke pack
    budgets, source reputation, and token-budget mixes)."""
    from crab_spark.operators import packing as P2
    from crab_spark.operators import sampling as SA2

    d = spark.createDataFrame(
        [(0, "a\nb\tc  d"), (1, "one two")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_tokens"] for r in X.token_count(d).collect()}
    assert got == {0: 4, 1: 2}
    q = {r["doc_id"]: r["mean_word_len"] for r in X.quality_features(d).collect()}
    assert q[0] == round(8 / 4, 4)                     # 8 chars / 4 words
    packed = P2.with_pack_ids(d, budget=4)
    n = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    for df_ in getattr(packed, "df_ordered_cache", None) and [packed.df_ordered_cache] or []:
        df_.unpersist()
    assert n[0] == 4
    mix = SA2.token_budget_sample(
        d.withColumn("source", F.lit("s")), {"s": 100}, salt="b"
    ).collect()
    assert {r["doc_id"]: r["n_tokens"] for r in mix} == {0: 4, 1: 2}


def test_hash_sample_null_key_deterministic(spark):
    """NULL keys hash as the empty string instead of being dropped by
    the NULL<threshold predicate: a 99.9% sample no longer excludes
    100% of NULL-key rows."""
    import hashlib

    from crab_spark.operators import sampling as SA2

    d = spark.createDataFrame([(1,), (2,), (None,)], "doc_id long") \
        .withColumn("text", F.lit("x"))
    rate = 0.999
    kept = {r["doc_id"] for r in SA2.hash_sample(d, rate, salt="s").collect()}
    null_hash = hashlib.md5(b"s").hexdigest()
    expect_null = null_hash < SA2._hex_threshold(rate)
    assert (None in kept) == expect_null and expect_null  # md5('s') ~ 0.03


def test_pii_counts_reconcile_with_redacted_text(spark):
    """Overlapping patterns ('1.2.3.4@x.com' matches EMAIL and IPV4):
    counts are taken sequentially on the progressively-redacted text so
    each n_* equals the <TOKEN> occurrences in the redacted output."""
    from crab_spark.operators import scrub as SC

    d = spark.createDataFrame(
        [(0, "mail 1.2.3.4@x.com and ip 5.6.7.8"),
         (1, "call +1-234-567-8901@x.com now")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in SC.pii_scrub(d).collect()}
    red = {r["doc_id"]: r["red"] for r in d.select(
        "doc_id", SC.redacted(F.col("text")).alias("red")).collect()}
    for i in (0, 1):
        assert got[i]["n_emails"] == red[i].count("<EMAIL>")
        assert got[i]["n_ipv4"] == red[i].count("<IP>")
        assert got[i]["n_phones"] == red[i].count("<PHONE>")
    assert got[0]["n_ipv4"] == 1 and got[0]["n_emails"] == 1
    assert got[1]["n_phones"] == 0                      # inside the email


def test_chunk_documents_skips_empty_docs(spark):
    """Empty/whitespace-only docs produce NO chunks (split('') is ['']
    and used to emit a phantom md5('') chunk that ate pack budget)."""
    from crab_spark.operators import scrub as SC

    d = spark.createDataFrame(
        [(0, "one two three"), (1, ""), (2, "   ")],
        "doc_id long, text string",
    )
    got = SC.chunk_documents(d, chunk_words=2, stride=2).collect()
    assert {r["doc_id"] for r in got} == {0}


def test_lang_id_null_text_parity(spark):
    """NULL text yields (NULL, NULL) on BOTH the expression and model
    paths — the equivalence contract includes the degenerate row."""
    d = spark.createDataFrame([(0, None), (1, "the cat and the dog")],
                              "doc_id long, text string")
    e = {r["doc_id"]: (r["pred_lang"], r["hits"]) for r in X.lang_id(d).collect()}
    m = {r["doc_id"]: (r["pred_lang"], r["hits"])
         for r in X.lang_id(d, model=X.StopwordModel()).collect()}
    assert e == m and e[0] == (None, None) and e[1][0] == "en"


def test_lm_score_explodes_corpus_once(spark):
    """doc_counts feeds the frequency table, the totals chain, and the
    scoring join; deriving them from one frame is not enough (AQE
    broadcasts / pruning divergence break exchange-reuse — plan audit
    measured 3 corpus explodes), so the op caches it: every consumer
    reads InMemoryTableScan."""
    d = spark.createDataFrame([(0, "a b a"), (1, "b c")],
                              "doc_id long, text string")
    out = X.lm_score(d)
    out.collect()
    ep = out._jdf.queryExecution().executedPlan().toString()
    try:
        assert ep.count("InMemoryTableScan") >= 2, ep
    finally:
        out.df_ordered_cache.unpersist()


def test_caption_ties_deterministic(spark):
    """Two text spans at the SAME offset: the chosen caption must be
    deterministic (full-tuple window order), not shuffle-dependent."""
    import crab_spark.operators.multimodal as MM

    spans = [("text", "A", "", 8), ("text", "B", "", 8), ("media", "", "m-1", 10)]
    d = spark.createDataFrame(
        [(1, spans)],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    caps = {MM.caption_candidates(d).collect()[0]["caption"]
            for _ in range(3)}
    assert caps == {"B"}                                # text-desc: last wins


def test_dedup_incremental_planted(spark):
    """Monthly-snapshot register: a batch doc whose content already
    lives in the corpus is in_corpus; an in-batch dup group keeps only
    its min-id row; NULL text hashes as '' (the q46 convention) so a
    NULL-text batch row matches an empty-text corpus row instead of
    vanishing through the equi-join. Plan contract (broadcast path):
    the corpus probe is a broadcast LEFT-SEMI by construction (the
    F.broadcast hint, visible in the STATIC plan — not an AQE runtime
    conversion), so the corpus side is never shuffled; the remaining
    exchanges are batch-keyed only."""
    from crab_spark.operators import dedup as D
    from crab_spark.plans import formatted_plan

    corpus = spark.createDataFrame(
        [(100, "old news article"), (101, ""), (102, "seen before")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, "Old  News article"),   # ws/case-dup of corpus 100
         (2, "fresh content a"),     # new, unique in batch
         (3, "fresh content b"),     # new dup group {3, 4}: 3 keeps
         (4, "fresh content b"),
         (5, None)],                 # NULL text == corpus empty text
        "doc_id long, text string",
    )
    out = D.dedup_incremental(batch, corpus)
    static_plan = formatted_plan(out)          # before collect: no AQE result
    assert "BroadcastHashJoin LeftSemi" in static_plan, static_plan
    got = {r["doc_id"]: (r["in_corpus"], r["batch_keeper"], r["keep"])
           for r in out.collect()}
    assert got == {
        1: (True, True, False),
        2: (False, True, True),
        3: (False, True, True),
        4: (False, False, False),
        5: (True, True, False),
    }
    ep = (out._jdf.queryExecution().executedPlan().toString()
          .split("== Initial Plan ==")[0])     # AQE-final section only
    assert "BroadcastHashJoin" in ep and "SortMergeJoin" not in ep, ep
    # the shuffle path (batch too big to broadcast) agrees row-for-row
    slow = {r["doc_id"]: (r["in_corpus"], r["batch_keeper"], r["keep"])
            for r in D.dedup_incremental(
                batch, corpus, broadcast_batch=False).collect()}
    assert slow == got


def test_heuristic_quality_gate_planted(spark):
    """One planted failure per Gopher rule, each attributed to exactly
    the boolean that caught it; a normal sentence passes all five.
    Plan contract: zero shuffles — the gate is one codegen scan."""
    from crab_spark.plans import formatted_plan

    rows = [
        (0, "the cat is on the mat and it sat down"),       # clean
        (1, "the cat"),                                      # too short
        (2, "the cat is on a mat # # and it sat here now"),  # symbol spam
        (3, "pneumonoultramicroscopicsilicovolcanoconiosis "
            * 8),                                            # word soup
        (4, "the is 111 222 333 444 555 666 777 888"),       # non-alpha
        (5, "cats dogs birds fish lions tigers bears wolves"),  # no stopwords
        (6, "wait... wait... stop here the cat is very good now"),  # ellipsis
        (7, None),                                           # NULL text
    ]
    out = X.heuristic_quality_gate(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    g = {r["doc_id"]: r for r in out.collect()}
    assert g[0]["keep"] is True
    assert g[1]["rule_word_count"] is False
    # 14 tokens, 2 '#': 2/14 > 1/10 trips the symbol rule but not alpha
    assert g[2]["rule_symbol_ratio"] is False
    assert g[2]["rule_alpha_words"] is True
    assert g[3]["rule_mean_word_len"] is False
    assert g[4]["rule_alpha_words"] is False
    assert g[4]["rule_mean_word_len"] is True              # 2.9 in [2, 12]
    assert g[5]["rule_stopwords"] is False
    assert g[6]["rule_symbol_ratio"] is False              # '...' counted
    # NULL text = empty: a False verdict (word-count rule), never NULL
    assert g[7]["n_words"] == 0 and g[7]["rule_word_count"] is False
    for i in range(1, 8):
        assert g[i]["keep"] is False
    assert "Exchange" not in formatted_plan(out)


def test_neardup_contamination_planted(spark):
    """An exact copy of a benchmark doc is flagged at max_jaccard 1.0;
    a one-word rewrite still collides in ≥1 MinHash band and clears
    min_jaccard; an unrelated doc stays clean with max_jaccard 0.0 (it
    shares no band, so it never even reaches the verify). Plan
    contract: the benchmark side is broadcast and nothing is
    cartesian — the corpus is never shuffled on band keys."""
    from crab_spark.operators import decontam as DC
    from crab_spark.plans import assert_no_cartesian, formatted_plan

    bench = spark.createDataFrame(
        [("ev-1", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    docs = spark.createDataFrame(
        [("copy", "the quick brown fox jumps over the lazy dog"),
         ("near", "the quick brown fox jumps over the lazy cat"),
         ("clean", "completely different words about spark engines here")],
        "doc_id string, text string",
    )
    out = DC.neardup_contamination(
        docs, bench, n_hashes=8, band_size=2, sig_k=2, verify_k=3,
        min_jaccard=0.5,
    )
    g = {r["doc_id"]: r for r in out.collect()}
    assert g["copy"]["contaminated"] is True
    assert g["copy"]["max_jaccard"] == 1.0
    assert g["copy"]["n_neardup_bench"] == 1
    # 'near' shares 6 of 9 distinct 3-shingles with the bench doc
    assert g["near"]["contaminated"] is True
    assert 0.5 <= g["near"]["max_jaccard"] < 1.0
    assert g["clean"]["contaminated"] is False
    assert g["clean"]["max_jaccard"] == 0.0
    assert_no_cartesian(out)
    assert "BroadcastHashJoin" in formatted_plan(out)


def test_semantic_dedup_transitive_chain(spark):
    """A≈B and B≈C but A, C are below threshold pairwise: semantic
    duplication is transitive, so all three land in ONE cluster with
    the min id as keeper; an unrelated vector stays a singleton keeper.
    Geometry: unit vectors in the plane at 0°, 25°, 50° with a 0.8
    cosine threshold (cos25° ≈ 0.906, cos50° ≈ 0.643) — pairs alone
    would keep A and C both."""
    import math as m

    def v(deg):
        return [float(m.cos(m.radians(deg))), float(m.sin(m.radians(deg))), 0.0]

    rows = [(0, v(0)), (1, v(25)), (2, v(50)), (3, [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = S.ivf_assign(df, [[1.0, 0.0, 0.0]])      # one bucket: all
    out = {r["vec_id"]: r for r in S.semantic_dedup(
        assigned, threshold=0.8).collect()}
    assert {i: out[i]["cluster_id"] for i in range(4)} == {0: 0, 1: 0, 2: 0, 3: 3}
    assert out[0]["is_keeper"] and out[0]["cluster_size"] == 3
    assert not out[1]["is_keeper"] and not out[2]["is_keeper"]
    assert out[3]["is_keeper"] and out[3]["cluster_size"] == 1


def test_linear_quality_score_paths_and_nulls(spark):
    """The inline weight-array path (zero shuffles) and the
    broadcast-join path (real-model D) agree row-for-row with dyadic
    weights; NULL/empty text scores exactly bias; keep is the sign of
    the margin. A replayed Python fold cross-checks the values."""
    import hashlib

    w = [((b * 37 + 11) % 41 - 20) / 16 for b in range(64)]
    rows = [(0, "the quick brown fox"), (1, "the the the"),
            (2, None), (3, "   "), (4, "zebra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inline = X.linear_quality_score(docs, w, bias=0.25)
    got = {r["doc_id"]: r for r in inline.collect()}

    def replay(text):
        toks = [t for t in " ".join((text or "").lower().split()).split(" ")
                if t]
        s = 0.25 + sum(
            w[int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 64]
            for t in toks)
        return len(toks), round(s, 6), s > 0
    for i, text in rows:
        n, s, k = replay(text)
        assert (got[i]["n_tokens"], got[i]["score"], got[i]["keep"]) == (n, s, k), i
    assert got[2]["score"] == 0.25 and got[3]["score"] == 0.25  # bias only
    # bag semantics: 3× the same token = 3× its weight
    one = replay("the")[1] - 0.25
    assert abs((got[1]["score"] - 0.25) - 3 * one) < 1e-12
    from crab_spark.plans import formatted_plan
    assert "Exchange" not in formatted_plan(inline)
    joined = {r["doc_id"]: r for r in X.linear_quality_score(
        docs, w, bias=0.25, join_weights=True).collect()}
    assert {i: (r["n_tokens"], r["score"], r["keep"]) for i, r in got.items()} \
        == {i: (r["n_tokens"], r["score"], r["keep"]) for i, r in joined.items()}


def test_ccnet_buckets_thirds_and_empty_last(spark):
    """Six docs in one language split exactly 2/2/2 head/middle/tail in
    avg_nll order; the empty doc ranks LAST (tail) despite its
    coalesced 0.0 score; a second language buckets independently; a
    NULL-language doc is bucketed (own group), not dropped."""
    rare = ["zeta", "yak", "xylo", "wisp", "verb"]
    rows = [
        # 'en'-labeled: doc i repeats common word 'the' (6-i) times and
        # uses i distinct rare words → avg_nll strictly increases with i
        *[(i, "en", " ".join(["the"] * (6 - i) + rare[:i])) for i in range(5)],
        (5, "en", "   "),                    # empty: n_words=0, ranks last
        (6, "fr", "le le le"), (7, "fr", "unmotrare"),
        (8, None, "the the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in X.ccnet_buckets(docs).collect()}
    assert len(out) == 9                                  # NULL lang kept
    en = [out[i] for i in range(6)]
    assert [r["bucket"] for r in en] == ["head", "head", "middle", "middle",
                                         "tail", "tail"]
    assert out[5]["n_words"] == 0 and out[5]["lang_rank"] == 5   # empty last
    assert [r["lang_rank"] for r in en] == list(range(6))
    assert all(r["lang_n"] == 6 for r in en)
    # fr: n=2 → rank0: 0<2 head; rank1: 3<4 middle (never tail at n=2)
    assert out[6]["bucket"] == "head" and out[7]["bucket"] == "middle"
    assert out[6]["avg_nll"] <= out[7]["avg_nll"]
    assert out[8]["bucket"] == "head" and out[8]["lang_n"] == 1


def test_dedup_lines_first_wins_order(spark):
    """Repeated lines drop after their FIRST occurrence, survivors keep
    document order; NULL text gets 0/0 counts; a doc with no repeats is
    untouched. Zero-shuffle plan (pure per-row codegen)."""
    from crab_spark.operators import scrub as SC
    from crab_spark.plans import formatted_plan

    rows = [
        (0, "nav menu\nreal content a\nnav menu\nreal content b\nnav menu"),
        (1, "only line"),
        (2, None),
        (3, "a\nb\na\nb\na\nb"),
    ]
    out = SC.dedup_lines(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    g = {r["doc_id"]: r for r in out.collect()}
    assert g[0]["text"] == "nav menu\nreal content a\nreal content b"
    assert (g[0]["n_lines"], g[0]["n_removed"]) == (5, 2)
    assert g[1]["text"] == "only line" and g[1]["n_removed"] == 0
    assert (g[2]["text"], g[2]["n_lines"], g[2]["n_removed"]) == ("", 1, 0)
    assert g[3]["text"] == "a\nb" and g[3]["n_removed"] == 4
    assert "Exchange" not in formatted_plan(out)


def test_temperature_mixture_rates_planted(spark):
    """α = 0.5 replayed in Python on known token counts: a small source
    gets boost > 1, the big one < 1, temp shares sum to 1; a NULL
    source is its own group; an all-empty source gets boost 0.0 (not
    the 0/0 NaN)."""
    import math as m

    from crab_spark.operators import sampling as SA

    rows = [(0, "big", "w " * 89 + "w"), (1, "small", "a b c d e f g h i j"),
            (2, None, "k l m n o p q r s t"), (3, "empty", "   "),
            (4, "empty", None)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in SA.temperature_mixture_rates(
        docs, alpha=0.5).collect()}
    counts = {"big": 90, "small": 10, None: 10, "empty": 0}
    total = 110
    z = sum(m.sqrt(c / total) for c in counts.values())
    for s, c in counts.items():
        assert got[s]["n_tokens"] == c
        assert got[s]["token_share"] == round(c / total, 6)
        assert got[s]["temp_share"] == round(m.sqrt(c / total) / z, 6)
    assert got["empty"]["boost"] == 0.0 and got["empty"]["n_docs"] == 2
    assert got["small"]["boost"] > 1.0 > got["big"]["boost"]
    assert abs(sum(r["temp_share"] for r in got.values()) - 1.0) < 1e-5


def test_incremental_neardup_planted(spark):
    """A batch doc that's a one-word rewrite of a corpus doc is flagged
    (banded candidate + Jaccard ≥ 0.5); a batch doc near-identical only
    to ANOTHER BATCH doc is NOT (corpus-probe semantics — in-batch
    fuzzy grouping is the composed lsh_candidate_pairs step); a fresh
    doc stays clean at 0.0. Plan: the batch side is broadcast, nothing
    is cartesian."""
    from crab_spark.plans import assert_no_cartesian, formatted_plan

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "completely unrelated corpus text about storage engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy cat"),   # ≈ corpus 100
         (2, "fresh snapshot words never seen before anywhere at all"),
         (3, "fresh snapshot words never seen before anywhere at most")],
        "doc_id long, text string",                            # 3 ≈ 2 only
    )
    out = D.dedup_incremental_neardup(
        batch, corpus, n_hashes=8, band_size=2, sig_k=2, verify_k=3,
        min_jaccard=0.5,
    )
    g = {r["doc_id"]: r for r in out.collect()}
    assert g[1]["is_neardup"] is True and g[1]["max_jaccard"] >= 0.5
    assert g[2]["is_neardup"] is False
    assert g[3]["is_neardup"] is False                 # batch-internal only
    assert_no_cartesian(out)
    assert "BroadcastHashJoin" in formatted_plan(out)


def test_media_ref_index_planted(spark):
    """Shared vs doc-unique media refs roll up correctly; text spans
    never reach the index. Plan contract: no join of any kind — one
    filtered explode feeding one combinable aggregation."""
    from crab_spark.plans import formatted_plan

    def sp(kind, text, ref, off):
        return (kind, text, ref, off)

    rows = [
        (0, [sp("text", "intro", "", 0), sp("media", "img", "m-a", 1),
             sp("media", "img", "m-a", 2), sp("media", "img", "m-b", 3)]),
        (1, [sp("media", "img", "m-a", 0), sp("text", "tail", "", 1)]),
        (2, [sp("text", "only", "", 0)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = {r["media_ref"]: r for r in M.media_ref_index(df).collect()}
    assert set(out) == {"m-a", "m-b"}
    a, b = out["m-a"], out["m-b"]
    assert (a["n_occurrences"], a["n_docs"], a["first_doc"], a["is_shared"]) \
        == (3, 2, 0, True)
    assert (b["n_occurrences"], b["n_docs"], b["first_doc"], b["is_shared"]) \
        == (1, 1, 0, False)
    plan = formatted_plan(M.media_ref_index(df))
    assert "Join" not in plan, plan


def test_embedding_decontamination_planted(spark):
    """An exact copy of a bench vector is contaminated, an orthogonal
    one isn't, a zero-norm corpus vector gets a NULL verdict (cosine's
    ANSI guard), and the flag always agrees with the rounded score.
    Plan contract: the corpus side never shuffles — the bench set
    arrives as ONE broadcast row (BroadcastNestedLoopJoin), so the
    corpus-side plan has no Exchange at all."""
    from crab_spark.operators import decontam as DC
    from crab_spark.plans import formatted_plan

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [(0, [2.0, 0.0, 0.0]),      # parallel to bench 100 → cos 1.0
         (1, [0.0, 1.0, 0.0]),      # orthogonal to both → cos 0.0
         (2, [1.0, 1.0, 0.0]),      # cos ≈ 0.7071 < 0.9
         (3, [0.0, 0.0, 0.0])],     # zero norm → NULL
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in
           DC.embedding_decontamination(corpus, bench, threshold=0.9).collect()}
    assert out[0]["max_bench_cos"] == 1.0 and out[0]["is_contaminated"]
    assert out[1]["max_bench_cos"] == 0.0 and not out[1]["is_contaminated"]
    assert out[2]["max_bench_cos"] == 0.7071 and not out[2]["is_contaminated"]
    assert out[3]["max_bench_cos"] is None
    assert out[3]["is_contaminated"] is None
    plan = formatted_plan(
        DC.embedding_decontamination(corpus, bench, threshold=0.9))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_semantic_dedup_farthest_keeper(spark):
    """SemDeDup's published keeper rule: in the 0°/20°/50° chain
    cluster the centroid points ≈23°, so the 50° member is farthest
    (lowest centroid cosine) and keeps — NOT the min id that the
    default rule would pick. Singletons are their own centroid
    (cos 1.0) and always keep."""
    import math as m

    def v(deg):
        return [float(m.cos(m.radians(deg))), float(m.sin(m.radians(deg))), 0.0]

    rows = [(0, v(0)), (1, v(20)), (2, v(50)), (3, [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = S.ivf_assign(df, [[1.0, 0.0, 0.0]])
    out = {r["vec_id"]: r for r in S.semantic_dedup(
        assigned, threshold=0.8, keeper="farthest").collect()}
    assert {i: out[i]["cluster_id"] for i in range(4)} == {0: 0, 1: 0, 2: 0, 3: 3}
    assert [out[i]["is_keeper"] for i in range(3)] == [False, False, True]
    assert out[2]["cluster_size"] == 3
    assert out[2]["centroid_cos"] < out[0]["centroid_cos"] < out[1]["centroid_cos"]
    assert out[3]["is_keeper"] and out[3]["centroid_cos"] == 1.0
    with pytest.raises(ValueError):
        S.semantic_dedup(assigned, keeper="median")


def test_source_prior_gate_planted(spark):
    """Shrinkage arithmetic end-to-end with weights=[1.0] (score =
    #tokens): srcA = docs of 1 and 3 tokens (mean 2), srcB = one
    9-token doc (mean 9), mu = 13/3; with k=3 the priors are exactly
    17/5 = 3.4 and 22/4 = 5.5 — the small high-mean source clears a
    min_prior=4 gate that its raw-mean-ranked opposite doesn't."""
    docs = spark.createDataFrame(
        [(0, "a", "one"), (1, "a", "one two three"),
         (2, "b", "t t t t t t t t t")],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in X.source_prior_gate(
        docs, [1.0], bias=0.0, shrink_k=3, min_prior=4.0).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["mean_score"], a["prior_score"], a["keep"]) \
        == (2, 2.0, 3.4, False)
    assert (b["n_docs"], b["mean_score"], b["prior_score"], b["keep"]) \
        == (1, 9.0, 5.5, True)


def test_bm25_topk_planted(spark):
    """BM25 semantics end-to-end on a 4-doc corpus: the rarer query
    term dominates (idf), repeating a term saturates instead of
    scaling linearly (k1), and a longer document is penalized (b).
    Plan contract: only query-term occurrences explode — df and the
    totals come back broadcast, no SortMergeJoin."""
    from crab_spark.plans import formatted_plan

    docs = spark.createDataFrame(
        [(0, "spark spark spark filler filler filler filler filler"),
         (1, "rareword filler filler filler filler filler filler filler"),
         (2, "spark filler filler filler filler filler filler filler"),
         (3, "filler " * 50 + "spark")],   # long doc, one hit
        "doc_id long, text string",
    )
    out = X.bm25_topk(docs, ["spark", "rareword"], k=10)
    rows = out.collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert set(got) == {0, 1, 2, 3}           # doc with no hits never appears
    # rareword (df=1) outscores even the triple-hit common term (df=3)
    assert got[1] > got[0] > got[2] > got[3]
    # k1 saturation: 3 hits < 3x one hit
    assert got[0] < 3 * got[2]
    plan = formatted_plan(out)
    assert "SortMergeJoin" not in plan, plan
    with pytest.raises(ValueError):
        X.bm25_topk(docs, [])


def test_knn_label_vote_planted(spark):
    """Two well-separated clusters: test vectors take their cluster's
    majority label through the bucket-local vote; a zero vector (NULL
    bucket) gets the NULL verdict row with n_neighbors 0; ties in the
    vote break to the smaller label."""
    train = spark.createDataFrame(
        [(10, [1.0, 0.0], 7), (11, [0.9, 0.1], 7), (12, [0.8, 0.2], 3),
         (13, [0.0, 1.0], 4), (14, [0.1, 0.9], 4)],
        "vec_id long, embedding array<float>, label int",
    )
    test = spark.createDataFrame(
        [(0, [0.95, 0.05]), (1, [0.05, 0.95]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = {r["vec_id"]: r for r in S.knn_label_vote(
        train, test, cents, k=3).collect()}
    assert out[0]["pred_label"] == 7 and out[0]["n_votes"] == 2 \
        and out[0]["n_neighbors"] == 3
    assert out[1]["pred_label"] == 4 and out[1]["n_votes"] == 2 \
        and out[1]["n_neighbors"] == 2
    assert out[2]["pred_label"] is None and out[2]["n_neighbors"] == 0
    # vote tie → smaller label: one neighbor each of labels 3 and 7
    out2 = {r["vec_id"]: r for r in S.knn_label_vote(
        train.filter(F.col("vec_id").isin(11, 12)), test, cents,
        k=2).collect()}
    assert out2[0]["pred_label"] == 3 and out2[0]["n_votes"] == 1


def test_holdout_split_planted(spark):
    """Every row lands in exactly one split, matching a Python md5
    replay of the cumulative thresholds; NULL keys get a deterministic
    split ('' hash), never NULL; mismatched fractions/names raise.
    Zero-shuffle plan (one codegen'd CASE over the scan)."""
    import hashlib

    from crab_spark.operators import sampling as SA
    from crab_spark.operators.sampling import _hex_threshold
    from crab_spark.plans import formatted_plan

    rows = [(i, f"doc {i}") for i in range(50)] + [(None, "null id")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = SA.holdout_split(docs, (0.6, 0.2, 0.2), ("train", "val", "test"),
                           salt="s")
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    t1, t2 = _hex_threshold(0.6), _hex_threshold(0.6 + 0.2)
    for i, _ in rows:
        h = hashlib.md5(f"s{'' if i is None else i}".encode()).hexdigest()
        want = "train" if h < t1 else ("val" if h < t2 else "test")
        assert got[i] == want, (i, h)
    assert got[None] in ("train", "val", "test")
    assert len(set(got.values())) == 3          # all three splits hit
    assert "Exchange" not in formatted_plan(out)
    with pytest.raises(ValueError):
        SA.holdout_split(docs, (0.5, 0.5), ("a",))


def test_epoch_order_planted(spark):
    """Positions are a dense 0-based permutation matching the Python
    md5-sort replay; the same seed replays the same order; a different
    seed yields a different deterministic order."""
    import hashlib

    from crab_spark.operators import sampling as SA

    docs = spark.createDataFrame(
        [(i, "x") for i in range(20)], "doc_id long, text string"
    )

    def replay(seed):
        return {
            i: pos
            for pos, (_, i) in enumerate(
                sorted((hashlib.md5(f"{seed}{i}".encode()).hexdigest(), i)
                       for i in range(20))
            )
        }

    for seed in ("e1", "e2"):
        got = {r["doc_id"]: r["epoch_pos"]
               for r in SA.epoch_order(docs, seed=seed).collect()}
        assert got == replay(seed), seed
        assert sorted(got.values()) == list(range(20))


def test_novelty_score_planted(spark):
    """Exact dups score 0 (every shingle shared), a unique doc 1, a
    partially-overlapping doc the exact shared fraction; NULL text gets
    (0, 0, NULL) — never an ANSI 0/0."""
    rows = [
        (0, "w1 w2 w3 w4"),                  # dup pair with 1
        (1, "w1 w2 w3 w4"),
        (2, "all alone unique words here"),  # fully novel
        (3, "a b c d e"),                    # shares 'a b c' with 4
        (4, "a b c x y"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    g = {r["doc_id"]: r for r in D.novelty_score(docs, k=3).collect()}
    assert g[0]["novelty"] == 0.0 and g[1]["novelty"] == 0.0
    assert g[2]["novelty"] == 1.0 and g[2]["n_shingles"] == 3
    assert g[3]["n_shingles"] == 3 and g[3]["n_novel"] == 2
    assert g[3]["novelty"] == round(2 / 3, 6) == g[4]["novelty"]
    assert (g[5]["n_shingles"], g[5]["n_novel"], g[5]["novelty"]) == (0, 0, None)


def test_source_quota_planted(spark):
    """Per-source ranks follow (score desc, id) with keep = rank <
    quota; a NULL source is its own quota group; ranks are dense from 0
    in every group."""
    w = [0.5] * 8                            # every token scores +0.5
    rows = [
        (0, "s1", "a b c d"),                # 4 tokens → 2.0 (+bias)
        (1, "s1", "a b"),                    # 1.0
        (2, "s1", "a b c"),                  # 1.5
        (3, "s2", "a"),                      # 0.5
        (4, None, "a b c d e"),              # NULL-source group
        (5, None, "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = X.source_quota(docs, w, bias=0.0, quota=2)
    g = {r["doc_id"]: r for r in out.collect()}
    assert [g[i]["src_rank"] for i in (0, 2, 1)] == [0, 1, 2]   # score desc
    assert g[0]["keep"] and g[2]["keep"] and not g[1]["keep"]
    assert g[3]["src_rank"] == 0 and g[3]["keep"]
    assert {g[4]["src_rank"], g[5]["src_rank"]} == {0, 1}       # NULL group kept
    assert g[4]["src_rank"] == 0                                # higher score first


def test_bigram_lm_planted(spark):
    """Python replay of the smoothed bigram model on known counts:
    P(b|a) = (3+α)/(3+αV), P(a|b) = (1+α)/(1+αV) with V = 2 distinct
    continuations; docs with <2 tokens get (0, 0.0)."""
    import math as m

    rows = [(0, "a b a b"), (1, "a b"), (2, "x"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    g = {r["doc_id"]: r for r in X.bigram_lm_score(docs, alpha=0.5).collect()}
    v = 2.0                                   # distinct w2 = {a, b}
    p_ab = (3 + 0.5) / (3 + 0.5 * v)          # c(a,b)=3, c(a·)=3
    p_ba = (1 + 0.5) / (1 + 0.5 * v)          # c(b,a)=1, c(b·)=1
    assert g[0]["n_bigrams"] == 3
    assert g[0]["avg_nll"] == round((2 * -m.log(p_ab) + -m.log(p_ba)) / 3, 4)
    assert g[1]["n_bigrams"] == 1 and g[1]["avg_nll"] == round(-m.log(p_ab), 4)
    assert (g[2]["n_bigrams"], g[2]["avg_nll"]) == (0, 0.0)
    assert (g[3]["n_bigrams"], g[3]["avg_nll"]) == (0, 0.0)


def test_dataset_card_planted(spark):
    """Hand-computed card for a 3-doc source (one exact dup pair, one
    gate-failing short doc, two languages) and a NULL-source group;
    NULL langs count for top_lang but not n_langs."""
    good = "the cat is on the mat and it sat there"       # 10 words, passes
    rows = [
        (0, "s1", "en", good),
        (1, "s1", "en", "The  cat is on the mat and it sat there"),  # dup of 0
        (2, "s1", "de", "tiny doc"),                      # fails word-count
        (3, None, None, good),
        (4, None, None, good + " again"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    g = {r["source"]: r for r in X.dataset_card(docs).collect()}
    s1 = g["s1"]
    assert (s1["n_docs"], s1["n_distinct"]) == (3, 2)
    assert s1["dup_fraction"] == round(1.0 - 2 / 3, 6)
    assert s1["n_words_total"] == 22 and s1["mean_words"] == round(22 / 3, 4)
    assert s1["keep_rate"] == round(2 / 3, 6)
    assert s1["n_langs"] == 2
    assert s1["top_lang"] == "en" and s1["top_lang_share"] == round(2 / 3, 6)
    nul = g[None]
    assert (nul["n_docs"], nul["n_distinct"], nul["n_langs"]) == (2, 2, 0)
    assert nul["top_lang"] is None and nul["top_lang_share"] == 1.0


def test_contamination_attribution_planted(spark):
    """A verbatim copy attributes to its bench source with the right
    shared count; a partial overlap attributes to the right doc with
    the exact fraction; equal overlap ties to the LOWER bench id; a
    clean doc is absent. Plan: bench side broadcast, no cartesian."""
    from crab_spark.operators import decontam as DC
    from crab_spark.plans import assert_no_cartesian, formatted_plan

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),
         (101, "one two three four five six")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),      # copy of 100
         (1, "one two three four nope nope"),             # partial of 101
         (2, "totally clean unrelated words here now"),   # clean
         (3, "alpha beta gamma one two three")],          # 1 shingle each: tie
        "doc_id long, text string",
    )
    out = DC.contamination_attribution(corpus, bench, k=3)
    g = {r["doc_id"]: r for r in out.collect()}
    assert g[0]["bench_id"] == 100 and g[0]["n_shared"] == 4
    assert g[0]["overlap_frac"] == 1.0
    assert g[1]["bench_id"] == 101 and g[1]["n_shared"] == 2
    assert g[1]["overlap_frac"] == 0.5                    # 2 of 4 shingles
    assert 2 not in g                                     # clean doc absent
    assert g[3]["bench_id"] == 100 and g[3]["n_shared"] == 1   # tie → lower id
    assert_no_cartesian(out)
    assert "BroadcastHashJoin" in formatted_plan(out)


def test_score_calibration_planted(spark):
    """Two rank-buckets over unit weights (score = n_tokens + bias):
    the short gate-failing docs land in the bottom bucket with keep
    rate 0, the long passing docs in the top with keep rate 1; exact
    integer bucket boundaries."""
    good = "the cat is on the mat and it sat there"       # 10 words, passes
    rows = [(i, "zz qq") for i in range(3)] + [(i + 3, good) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.score_calibration(docs, [1.0] * 4, bias=0.0, n_buckets=2)
    g = {r["bucket"]: r for r in out.collect()}
    assert set(g) == {0, 1}
    assert g[0]["n_docs"] == 3 and g[1]["n_docs"] == 3
    assert (g[0]["min_score"], g[0]["max_score"]) == (2.0, 2.0)
    assert (g[1]["min_score"], g[1]["max_score"]) == (10.0, 10.0)
    assert g[0]["gate_keep_rate"] == 0.0 and g[1]["gate_keep_rate"] == 1.0
    assert g[0]["mean_score"] == 2.0 and g[1]["mean_score"] == 10.0


def test_shard_manifest_planted(spark):
    """Digest equals a hashlib replay over chunk hashes in exact
    (pack, doc, chunk) order; counts roll up per shard = pack DIV 2;
    packs_per_shard < 1 raises."""
    import hashlib

    from crab_spark.operators import packing as P

    rows = [
        # (doc_id, chunk_id, n_words, chunk_hash, pack_id)
        (0, 0, 10, "h00", 0),
        (0, 1, 10, "h01", 0),
        (1, 0, 12, "h10", 1),
        (2, 0, 9, "h20", 2),
        (2, 1, 9, "h21", 3),
    ]
    packed = spark.createDataFrame(
        rows,
        "doc_id long, chunk_id int, n_words long, chunk_hash string, pack_id long",
    )
    out = {r["shard_id"]: r for r in
           P.shard_manifest(packed, packs_per_shard=2).collect()}
    s0, s1 = out[0], out[1]
    assert (s0["n_packs"], s0["n_chunks"], s0["n_tokens"]) == (2, 3, 32)
    assert (s1["n_packs"], s1["n_chunks"], s1["n_tokens"]) == (2, 2, 18)
    assert s0["digest"] == hashlib.md5(b"h00h01h10").hexdigest()
    assert s1["digest"] == hashlib.md5(b"h20h21").hexdigest()
    with pytest.raises(ValueError):
        P.shard_manifest(packed, packs_per_shard=0)


def test_hyperplane_lsh_planted(spark):
    """Signature equals the Python replay (quantize → signed dyadic
    fold → bit); identical vectors collide; a negated vector flips
    every bit whose projection is nonzero; NULL embeddings keep a NULL
    sig; non-power-of-two quant raises. Zero-shuffle plan."""
    import math as m

    from crab_spark.plans import formatted_plan

    dim, bits = 8, 6
    v = [0.11, -0.52, 0.83, 0.27, -0.94, 0.45, -0.18, 0.66]
    rows = [(0, v), (1, v), (2, [-x for x in v]), (3, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.hyperplane_lsh(emb, dim=dim, n_bits=bits)
    g = {r["vec_id"]: r["sig"] for r in out.collect()}

    signs = S.hyperplane_signs(bits, dim)

    def replay(vec):
        q = [m.floor(float(np.float32(x)) * 4096) / 4096 for x in vec]
        sig = 0
        for k in range(bits):
            if sum(x * s for x, s in zip(q, signs[k])) > 0:
                sig += 1 << k
        return sig

    assert g[0] == replay(v) == g[1]
    assert g[2] == replay([-x for x in v])
    assert g[0] ^ g[2] == (1 << bits) - 1      # antipodal: every bit flips
    assert g[3] is None
    assert "Exchange" not in formatted_plan(out)
    with pytest.raises(ValueError):
        S.hyperplane_lsh(emb, dim=dim, quant=3)


def test_apply_mixture_rates_planted(spark):
    """Keep verdicts replay the 48-bit hash-fraction rule under
    per-source rates = min(base x boost, 1); sources absent from the
    rates frame (including NULL) rate 0.0 and never pass; a NULL
    source PRESENT in rates meets its rate (null-safe join); boosts
    above 1/base clamp to rate 1.0 (always kept)."""
    import hashlib

    from crab_spark.operators import sampling as SA

    docs = spark.createDataFrame(
        [(i, s, "x") for i, s in
         enumerate(["a", "a", "a", "b", "c", None, None])],
        "doc_id long, source string, text string",
    )
    rates = spark.createDataFrame(
        [("a", 2.0), ("b", 9.0), (None, 1.0)], "source string, boost double"
    )
    out = SA.apply_mixture_rates(docs, rates, base_rate=0.4, salt="t")
    g = {r["doc_id"]: r for r in out.collect()}

    def frac(i):
        return int(hashlib.md5(f"t{i}".encode()).hexdigest()[:12], 16) / (1 << 48)

    for i, s, want_rate in [(0, "a", 0.8), (1, "a", 0.8), (2, "a", 0.8),
                            (3, "b", 1.0), (4, "c", 0.0),
                            (5, None, 0.4), (6, None, 0.4)]:
        assert g[i]["rate"] == want_rate
        assert g[i]["keep"] == (frac(i) < want_rate), (i, s)
    assert g[3]["keep"] is True and g[4]["keep"] is False


def test_asof_join_planted(spark):
    """Each left row picks the latest right row at-or-before its ts
    within its key: strictly-before works, exact-ts right rows count,
    equal-ts right ties go to the largest id, rows before any right
    row keep NULLs, and keys never leak across users."""
    from datetime import datetime as dt

    from crab_spark.operators import relational as R
    from crab_spark.plans import assert_no_cartesian

    t = lambda m: dt(2024, 1, 1, 0, m)
    purchases = spark.createDataFrame(
        [(1, t(10), 7, 10.0), (3, t(30), 7, 30.0),
         (5, t(40), 7, 51.0), (6, t(40), 7, 52.0),     # equal-ts tie
         (9, t(5), 8, 99.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    errors = spark.createDataFrame(
        [(0, t(1), 7), (2, t(20), 7), (4, t(30), 7), (8, t(45), 7),
         (10, t(1), 8)],
        "event_id long, ts timestamp, user_id long",
    )
    out = R.asof_join(errors, purchases, ["user_id"], "ts", "event_id",
                      ["value"])
    g = {r["event_id"]: r for r in out.collect()}
    assert g[0]["asof_event_id"] is None and g[0]["asof_value"] is None
    assert g[2]["asof_event_id"] == 1 and g[2]["asof_value"] == 10.0
    assert g[4]["asof_event_id"] == 3          # exact-ts purchase counts
    assert g[8]["asof_event_id"] == 6          # tie → largest id
    assert g[8]["asof_value"] == 52.0
    assert g[10]["asof_event_id"] is None      # user 8: purchase is LATER
    assert_no_cartesian(out)


def test_range_join_tiers_planted(spark):
    """[lo, hi) semantics at the boundaries, NULL tier outside every
    interval, overlapping tiers rejected; the tier side broadcasts."""
    from crab_spark.operators import relational as R
    from crab_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [(0, 49.99), (1, 50.0), (2, 199.99), (3, 200.0), (4, -1.0)],
        "id long, value double",
    )
    tiers = [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 300.0, "high")]
    out = R.range_join_tiers(df, tiers)
    g = {r["id"]: r["tier"] for r in out.collect()}
    assert g == {0: "low", 1: "mid", 2: "mid", 3: "high", 4: None}
    assert "BroadcastNestedLoopJoin" in formatted_plan(out)
    with pytest.raises(ValueError):
        R.range_join_tiers(df, [(0.0, 60.0, "a"), (50.0, 100.0, "b")])


def test_bigram_lm_explodes_corpus_once(spark):
    """The (doc, w1, w2) count relation feeds three model consumers;
    exchange-reuse alone cannot dedupe them (per-branch pruning breaks
    canonical equality — measured 8 Generate nodes), so the op caches
    it: the executed plan reads InMemoryTableScan and the corpus
    bigram explode appears exactly once."""
    d = spark.createDataFrame([(0, "a b a b"), (1, "b c d")],
                              "doc_id long, text string")
    out = X.bigram_lm_score(d, alpha=0.5)
    out.collect()
    ep = out._jdf.queryExecution().executedPlan().toString()
    try:
        # every model consumer reads the cached relation (each scan
        # node re-PRINTS the cached build plan, so counting 'Generate'
        # text would overcount; the scans are the semantic check —
        # Spark materializes a cached relation once)
        assert ep.count("InMemoryTableScan") >= 3, ep
    finally:
        out.df_ordered_cache.unpersist()


def test_novelty_explodes_corpus_once(spark):
    """The distinct (doc, shingle-md5) relation feeds both the df
    table and the verdict join; it is cached so the corpus shingle
    explode materializes once (word_shingles' lambda defeats
    exchange-reuse, the bigram_lm lesson)."""
    d = spark.createDataFrame([(0, "a b c d e"), (1, "a b c x y")],
                              "doc_id long, text string")
    out = D.novelty_score(d, k=3)
    out.collect()
    ep = out._jdf.queryExecution().executedPlan().toString()
    try:
        assert ep.count("InMemoryTableScan") >= 2, ep
    finally:
        out.df_ordered_cache.unpersist()


def test_dsir_importance_planted(spark):
    """Python replay of the smoothed log-ratio on known bucket counts:
    a doc made of target-heavy words scores positive, one made of
    corpus-only words negative; empty docs (0, 0.0); the per-(doc,
    bucket) counts are cached (one corpus explode)."""
    import hashlib
    import math as m

    docs = spark.createDataFrame(
        [(0, "good good good"), (1, "junk junk junk junk"), (2, None)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "good good")],
                                   "doc_id long, text string")
    B, a = 16, 0.5
    out = X.dsir_importance(docs, target, n_buckets=B, alpha=a)
    g = {r["doc_id"]: r for r in out.collect()}

    def bkt(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % B

    # corpus buckets: good x3, junk x4; target: good x2
    s = {bkt("good"): 3, bkt("junk"): 4}
    t = {bkt("good"): 2}
    S, T = 7, 2

    def lw(b):
        return m.log((t.get(b, 0) + a) / (T + a * B)) - \
            m.log((s.get(b, 0) + a) / (S + a * B))

    try:
        assert g[0]["n_tokens"] == 3
        assert g[0]["importance"] == round(3 * lw(bkt("good")), 4)
        assert g[1]["importance"] == round(4 * lw(bkt("junk")), 4)
        assert g[0]["importance"] > 0 > g[1]["importance"]
        assert (g[2]["n_tokens"], g[2]["importance"]) == (0, 0.0)
        ep = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in ep
    finally:
        out.df_ordered_cache.unpersist()


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-validation against the reference implementation: on a
    seeded random frame (40 users, duplicate timestamps included) the
    operator's output equals pandas.merge_asof(direction='backward',
    allow_exact_matches=True) with the right side pre-sorted by
    (ts, id) so pandas' last-occurrence tie rule matches the
    operator's largest-(ts, id) rule."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_r, n_l = 400, 300
    right = pd.DataFrame({
        "event_id": np.arange(n_r, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 500, n_r), unit="s"),
        "user_id": rng.integers(0, 40, n_r).astype(np.int64),
        "value": np.round(rng.random(n_r) * 100, 2),
    })
    left = pd.DataFrame({
        "event_id": np.arange(1000, 1000 + n_l, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 500, n_l), unit="s"),
        "user_id": rng.integers(0, 40, n_l).astype(np.int64),
    })
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in (
            spark.createDataFrame(left)
            .transform(lambda l: __import__("crab_spark.operators.relational",
                                            fromlist=["asof_join"]).asof_join(
                l, spark.createDataFrame(right),
                ["user_id"], "ts", "event_id", ["value"]))
        ).collect()
    }
    want = pd.merge_asof(
        left.sort_values(["ts", "event_id"], kind="stable"),
        right.sort_values(["ts", "event_id"], kind="stable"),
        on="ts", by="user_id", direction="backward",
        allow_exact_matches=True, suffixes=("", "_r"),
    )
    assert len(out) == n_l
    for _, row in want.iterrows():
        got_id, got_val = out[row["event_id"]]
        if pd.isna(row["event_id_r"]):
            assert got_id is None, row["event_id"]
        else:
            assert got_id == int(row["event_id_r"]), row["event_id"]
            assert got_val == row["value"]


def test_event_funnel_order_window_and_denominator(spark):
    """q100 semantics: steps must be in strict time order, within the
    24 h window (boundary inclusive), and users without a 'view' are
    outside the funnel entirely."""
    import datetime as dt

    import crab_spark.queries as Q

    base = dt.datetime(2024, 1, 1)

    def ts(h):
        return base + dt.timedelta(hours=h)

    rows = [
        (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        (2, ts(1), "view"), (2, ts(0), "click"),      # click BEFORE view
        (3, ts(0), "view"), (3, ts(25), "click"),     # outside 24 h
        (4, ts(0), "view"), (4, ts(24), "click"),     # exact boundary kept
        (4, ts(30), "purchase"),
        (5, ts(0), "click"), (5, ts(1), "purchase"),  # no view: not in funnel
    ]
    ev = spark.createDataFrame(
        [(i, t_, u, et, 0.0, "{}") for i, (u, t_, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: ev
    try:
        out = {r.user_id: r for r in
               Q.QUERIES["q100_event_funnel"](spark, "x").collect()}
    finally:
        Q.t = orig_t
    assert set(out) == {1, 2, 3, 4}
    assert out[1].n_steps == 3 and out[1].t_purchase == ts(2)
    assert out[2].n_steps == 1 and out[2].t_click is None
    assert out[3].n_steps == 1
    assert out[4].n_steps == 3 and out[4].t_click == ts(24)


def test_length_histogram_buckets(spark):
    """q99: bucket = exact integer floor(log2(n_tokens))+1 via
    bin-length; NULL text lands in bucket 0."""
    import crab_spark.queries as Q

    docs = spark.createDataFrame(
        [(0, "one two three four five six seven", "s"),  # 7 → bucket 3
         (1, "a", "s"),                                  # 1 → bucket 1
         (2, None, "s")],                                # NULL → 0
        "doc_id long, text string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {(r.log2_bucket): r.n_docs for r in
               Q.QUERIES["q99_length_histogram"](spark, "x").collect()}
    finally:
        Q.t = orig_t
    assert out == {3: 1, 1: 1, 0: 1}


def test_anchor_topk_pairs_and_ranking(spark):
    """q101 semantics: word index ≡ 5 (mod 7) is a link, its anchor is
    the PRECEDING word, hosts come from the md5 route of the target
    word, and per-host ranking is (count desc, anchor asc) capped at 3."""
    import hashlib

    import crab_spark.queries as Q

    # index:   0  1  2   3   4   5(link) 6  ...  12(link)
    text = "w0 w1 w2 w3 anchorA target w6 w7 w8 w9 w10 anchorB target2"
    docs = spark.createDataFrame(
        [(i, text, "s") for i in range(4)]
        + [(99, None, "s")],  # NULL text must not error or emit pairs
        "doc_id long, text string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = Q.QUERIES["q101_anchor_topk"](spark, "x").collect()
    finally:
        Q.t = orig_t

    def host_of(word):
        return int(hashlib.md5(f"t|{word}".encode()).hexdigest()[:2], 16) % 64

    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    ha, hb = host_of("target"), host_of("target2")
    assert set(by_host) == {ha, hb}
    ra = {r.anchor: r for r in by_host[ha]}
    assert ra["anchora"].n == 4 and ra["anchora"].rnk == 1
    rb = {r.anchor: r for r in by_host[hb]}
    assert rb["anchorb"].n == 4 and rb["anchorb"].rnk == 1
    assert all(r.rnk <= 3 for r in out)


def test_anchor_topk_tiebreak_and_cap(spark):
    """Equal counts break ties anchor-asc; a host with >3 distinct
    anchors keeps exactly 3."""
    import crab_spark.queries as Q

    # every doc links the SAME target word (one host) with a different
    # anchor; counts all equal ⇒ rank order is pure anchor asc
    docs = spark.createDataFrame(
        [(i, f"w0 w1 w2 w3 anch{i} sametarget", "s") for i in range(5)],
        "doc_id long, text string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = sorted(
            Q.QUERIES["q101_anchor_topk"](spark, "x").collect(),
            key=lambda r: r.rnk,
        )
    finally:
        Q.t = orig_t
    assert [r.anchor for r in out] == ["anch0", "anch1", "anch2"]
    assert [r.rnk for r in out] == [1, 2, 3]


def test_hopping_window_double_assignment(spark):
    """q102: every event lands in EXACTLY two 1h/30min windows, so the
    window counts sum to 2× the event count; planted events reproduce
    the 3-window pattern with the shared middle window summed."""
    import datetime as dt

    import crab_spark.queries as Q

    ev = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1, 10, 15), 1, "view", 1.5, "{}"),
         (1, dt.datetime(2024, 1, 1, 10, 45), 1, "view", 2.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: ev
    try:
        out = {r.win_start: r for r in
               Q.QUERIES["q102_hopping_window"](spark, "x").collect()}
    finally:
        Q.t = orig_t
    w = {k: (v.n, v.sum_value) for k, v in out.items()}
    assert w == {
        dt.datetime(2024, 1, 1, 9, 30): (1, 1.5),
        dt.datetime(2024, 1, 1, 10, 0): (2, 3.5),
        dt.datetime(2024, 1, 1, 10, 30): (1, 2.0),
    }
    assert sum(v.n for v in out.values()) == 2 * ev.count()


def test_host_degrees_complete_and_consistent(spark):
    """q103: all 64 hosts present (isolated ⇒ zeros), degree counts
    match a Python mirror of the edge derivation, and link totals
    conserve the doc count on both directions."""
    import hashlib

    import crab_spark.queries as Q

    docs = spark.createDataFrame(
        [(i, f"doc body {i % 3}", "s") for i in range(12)],
        "doc_id long, text string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {r.host: r for r in
               Q.QUERIES["q103_host_degrees"](spark, "x").collect()}
    finally:
        Q.t = orig_t
    assert set(out) == set(range(64))

    def route(prefix, s):
        return int(hashlib.md5(f"{prefix}{s}".encode()).hexdigest()[:2], 16) % 64

    edges = {}
    for i in range(12):
        k = (route("h|", str(i)), route("d|", f"doc body {i % 3}"))
        edges[k] = edges.get(k, 0) + 1
    for h in range(64):
        assert out[h].out_deg == sum(1 for (s, _) in edges if s == h)
        assert out[h].out_links == sum(w for (s, _), w in edges.items() if s == h)
        assert out[h].in_deg == sum(1 for (_, d) in edges if d == h)
        assert out[h].in_links == sum(w for (_, d), w in edges.items() if d == h)
    assert sum(r.out_links for r in out.values()) == 12
    assert sum(r.in_links for r in out.values()) == 12


def test_robots_gate_relational_semantics(spark):
    """q104: RFC 9309 longest-match-wins resolved relationally — the
    integer encoding len·2+allow must reproduce robots.rules_allow on
    the fixture's rule shapes: Disallow /pX blocks, the longer Allow
    /pX/1 carves back, root-Disallow hosts block everything else, and
    a no-rule URL passes."""
    import hashlib

    import crab_spark.queries as Q
    from crab_spark.robots import _compile_rules, rules_allow

    docs = spark.createDataFrame(
        [(i, "t", "s") for i in range(200)],
        "doc_id long, text string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {r.host: r for r in
               Q.QUERIES["q104_robots_gate"](spark, "x").collect()}
    finally:
        Q.t = orig_t

    def route(i):
        return int(hashlib.md5(f"h|{i}".encode()).hexdigest()[:2], 16) % 64

    # python mirror through the ENGINE's rule evaluator
    expected = {}
    for i in range(200):
        h = route(i)
        rules = [(False, f"/p{h % 7}"), (True, f"/p{h % 7}/1")]
        if h % 16 == 0:
            rules.append((False, "/"))
        ok = rules_allow(f"/p{i % 10}/{i}", _compile_rules(rules))
        n_urls, n_allowed, n_blocked = expected.get(h, (0, 0, 0))
        expected[h] = (
            n_urls + 1, n_allowed + (1 if ok else 0),
            n_blocked + (0 if ok else 1),
        )
    assert {h: (r.n_urls, r.n_allowed, r.n_blocked) for h, r in out.items()} \
        == expected
    assert sum(r.n_blocked for r in out.values()) > 0
    assert sum(r.n_allowed for r in out.values()) > 0


def test_robots_gate_rules_broadcast(spark):
    """q104 scale contract: the rule table broadcasts — the frontier
    side never shuffles for rule matching (no SortMergeJoin)."""
    import crab_spark.queries as Q
    from crab_spark.plans import assert_broadcast_join, formatted_plan

    df = Q.QUERIES["q104_robots_gate"](spark, "/root/testdata/sf0.001")
    assert_broadcast_join(df)
    plan = formatted_plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan


def test_anchor_topk_plan_contracts(spark):
    """q101 scale contracts, pinned on the executed shape: the scan
    reads only `text`; the Generate emits the pair struct (the array is
    consumed inside the transform, never carried per exploded row);
    and the rank limit pushes below the exchange as a Partial
    WindowGroupLimit, so at most 3 rows per host per partition cross
    the shuffle."""
    import crab_spark.queries as Q
    from crab_spark.plans import formatted_plan

    df = Q.QUERIES["q101_anchor_topk"](spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df).split("== Initial Plan ==")[0]
    assert "ReadSchema: struct<text:string>" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_crawl_budget_sums_exactly_and_apportions(spark):
    """q105 invariants: Σquota = B exactly (the scheduler contract the
    largest-remainder method guarantees), every quota is floor or
    floor+1 of the proportional share, and the +1s go to the largest
    fractional remainders with the host-asc tiebreak."""
    from fractions import Fraction

    import crab_spark.queries as Q

    # skewed pending counts: host route spreads 300 docs unevenly
    docs = spark.createDataFrame(
        [(i, "t", "s") for i in range(300)],
        "doc_id long, text string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {r.host: r for r in
               Q.QUERIES["q105_crawl_budget"](spark, "x").collect()}
    finally:
        Q.t = orig_t
    B = Q._Q105_BUDGET
    total = sum(r.pending for r in out.values())
    assert total == 300
    assert sum(r.quota for r in out.values()) == B
    # python mirror of the apportionment
    fls = {h: (B * r.pending) // total for h, r in out.items()}
    rems = {h: (B * r.pending) % total for h, r in out.items()}
    left = B - sum(fls.values())
    order = sorted(out, key=lambda h: (-rems[h], h))
    bumped = set(order[:left])
    for h, r in out.items():
        assert r.quota == fls[h] + (1 if h in bumped else 0), h
        share = Fraction(B * r.pending, total)
        assert fls[h] <= r.quota <= fls[h] + 1
        assert abs(r.quota - share) < 1


def test_length_percentiles_rank_rule(spark):
    """q106: exact rank-based percentiles — smallest v with
    cum ≥ ceil(q·n) — against a hand-checked frame, including a
    NULL-source group and NULL n_chars → 0."""
    import crab_spark.queries as Q

    # source a: values 1..10 → p50 = 5 (ceil(10/2)=5th), p90 = 9, p99 = 10
    rows = [(i, "t", "en", "a", i + 1) for i in range(10)]
    # source NULL: single doc with NULL n_chars → all percentiles 0
    rows.append((99, "t", "en", None, None))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {r.source: r for r in
               Q.QUERIES["q106_length_percentiles"](spark, "x").collect()}
    finally:
        Q.t = orig_t
    a = out["a"]
    assert (a.n_docs, a.p50, a.p90, a.p99) == (10, 5, 9, 10)
    n = out[None]
    assert (n.n_docs, n.p50, n.p90, n.p99) == (1, 0, 0, 0)


def test_url_templates_trap_detection(spark):
    """q108: digit runs collapse to {n}, the sid minority lands in its
    own template, and the trap verdict is the exact integer rule
    100·n_urls > 5·total — checked against a Python mirror of the
    whole fixture."""
    import hashlib

    import crab_spark.queries as Q

    # skewed langs: 'en' dominates (its templates are traps), the
    # letter-only minority langs fall under the 5% line
    langs = ["en"] * 7 + ["qa", "qb", "qc"]
    docs = spark.createDataFrame(
        [(i, "t", langs[i % 10], f"src{i % 3}") for i in range(200)],
        "doc_id long, text string, lang string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {r.template: r for r in
               Q.QUERIES["q108_url_templates"](spark, "x").collect()}
    finally:
        Q.t = orig_t

    import re

    mirror = {}
    for i in range(200):
        coin = int(hashlib.md5(f"t|{i}".encode()).hexdigest()[:2], 16)
        path = f"/{langs[i % 10]}/src{i % 3}/c{i % 7}/item-{i}"
        if coin % 5 == 0:
            path += f"?sid={(i * 7919) % 100000}"
        tpl = re.sub(r"[0-9]+", "{n}", path)
        n, paths = mirror.get(tpl, (0, set()))
        paths.add(path)
        mirror[tpl] = (n + 1, paths)
    assert set(out) == set(mirror)
    for tpl, (n, paths) in mirror.items():
        r = out[tpl]
        assert (r.n_urls, r.n_paths) == (n, len(paths)), tpl
        assert r.is_trap == (100 * n > 5 * 200), tpl
    # the fixture exercises BOTH verdicts and no template keeps a digit
    assert {r.is_trap for r in out.values()} == {True, False}
    assert not any(re.search(r"[0-9]", t) for t in out)


def test_cluster_reps_pick_best_quality_not_min_id(spark):
    """q109: the keeper is the cluster member with the LOWEST unigram
    avg_nll (common-word doc), NOT the min doc_id — the planted pair
    puts the rare-word doc at the smaller id, so q50's min-id rule and
    q109's quality rule disagree on purpose. Singletons keep
    themselves with n_dropped = 0."""
    import crab_spark.queries as Q

    common = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, "the " * 9 + "the", "en", "s") for i in range(6)]
    rows += [
        (10, common + " qqrare zzrare", "en", "s"),   # rare tail → high nll
        (11, common + " the the", "en", "s"),         # common tail → low nll
        (20, "unique singleton words never repeated anywhere else here",
         "en", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {r.cluster_id: r for r in
               Q.QUERIES["q109_cluster_reps"](spark, "x").collect()}
    finally:
        Q.t = orig_t

    pair = out[10]  # cluster labeled by its min member id
    assert pair.n_members == 2 and pair.n_dropped == 1
    assert pair.keeper_id == 11  # quality wins over min-id
    single = out[20]
    assert (single.keeper_id, single.n_members, single.n_dropped) == (20, 1, 0)
    # every corpus doc lands in exactly one cluster
    assert sum(r.n_members for r in out.values()) == len(rows)


def test_recrawl_schedule_change_rate(spark):
    """q110: change-rate arithmetic against hand-built observation
    logs — a changing page gets a short interval, a static page's
    interval is its whole span, and a single-observation page falls
    back to the 60 s politeness floor."""
    from datetime import datetime

    import crab_spark.queries as Q

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return datetime(2024, 1, 1, 0, 0, 0).fromtimestamp(
            t0.timestamp() + sec
        )

    rows = [
        # user 1: sigs 0,1,1,2 over 300 s → 2 changes, interval 150
        (1, at(0), 1, 0.00), (2, at(100), 1, 0.01),
        (3, at(200), 1, 0.01), (4, at(300), 1, 0.02),
        # user 2: static sig over 500 s → 0 changes, interval = span
        (5, at(0), 2, 0.03), (6, at(500), 2, 0.03),
        # user 3: one observation → span 0, due = last + 60 floor
        (7, at(42), 3, 0.04),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: ev
    try:
        out = {r.url_key: r for r in
               Q.QUERIES["q110_recrawl_schedule"](spark, "x").collect()}
    finally:
        Q.t = orig_t

    base = int(t0.timestamp())
    u1 = out[1]
    assert (u1.n_obs, u1.n_changes, u1.span_sec, u1.interval_sec) == (
        4, 2, 300, 150)
    assert u1.next_due_epoch == base + 300 + 150
    u2 = out[2]
    assert (u2.n_changes, u2.interval_sec) == (0, 500)
    assert u2.next_due_epoch == base + 500 + 500
    u3 = out[3]
    assert (u3.n_obs, u3.span_sec, u3.interval_sec) == (1, 0, 0)
    assert u3.next_due_epoch == base + 42 + 60  # politeness floor


def test_range_planner_equal_height_and_value_integrity(spark):
    """q111: every key value lands in exactly one shard (range
    invariant), shards partition the corpus exactly, boundaries are
    the integer equal-height rule, and a heavy value is NOT split."""
    import crab_spark.queries as Q

    # values 1..16 once each, plus value 5 repeated 16× (heavy key)
    rows = [(i, "t", "en", "s", (i % 16) + 1) for i in range(16)]
    rows += [(100 + i, "t", "en", "s", 5) for i in range(16)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = sorted(
            Q.QUERIES["q111_range_planner"](spark, "x").collect(),
            key=lambda r: r.shard_id,
        )
    finally:
        Q.t = orig_t

    # python mirror of the shard rule
    from collections import Counter

    cnt = Counter((i % 16) + 1 for i in range(16))
    cnt.update({5: 16})
    total = sum(cnt.values())
    cum = 0
    mirror = {}
    for v in sorted(cnt):
        shard = (cum * Q._Q111_SHARDS) // total
        m = mirror.setdefault(shard, [0, v, v, 0])
        m[0] += cnt[v]
        m[2] = v
        m[3] += 1
        cum += cnt[v]
    assert {r.shard_id: (r.n_docs, r.lo, r.hi, r.n_keys) for r in out} == {
        s: tuple(m) for s, m in mirror.items()
    }
    assert sum(r.n_docs for r in out) == total        # exact partition
    # ranges are disjoint and ordered
    for a, b in zip(out, out[1:]):
        assert a.hi < b.lo


def test_weighted_sample_race_and_weight_bias(spark):
    """q112/weighted_sample: the k winners are EXACTLY the k smallest
    −ln(u)/w race keys (Python mirror of the md5 uniforms), and a
    massively heavy row always races into the sample."""
    import hashlib
    import math

    import crab_spark.queries as Q
    from crab_spark.operators import sampling as SA2

    # 300 unit-weight docs + one heavy doc (w = 100000)
    rows = [(i, "t", "en", "s", 1) for i in range(300)]
    rows.append((999, "t", "en", "s", 100000))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    )
    from pyspark.sql import functions as F2

    out = SA2.weighted_sample(
        docs, k=20,
        weight=F2.greatest(F2.coalesce(F2.col("n_chars"), F2.lit(0)),
                           F2.lit(1)),
    ).collect()
    assert len(out) == 20

    def race(i, w):
        big = int(hashlib.md5(f"ws|{i}".encode()).hexdigest()[:12], 16)
        u = (big + 1.0) / 281474976710657.0
        return round(-math.log(u) / w, 9)

    mirror = sorted(
        [(race(i, 1), i) for i in range(300)] + [(race(999, 100000), 999)]
    )[:20]
    assert {(r.doc_id, r.race) for r in out} == {
        (i, rc) for rc, i in mirror
    }
    # the heavy doc's race is ~1e5 smaller than any unit draw — it wins
    assert any(r.doc_id == 999 for r in out)
    assert all(r.w in (1, 100000) for r in out)


def test_containment_pairs_quote_detection(spark):
    """containment_pairs finds the short-in-long relation symmetric
    Jaccard misses: a 12-word quote doc scores containment 1.0 against
    the 312-word page embedding it (their Jaccard is ~5/305), and
    over-cap boilerplate buckets drop whole."""
    quote = "qa qb qc qd qe qf qg qh qi qj qk ql"
    filler = " ".join(f"w{i}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote),
         (3, " ".join(f"z{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r
           for r in D.containment_pairs(docs, k=8, min_shared=3).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # quote = 12 words → 5 distinct 8-shingles, all inside doc 2
    assert (r.shared, r.n_a) == (5, 5)
    assert r.n_b == 305
    assert r.containment == 1.0

    # cap: 70 identical quote docs blow a max_bucket=64 bucket — the
    # bucket drops WHOLE (no pairs) and is reported, never silent
    many = spark.createDataFrame(
        [(i, quote) for i in range(70)], "doc_id long, text string"
    )
    capped = D.containment_pairs(many, k=8, min_shared=3, max_bucket=64)
    assert capped.count() == 0
    assert capped.dropped_buckets.count() == 5  # the 5 quote shingles


def test_new_crawl_analytics_plan_contracts(spark):
    """Scale-shape contracts for q108/q110/q111/q112 (plan-audited and
    pinned): q108 never reads the text column (template mining is
    metadata-only); q110 runs ONE key exchange and its final agg reuses
    the window partitioning; q111 caches the value-domain counts so
    the corpus aggregates once; q112 is zero-exchange TakeOrdered."""
    import crab_spark.queries as Q
    from crab_spark.plans import (
        assert_no_cartesian,
        assert_read_schema_excludes,
        formatted_plan,
    )

    sf = "/root/testdata/sf0.001"
    tmpl = Q.QUERIES["q108_url_templates"](spark, sf)
    assert_read_schema_excludes(tmpl, "text")

    p110 = formatted_plan(Q.QUERIES["q110_recrawl_schedule"](spark, sf))
    # exactly one shuffle: the user-key partition shared by the lag
    # window AND the aggregation (Exchange appears once in the tree
    # and once in the numbered detail section)
    assert p110.count("Exchange") == 2, p110
    assert "SortMergeJoin" not in p110

    p111 = formatted_plan(Q.QUERIES["q111_range_planner"](spark, sf))
    assert "InMemoryTableScan" in p111  # cnts cached, corpus aggs once

    p112 = formatted_plan(Q.QUERIES["q112_weighted_sample"](spark, sf))
    assert "TakeOrderedAndProject" in p112
    assert "Exchange" not in p112
    assert_no_cartesian(Q.QUERIES["q112_weighted_sample"](spark, sf))


def test_pmi_collocations_planted_phrase(spark):
    """pmi_collocations ranks a planted always-together pair ('hong
    kong': every occurrence adjacent) above a frequent-but-independent
    pair, with the exact PMI arithmetic mirrored in Python."""
    import math

    # 10 docs "hong kong" (perfect collocation), 30 docs of independent
    # combinations "the cat" / "the dog" / "a cat" / "a dog"
    rows = [(i, "hong kong") for i in range(10)]
    combos = ["the cat", "the dog", "a cat", "a dog"]
    rows += [(100 + i, combos[i % 4]) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.pmi_collocations(docs, min_count=5, k=10).collect()
    by_pair = {(r.w1, r.w2): r for r in out}
    hk = by_pair[("hong", "kong")]
    n_total = 10 + 30  # every doc contributes exactly one bigram
    assert (hk.n12, hk.c1, hk.c2) == (10, 10, 10)
    assert hk.pmi == round(math.log(10 * n_total / (10 * 10)), 6)
    # the planted collocation outranks every independent pair
    top = max(out, key=lambda r: (r.pmi, r.w1))
    assert (top.w1, top.w2) == ("hong", "kong")
    # min_count floor: pairs seen <5 times never appear
    assert all(r.n12 >= 5 for r in out)


def test_weighted_sample_k_exceeds_population(spark):
    """k larger than the corpus returns every row exactly once —
    sampling without replacement can't invent rows."""
    from pyspark.sql import functions as F2

    from crab_spark.operators import sampling as SA2

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", i + 1) for i in range(7)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    out = SA2.weighted_sample(
        docs, k=50,
        weight=F2.greatest(F2.coalesce(F2.col("n_chars"), F2.lit(0)),
                           F2.lit(1)),
    ).collect()
    assert sorted(r.doc_id for r in out) == list(range(7))


def test_containment_min_shared_boundary(spark):
    """Pairs sharing exactly min_shared-1 shingles are excluded, exactly
    min_shared are kept — the boundary is ≥, not >."""
    # docs share exactly 3 distinct 2-word shingles: 'a b', 'b c', 'c d'
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d x y z q")],
        "doc_id long, text string",
    )
    kept = D.containment_pairs(docs, k=2, min_shared=3).collect()
    assert len(kept) == 1 and kept[0].shared == 3
    none = D.containment_pairs(docs, k=2, min_shared=4).collect()
    assert none == []


def test_containment_pairs_random_crossvalidation(spark):
    """Seeded-random cross-validation (the connected-components /
    asof_join precedent): containment_pairs on random small corpora
    must equal an exact Python brute force — shingle sets, the bucket
    cap (dropped WHOLE), the min_shared floor, and the rounded
    containment value."""
    import random

    rng = random.Random(411)
    for trial in range(3):
        n_docs = rng.randint(6, 12)
        rows = []
        for i in range(n_docs):
            words = [rng.choice("abcdef") for _ in range(rng.randint(1, 9))]
            rows.append((i, " ".join(words)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cap = rng.choice([3, 5, 100])
        got = {
            (r.id_a, r.id_b): (r.shared, r.n_a, r.n_b, r.containment)
            for r in D.containment_pairs(
                docs, k=2, min_shared=2, max_bucket=cap
            ).collect()
        }

        # brute force: k=2 shingles exactly as word_shingles builds them
        def shingles(text):
            ws = text.split(" ")
            n = max(len(ws) - 2, 0)
            return {" ".join(ws[i:i + 2]) for i in range(n + 1)}

        sets = {i: shingles(t) for i, t in rows}
        # whole-bucket drop: shingles held by more than `cap` docs
        from collections import Counter

        freq = Counter(s for ss in sets.values() for s in ss)
        live = {s for s, c in freq.items() if c <= cap}
        want = {}
        for a in range(n_docs):
            for b in range(a + 1, n_docs):
                shared = len((sets[a] & sets[b]) & live)
                if shared >= 2:
                    want[(a, b)] = (
                        shared, len(sets[a]), len(sets[b]),
                        round(shared / min(len(sets[a]), len(sets[b])), 6),
                    )
        assert got == want, f"trial {trial} cap {cap}"


def test_range_planner_random_crossvalidation(spark):
    """q111 against an integer-exact Python mirror on seeded-random
    length multisets: identical shard ids, counts, ranges, key counts;
    Σn_docs == corpus; ranges strictly ordered."""
    import random

    import crab_spark.queries as Q

    rng = random.Random(1131)
    for trial in range(3):
        vals = [rng.randint(0, 40) for _ in range(rng.randint(5, 120))]
        docs = spark.createDataFrame(
            [(i, "t", "en", "s", v) for i, v in enumerate(vals)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {r.shard_id: (r.n_docs, r.lo, r.hi, r.n_keys)
                   for r in Q.QUERIES["q111_range_planner"](spark, "x")
                   .collect()}
        finally:
            Q.t = orig_t
        from collections import Counter

        cnt = Counter(vals)
        total, cum, want = len(vals), 0, {}
        for v in sorted(cnt):
            s = (cum * Q._Q111_SHARDS) // total
            m = want.setdefault(s, [0, v, v, 0])
            m[0] += cnt[v]
            m[2] = v
            m[3] += 1
            cum += cnt[v]
        assert got == {s: tuple(m) for s, m in want.items()}, f"trial {trial}"
        assert sum(r[0] for r in got.values()) == total


def test_weighted_sample_random_crossvalidation(spark):
    """Seeded-random cross-validation for q112/weighted_sample (the
    containment/range-planner precedent): on random weight vectors the
    k winners must be EXACTLY the k smallest (race, id) under the md5
    exponential-race mirror — including the race values the engine
    reports."""
    import hashlib
    import math
    import random

    from pyspark.sql import functions as F2
    from crab_spark.operators import sampling as SA2

    rng = random.Random(1121)
    for trial in range(3):
        n = rng.randint(20, 120)
        ids = rng.sample(range(1_000_000), n)
        weights = {i: rng.choice([1, 2, 7, 50, 400, 9000]) for i in ids}
        docs = spark.createDataFrame(
            [(i, weights[i]) for i in ids], "doc_id long, w_in long"
        )
        k = rng.randint(1, n)
        got = sorted(
            (r.race, r.doc_id, r.w)
            for r in SA2.weighted_sample(
                docs, k=k, weight=F2.col("w_in")
            ).collect()
        )

        def race(i, w):
            big = int(hashlib.md5(f"ws|{i}".encode()).hexdigest()[:12], 16)
            u = (big + 1.0) / 281474976710657.0
            return round(-math.log(u) / w, 9)

        want = sorted((race(i, weights[i]), i) for i in ids)[:k]
        assert got == [(rc, i, weights[i]) for rc, i in want], (
            f"trial {trial} k {k}"
        )


def test_recrawl_schedule_random_crossvalidation(spark):
    """Seeded-random cross-validation for q110: random observation
    logs (duplicate timestamps included, so the event_id tiebreak is
    exercised) against an integer-exact Python mirror of the
    lag/change/interval/due arithmetic."""
    import math
    import random
    from datetime import datetime

    import crab_spark.queries as Q

    rng = random.Random(1101)
    base = int(datetime(2024, 3, 1, 0, 0, 0).timestamp())
    for trial in range(3):
        rows, eid = [], 0
        logs = {}
        for user in range(1, rng.randint(3, 9)):
            n_obs = rng.randint(1, 12)
            secs = [rng.randrange(0, 5000, 100) for _ in range(n_obs)]
            obs = []
            for s in secs:
                eid += 1
                val = rng.choice([0.0, 0.01, 0.02, 0.04, 0.05, 1.37, 2.5])
                rows.append(
                    (eid, datetime.fromtimestamp(base + s), user, val)
                )
                obs.append((base + s, eid, val))
            logs[user] = sorted(obs)
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: ev
        try:
            got = {
                r.url_key: (r.n_obs, r.n_changes, r.span_sec,
                            r.interval_sec, r.next_due_epoch)
                for r in Q.QUERIES["q110_recrawl_schedule"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        want = {}
        for user, obs in logs.items():
            sigs = [int(math.floor(v * 100)) % 5 for _, _, v in obs]
            changes = sum(
                1 for a, b in zip(sigs, sigs[1:]) if a != b
            )
            eps = [e for e, _, _ in obs]
            span = max(eps) - min(eps)
            interval = span // max(changes, 1)
            due = max(eps) + max(interval, 60)
            want[user] = (len(obs), changes, span, interval, due)
        assert got == want, f"trial {trial}"


def test_crawl_budget_random_crossvalidation(spark):
    """Seeded-random cross-validation for q105: random (skewed) corpus
    sizes against a Python mirror of the md5 host routing and the
    largest-remainder apportionment; Σquota == budget exactly and every
    quota is its floor share or floor+1."""
    import hashlib
    import random

    import crab_spark.queries as Q

    rng = random.Random(1051)
    for trial in range(3):
        ids = rng.sample(range(10_000_000), rng.randint(40, 300))
        # skew: repeat-route a block of ids through a hot host by
        # duplicating rows is impossible (doc_id is the key), so skew
        # comes naturally from small host counts at small n
        docs = spark.createDataFrame(
            [(i, "t") for i in ids], "doc_id long, text string"
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {
                r.host: (r.pending, r.quota)
                for r in Q.QUERIES["q105_crawl_budget"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        pend = {}
        for i in ids:
            h = int(
                hashlib.md5(f"h|{i}".encode()).hexdigest()[:2], 16
            ) % 64
            pend[h] = pend.get(h, 0) + 1
        tot, B = sum(pend.values()), 10_000
        shares = {
            h: ((B * w) // tot, (B * w) % tot) for h, w in pend.items()
        }
        left = B - sum(fl for fl, _ in shares.values())
        order = sorted(shares, key=lambda h: (-shares[h][1], h))
        bumped = set(order[:left])
        want = {
            h: (pend[h], shares[h][0] + (1 if h in bumped else 0))
            for h in pend
        }
        assert got == want, f"trial {trial}"
        assert sum(q for _, q in got.values()) == B


def test_length_percentiles_random_crossvalidation(spark):
    """Seeded-random cross-validation for q106: random per-source
    length multisets (NULL sources and NULL lengths included) against
    the exact rank rule — smallest v with cum ≥ ceil(q·n)."""
    import random

    import crab_spark.queries as Q

    rng = random.Random(1061)
    for trial in range(3):
        rows = []
        for i in range(rng.randint(10, 200)):
            src = rng.choice(["a", "b", "c", None])
            v = rng.choice([None] + list(range(0, 500, 7)))
            rows.append((i, src, v))
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, n_chars long"
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {
                r.source: (r.n_docs, r.p50, r.p90, r.p99)
                for r in Q.QUERIES["q106_length_percentiles"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        by_src = {}
        for _, src, v in rows:
            by_src.setdefault(src, []).append(0 if v is None else v)
        want = {}
        for src, vals in by_src.items():
            vals.sort()
            n = len(vals)

            def pick(num, den):
                kth = (num * n + den - 1) // den
                return vals[kth - 1]

            want[src] = (n, pick(1, 2), pick(9, 10), pick(99, 100))
        assert got == want, f"trial {trial}"


def test_pmi_collocations_random_crossvalidation(spark):
    """Seeded-random cross-validation for q114/pmi_collocations:
    random small-vocab corpora with messy whitespace and NULL texts
    against a full Python mirror (tokenization, position-specific
    marginals, min_count floor, 6 dp PMI)."""
    import math
    import random
    import re

    rng = random.Random(1141)
    for trial in range(3):
        vocab = ["alpha", "beta", "GAMMA", "delta", "eps"]
        seps = [" ", "  ", "\n", "\t "]
        rows = []
        for i in range(rng.randint(8, 40)):
            if rng.random() < 0.1:
                rows.append((i, None))
                continue
            words = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
            txt = ""
            for w in words:
                txt += w + rng.choice(seps)
            rows.append((i, txt))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.w1, r.w2): (r.n12, r.c1, r.c2, r.pmi)
            for r in X.pmi_collocations(
                docs, min_count=2, k=100_000
            ).collect()
        }

        pair_counts = {}
        for _, txt in rows:
            t = re.sub(r"\s+", " ", (txt or "").lower())
            ws = t.split(" ")
            for a, b in zip(ws, ws[1:]):
                if a and b:
                    pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
        c1, c2 = {}, {}
        for (a, b), n12 in pair_counts.items():
            c1[a] = c1.get(a, 0) + n12
            c2[b] = c2.get(b, 0) + n12
        nt = float(sum(pair_counts.values()))
        want = {
            (a, b): (
                n12,
                c1[a],
                c2[b],
                round(
                    math.log((n12 * nt) / (float(c1[a]) * float(c2[b]))), 6
                ),
            )
            for (a, b), n12 in pair_counts.items()
            if n12 >= 2
        }
        assert got == want, f"trial {trial}"


def test_event_funnel_random_crossvalidation(spark):
    """Seeded-random cross-validation for q100: random event logs
    (steps straddling the 24 h windows, users missing steps, purchases
    before clicks) against a Python mirror of the chained
    first-qualifying-event rule."""
    import random
    from datetime import datetime, timedelta

    import crab_spark.queries as Q

    rng = random.Random(1001)
    base = datetime(2024, 5, 1, 0, 0, 0)
    H24 = timedelta(hours=24)
    for trial in range(3):
        rows, by_user = [], {}
        for user in range(1, rng.randint(4, 10)):
            for _ in range(rng.randint(0, 15)):
                et = rng.choice(["view", "click", "purchase", "other"])
                ts = base + timedelta(seconds=rng.randrange(0, 200_000, 50))
                rows.append((user, et, ts))
                by_user.setdefault(user, []).append((ts, et))
        if not rows:
            continue
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: ev
        try:
            got = {
                r.user_id: (r.t_view, r.t_click, r.t_purchase, r.n_steps)
                for r in Q.QUERIES["q100_event_funnel"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        want = {}
        for user, evs in by_user.items():
            views = [ts for ts, et in evs if et == "view"]
            if not views:
                continue
            tv = min(views)
            clicks = [
                ts for ts, et in evs
                if et == "click" and tv < ts <= tv + H24
            ]
            tc = min(clicks) if clicks else None
            tp = None
            if tc is not None:
                purchases = [
                    ts for ts, et in evs
                    if et == "purchase" and tc < ts <= tc + H24
                ]
                tp = min(purchases) if purchases else None
            want[user] = (
                tv, tc, tp, 1 + (tc is not None) + (tp is not None)
            )
        assert got == want, f"trial {trial}"


def test_anchor_topk_random_crossvalidation(spark):
    """Seeded-random cross-validation for q101: random messy-whitespace
    corpora against a Python mirror of the mod-7 link convention, the
    md5 host route, and the per-host (n desc, anchor asc) top-3."""
    import hashlib
    import random
    import re

    import crab_spark.queries as Q

    rng = random.Random(1011)
    vocab = ["red", "blue", "green", "tan", "jet", "sky", "oak"]
    seps = [" ", "  ", "\n", "\t"]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(10, 60)):
            if rng.random() < 0.08:
                rows.append((i, None))
                continue
            words = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
            rows.append(
                (i, "".join(w + rng.choice(seps) for w in words))
            )
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {
                (r.host, r.rnk): (r.anchor, r.n)
                for r in Q.QUERIES["q101_anchor_topk"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        counts = {}
        for _, txt in rows:
            arr = re.sub(r"\s+", " ", (txt or "").lower()).split(" ")
            for i, w in enumerate(arr):
                if i % 7 == 5 and w != "" and arr[i - 1] != "":
                    h = int(
                        hashlib.md5(f"t|{w}".encode()).hexdigest()[:2], 16
                    ) % 64
                    key = (h, arr[i - 1])
                    counts[key] = counts.get(key, 0) + 1
        want = {}
        by_host = {}
        for (h, anchor), n in counts.items():
            by_host.setdefault(h, []).append((-n, anchor))
        for h, lst in by_host.items():
            for rnk, (neg_n, anchor) in enumerate(sorted(lst)[:3], 1):
                want[(h, rnk)] = (anchor, -neg_n)
        assert got == want, f"trial {trial}"


def test_host_degrees_random_crossvalidation(spark):
    """Seeded-random cross-validation for q103: random corpora (NULL
    ids and texts included) against a Python mirror of the host_edges
    md5 routing and both degree aggregations over the full 64-host
    domain."""
    import hashlib
    import random

    import crab_spark.queries as Q

    rng = random.Random(1031)
    for trial in range(3):
        rows = []
        for i in range(rng.randint(15, 120)):
            did = None if rng.random() < 0.05 else rng.randrange(10**6)
            txt = (
                None if rng.random() < 0.05
                else "Doc " + str(rng.randrange(20))
            )
            rows.append((did, txt))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {
                r.host: (r.out_deg, r.out_links, r.in_deg, r.in_links)
                for r in Q.QUERIES["q103_host_degrees"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        def route(salt, s):
            return int(
                hashlib.md5((salt + s).encode()).hexdigest()[:2], 16
            ) % 64

        edges = {}
        for did, txt in rows:
            src = route("h|", "" if did is None else str(did))
            dst = route("d|", "" if txt is None else txt.lower())
            edges[(src, dst)] = edges.get((src, dst), 0) + 1
        want = {h: [0, 0, 0, 0] for h in range(64)}
        for (src, dst), w in edges.items():
            want[src][0] += 1
            want[src][1] += w
            want[dst][2] += 1
            want[dst][3] += w
        assert got == {h: tuple(m) for h, m in want.items()}, (
            f"trial {trial}"
        )
        assert len(got) == 64


def test_length_histogram_random_crossvalidation(spark):
    """Seeded-random cross-validation for q99: random corpora (NULL
    texts, whitespace-only texts, NULL sources) against a Python
    mirror of the q30 token count and the bit-length log2 bucket."""
    import random
    import re

    import crab_spark.queries as Q

    rng = random.Random(991)
    for trial in range(3):
        rows = []
        for i in range(rng.randint(10, 150)):
            src = rng.choice(["a", "b", None])
            r = rng.random()
            if r < 0.08:
                txt = None
            elif r < 0.16:
                txt = rng.choice(["", " ", "  \n\t "])
            else:
                txt = " ".join("w" for _ in range(rng.randint(1, 600)))
            rows.append((i, src, txt))
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {
                (r.source, r.log2_bucket): r.n_docs
                for r in Q.QUERIES["q99_length_histogram"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        want = {}
        for _, src, txt in rows:
            if txt is None:
                b = 0
            else:
                n = len(re.sub(r"\s+", " ", txt).split(" "))
                b = n.bit_length()
            want[(src, b)] = want.get((src, b), 0) + 1
        assert got == want, f"trial {trial}"


def test_hopping_window_random_crossvalidation(spark):
    """Seeded-random cross-validation for q102: random odd-second
    event times against a Python mirror of the 1h/30min covering-window
    assignment (UTC epoch grid). Values are dyadic multiples of 0.25 so
    both engines' sums are exact regardless of addition order."""
    import random
    from datetime import datetime, timedelta, timezone

    import crab_spark.queries as Q

    rng = random.Random(1021)
    for trial in range(3):
        rows = []
        for eid in range(rng.randint(5, 80)):
            sec = rng.randrange(0, 20_000)  # odd seconds, ~5.5 h span
            ts = datetime(2024, 6, 1, 0, 0, 0) + timedelta(seconds=sec)
            val = rng.choice([0.25, 0.5, 1.75, 2.0, -0.75])
            rows.append((eid, ts, 1, "view", val, "{}"))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: ev
        try:
            got = {
                r.win_start: (r.n, r.sum_value)
                for r in Q.QUERIES["q102_hopping_window"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        agg = {}
        for _, ts, _, _, val, _ in rows:
            e = int(ts.replace(tzinfo=timezone.utc).timestamp())
            w0 = (e // 1800) * 1800
            for s in (w0, w0 - 1800):
                n, sv = agg.get(s, (0, 0.0))
                agg[s] = (n + 1, sv + val)
        want = {
            datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None):
            (n, round(sv, 4))
            for s, (n, sv) in agg.items()
        }
        assert got == want, f"trial {trial}"
        assert sum(n for n, _ in got.values()) == 2 * len(rows)


def test_skew_report_random_crossvalidation(spark):
    """Seeded-random cross-validation for q96: random corpora with a
    planted hot key per dimension against a Python mirror of all five
    dimension derivations and the (n desc, key asc) top-5 cut."""
    import hashlib
    import random

    import crab_spark.queries as Q

    rng = random.Random(961)
    for trial in range(3):
        rows = []
        for i in range(rng.randint(30, 150)):
            did = None if rng.random() < 0.04 else rng.randrange(10**5)
            rows.append((
                did,
                rng.choice(["cc", "wiki", "code", None]),
                rng.choice(["en", "de", None]),
                rng.choice([None, "", "hot text", f"t{rng.randrange(9)}"]),
                rng.choice([None, 0, 100, 300, 4000]),
            ))
        docs = spark.createDataFrame(
            rows,
            "doc_id long, source string, lang string, text string, "
            "n_chars long",
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {
                (r.dimension, r.key): (r.n, r.pct)
                for r in Q.QUERIES["q96_skew_report"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        def md5hex(s):
            return hashlib.md5(s.encode()).hexdigest()

        tot = len(rows)
        want = {}
        for dim in ("source", "lang", "content_md5", "host_bucket",
                    "len_bucket"):
            counts = {}
            for did, src, lang, txt, nc in rows:
                if dim == "source":
                    k = src or ""
                elif dim == "lang":
                    k = lang or ""
                elif dim == "content_md5":
                    k = md5hex(txt or "")
                elif dim == "host_bucket":
                    s = "" if did is None else str(did)
                    k = str(int(md5hex("h|" + s)[:2], 16) % 64)
                else:
                    k = str((nc or 0) // 256)
                counts[k] = counts.get(k, 0) + 1
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
            for k, n in top:
                want[(dim, k)] = (n, round(n / tot, 6))
        assert got == want, f"trial {trial}"


def test_cms_heavy_hitters_random_crossvalidation(spark):
    """Seeded-random cross-validation for the count-min sketch: on
    random corpora the reported (word, exact_cnt, cms_cnt) triples —
    including every collision overcount — must equal a full Python
    replay of the 4×256 md5 sketch."""
    import hashlib
    import random

    from crab_spark.operators import sketches as SK2

    rng = random.Random(931)
    vocab = [f"w{i}" for i in range(60)] + ["heavy"]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(20, 80)):
            words = ["heavy"] * rng.randint(0, 4) + [
                rng.choice(vocab) for _ in range(rng.randint(0, 10))
            ]
            rng.shuffle(words)
            txt = None if rng.random() < 0.05 else " ".join(words)
            rows.append((i, txt))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        thr = rng.choice([2, 5, 20])
        got = {
            r.word: (r.exact_cnt, r.cms_cnt)
            for r in SK2.cms_heavy_hitters(docs, threshold=thr).collect()
        }

        exact = {}
        for _, txt in rows:
            if txt is None:
                continue
            import re
            for w in re.sub(r"\s+", " ", txt.lower()).split(" "):
                if w:
                    exact[w] = exact.get(w, 0) + 1
        sketch = {}
        for w, n in exact.items():
            for j in range(4):
                c = int(
                    hashlib.md5(f"{j}|{w}".encode()).hexdigest()[:2], 16
                )
                sketch[(j, c)] = sketch.get((j, c), 0) + n
        want = {}
        for w, n in exact.items():
            est = min(
                sketch[(j, int(
                    hashlib.md5(f"{j}|{w}".encode()).hexdigest()[:2], 16
                ))]
                for j in range(4)
            )
            if est >= thr:
                want[w] = (n, est)
        assert got == want, f"trial {trial} thr {thr}"
        assert all(c >= n for n, c in got.values())


def test_hll_distinct_random_crossvalidation(spark):
    """Seeded-random cross-validation for the HLL sketch: per-group
    estimates on random corpora (NULL sources and texts included) must
    equal a full Python replay of the md5 register math — buckets,
    rho, harmonic sum, small-range correction, 4 dp round."""
    import hashlib
    import math
    import random
    import re

    from crab_spark.operators import sketches as SK2

    rng = random.Random(901)
    vocab = [f"tok{i}" for i in range(400)]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(20, 90)):
            src = rng.choice(["a", "b", None])
            txt = (
                None if rng.random() < 0.05
                else " ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(0, 40))
                )
            )
            rows.append((i, src, txt))
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        got = {
            r.source: r.est_distinct
            for r in SK2.hll_distinct(docs).collect()
        }

        regs = {}
        for _, src, txt in rows:
            if txt is None:
                continue
            for w in re.sub(r"\s+", " ", txt.lower()).split(" "):
                if not w:
                    continue
                h32 = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                b, v = h32 % 64, h32 // 64
                rho = 27 - v.bit_length() if v > 0 else 27
                key = (src, b)
                regs[key] = max(regs.get(key, -1), rho)
        want = {}
        groups = {src for src, _ in regs}
        for src in groups:
            mx = {b: r for (s, b), r in regs.items() if s == src}
            s = sum(2.0 ** -r for r in mx.values()) + (64 - len(mx))
            z = 64 - len(mx)
            raw = float("0.7093409548395029") * 4096.0 / s
            est = (
                64.0 * math.log(64.0 / z) if (raw <= 160.0 and z > 0)
                else raw
            )
            want[src] = round(est, 4)
        assert got == want, f"trial {trial}"


def test_bloom_audit_random_crossvalidation(spark):
    """Seeded-random cross-validation for the Bloom membership audit:
    on random disjoint build/probe sets the false-positive count must
    equal a full Python replay of the m=4096/k=3 md5 bitset."""
    import hashlib
    import random

    from crab_spark.operators import sketches as SK2

    rng = random.Random(941)
    for trial in range(3):
        n_build = rng.randint(50, 600)
        n_probe = rng.randint(50, 400)
        build_keys = [f"b{u}" for u in rng.sample(range(10**6), n_build)]
        probe_keys = [f"p{u}" for u in rng.sample(range(10**6), n_probe)]
        build = spark.createDataFrame(
            [(k,) for k in build_keys], "key string"
        )
        probe = spark.createDataFrame(
            [(k,) for k in probe_keys], "key string"
        )
        row = SK2.bloom_audit(build, probe).collect()[0]

        def bits(k):
            return [
                int(
                    hashlib.md5(f"{i}|{k}".encode()).hexdigest()[:4], 16
                ) % 4096
                for i in range(3)
            ]

        bitset = {b for k in build_keys for b in bits(k)}
        fp = sum(1 for k in probe_keys if all(b in bitset for b in bits(k)))
        assert (row.n_build, row.n_probe, row.n_false_pos) == (
            n_build, n_probe, fp
        ), f"trial {trial}"
        assert row.fp_rate == round(fp / n_probe, 6)


def test_hll_overlap_random_crossvalidation(spark):
    """Seeded-random cross-validation for q97: pairwise overlap
    estimates on random corpora must equal a Python replay of the
    register algebra — dense rho, union-by-max, inclusion-exclusion on
    the 4 dp-rounded estimates."""
    import hashlib
    import math
    import random

    from crab_spark.operators import sketches as SK2

    rng = random.Random(971)
    vocab = [f"v{i}" for i in range(300)]
    for trial in range(3):
        rows = []
        for i in range(rng.randint(30, 90)):
            src = rng.choice(["a", "b", "c", None])
            txt = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 30))
            )
            rows.append((i, src, txt))
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        got = {
            (r.src_a, r.src_b): (
                r.est_a, r.est_b, r.est_union, r.est_intersect
            )
            for r in SK2.hll_pair_overlap(docs).collect()
        }

        regs = {}
        for _, src, txt in rows:
            if src is None:
                continue
            for w in txt.split(" "):
                h32 = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                b, v = h32 % 64, h32 // 64
                rho = 27 - v.bit_length() if v > 0 else 27
                key = (src, b)
                regs[key] = max(regs.get(key, 0), rho)

        def est(rhos):
            s = sum(2.0 ** -rhos.get(b, 0) for b in range(64))
            z = sum(1 for b in range(64) if rhos.get(b, 0) == 0)
            raw = float("0.7093409548395029") * 4096.0 / s
            e = (
                64.0 * math.log(64.0 / z) if (raw <= 160.0 and z > 0)
                else raw
            )
            return round(e, 4)

        srcs = sorted({s for s, _ in regs})
        want = {}
        for i, sa in enumerate(srcs):
            for sb in srcs[i + 1:]:
                ra = {b: r for (s, b), r in regs.items() if s == sa}
                rb = {b: r for (s, b), r in regs.items() if s == sb}
                ru = {
                    b: max(ra.get(b, 0), rb.get(b, 0)) for b in range(64)
                }
                ea, eb, eu = est(ra), est(rb), est(ru)
                want[(sa, sb)] = (ea, eb, eu, round(ea + eb - eu, 4))
        assert got == want, f"trial {trial}"


def test_host_communities_random_crossvalidation(spark):
    """Seeded-random cross-validation for q98: random corpora (small
    id/text pools so repeated (src, dst) edges cross the weight-2
    threshold) against a Python union-find over the mirrored strong
    edges; all 64 hosts labeled, min-id labels."""
    import hashlib
    import random

    import crab_spark.queries as Q

    rng = random.Random(981)
    for trial in range(3):
        ids = rng.sample(range(10**5), 12)
        texts = [f"page {i}" for i in range(8)]
        rows = [
            (rng.choice(ids), rng.choice(texts))
            for _ in range(rng.randint(20, 120))
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        orig_t = Q.t
        Q.t = lambda sp, sf, name: docs
        try:
            got = {
                r.host: r.cluster_id
                for r in Q.QUERIES["q98_host_communities"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        def route(salt, s):
            return int(
                hashlib.md5((salt + s).encode()).hexdigest()[:2], 16
            ) % 64

        edges = {}
        for did, txt in rows:
            e = (route("h|", str(did)), route("d|", txt.lower()))
            edges[e] = edges.get(e, 0) + 1
        parent = list(range(64))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for (a, b), w in edges.items():
            if w >= 2:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comp = {}
        for h in range(64):
            comp.setdefault(find(h), []).append(h)
        want = {}
        for members in comp.values():
            lab = min(members)
            for h in members:
                want[h] = lab
        assert got == want, f"trial {trial}"
        assert len(got) == 64


def test_hll_windowed_random_crossvalidation(spark):
    """Seeded-random cross-validation for q95: per-window distinct-user
    HLL estimates on random event logs (NULL timestamps and users
    included) against the Python register replay over the 1 h tumbling
    grid."""
    import hashlib
    import math
    import random
    from datetime import datetime, timedelta, timezone

    import crab_spark.queries as Q

    rng = random.Random(951)
    base = datetime(2024, 7, 1, 0, 0, 0)
    for trial in range(3):
        rows = []
        for eid in range(rng.randint(20, 120)):
            ts = (
                None if rng.random() < 0.05
                else base + timedelta(seconds=rng.randrange(0, 10_000))
            )
            uid = None if rng.random() < 0.05 else rng.randrange(30)
            rows.append((eid, ts, uid, "view", 0.0, "{}"))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        orig_t = Q.t
        Q.t = lambda sp, sf, name: ev
        try:
            got = {
                r.win_start: (r.exact_distinct, r.est_distinct, r.rel_err)
                for r in Q.QUERIES["q95_hll_windowed"](spark, "x")
                .collect()
            }
        finally:
            Q.t = orig_t

        keys = set()
        for _, ts, uid, _, _, _ in rows:
            if ts is None:
                continue  # window(NULL ts) emits no row
            e = int(ts.replace(tzinfo=timezone.utc).timestamp())
            win = datetime.fromtimestamp(
                (e // 3600) * 3600, tz=timezone.utc
            ).replace(tzinfo=None)
            keys.add((win, "" if uid is None else str(uid)))
        want = {}
        wins = {w for w, _ in keys}
        for win in wins:
            regs = {}
            ks = [k for w, k in keys if w == win]
            for k in ks:
                h32 = int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
                b, v = h32 % 64, h32 // 64
                rho = 27 - v.bit_length() if v > 0 else 27
                regs[b] = max(regs.get(b, -1), rho)
            s = sum(2.0 ** -r for r in regs.values()) + (64 - len(regs))
            z = 64 - len(regs)
            raw = float("0.7093409548395029") * 4096.0 / s
            est = round(
                64.0 * math.log(64.0 / z) if (raw <= 160.0 and z > 0)
                else raw,
                4,
            )
            exact = len(ks)
            want[win] = (exact, est, round(abs(est - exact) / exact, 4))
        assert got == want, f"trial {trial}"


def test_phash_pairs_random_crossvalidation(spark):
    """Seeded-random cross-validation for the media phash banding:
    random payload pools (clones planted by reuse) against a Python
    replay of the 48-bit md5 phash, 4×12-bit banding, whole-bucket cap
    drop, and the hamming≤3 verify."""
    import hashlib
    import random

    from crab_spark.operators import multimodal as M2

    rng = random.Random(921)
    for trial in range(3):
        payloads = [
            bytes(rng.randrange(256) for _ in range(8)) for _ in range(10)
        ]
        rows = []
        for i in range(rng.randint(15, 60)):
            rows.append((
                f"m:{i}",
                str(i),
                rng.choice(["image", "audio"]),
                rng.choice(payloads),
                "application/octet-stream",
                8,
            ))
        media = spark.createDataFrame(
            rows,
            ["media_id", "doc_id", "kind", "payload", "mime", "n_bytes"],
        )
        cap = rng.choice([2, 5, 200])
        out = M2.media_phash_pairs(media, max_bucket=cap)
        got = {
            (r.id_a, r.id_b, r.kind): r.hamming for r in out.collect()
        }

        sigs = {
            (mid, kind, int(hashlib.md5(p).hexdigest()[:12], 16))
            for mid, _, kind, p, _, _ in rows
        }
        keyed = []
        buckets = {}
        for mid, kind, ph in sigs:
            for b in range(4):
                bk = (kind, b, (ph >> (b * 12)) & 0xFFF)
                keyed.append((mid, kind, ph, bk))
                buckets[bk] = buckets.get(bk, 0) + 1
        live = [k for k in keyed if buckets[k[3]] <= cap]
        want = {}
        for i, (ma, ka, pa, bka) in enumerate(live):
            for mb, kb, pb, bkb in live[i + 1:]:
                if bka != bkb or ma == mb:
                    continue
                lo, hi = min(ma, mb), max(ma, mb)
                h = bin(pa ^ pb).count("1")
                if h <= 3:
                    want[(lo, hi, ka)] = h
        assert got == want, f"trial {trial} cap {cap}"
