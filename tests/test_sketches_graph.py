"""Value + plan tests for the deterministic-sketch operators
(operators/sketches.py), fixed-point PageRank (operators/graph.py) and
media phash near-dup (operators/multimodal.py) — the parity suite
(test_oracle_parity) covers engine↔DuckDB agreement; this module pins
the sketch/graph SEMANTICS (accuracy bounds, merge idempotence, no
false negatives, mass conservation, exact Python mirror) and the scale
contracts (broadcast sketch, no cartesian)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crab_spark.operators import graph as G
from crab_spark.operators import multimodal as M
from crab_spark.operators import sketches as SK
from crab_spark.plans import assert_broadcast_join, assert_no_cartesian


@pytest.fixture(scope="module")
def vocab_docs(spark):
    """40 docs over a known 1,000-word vocabulary, every word used at
    least once, word 'hot' planted 120 times."""
    rows = []
    vocab = [f"w{i:04d}" for i in range(1000)]
    for d in range(40):
        words = vocab[d * 25:(d + 1) * 25] + ["hot"] * 3
        rows.append((d, " ".join(words), "s1" if d % 2 else "s2"))
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_register_bounds(spark, vocab_docs):
    regs = SK.hll_registers(vocab_docs).collect()
    assert regs
    for r in regs:
        assert 0 <= r.bucket < 64
        assert 1 <= r.max_rho <= 27


def test_hll_estimate_within_expected_error(spark, vocab_docs):
    # corpus-wide: 1001 distinct words; HLL(p=6) standard error is
    # 1.04/sqrt(64) = 13% — assert a generous 3-sigma band
    est = SK.hll_distinct(
        vocab_docs.withColumn("source", F.lit("all"))
    ).collect()[0]
    assert est.est_distinct == pytest.approx(1001, rel=0.4)


def test_hll_duplication_invariant(spark, vocab_docs):
    """The sketch property that makes it a sketch: feeding every word
    twice (union the corpus with itself) changes NO register, so the
    estimate is identical — duplicates are free, which is why the
    shuffle carries registers instead of a distinct over tokens."""
    once = SK.hll_distinct(vocab_docs).collect()
    twice = SK.hll_distinct(vocab_docs.unionByName(vocab_docs)).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts(spark, vocab_docs):
    """CMS structural guarantee: the estimate is an upper bound on the
    exact count for EVERY word (threshold 0 returns the whole vocab)."""
    out = SK.cms_heavy_hitters(vocab_docs, threshold=0).collect()
    assert len(out) == 1001
    assert all(r.cms_cnt >= r.exact_cnt for r in out)


def test_cms_heavy_hitter_found_and_thresholded(spark, vocab_docs):
    out = {r.word: r for r in SK.cms_heavy_hitters(vocab_docs, 100).collect()}
    assert "hot" in out and out["hot"].exact_cnt == 120
    # singleton words (exact 1) can only appear via collisions INTO a
    # heavy cell; their exact count must expose the overcount
    for r in out.values():
        if r.word != "hot":
            assert r.cms_cnt >= 100 > r.exact_cnt


def test_cms_sketch_is_broadcast(spark, vocab_docs):
    hh = SK.cms_heavy_hitters(vocab_docs, 100)
    assert_broadcast_join(hh)
    assert_no_cartesian(hh)


# ---------------------------------------------------------------------------
# Bloom audit
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def keys(spark):
    build = spark.createDataFrame(
        [(f"url://a/{i}",) for i in range(250)], ["key"]
    )
    probe = spark.createDataFrame(
        [(f"url://b/{i}",) for i in range(400)], ["key"]
    )
    return build, probe


def test_bloom_no_false_negatives(spark, keys):
    """Probing the build set itself: every key must be positive (the
    Bloom guarantee the frontier prefilter relies on — a false
    negative would silently re-register a seen URL)."""
    build, _ = keys
    row = SK.bloom_audit(build, build).collect()[0]
    assert row.n_false_pos == row.n_probe == row.n_build == 250


def test_bloom_fp_rate_small_on_disjoint_probes(spark, keys):
    build, probe = keys
    row = SK.bloom_audit(build, probe).collect()[0]
    # theory: (1 - e^(-k·n/m))^k ≈ 0.5% at n=250, m=4096, k=3
    assert row.n_build == 250 and row.n_probe == 400
    assert row.fp_rate < 0.05
    assert row.fp_rate == pytest.approx(row.n_false_pos / 400, abs=1e-6)


def test_bloom_bitset_is_broadcast(spark, keys):
    build, probe = keys
    assert_broadcast_join(SK.bloom_audit(build, probe))


# ---------------------------------------------------------------------------
# Fixed-point PageRank
# ---------------------------------------------------------------------------


def _python_pagerank(edges, n_hosts, iters):
    """Bit-exact mirror of pagerank_fixed: staged integer floor
    division, same order of operations."""
    from collections import defaultdict

    w_out = defaultdict(int)
    for s, _, w in edges:
        w_out[s] += w
    r = {h: G.PR_SCALE // n_hosts for h in range(n_hosts)}
    tele = (15 * G.PR_SCALE) // 100 // n_hosts
    for _ in range(iters):
        dang = sum(r[h] for h in range(n_hosts) if h not in w_out)
        dang_share = ((85 * dang) // 100) // n_hosts
        c_in = defaultdict(int)
        for s, d, w in edges:
            c_in[d] += ((85 * r[s]) // 100) * w // w_out[s]
        r = {h: tele + dang_share + c_in[h] for h in range(n_hosts)}
    return r


def test_pagerank_matches_python_mirror_exactly(spark, vocab_docs):
    edges_df = G.host_edges(vocab_docs, n_hosts=16)
    edges = [(r.src, r.dst, r.w) for r in edges_df.collect()]
    out = G.pagerank_fixed(spark, edges_df, n_hosts=16, iters=4)
    got = {r.host: r.rank_fp for r in out.collect()}
    out.df_ordered_cache.unpersist()
    want = _python_pagerank(edges, 16, 4)
    assert got == want


def test_pagerank_mass_conserved_and_dangling_handled(spark):
    # hosts 0..3; host 3 has NO out-edges (dangling) — its mass must
    # redistribute, not vanish beyond floor dust
    edges = spark.createDataFrame(
        [(0, 1, 2), (1, 2, 1), (2, 3, 1), (2, 0, 3)], ["src", "dst", "w"]
    )
    out = G.pagerank_fixed(spark, edges, n_hosts=4, iters=4)
    ranks = {r.host: r.rank_fp for r in out.collect()}
    out.df_ordered_cache.unpersist()
    total = sum(ranks.values())
    assert G.PR_SCALE - 10**6 <= total <= G.PR_SCALE
    # host 3 only RECEIVES (from 2) — still ranked, and host 0 (fed by
    # the heaviest edge) outranks the teleport floor
    tele = (15 * G.PR_SCALE) // 100 // 4
    assert all(v >= tele for v in ranks.values())


def test_pagerank_uniform_on_symmetric_graph(spark):
    # complete 4-host digraph with equal weights: uniform rank is the
    # fixed point, so every iteration must preserve equality
    edges = spark.createDataFrame(
        [(s, d, 1) for s in range(4) for d in range(4)], ["src", "dst", "w"]
    )
    out = G.pagerank_fixed(spark, edges, n_hosts=4, iters=3)
    ranks = [r.rank_fp for r in out.collect()]
    out.df_ordered_cache.unpersist()
    assert len(set(ranks)) == 1


# ---------------------------------------------------------------------------
# Media phash near-dup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m:1", "1", "image", b"payload-one", "application/octet-stream", 11),
        ("m:2", "2", "image", b"payload-one", "application/octet-stream", 11),
        ("m:3", "3", "audio", b"payload-one", "application/octet-stream", 11),
        ("m:4", "4", "image", b"payload-two", "application/octet-stream", 11),
    ]
    return spark.createDataFrame(
        rows, ["media_id", "doc_id", "kind", "payload", "mime", "n_bytes"]
    )


def test_phash_matches_payload_md5_prefix(spark, media):
    sig = {r.media_id: r.phash48 for r in M.media_phash(media).collect()}
    want = int(hashlib.md5(b"payload-one").hexdigest()[:12], 16)
    assert sig["m:1"] == sig["m:2"] == want


def test_phash_pairs_planted_and_intra_kind(spark, media):
    pairs = M.media_phash_pairs(media).collect()
    got = {(r.id_a, r.id_b): (r.kind, r.hamming) for r in pairs}
    # identical payload, same kind → hamming-0 pair
    assert got == {("m:1", "m:2"): ("image", 0)}
    # m:3 shares the payload but is audio — never paired across kinds


def test_phash_bucket_cap_drops_and_reports(spark, media):
    out = M.media_phash_pairs(media, max_bucket=1)
    assert out.count() == 0  # the duplicate bucket (size 2) was dropped
    dropped = out.dropped_buckets.collect()
    assert dropped and all(d.n == 2 for d in dropped)
    assert_no_cartesian(out)


# ---------------------------------------------------------------------------
# HLL overlap algebra + skew report
# ---------------------------------------------------------------------------


def test_hll_overlap_tracks_true_intersection(spark):
    """Two sources sharing exactly half a 600-word vocabulary: the
    register-algebra intersection estimate must land near 300 and the
    union near 900 (13% HLL error, generous 3-sigma bands); a third
    source with a disjoint vocabulary must show near-zero overlap with
    both."""
    va = [f"a{i}" for i in range(300)]
    sh = [f"s{i}" for i in range(300)]
    vc = [f"c{i}" for i in range(300)]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(va[i * 10:(i + 1) * 10] + sh[i * 10:(i + 1) * 10]), "A"))
        rows.append((100 + i, " ".join(sh[i * 10:(i + 1) * 10]), "B"))
        rows.append((200 + i, " ".join(vc[i * 10:(i + 1) * 10]), "C"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {(r.src_a, r.src_b): r for r in SK.hll_pair_overlap(docs).collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab.est_a == pytest.approx(600, rel=0.4)
    assert ab.est_b == pytest.approx(300, rel=0.4)
    assert ab.est_union == pytest.approx(600, rel=0.4)
    assert ab.est_intersect == pytest.approx(300, rel=0.6)
    # disjoint pairs: intersection estimate is noise around zero,
    # far below the true set sizes
    for pair in [("A", "C"), ("B", "C")]:
        assert abs(out[pair].est_intersect) < 150
        assert out[pair].est_union == pytest.approx(
            out[pair].est_a + out[pair].est_b, rel=0.3
        )


def test_skew_report_finds_planted_hot_key(spark):
    """A boilerplate page duplicated 50× must top the content_md5
    dimension with its exact count and share."""
    from crab_spark.queries import QUERIES

    rows = [(i, "the same cookie banner text", "de", "web", 27) for i in range(50)]
    rows += [(100 + i, f"unique text number {i}", "en", "web", 20) for i in range(50)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    import crab_spark.queries as Q

    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs  # the report only reads documents
    try:
        out = QUERIES["q96_skew_report"](spark, "ignored")
        rep = [r for r in out.collect() if r.dimension == "content_md5"]
    finally:
        Q.t = orig_t
    top = max(rep, key=lambda r: r.n)
    assert top.n == 50 and top.pct == 0.5
    # lang dimension: 'de' and 'en' both at 50
    langs = {r.key: r.n for r in out.collect() if r.dimension == "lang"}
    assert langs == {"de": 50, "en": 50}


def test_host_communities_respect_weight_threshold(spark):
    """q98 semantics: a src→dst link observed twice merges the hosts;
    a single observation is pruned as noise; untouched hosts stay
    self-labeled."""
    import crab_spark.queries as Q

    # host_edges keys src on md5('h|'||doc_id) and dst on
    # md5('d|'||lower(text)) — find doc_ids/texts landing on distinct
    # hosts, then duplicate one link and leave another single
    import hashlib

    def src_of(i):
        return hashlib.md5(f"h|{i}".encode()).digest()[0] % 64

    def dst_of(t):
        return hashlib.md5(f"d|{t}".encode()).digest()[0] % 64

    # pick ids/texts by their ACTUAL host routes: two ids sharing a
    # src host (the doubled edge), one id on a different host (the
    # single edge), dst texts on hosts distinct from all of those
    by_src = {}
    for i in range(400):
        by_src.setdefault(src_of(i), []).append(i)
    hs, (a1, a2, *_) = next(
        (h, v) for h, v in sorted(by_src.items()) if len(v) >= 2
    )
    hb, (b, *_) = next((h, v) for h, v in sorted(by_src.items()) if h != hs)
    ta = next(
        f"t{k}" for k in range(2000) if dst_of(f"t{k}") not in (hs, hb)
    )
    hta = dst_of(ta)
    tb = next(
        f"u{k}" for k in range(2000)
        if dst_of(f"u{k}") not in (hs, hb, hta)
    )
    htb = dst_of(tb)
    rows = [(a1, ta), (a2, ta), (b, tb)]  # hs→hta twice, hb→htb once
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        out = {r.host: r.cluster_id for r in
               Q.QUERIES["q98_host_communities"](spark, "ignored").collect()}
    finally:
        Q.t = orig_t
    assert len(out) == 64
    # the doubled link merges its two hosts
    assert out[hs] == out[hta] == min(hs, hta)
    # the single link is below the threshold: both self-labeled
    assert out[hb] == hb and out[htb] == htb
    # an untouched host is its own community
    untouched = next(h for h in range(64) if h not in (hs, hta, hb, htb))
    assert out[untouched] == untouched


def test_cms_token_stream_explodes_once(spark, vocab_docs):
    """The sketch cells and the candidate keys both derive from the
    CACHED per-word counts — the executed plan must read
    InMemoryTableScan for both consumers instead of re-exploding the
    token stream (the r5 multi-consumer rule, applied at design time
    to the sketch family)."""
    out = SK.cms_heavy_hitters(vocab_docs, 100)
    out.collect()
    ep = out._jdf.queryExecution().executedPlan().toString()
    try:
        assert ep.count("InMemoryTableScan") >= 2, ep
        assert ep.count("Explode") <= 3, ep  # 1 token + 2 tiny j-explodes
    finally:
        out.df_ordered_cache.unpersist()


def test_hll_overlap_registers_cached(spark, vocab_docs):
    """hll_pair_overlap's register table feeds the source list AND the
    dense join: both must read the cache, not re-run the corpus
    explode."""
    out = SK.hll_pair_overlap(vocab_docs)
    out.collect()
    ep = out._jdf.queryExecution().executedPlan().toString()
    try:
        assert ep.count("InMemoryTableScan") >= 2, ep
    finally:
        out.df_ordered_cache.unpersist()


# ---------------------------------------------------------------------------
# redirect resolution (q107)
# ---------------------------------------------------------------------------


def _redirect_mirror(n):
    """Python walk of the deterministic redirect fixture."""
    def coin(u):
        return int(hashlib.md5(f"r|{u}".encode()).hexdigest()[:2], 16)

    fin, hp = {}, {}
    for u in range(n):
        cur, h = u, 0
        while not (cur == 0 or coin(cur) % 4 == 0):
            cur = max(cur - (1 + coin(cur) % 3), 0)
            h += 1
        fin[u], hp[u] = cur, h
    return fin, hp


def test_resolve_redirects_matches_python_walk(spark):
    """Pointer doubling must land every node on the SAME terminal with
    the SAME exact hop count as a step-by-step walk — doubling is an
    execution strategy, not a semantics change."""
    out = {r.node: (r.final, r.hops)
           for r in G.resolve_redirects(spark, n_nodes=256).collect()}
    fin, hp = _redirect_mirror(256)
    assert len(out) == 256
    assert out == {u: (fin[u], hp[u]) for u in range(256)}
    # the fixture is non-trivial: multi-hop chains exist, node 0 is the
    # floor terminal, and every final is itself terminal (self-mapped)
    assert max(h for _, h in out.values()) >= 2
    assert out[0] == (0, 0)
    assert all(out[f] == (f, 0) for f, _ in out.values())


def test_q107_collapsed_mass_python_mirror(spark):
    """q107 aggregates per canonical target exactly: n_urls, distinct
    start nodes, and the longest chain among the collapsing URLs."""
    import crab_spark.queries as Q

    docs = spark.createDataFrame(
        [(i, "t", "s") for i in range(150)],
        "doc_id long, text string, source string",
    )
    orig_t = Q.t
    Q.t = lambda sp, sf, name: docs
    try:
        rows = Q.QUERIES["q107_redirect_resolve"](spark, "x").collect()
    finally:
        Q.t = orig_t

    fin, hp = _redirect_mirror(256)
    agg = {}
    for i in range(150):
        s = int(hashlib.md5(f"u|{i}".encode()).hexdigest()[:2], 16) % 256
        f = fin[s]
        a = agg.setdefault(f, [0, set(), 0])
        a[0] += 1
        a[1].add(s)
        a[2] = max(a[2], hp[s])
    assert {r.final: (r.n_urls, r.n_starts, r.max_hops) for r in rows} == {
        f: (a[0], len(a[1]), a[2]) for f, a in agg.items()
    }
    assert sum(r.n_urls for r in rows) == 150  # mass conservation


def test_q107_resolved_map_broadcasts(spark):
    """Scale contract: the ≤256-row resolved map broadcasts to the
    docs-scale start nodes — the corpus side never shuffles to meet
    the redirect table."""
    import crab_spark.queries as Q

    df = Q.QUERIES["q107_redirect_resolve"](spark, "/root/testdata/sf0.001")
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_resolve_redirects_other_domain_size(spark):
    """The resolver is size-generic: a 64-node domain resolves to the
    same fixpoints as the Python walk (the 256 test pins the default;
    this pins that nothing hard-codes the domain size)."""
    out = {r.node: (r.final, r.hops)
           for r in G.resolve_redirects(spark, n_nodes=64).collect()}
    fin, hp = _redirect_mirror(64)
    assert out == {u: (fin[u], hp[u]) for u in range(64)}


def test_resolve_mapping_chains_cycles_and_terminals(spark):
    """The production-shaped resolver: raw (url, location) pairs —
    chains resolve with exact hop counts, terminals are URLs with no
    location row, and anything ON or DRAINING INTO a redirect cycle
    (incl. self-redirects) comes back resolved=False with NULL
    final/hops instead of wrong answers or a hang."""
    pairs = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"),          # chain a→b→c, c terminal
            ("x", "y"), ("y", "x"),          # 2-cycle
            ("t", "x"),                      # tail draining into it
            ("s", "s"),                      # self-redirect
        ],
        "node string, nxt string",
    )
    out = {r.node: (r.final, r.hops, r.resolved)
           for r in G.resolve_mapping(pairs).collect()}
    assert out["a"] == ("c", 2, True)
    assert out["b"] == ("c", 1, True)
    assert out["c"] == ("c", 0, True)
    for cyc in ("x", "y", "t", "s"):
        assert out[cyc] == (None, None, False), cyc


def test_resolve_mapping_matches_fixture_resolver(spark):
    """Feeding redirect_map's edge pairs through the general resolver
    reproduces resolve_redirects exactly (all resolved — the fixture
    is acyclic by construction)."""
    mfix = G.redirect_map(spark, 64)
    pairs = mfix.where(~F.col("done")).select("node", "nxt")
    nodes = mfix.select("node")
    got = {r.node: (r.final, r.hops)
           for r in G.resolve_mapping(pairs, nodes=nodes).collect()}
    want = {r.node: (r.final, r.hops)
            for r in G.resolve_redirects(spark, n_nodes=64).collect()}
    assert got == want


def test_resolve_mapping_random_crossvalidation(spark):
    """Seeded-random cross-validation (the containment_pairs
    precedent): resolve_mapping on random functional graphs — cycles,
    self-loops, long chains, duplicate redirect rows — must equal an
    exact Python walk with cycle detection. This also exercises the
    early-exit soundness: trials where cycles and live chains coexist
    must still resolve every chain fully before the loop stops."""
    import random

    rng = random.Random(907)
    for trial in range(4):
        n = rng.randint(8, 20)
        names = [f"u{i}" for i in range(n)]
        pairs = []
        for u in names:
            if rng.random() < 0.75:  # 25% terminals
                pairs.append((u, rng.choice(names)))
                if rng.random() < 0.3:  # duplicate row, maybe different
                    pairs.append((u, rng.choice(names)))
        if not pairs:
            continue
        df = spark.createDataFrame(pairs, "node string, nxt string")
        got = {r.node: (r.final, r.hops, r.resolved)
               for r in G.resolve_mapping(df).collect()}

        # Python mirror: first-wins min-dedup, then walk with a
        # visited set; revisiting any node means cycle-involved.
        nxt = {}
        for u, v in pairs:
            nxt[u] = min(nxt[u], v) if u in nxt else v
        universe = set(nxt) | set(nxt.values())
        want = {}
        for u in universe:
            cur, hops, seen = u, 0, {u}
            while cur in nxt:
                cur = nxt[cur]
                hops += 1
                if cur in seen:
                    want[u] = (None, None, False)
                    break
                seen.add(cur)
            else:
                want[u] = (cur, hops, True)
        assert got == want, f"trial {trial}"
