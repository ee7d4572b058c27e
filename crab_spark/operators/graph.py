"""Link-graph analytics over the crawl corpus: a fixed-point-integer
PageRank for host-level crawl prioritization.

Why this operator: web crawlers rank HOSTS (not pages) to decide
frontier priority and politeness budget — CommonCrawl publishes
exactly this host-graph centrality, and crab's priority frontier
(reference crawler.rs dequeue ordering; our frontier.py priority mode)
is the consumer. The host graph is tiny relative to the page corpus
(millions of hosts from billions of pages), so the scale shape is:
one heavy edge-aggregation pass over the docs, then cheap iterations
over the aggregated (src, dst, weight) table.

Why FIXED-POINT INTEGER arithmetic: a float PageRank's per-host sums
depend on addition order, which Spark does not guarantee across
partitionings — the same query could hash-mismatch its own rerun, let
alone the DuckDB oracle. Ranks here are integer micro-units
(SCALE = 10^12) and every damping/out-degree step is a staged integer
floor-division — associative, order-independent, bit-exact in any
engine. The floor truncation leaks ≤ 1 unit per edge per iteration
(bounded dust, documented), which is far below any ranking-relevant
difference.

Overflow bound: contributions compute ``(85·r div 100) · w div W``
with r ≤ SCALE=10^12, so the intermediate fits int64 while
w ≤ 9·10^5. Beyond that (host pairs with >900k observed links),
pre-scale the weights: PageRank only uses w/W ratios, so dividing
both by a constant preserves the result — the operator does this
automatically when max(w) exceeds the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..util import fan_out

PR_SCALE = 10**12
_W_CAP = 9 * 10**5  # keeps (85·SCALE div 100)·w inside int64


def host_edges(
    docs: DataFrame,
    n_hosts: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic host-level edge list (src, dst, w) from the
    corpus: src = md5-route of the doc id, dst = md5-route of the
    doc's normalized text (a link target proxy — identical content
    links the same place). In a real crawl these come from the parsed
    link spans (crawler.py navigate output); the md5 derivation stands
    in because the sandbox documents table carries no link column, and
    it gives the oracle the exact same graph. NULLs take the q46
    convention (coalesce to '') so no NULL vertex group exists."""
    did = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    txt = F.coalesce(F.lower(F.col(text_col)), F.lit(""))
    src = (F.conv(F.substring(F.md5(F.concat(F.lit("h|"), did)), 1, 2), 16, 10)
           .cast("int") % n_hosts)
    dst = (F.conv(F.substring(F.md5(F.concat(F.lit("d|"), txt)), 1, 2), 16, 10)
           .cast("int") % n_hosts)
    # fan_out: two md5s per row fuse into the scan (no-op at scale)
    return (
        fan_out(docs.select(id_col, text_col))
        .select(src.alias("src"), dst.alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank_fixed(
    spark: SparkSession,
    edges: DataFrame,
    n_hosts: int = 64,
    iters: int = 4,
) -> DataFrame:
    """``iters`` rounds of damped (0.85) PageRank in integer
    micro-units: (host, rank_fp), sum(rank_fp) ≈ PR_SCALE minus floor
    dust. Dangling hosts' mass is redistributed uniformly, matching
    the standard formulation.

    Plan shape per iteration: edges (cached once — the multi-consumer
    relation) join rank (n_hosts rows) → groupBy(dst) sum. At millions
    of hosts the same plan holds with AQE choosing shuffle-hash
    instead of broadcast; the docs-scale work happened once in
    host_edges. The rank frame is localCheckpoint-ed at each
    iteration top (the connected_components lineage rule,
    operators/dedup.py): every iteration consumes rank TWICE
    (contributions + dangling mass), so without truncation the plan
    would double per iteration — the same multi-consumer re-execution
    failure the round-5 explode sweep hunted, in iterative form.
    Dangling hosts are computed once, statically, from the edge list.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # cache the RAW edges before the overflow probe: the probe's
    # max(w) action then materializes the cache, so the docs-scale
    # edge aggregation runs exactly once — probing first would pay an
    # extra full upstream pass
    edges = edges.cache()
    w_max = edges.agg(F.max("w")).first()[0]
    if w_max is not None and w_max > _W_CAP:
        # ratio-preserving rescale, floor keeps ≥1 so edges never vanish
        div = -(-w_max // _W_CAP)  # ceil
        scaled = edges.select(
            "src", "dst", F.greatest(F.expr(f"w div {div}"), F.lit(1)).alias("w")
        )
    else:
        scaled = edges
    out_w = scaled.groupBy("src").agg(F.sum("w").alias("w_out"))
    # derived per-iteration from the cached edges — host-pair scale
    edges_w = scaled.join(out_w, "src")

    hosts = spark.range(n_hosts).select(F.col("id").cast("int").alias("host"))
    teleport = (15 * PR_SCALE) // 100 // n_hosts
    # dangling hosts depend only on the edge list — compute once
    dang_hosts = hosts.join(
        edges_w.select(F.col("src").alias("host")).distinct(),
        "host",
        "left_anti",
    )
    rank = hosts.select("host", F.lit(PR_SCALE // n_hosts).alias("r"))

    for _ in range(iters):
        # O(1) lineage per iteration; n_hosts rows, trivially cheap
        rank = rank.localCheckpoint(eager=True)
        dang = (
            rank.join(F.broadcast(dang_hosts), "host", "leftsemi")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("d"))
            .select(F.expr(f"((85 * d) div 100) div {n_hosts}").alias("dang_share"))
        )
        contrib = (
            rank.join(edges_w, rank["host"] == edges_w["src"])
            .select(
                F.col("dst"),
                F.expr("((85 * r) div 100) * w div w_out").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c_in"))
        )
        rank = (
            hosts.join(contrib, hosts["host"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                (
                    F.lit(teleport)
                    + F.col("dang_share")
                    + F.coalesce(F.col("c_in"), F.lit(0))
                ).alias("r"),
            )
        )

    out = rank.select("host", F.col("r").alias("rank_fp"))
    out.df_ordered_cache = edges  # caller-unpersist handle (repo convention)
    return out


def redirect_map(spark: SparkSession, n_nodes: int = 256) -> DataFrame:
    """Deterministic redirect table over an integer node domain:
    (node, nxt, done, hops). Node 0 and every node whose md5 coin
    ``hexbyte(md5('r|' || node))`` is ≡ 0 (mod 4) answer 200 (terminal:
    nxt = node, hops = 0); every other node 301-redirects 1–3 ids DOWN
    (``max(node − (1 + coin % 3), 0)``) — strictly decreasing, so the
    graph is acyclic by construction and every chain terminates. The
    md5 derivation is the fixture convention shared with the DuckDB
    oracle (q104/q105 precedent); in a real crawl this table is the
    fetched log's (url, location) redirect pairs at URL scale."""
    u = F.col("id").cast("int")
    coin = (
        F.conv(F.substring(F.md5(F.concat(F.lit("r|"), u.cast("string"))), 1, 2), 16, 10)
        .cast("int")
    )
    term = (u == 0) | (coin % 4 == 0)
    nxt = F.when(term, u).otherwise(F.greatest(u - (1 + coin % 3), F.lit(0)))
    return spark.range(n_nodes).select(
        u.alias("node"),
        nxt.cast("int").alias("nxt"),
        term.alias("done"),
        # hops is LONG: unresolved (cyclic) rows DOUBLE their hop count
        # every doubling round, so int32 would overflow at round 31 —
        # long gives 63 rounds of headroom, beyond any max_rounds here
        F.when(term, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("hops"),
    )


def resolve_redirects(
    spark: SparkSession, n_nodes: int = 256, max_rounds: int = 12
) -> DataFrame:
    """Resolve every node's redirect chain to its terminal target by
    POINTER DOUBLING: after round k each unresolved row has advanced
    2^k hops, so L-step chains finish in ceil(log2 L) rounds — the
    O(log n) MapReduce shape (the connected-components discipline,
    operators/dedup.py), never a per-step walk whose round count is the
    longest chain. Returns (node, final, hops) with ``final`` terminal
    and ``hops`` the exact chain length.

    Plan shape per round: the mapping self-joins on (nxt = node) — at
    sandbox scale (256 rows) a broadcast, at URL scale a shuffle-hash
    join on the node key, both fine — and is localCheckpoint-ed so
    lineage stays O(1) per round (each round consumes the previous
    mapping TWICE: probe side + build side — the multi-consumer
    re-execution trap in iterative form). The done-check is a 1-row
    driver action per round, ≤ ceil(log2 n_nodes) + 1 rounds total."""
    m = _pointer_double(redirect_map(spark, n_nodes), max_rounds)
    n_bad = m.where(~F.col("done")).count()
    if n_bad:
        raise RuntimeError(
            f"redirect resolution did not converge: {n_bad} nodes "
            f"unresolved after {max_rounds} doubling rounds"
        )
    return m.select("node", F.col("nxt").alias("final"), "hops")


def _pointer_double(m: DataFrame, max_rounds: int) -> DataFrame:
    """The shared doubling core: advance every unresolved row 2^k hops
    per round until all are done or rounds run out. Input/output
    contract: (node, nxt, done, hops) with a COMPLETE universe (every
    nxt value has its own node row — resolve_mapping constructs one,
    redirect_map is one by construction), so the self-join stays inner.
    Rows still not-done at exit sit on a cycle (or a chain longer than
    2^max_rounds); callers decide whether to raise or flag.

    Early exit: with a complete universe every chain occupies
    CONSECUTIVE distances-to-terminal (each hop node is its own row),
    so while any eventually-done row remains, every round resolves at
    least the closest one — an UNCHANGED unresolved count means the
    survivors all sit on (or drain into) cycles and no further round
    can help. That turns the all-cycles case from max_rounds self-joins
    into ~2, at the cost of count() instead of isEmpty() per round."""
    m = m.localCheckpoint(eager=True)
    prev_pending = None
    for _ in range(max_rounds):
        pending = m.where(~F.col("done")).count()
        if pending == 0 or pending == prev_pending:
            break
        prev_pending = pending
        succ = m.select(
            F.col("node").alias("s_node"),
            F.col("nxt").alias("s_nxt"),
            F.col("done").alias("s_done"),
            F.col("hops").alias("s_hops"),
        )
        m = (
            m.join(succ, m["nxt"] == succ["s_node"])
            .select(
                "node",
                F.when(F.col("done"), F.col("nxt"))
                .otherwise(F.col("s_nxt"))
                .alias("nxt"),
                (F.col("done") | F.col("s_done")).alias("done"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.col("s_hops"))
                .alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    return m


def resolve_mapping(
    redirects: DataFrame,
    nodes: DataFrame | None = None,
    node_col: str = "node",
    next_col: str = "nxt",
    max_rounds: int = 40,
) -> DataFrame:
    """PRODUCTION-shaped resolver: takes a raw redirect log — (url,
    location) pairs, exactly what the fetched log's 301 rows carry —
    and resolves every node to (node, final, hops, resolved) by the
    same pointer-doubling core q107 uses. Nodes absent from the
    redirect side are terminals (a 200 is a URL with no location row).
    Real redirect graphs have CYCLES (A→B→A misconfigurations, and
    self-redirects); anything on or draining into a cycle comes back
    ``resolved = False`` with NULL final/hops — flagged, never
    silently wrong or non-terminating (the no-silent-caps discipline).
    max_rounds=40 bounds work at 2^40 hops, beyond any real chain.

    Duplicate redirect rows for one node resolve first-wins by min
    location (deterministic); pass ``nodes`` to widen the universe to
    URLs seen nowhere in the log."""
    r = (
        redirects.select(
            F.col(node_col).alias("node"), F.col(next_col).alias("nxt")
        )
        .groupBy("node")
        .agg(F.min("nxt").alias("nxt"))
    )
    universe = r.select("node").unionByName(
        r.select(F.col("nxt").alias("node"))
    )
    if nodes is not None:
        universe = universe.unionByName(
            nodes.select(F.col(node_col).alias("node"))
        )
    m0 = (
        universe.distinct()
        .join(r, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("nxt"), F.col("node")).alias("nxt"),
            F.col("nxt").isNull().alias("done"),
            # long, not int: cycle rows double hops per round (see
            # redirect_map) and 40 rounds would overflow int32
            F.when(F.col("nxt").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("hops"),
        )
    )
    m = _pointer_double(m0, max_rounds)
    return m.select(
        "node",
        F.when(F.col("done"), F.col("nxt")).alias("final"),
        F.when(F.col("done"), F.col("hops")).alias("hops"),
        F.col("done").alias("resolved"),
    )
