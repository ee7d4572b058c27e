"""robots / proxy / report / html-conversion tests.

Proxy tests mirror the reference unit suite (proxy.rs:148-189):
list parsing and the saturating −2..=2 counter."""

from __future__ import annotations

from pyspark.sql import functions as F

from crab_spark import corpus as C
from crab_spark import report
from crab_spark.crawler import CorpusFetcher, crawl
from crab_spark.frontier import seed_frontier
from crab_spark.functions.html import html_to_spans
from crab_spark.parsers import data as parser_data
from crab_spark.parsers import listing as parser_listing
from crab_spark.parsers import load_registry
from crab_spark.proxy import ProxyPool
from crab_spark.robots import filter_allowed, parse_robots_txt, robots_table
from crab_spark.schemas import SEEDS
from crab_spark.util import local_df, ordered_index


# -- proxy (proxy.rs:148-189 semantics) --------------------------------------

def test_proxy_list_parsing():
    pool = ProxyPool.from_lines("http://p1:8080\n\n  http://p2:8080  \n")
    assert pool.urls == ["http://p1:8080", "http://p2:8080"]


def test_proxy_saturating_counter():
    pool = ProxyPool(["a", "b"])
    for _ in range(5):
        pool.failed(0)
    assert pool.stats[0].alive_counter == -2 and pool.stats[0].dead
    pool.succeeded(0)
    assert pool.stats[0].alive_counter == -1 and not pool.stats[0].dead
    for _ in range(10):
        pool.succeeded(0)
    assert pool.stats[0].alive_counter == 2  # saturated up
    assert pool.stats[0].requests == 16
    assert pool.stats[0].successful_requests == 11


def test_proxy_selection_avoids_dead():
    pool = ProxyPool(["a", "b", "c"])
    for _ in range(2):
        pool.failed(1)
    picks = {pool.next()[1] for _ in range(50)}
    assert 1 not in picks and picks <= {0, 2}
    # all dead → random over all (proxy.rs:97-109)
    for i in (0, 2):
        for _ in range(2):
            pool.failed(i)
    picks = {pool.next()[1] for _ in range(50)}
    assert picks == {0, 1, 2}


def test_proxy_fold_epoch_outcomes(spark):
    import pyspark.sql.types as T

    pool = ProxyPool(["a", "b"])
    outcomes = local_df(
        spark,
        [(0, True), (0, True), (1, False), (1, False), (1, False)],
        T.StructType([T.StructField("proxy_id", T.IntegerType()),
                      T.StructField("ok", T.BooleanType())]),
    )
    pool.fold_epoch_outcomes(outcomes)
    assert pool.stats[0].alive_counter == 2
    assert pool.stats[1].alive_counter == -2 and pool.stats[1].dead


def test_proxy_fold_mixed_outcomes_pins_semantics(spark):
    """Pin the successes-then-failures epoch fold for a MIXED-outcome
    proxy: endpoint = max(-2, min(2, c + n_ok) - n_fail). This is the
    O(1) closed form of the saturating unit walk, and the documented
    divergence point from the reference's per-request interleave
    (proxy.rs:116-122)."""
    import pyspark.sql.types as T

    pool = ProxyPool(["a"])
    pool.stats[0].alive_counter = 1
    # 3 successes + 2 failures in one epoch: min(2, 1+3)=2, then 2-2=0
    outcomes = local_df(
        spark,
        [(0, True), (0, True), (0, True), (0, False), (0, False)],
        T.StructType([T.StructField("proxy_id", T.IntegerType()),
                      T.StructField("ok", T.BooleanType())]),
    )
    pool.fold_epoch_outcomes(outcomes)
    s = pool.stats[0]
    assert s.alive_counter == 0 and not s.dead
    assert s.requests == 5 and s.successful_requests == 3
    # out-of-range proxy ids are ignored, not an IndexError
    bad = local_df(
        spark, [(7, True)],
        T.StructType([T.StructField("proxy_id", T.IntegerType()),
                      T.StructField("ok", T.BooleanType())]),
    )
    pool.fold_epoch_outcomes(bad)
    assert s.requests == 5


# -- robots -------------------------------------------------------------------

def test_parse_robots_txt():
    body = """
    # comment
    User-agent: googlebot
    Disallow: /google-only

    User-agent: *
    Disallow: /private
    Disallow: /tmp
    """
    got = parse_robots_txt(body)
    assert got["rules"] == [(False, "/private"), (False, "/tmp")]
    assert got["crawl_delay"] is None
    assert parse_robots_txt("User-agent: *\nDisallow:")["rules"] == []


def test_parse_robots_allow_groups_and_delay():
    """RFC 9309: Allow lines, merged groups (every group whose UA set
    contains * contributes), stacked User-agent lines, Crawl-delay."""
    body = """
    User-agent: googlebot
    User-agent: *
    Allow: /public/
    Disallow: /

    User-agent: bingbot
    Disallow: /bing-only

    User-agent: *
    Disallow: /tmp/
    Crawl-delay: 2.5
    """
    got = parse_robots_txt(body)
    assert got["rules"] == [
        (True, "/public/"), (False, "/"), (False, "/tmp/")
    ]
    assert got["crawl_delay"] == 2.5


def test_parse_robots_named_agent_groups():
    """RFC 9309 §2.2.1 named-agent selection: the crawler's product
    token picks the most specific matching UA group (longest prefix,
    exact match included); all groups carrying the winning value merge;
    no named match ⇒ the * groups apply."""
    body = """
    User-agent: googlebot-news
    Disallow: /news-only
    Crawl-delay: 7

    User-agent: googlebot
    Disallow: /google-only

    User-agent: *
    Disallow: /private
    Crawl-delay: 2

    User-agent: googlebot-news
    Allow: /news-ok
    """
    # exact token: both googlebot-news groups merge, * excluded
    got = parse_robots_txt(body, agent="googlebot-news")
    assert got["rules"] == [(False, "/news-only"), (True, "/news-ok")]
    assert got["crawl_delay"] == 7.0
    # prefix (de-facto most-specific): googlebot-image falls to googlebot
    got = parse_robots_txt(body, agent="Googlebot-Image")
    assert got["rules"] == [(False, "/google-only")]
    assert got["crawl_delay"] is None
    # unknown token ⇒ * group
    got = parse_robots_txt(body, agent="crabbot")
    assert got["rules"] == [(False, "/private")]
    assert got["crawl_delay"] == 2.0
    # default agent is * — legacy behavior unchanged
    assert parse_robots_txt(body)["rules"] == [(False, "/private")]
    # longest prefix beats shorter: googlebot-newsfeed → googlebot-news
    got = parse_robots_txt(body, agent="googlebot-newsfeed")
    assert got["rules"] == [(False, "/news-only"), (True, "/news-ok")]
    # named group does NOT inherit * rules (RFC: the matched group only)
    assert (False, "/private") not in parse_robots_txt(
        body, agent="googlebot")["rules"]


def test_robots_longest_match_wins():
    """RFC 9309 §2.2.2 precedence: most octets wins; Allow wins an
    exact-length tie; * and $ pattern forms; no match ⇒ allowed."""
    from crab_spark.robots import _compile_rules, rules_allow

    # the RFC's own example group: allow /foo/bar carved out of /foo
    c = _compile_rules([(False, "/foo"), (True, "/foo/bar")])
    assert not rules_allow("/foo/baz", c)
    assert rules_allow("/foo/bar/page", c)
    assert rules_allow("/other", c)

    # exact-length tie → Allow (RFC: least restrictive rule)
    c = _compile_rules([(False, "/page"), (True, "/page")])
    assert rules_allow("/page", c)

    # wildcard + end anchor
    c = _compile_rules([(False, "/*.php$"), (True, "/allowed.php$")])
    assert not rules_allow("/x/y.php", c)
    assert rules_allow("/x/y.php?q=1", c)  # $ anchors: query breaks the match
    assert rules_allow("/allowed.php", c)
    c = _compile_rules([(False, "/fish*.html")])
    assert not rules_allow("/fish/sole.html", c)
    assert rules_allow("/fish/sole.htm", c)


def test_filter_allowed(spark):
    import pyspark.sql.types as T

    batch = local_df(
        spark,
        [("http://h1/private/x", "h1"), ("http://h1/ok", "h1"),
         ("http://h2/private/x", "h2")],
        T.StructType([T.StructField("url", T.StringType()),
                      T.StructField("host", T.StringType())]),
    )
    robots = robots_table(spark, {"h1": ["/private"]})
    got = {r["url"] for r in filter_allowed(batch, robots).collect()}
    # h1/private blocked; h2 not in cache → allowed
    assert got == {"http://h1/ok", "http://h2/private/x"}


def test_filter_allowed_rfc_allow_carveout(spark):
    """Allow carve-outs + wildcard rules evaluated through the
    broadcast-join + Arrow UDF path (the dispatch-gate shape)."""
    import pyspark.sql.types as T

    batch = local_df(
        spark,
        [("http://h1/public/a", "h1"), ("http://h1/secret", "h1"),
         ("http://h2/x/run.php", "h2"), ("http://h2/x/run.phpx", "h2")],
        T.StructType([T.StructField("url", T.StringType()),
                      T.StructField("host", T.StringType())]),
    )
    robots = robots_table(spark, {
        "h1": {"disallow": ["/"], "allow": ["/public/"]},
        "h2": {"disallow": ["/*.php$"]},
    })
    got = {r["url"] for r in filter_allowed(batch, robots).collect()}
    assert got == {"http://h1/public/a", "http://h2/x/run.phpx"}


def test_crawl_delay_reaches_fetcher_token_bucket(spark):
    """A robots Crawl-delay rides the dispatch rows into the fetch task
    and widens the per-host token bucket: fetching n rows of that host
    takes at least n × crawl_delay even with delay_sec=0."""
    import time as _t

    import pyspark.sql.types as T

    from crab_spark.crawler import CorpusFetcher
    from crab_spark.robots import with_robots_flag
    from crab_spark.schemas import SPAN

    urls = [f"http://slow/{i}" for i in range(4)]
    corpus = spark.createDataFrame(
        [(u, [("text", "x", "", 0)]) for u in urls],
        T.StructType([T.StructField("url", T.StringType()),
                      T.StructField("spans", T.ArrayType(SPAN))]),
    )
    batch = local_df(
        spark,
        [(hash(u) & 0x7FFFFFFF, u, "slow", 1, 0, 0, i + 1) for i, u in enumerate(urls)],
        T.StructType([
            T.StructField("url_hash", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("type_id", T.IntegerType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField("part", T.IntegerType()),
            T.StructField("pos", T.LongType()),
        ]),
    )
    robots = robots_table(spark, {"slow": {"disallow": [], "crawl_delay": 0.1}})
    dispatch = with_robots_flag(batch, robots).filter("robots_ok").drop("robots_ok")
    assert "crawl_delay" in dispatch.columns
    fetcher = CorpusFetcher(corpus, delay_sec=0.0)
    t0 = _t.monotonic()
    rows = fetcher.fetch(dispatch).collect()
    wall = _t.monotonic() - t0
    assert len(rows) == 4 and all(r["ok"] for r in rows)
    assert wall >= 0.4  # 4 rows × 0.1 s Crawl-delay, sleeps are a floor
    assert fetcher.side_effects  # crawl() must pin these results


# -- html → spans --------------------------------------------------------------

def test_html_to_spans_fixture_page():
    """The reference test-server page HTML (test-server.py:26-39) converts
    to spans whose link order matches the span corpus convention."""
    html = ("<html><body><p>Page number 3</p><ul>"
            "<li><a href='/data/30'>Data 30</a></li></ul>"
            "<section class='pager'><a href='/page/2'>Page 2</a></section>"
            "<img src='/img/3.png'></body></html>")
    spans = html_to_spans(html)
    kinds = [(s["kind"], s["text"] or s["media_ref"]) for s in spans]
    assert ("link", "/data/30") in kinds
    assert ("link", "/page/2") in kinds
    assert ("media", "/img/3.png") in kinds
    assert kinds[0] == ("text", "Page number 3")
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs)


def test_html_to_spans_class_marking():
    spans = html_to_spans("<p>Data for <span class='input'>7</span> is "
                          "<span class='output'>49</span></p>")
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert "input=7" in texts and "output=49" in texts


def test_html_to_spans_malformed():
    # unclosed tag: link captured AND trailing text salvaged
    got = html_to_spans("<a href='/x'>ok")
    assert [(s["kind"], s["text"]) for s in got] == [("link", "/x"), ("text", "ok")]
    assert html_to_spans("") == []


def test_html_void_elements_do_not_leak_class_stack():
    """Regression (r2 verdict): <img>/<br>/... never get an end tag, so
    pushing them on the class stack shifted every later pop — text
    following a classed sibling inherited the WRONG class= prefix.
    North-star invariant: span text must be stable on real-web HTML."""
    html = ("<div class='nav'><img src='/logo.png'><br></div>"
            "<p>plain after closed div</p>"
            "<span class='input'>7</span><img src='/i.png'> tail")
    texts = [s["text"] for s in html_to_spans(html) if s["kind"] == "text"]
    # the div closed: 'plain' must NOT carry class=nav; the tail after a
    # void <img> must NOT carry class=input
    assert "plain after closed div" in texts
    assert "input=7" in texts
    assert "tail" in texts
    # self-closing form and stray end tags are equally safe
    t2 = [s["text"] for s in
          html_to_spans("<img/><p class='x'>a</p></p></div>b") if s["kind"] == "text"]
    assert t2 == ["x=a", "b"]


# -- ordered_index -------------------------------------------------------------

def test_ordered_index_matches_global_sort(spark):
    import pyspark.sql.types as T

    rows = [((i * 37) % 101, i) for i in range(101)]
    df = local_df(spark, rows, T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.IntegerType())]))
    out = ordered_index(df, ["k"], "idx", start=5, num_partitions=7)
    got = {r["k"]: r["idx"] for r in out.collect()}
    want = {k: 5 + rank for rank, (k, _) in enumerate(sorted(rows))}
    assert got == want
    out.df_ordered_cache.unpersist()


# -- fan_out (r6 serial-scan spread) ------------------------------------------

def test_fan_out_spreads_narrow_input_and_reuses_exchange(spark):
    """A below-parallelism input (the single-row-group parquet case) is
    repartitioned to the cluster's default parallelism, and the
    by-column form hash-partitions so a downstream groupBy on the same
    key reuses that one exchange (no second shuffle)."""
    from crab_spark.plans import formatted_plan
    from crab_spark.util import fan_out

    n = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).toDF("id").coalesce(1)
    out = fan_out(narrow, "id")
    assert out.rdd.getNumPartitions() == n
    # content unchanged
    assert out.count() == 1000
    agg = out.groupBy("id").count()
    plan = formatted_plan(agg)
    # exactly ONE shuffle: the fan-out exchange, reused by the groupBy
    # (count the numbered operator detail headers, e.g. "(3) Exchange")
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    assert n_exchanges == 1, plan


def test_fan_out_noop_on_already_parallel_input(spark):
    """At or above the cluster's parallelism (the real-scale case:
    thousands of input splits) fan_out returns the frame UNTOUCHED —
    no exchange is added."""
    from crab_spark.util import fan_out

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).toDF("id").repartition(n)
    assert fan_out(wide, "id") is wide
    assert fan_out(wide) is wide


def test_crawl_on_empty_store_completes(spark, store):
    """No registered pages ⇒ empty first refill ⇒ done (crawler.rs:61-67)."""
    registry = load_registry([parser_listing, parser_data])
    stats = crawl(store, CorpusFetcher(C.corpus_df(spark, 3)), registry)
    assert stats.epochs == 0 and stats.requests == 0


def test_broadcast_join_in_plan(spark, sf_dir):
    """q10 contract: the small dimension side broadcasts (no shuffle of
    the fact table on the join key)."""
    from crab_spark.queries import QUERIES

    df = QUERIES["q10_broadcast_join"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


# -- reports -------------------------------------------------------------------

def test_reports_after_crawl(spark, store):
    registry = load_registry([parser_listing, parser_data])
    seed_frontier(store, local_df(spark, [(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store, CorpusFetcher(C.corpus_df(spark, 6)), registry, batch_size=50)

    rep = report.crawl_report(store)
    assert rep["requests"] == rep["successful"] > 0
    assert rep["pending"] == 0
    assert rep["frontier_size"] == rep["requests"]

    pages = report.list_pages(store, limit=10).collect()
    assert pages[0]["url"] == C.page_url(1)
    assert all(p["status_name"] == "Downloaded" for p in pages)

    ts = report.epoch_timeseries(store).collect()
    assert sum(r["requests"] for r in ts) == rep["requests"]

    one = report.page_row(store, C.page_url(2)).collect()
    assert len(one) == 1 and one[0]["depth"] == 1
    spans = report.dump_content(store, C.data_url(10)).collect()[0]["spans"]
    assert any("input=10" == s["text"] for s in spans)


def test_hot_host_salting_spreads_partitions(spark):
    """north_rule skew contract: ONE hot host must not serialize an
    epoch. The fetchers' salted-host repartition has to spread a
    single-host batch over HOST_SALT distinct partitions so politeness
    sleeps overlap across executor slots."""
    from crab_spark.crawler import HOST_SALT, CorpusFetcher

    corpus = spark.createDataFrame(
        [(f"http://hot/{i}", [{"kind": "text", "text": "x", "media_ref": "",
                               "offset": 0}]) for i in range(200)],
        "url string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    batch = spark.createDataFrame(
        [(i * 7919, f"http://hot/{i}", "hot", 1, 0, 0, i + 1) for i in range(200)],
        "url_hash long, url string, host string, type_id int, depth int, part int, pos long",
    )
    fetched = CorpusFetcher(corpus, delay_sec=0.001).fetch(batch)
    # count distinct physical partitions the hot host's rows land in
    n_parts = (
        fetched.select(F.spark_partition_id().alias("pid"))
        .distinct().count()
    )
    assert n_parts >= min(HOST_SALT, 4) - 1  # ≥3 of 4 salt groups populated
    assert fetched.count() == 200


def test_robots_from_bodies_roundtrip(spark):
    """robots.txt refresh flow: bodies → vectorized parse → cache table
    → dispatch filter, end to end."""
    from crab_spark.robots import ROBOTS_BODY, robots_from_bodies, with_robots_flag

    bodies = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"),
         ("b.com", "User-agent: bot\nDisallow: /\n"),   # other agent: ignored
         ("c.com", None)],                               # unreachable: allow
        ROBOTS_BODY,
    )
    robots = robots_from_bodies(bodies, epoch=3)
    got = {r["host"]: [(x["allow"], x["pattern"]) for x in r["rules"]]
           for r in robots.collect()}
    assert got == {"a.com": [(False, "/private/"), (False, "/tmp")],
                   "b.com": [], "c.com": []}

    batch = spark.createDataFrame(
        [("http://a.com/private/x", "a.com"), ("http://a.com/ok", "a.com"),
         ("http://b.com/anything", "b.com"), ("http://c.com/x", "c.com")],
        "url string, host string",
    )
    flags = {r["url"]: r["robots_ok"] for r in with_robots_flag(batch, robots).collect()}
    assert flags == {"http://a.com/private/x": False, "http://a.com/ok": True,
                     "http://b.com/anything": True, "http://c.com/x": True}


def test_robots_from_bodies_named_agent(spark):
    """agent= plumbs through the vectorized parse: a configured crawler
    UA picks its own group (crawl-delay included) and ignores *."""
    from crab_spark.robots import ROBOTS_BODY, robots_from_bodies

    body = ("User-agent: crabbot\nDisallow: /crab-only\nCrawl-delay: 9\n\n"
            "User-agent: *\nDisallow: /private\n")
    bodies = spark.createDataFrame(
        [("a.com", body), ("b.com", "User-agent: *\nDisallow: /x\n")],
        ROBOTS_BODY,
    )
    got = {r["host"]: ([(x["allow"], x["pattern"]) for x in r["rules"]],
                       r["crawl_delay"])
           for r in robots_from_bodies(bodies, agent="crabbot").collect()}
    assert got["a.com"] == ([(False, "/crab-only")], 9.0)
    assert got["b.com"] == ([(False, "/x")], None)  # falls back to *
    # default agent stays on legacy * behavior
    star = {r["host"]: [(x["allow"], x["pattern"]) for x in r["rules"]]
            for r in robots_from_bodies(bodies).collect()}
    assert star["a.com"] == [(False, "/private")]


def test_fetch_robots_http_via_file_urls(spark, tmp_path):
    """The distributed robots.txt refresh driven end-to-end: urllib
    serves file:// hosts through the same opener machinery as http."""
    from crab_spark.robots import fetch_robots_http, robots_from_bodies

    site_a = tmp_path / "a"; site_a.mkdir()
    (site_a / "robots.txt").write_text("User-agent: *\nDisallow: /private/\n")
    site_b = tmp_path / "b"; site_b.mkdir()  # no robots.txt → unreachable
    hosts = spark.createDataFrame(
        [(str(site_a),), (str(site_b),)], "host string"
    )
    bodies = fetch_robots_http(hosts, scheme="file", timeout=2)
    robots = robots_from_bodies(bodies, epoch=1)
    got = {r["host"]: [(x["allow"], x["pattern"]) for x in r["rules"]]
           for r in robots.collect()}
    assert got[str(site_a)] == [(False, "/private/")]
    assert got[str(site_b)] == []  # fetch failure ⇒ allow-all


def test_query_registry_fully_oracled():
    """Driver contract: every queries() entry has an oracle_sql() twin
    (the correctness gate compares them side-by-side), and names follow
    the qNN_* convention the registry's sorted-globals discovery keys on."""
    from crab_spark.queries import ORACLE_SQL, QUERIES

    assert set(QUERIES) == set(ORACLE_SQL)
    assert len(QUERIES) >= 54
    for name in QUERIES:
        digits = name[1:].split("_", 1)[0]
        assert (
            name[0] == "q"
            and len(digits) >= 2
            and digits.isdigit()
            and "_" in name[1:]
        ), name


def test_proxy_fold_closed_form_matches_sequential_fuzz():
    """The fold's O(1) closed form — max(floor, min(cap, c+k) − m) for
    k saturating +1s then m saturating −1s — vs the literal unit loop,
    fuzzed over the whole (counter, k, m) lattice the crawl can reach.
    The fixed-outcome tests above pin the documented
    successes-then-failures semantics; this pins the arithmetic
    identity the per-epoch fold rides on."""
    import random

    from crab_spark.proxy import ALIVE_MAX, ALIVE_MIN

    rng = random.Random(6343)
    for _ in range(500):
        c = rng.randint(ALIVE_MIN, ALIVE_MAX)
        k = rng.randint(0, 30)
        m = rng.randint(0, 30)
        seq = c
        for _ in range(k):
            seq = min(ALIVE_MAX, seq + 1)
        for _ in range(m):
            seq = max(ALIVE_MIN, seq - 1)
        closed = max(ALIVE_MIN, min(ALIVE_MAX, c + k) - m)
        assert closed == seq, (c, k, m)
