"""Crawl-trap detection: template shapes, the explosion report, the
ROBOTS-schema rule emission, and the e2e guard through the existing
dispatch gate. Includes a seeded-random cross-validation of the
templating against a pure-Python mirror (the session-10 protocol)."""

from __future__ import annotations

import random
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F, types as T

from crab_spark import corpus as C
from crab_spark.crawler import CorpusFetcher, crawl
from crab_spark.frontier import seed_frontier
from crab_spark.parsers import load_registry
from crab_spark.parsers import data as parser_data
from crab_spark.parsers import listing as parser_listing
from crab_spark.schemas import ROBOTS, SEEDS
from crab_spark.traps import merge_robots, trap_report, trap_rules, url_template


def _templates(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["t"] for r in
            df.select(url_template("url").alias("t")).collect()]


# -- template unit cases -------------------------------------------------------

CASES = [
    ("http://h.test/cal/2024/01/31", "/cal/{n}/{n}/{n}"),
    ("http://h.test/page/7", "/page/{n}"),
    ("http://h.test/docs/intro", "/docs/intro"),
    ("http://h.test/", "/"),
    ("http://h.test", "/"),
    ("http://h.test/a/b/", "/a/b/"),
    # id-like: hex/uuid runs need a digit; plain hex words stay literal
    ("http://h.test/s/550e8400-e29b-41d4-a716-446655440000", "/s/{id}"),
    ("http://h.test/s/deadbeef", "/s/deadbeef"),
    # long tokens need a digit too
    ("http://h.test/t/c2Vzc2lvbjEyMzQ1Njc4OTA=", "/t/{t}"),
    ("http://h.test/t/configurationsetting", "/t/configurationsetting"),
    # query → sorted distinct key set, values dropped
    ("http://h.test/search?q=foo&page=2", "/search?page,q"),
    ("http://h.test/search?page=9&q=bar", "/search?page,q"),
    ("http://h.test/search?a=1&a=2", "/search?a"),
    ("http://h.test/search?flag", "/search?flag"),
]


def test_template_planted_cases(spark):
    got = _templates(spark, [u for u, _ in CASES])
    assert got == [t for _, t in CASES]


def test_template_random_mirror(spark):
    """Seeded-random cross-validation vs a pure-Python mirror of the
    templating spec (Spark split keeps trailing empties; query keys are
    sorted distinct; {n}/{id}/{t} precedence in that order)."""
    import re

    def mirror(url: str) -> str:
        parts = urlsplit(url)
        path = parts.path or "/"
        segs = []
        for s in path.split("/"):
            if re.fullmatch(r"[0-9]+", s):
                segs.append("{n}")
            elif re.fullmatch(r"[0-9a-fA-F-]{8,}", s) and re.search(r"[0-9]", s):
                segs.append("{id}")
            elif re.fullmatch(r"[A-Za-z0-9_=-]{16,}", s) and re.search(r"[0-9]", s):
                segs.append("{t}")
            else:
                segs.append(s)
        shaped = "/".join(segs)
        if not parts.query:
            return shaped
        keys = sorted({kv.split("=")[0] for kv in parts.query.split("&")})
        return shaped + "?" + ",".join(keys)

    seg_pool = ["docs", "a", "item42", "2024", "7", "deadbeef", "beef1234",
                "550e8400-e29b-41d4", "x" * 20, "tok3n" + "a" * 15, "intro",
                "0", "UPPER", "mixed-Case_1"]
    key_pool = ["q", "page", "sort", "session", "id"]
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        urls = []
        for _ in range(80):
            n = rng.randint(0, 4)
            path = "/" + "/".join(rng.choice(seg_pool) for _ in range(n))
            if rng.random() < 0.3:
                path += "/"
            url = f"http://h{rng.randint(1, 3)}.test{path}"
            if rng.random() < 0.5:
                ks = rng.sample(key_pool, rng.randint(1, 3))
                url += "?" + "&".join(
                    f"{k}={rng.randint(0, 99)}" if rng.random() < 0.8 else k
                    for k in ks)
            urls.append(url)
        assert _templates(spark, urls) == [mirror(u) for u in urls]


# -- report + rules -------------------------------------------------------------

def _frontier_like(spark, rows):
    return spark.createDataFrame(rows, "host string, url string")


def test_trap_report_flags_exploding_shape(spark):
    rows = [("cal.test", f"http://cal.test/cal/2024/{m:02d}/{d:02d}")
            for m in range(1, 13) for d in range(1, 21)]          # 240 URLs, one shape
    rows += [("cal.test", f"http://cal.test/about/{p}") for p in ("team", "jobs")]
    rows += [("ok.test", f"http://ok.test/page/{i}") for i in range(30)]
    rep = trap_report(_frontier_like(spark, rows), max_urls_per_template=100)
    got = {(r["host"], r["template"]): (r["n_urls"], r["n_host_urls"],
                                        float(r["host_share"]))
           for r in rep.collect()}
    assert got == {("cal.test", "/cal/{n}/{n}/{n}"): (240, 242, round(240 / 242, 4))}


def test_trap_rules_schema_and_patterns(spark):
    rows = [("s.test", f"http://s.test/view?session={i}&page={i % 3}")
            for i in range(50)]
    rows += [("s.test", f"http://s.test/cal/{i}") for i in range(50)]
    rep = trap_report(_frontier_like(spark, rows), max_urls_per_template=10)
    rules = trap_rules(rep, epoch=3)
    # type-shape parity with the dispatch gate's cache schema
    # (nullability flags differ on computed columns; the gate reads
    # columns + types)
    assert rules.schema.simpleString() == ROBOTS.simpleString()
    row = rules.collect()[0]
    assert row["host"] == "s.test" and row["fetched_epoch"] == 3
    assert row["crawl_delay"] is None
    pats = [(r["allow"], r["pattern"]) for r in row["rules"]]
    assert pats == [(False, "/cal/*"), (False, "/view?*")]


def test_merge_robots_concatenates_per_host(spark):
    from crab_spark.robots import robots_table

    base = robots_table(spark, {
        "s.test": {"disallow": ["/private"], "crawl_delay": 2.0},
        "other.test": {"disallow": ["/x"]},
    }, epoch=1)
    extra = spark.createDataFrame(
        [("s.test", [(False, "/cal/*")], None, 5)], ROBOTS)
    merged = {r["host"]: r for r in merge_robots(base, extra).collect()}
    assert set(merged) == {"s.test", "other.test"}
    s = merged["s.test"]
    assert sorted((r["allow"], r["pattern"]) for r in s["rules"]) == [
        (False, "/cal/*"), (False, "/private")]
    assert s["crawl_delay"] == 2.0 and s["fetched_epoch"] == 5
    assert merged["other.test"]["rules"][0]["pattern"] == "/x"


# -- e2e: the guard rides the existing robots dispatch gate ---------------------

def test_trap_guard_caps_dispatch_e2e(spark, store):
    """Crawl the fixture graph ungated, flag /data/{n} as a trap from
    the resulting frontier, then recrawl FRESH with the emitted rules:
    data URLs occupy dequeue slots but never dispatch (robots-skips),
    pages still crawl, and no data children are fetched."""
    from crab_spark.store import TableStore

    registry = load_registry([parser_listing, parser_data])
    corpus_df = C.corpus_df(spark, 4)
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    stats = crawl(store, CorpusFetcher(corpus_df), registry, navigate=True,
                  batch_size=10)
    assert stats.requests == 33  # 3 pages + 30 data, fixture arithmetic

    rep = trap_report(store.read("frontier"), max_urls_per_template=10)
    flagged = rep.collect()
    assert [(r["host"], r["template"], r["n_urls"]) for r in flagged] == [
        (urlsplit(C.data_url(10)).hostname, "/data/{n}", 30)]
    rules = trap_rules(rep)

    store2 = TableStore(store.root.parent / "guarded", spark)
    seed_frontier(store2, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    stats2 = crawl(store2, CorpusFetcher(corpus_df), registry, navigate=True,
                   batch_size=10, robots=rules)
    assert stats2.requests == 3          # pages only
    assert stats2.robots_denied == 30    # every data URL capped
    fetched = store2.read("fetched")
    assert fetched.filter(F.col("reason") == "robots").count() == 30
    assert fetched.filter(
        (F.col("reason") == "fetched") & F.col("url").contains("/data/")
    ).count() == 0
    # the seen set still records the capped URLs (no re-registration
    # churn): identical to the ungated crawl's URL set
    assert (
        {r["url"] for r in store2.read("frontier").select("url").collect()}
        == {r["url"] for r in store.read("frontier").select("url").collect()}
    )


def test_trap_report_plan_contract(spark):
    """The 100 TB contract: ONE frontier scan, no Python crossing — the
    templating is built-in codegen, the only row-grain shuffle is the
    (host, template) combine, and host totals come from a window over
    the already-aggregated shape counts (never a second frontier pass)."""
    import re

    from crab_spark.plans import formatted_plan

    df = _frontier_like(spark, [("h.test", "http://h.test/a/1")])
    plan = formatted_plan(trap_report(df, 10))
    assert sum(1 for line in plan.splitlines()
               if re.match(r"^\(\d+\) Scan", line)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert sum(1 for line in plan.splitlines()
               if re.match(r"^\(\d+\) Exchange", line)) == 2


# -- CLI: traps report + --apply feeds the run-crawler robots cache --------------

def test_cli_traps_apply_guards_next_run(spark, tmp_path, capsys):
    import json

    from crab_spark.cli import main

    ws = tmp_path / "ws"
    assert main(["new", str(ws)]) == 0
    C.corpus_df(spark, 4).write.parquet(str(ws / "corpus.parquet"))
    cfg = json.loads((ws / "crab_spark.json").read_text())
    cfg["crawler"]["corpus_parquet"] = "corpus.parquet"
    cfg["crawler"]["batch_size"] = 10
    (ws / "crab_spark.json").write_text(json.dumps(cfg))
    (ws / "parser_example.py").unlink()
    (ws / "parser_listing.py").write_text(
        "from crab_spark.parsers.listing import TYPE_ID, SPAN_KINDS, navigate, validate\n")
    (ws / "parser_data.py").write_text(
        "from crab_spark.parsers.data import TYPE_ID, parse\n")
    assert main(["--workdir", str(ws), "register", C.page_url(1), "1"]) == 0
    assert main(["--workdir", str(ws), "run-crawler", "--navigate"]) == 0
    capsys.readouterr()

    # report prints the exploding shape, count-descending
    assert main(["--workdir", str(ws), "traps", "--cap", "10"]) == 0
    out = capsys.readouterr().out
    assert "/data/{n}" in out and "30" in out

    # --apply writes the robots file and registers it in the config
    assert main(["--workdir", str(ws), "traps", "--cap", "10", "--apply"]) == 0
    assert "applied 1 new Disallow rule(s)" in capsys.readouterr().out
    robots = json.loads((ws / "robots.json").read_text())
    host = list(robots)[0]
    assert robots[host] == ["/data/*"]
    assert json.loads((ws / "crab_spark.json").read_text())["crawler"]["robots"] == "robots.json"

    # idempotent re-apply adds nothing
    assert main(["--workdir", str(ws), "traps", "--cap", "10", "--apply"]) == 0
    assert "applied 0 new" in capsys.readouterr().out
    assert json.loads((ws / "robots.json").read_text())[host] == ["/data/*"]

    # a reset trap URL is DENIED on the next run instead of re-fetched
    assert main(["--workdir", str(ws), "reset", C.data_url(10)]) == 0
    capsys.readouterr()
    assert main(["--workdir", str(ws), "run-crawler"]) == 0
    out = capsys.readouterr().out
    assert "robots_denied=1" in out and "requests=0" in out


# -- in-crawl auto guard (crawl(trap_cap=...)) -----------------------------------

def test_pattern_for_template_parity(spark):
    from crab_spark.traps import _pattern_from_template, pattern_for_template

    templates = [t for _, t in CASES] + ["/a/{id}/{t}?k1,k2", "/{n}", "/?q"]
    df = spark.createDataFrame([(t,) for t in templates], "t string")
    col = [r["p"] for r in
           df.select(_pattern_from_template(F.col("t")).alias("p")).collect()]
    assert col == [pattern_for_template(t) for t in templates]


def test_incrawl_trap_guard_caps_midcrawl(spark, store):
    """Self-defending crawl: /data/{n} grows past the cap MID-crawl, the
    periodic sweep flags it, and from then on data URLs resolve as
    robots-skips — early data fetched, later data denied, pages
    unaffected, state checkpointed."""
    registry = load_registry([parser_listing, parser_data])
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    stats = crawl(store, CorpusFetcher(C.corpus_df(spark, 12)), registry,
                  navigate=True, batch_size=10,
                  trap_cap=30, trap_check_every=2)

    frontier = store.read("frontier")
    fetched = store.read("fetched")
    total_data = frontier.filter(F.col("url").contains("/data/")).count()
    data_fetched = fetched.filter(
        (F.col("reason") == "fetched") & F.col("url").contains("/data/")).count()
    denied = fetched.filter(F.col("reason") == "robots").count()
    assert total_data > 30 and data_fetched > 0 and denied > 0
    assert data_fetched + denied == total_data          # every data URL resolved
    assert stats.robots_denied == denied
    # every denied row is a data URL; pages all fetched normally
    assert fetched.filter(
        (F.col("reason") == "robots") & ~F.col("url").contains("/data/")
    ).count() == 0
    n_pages = frontier.filter(F.col("url").contains("/page/")).count()
    assert fetched.filter(
        (F.col("reason") == "fetched") & F.col("url").contains("/page/")
    ).count() == n_pages
    # active caps checkpointed for later crawls / crash re-runs
    host = urlsplit(C.page_url(1)).hostname
    assert store.read_state("traps")["hosts"] == {host: ["/data/*"]}

    # persisted caps gate a LATER crawl even when trap_cap is omitted:
    # a reset trap URL is re-denied, never re-fetched
    from crab_spark.frontier import reset_pages

    victim = store.read("fetched").filter(F.col("reason") == "robots").limit(1)
    url = victim.collect()[0]["url"]
    reset_pages(store, victim.select("url_hash"))
    stats2 = crawl(store, CorpusFetcher(C.corpus_df(spark, 12)), registry,
                   navigate=True, batch_size=10)
    assert stats2.requests == 0 and stats2.robots_denied == 1
    assert store.read("fetched").filter(
        (F.col("url") == url) & (F.col("reason") == "robots")).count() == 1


def test_incrawl_trap_guard_resume_stable(spark, tmp_path):
    """Stop-and-resume under the guard equals the uninterrupted run:
    the sweep cadence keys on the ABSOLUTE epoch number and active caps
    persist in store state, so the resumed crawl dispatches and denies
    identically."""
    from crab_spark.store import TableStore

    registry = load_registry([parser_listing, parser_data])
    cdf = C.corpus_df(spark, 12)
    kw = dict(navigate=True, batch_size=10, trap_cap=30, trap_check_every=2)

    a = TableStore(tmp_path / "straight", spark)
    seed_frontier(a, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(a, CorpusFetcher(cdf), registry, **kw)

    b = TableStore(tmp_path / "resumed", spark)
    seed_frontier(b, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(b, CorpusFetcher(cdf), registry, max_epochs=3, **kw)
    crawl(b, CorpusFetcher(cdf), registry, **kw)

    def snap(s):
        return (
            {(r["url"], r["reason"], r["epoch"])
             for r in s.read("fetched").collect()},
            {r["url"] for r in s.read("frontier").collect()},
            s.read_state("traps")["hosts"],
        )

    assert snap(a) == snap(b)


def test_trap_guarded_crawl_matches_mirror_random_topology(spark, tmp_path):
    """Random multi-host topologies with per-host generated URL spaces
    vs a pure-Python replay of the WHOLE guarded crawl: the periodic
    template sweep (absolute-epoch cadence, strict > cap over the
    frontier as-of epoch start), the pattern conversion, and the
    dispatch-slot denial must reproduce the engine's dispatch order,
    seen set, and denial ledger exactly — on topologies nobody chose.
    (crab has no trap guard, so the mirror is the authority.)"""
    import re

    from crab_spark.corpus import CORPUS_SCHEMA, DATA_TYPE
    from crab_spark.store import TableStore
    from crab_spark.traps import pattern_for_template
    from crab_spark.urlnorm import absolutize, canonicalize

    registry = load_registry([parser_listing, parser_data])

    def template(url: str) -> str:
        parts = urlsplit(url)
        segs = ["{n}" if re.fullmatch(r"[0-9]+", s) else s
                for s in (parts.path or "/").split("/")]
        return "/".join(segs)  # topology has no query strings / ids

    def pat_match(path: str, pat: str) -> bool:
        rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in pat)
        return re.match(rx, path) is not None

    rng = random.Random(9261)
    total_denied = 0
    for trial in range(3):
        n_hosts = rng.randint(2, 3)
        n_pages = rng.randint(8, 12)
        cap = 7
        every = rng.choice([1, 2])

        def purl(p):
            return f"http://host{p % n_hosts}.example.com/page/{p}"

        corpus: dict[str, list[dict]] = {}
        for p in range(1, n_pages + 1):
            spans, off = [], 0

            def add(kind, text):
                nonlocal off
                spans.append({"kind": kind, "text": text,
                              "media_ref": "", "offset": off})
                off += max(len(text), 1)

            add("text", f"Trap page {p}")
            for q in rng.sample(range(1, n_pages + 1),
                                rng.randint(1, min(5, n_pages))):
                add("link", purl(q))
            for d in range(rng.randint(1, 3)):
                n = p * 10 + d
                add("link", f"/data/{n}")
                corpus[absolutize(f"/data/{n}", purl(p))] = C.data_spans(n)
            corpus[purl(p)] = spans

        seed = purl(rng.choice(
            [p for p in range(1, n_pages + 1) if p % n_hosts == 0]))
        batch = 5

        # -- mirror: BFS oracle loop + epoch-cadenced trap sweep -------
        rows_m: list[dict] = []
        seen: dict[str, tuple[int, int, int]] = {}
        order: list[str] = []
        active: dict[str, set[str]] = {}
        denied = 0

        def register(url, type_id, depth):
            if url in seen:
                return
            seen[url] = (len(rows_m), depth, type_id)
            rows_m.append({"url": url, "type_id": type_id, "depth": depth,
                           "pending": True, "seq": len(rows_m)})

        register(canonicalize(seed), C.PAGE_TYPE, 0)
        epoch = 0
        while True:
            epoch += 1
            if epoch % every == 0:
                from collections import Counter

                counts = Counter(
                    (urlsplit(r["url"]).hostname, template(r["url"]))
                    for r in rows_m)
                for (h, t), c in counts.items():
                    if c > cap:
                        active.setdefault(h, set()).add(pattern_for_template(t))
            b = sorted((r for r in rows_m if r["pending"]),
                       key=lambda r: (r["depth"], r["seq"]))[:batch]
            if not b:
                break
            if len(b) > 1:
                b = [b[0]] + b[:0:-1]
            for page in b:
                parts = urlsplit(page["url"])
                pats = active.get(parts.hostname or "", ())
                if any(pat_match(parts.path or "/", p) for p in pats):
                    page["pending"] = False  # resolved: robots-skip
                    denied += 1
                    continue
                order.append(page["url"])
                spans = corpus.get(page["url"])
                if spans is None:
                    continue
                if not registry.run_validate(page["type_id"], spans):
                    continue
                page["pending"] = False
                for href, t in registry.run_navigate(page["type_id"], spans):
                    absu = absolutize(href, page["url"])
                    if absu is not None:
                        register(absu, t, page["depth"] + 1)

        # -- engine ----------------------------------------------------
        rows = [
            (url, DATA_TYPE if "/data/" in url else C.PAGE_TYPE, spans)
            for url, spans in corpus.items()
        ]
        store = TableStore(tmp_path / f"tg{trial}", spark)
        seed_frontier(
            store, spark.createDataFrame([(seed, C.PAGE_TYPE)], SEEDS))
        stats = crawl(
            store, CorpusFetcher(spark.createDataFrame(rows, CORPUS_SCHEMA)),
            registry, navigate=True, batch_size=batch, record_order=True,
            trap_cap=cap, trap_check_every=every,
        )
        got = {
            r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store.read("frontier").collect()
        }
        assert got == seen, f"trial {trial}"
        assert stats.crawl_order == order, f"trial {trial}"
        assert stats.robots_denied == denied, f"trial {trial}"
        assert store.read("fetched").filter(
            F.col("reason") == "robots").count() == denied, f"trial {trial}"
        got_state = store.read_state("traps", {"hosts": {}})["hosts"]
        assert {h: set(p) for h, p in got_state.items()} == active, f"trial {trial}"
        total_denied += denied
    assert total_denied > 0  # the sweep must actually fire


def test_cli_traps_clear(spark, tmp_path, capsys):
    import json

    from crab_spark.cli import main
    from crab_spark.store import TableStore

    ws = tmp_path / "ws"
    assert main(["new", str(ws)]) == 0
    cfg = json.loads((ws / "crab_spark.json").read_text())
    store = TableStore(ws / cfg["database"], spark)
    store.write_state("traps", {"hosts": {"h.test": ["/data/*"]}})
    assert main(["--workdir", str(ws), "traps", "--clear"]) == 0
    assert "cleared in-crawl trap state for 1 host(s)" in capsys.readouterr().out
    assert store.read_state("traps")["hosts"] == {}
