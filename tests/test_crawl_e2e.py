"""End-to-end crawl vs the pure-Python oracle of the reference loop.

The BASELINE.json acceptance criterion: identical crawl ordering and
URL-seen set vs the reference on the same seed list + politeness budget,
and span-sequence equality per parsed document. The oracle
(crab_spark/oracle.py) reimplements crab's default-config loop
(threads=1, batch=100) independently of any Spark code; the corpus
reproduces the reference e2e fixture topology
(examples/test_server/test-server.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crab_spark import corpus as C
from crab_spark.crawler import CorpusFetcher, crawl
from crab_spark.frontier import seed_frontier
from crab_spark.crawl_oracle import run_oracle
from crab_spark.parsers import load_registry
from crab_spark.parsers import data as parser_data
from crab_spark.parsers import listing as parser_listing
from crab_spark.schemas import SEEDS
from crab_spark.tabulator import export_table, parse_documents

N_PAGES = 12  # small graph: pages 1..12, data 10..129 — still multi-epoch


@pytest.fixture(scope="module")
def registry():
    return load_registry([parser_listing, parser_data])


@pytest.fixture(scope="module")
def oracle(registry):
    corpus = {}
    for p in range(1, N_PAGES + 1):
        corpus[C.page_url(p)] = C.page_spans(p, N_PAGES)
        for d in range(10):
            corpus[C.data_url(p * 10 + d)] = C.data_spans(p * 10 + d)
    return run_oracle(
        seeds=[(C.page_url(1), C.PAGE_TYPE)],
        corpus=corpus,
        registry=registry,
        batch_size=25,
    )


def _run_spark_crawl(spark, store, registry, **kw):
    corpus_df = C.corpus_df(spark, N_PAGES)
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    return crawl(
        store,
        CorpusFetcher(corpus_df),
        registry,
        navigate=True,
        batch_size=25,
        record_order=True,
        **kw,
    )


def test_crawl_matches_oracle(spark, store, registry, oracle):
    stats = _run_spark_crawl(spark, store, registry)

    # URL-seen set: exact equality, including depth / type / seq order
    got = {
        r["url"]: (r["seq"], r["depth"], r["type_id"])
        for r in store.read("frontier").collect()
    }
    assert got == oracle.seen

    # crawl (dispatch) order: byte-identical sequence
    assert stats.crawl_order == oracle.crawl_order

    # every reachable URL downloaded exactly once
    docs = store.read("documents")
    assert docs.count() == len(oracle.documents)
    assert docs.select("doc_id").distinct().count() == docs.count()

    # span-sequence equality (kind, text, media_ref, order) per document
    for row in docs.collect():
        want = oracle.documents[row["doc_id"]]
        got_spans = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        assert got_spans == [(s["kind"], s["text"], s["media_ref"]) for s in want]
        offs = [s["offset"] for s in row["spans"]]
        assert offs == sorted(offs)

    # reachable-set golden (fixture topology: all pages + all data URLs)
    assert set(got) == C.expected_seen_urls(N_PAGES)

    # metrics/lineage: per-epoch summary rows exist and add up
    m = store.read("metrics").filter(F.col("part") == -1)
    assert m.agg(F.sum("requests")).collect()[0][0] == stats.requests
    assert m.agg(F.sum("new_links")).collect()[0][0] == stats.new_links
    assert stats.new_links == oracle.new_links


def test_crawl_resume_from_checkpoint(spark, store, registry, oracle):
    """Kill-and-resume: run 2 epochs, 'crash', resume — final state
    identical to an uninterrupted run (north_rule resumability)."""
    corpus_df = C.corpus_df(spark, N_PAGES)
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    fetcher = CorpusFetcher(corpus_df)
    crawl(store, fetcher, registry, batch_size=25, max_epochs=2)
    assert store.read_state("crawl")["epoch"] == 2
    # resume: a brand-new crawl() call picks up from the checkpoint
    crawl(store, fetcher, registry, batch_size=25)
    got = {
        r["url"]: (r["seq"], r["depth"], r["type_id"])
        for r in store.read("frontier").collect()
    }
    assert got == oracle.seen
    assert store.read("documents").count() == len(oracle.documents)


def test_export_table_golden(spark, store, registry):
    """`export-csv` e2e golden (Makefile:1-9): the exported default table
    holds every reachable data id with its square."""
    _run_spark_crawl(spark, store, registry)
    docs = store.read("documents")
    frontier = store.read("frontier").select(F.col("url").alias("doc_id"), "type_id")
    parsed = parse_documents(docs.join(frontier, "doc_id"), registry)
    wide = export_table(parsed, "default")
    rows = {(r["input"], r["output"]) for r in wide.collect()}
    # reachable pages are 1..N_PAGES-1 (see corpus.expected_seen_urls)
    want = {(str(n), str(n * n)) for p in range(1, N_PAGES) for n in range(p * 10, p * 10 + 10)}
    assert rows == want
    # case-insensitive column filter (main.rs:392-398)
    only_in = export_table(parsed, "default", columns=["INPUT"])
    assert only_in.columns == ["doc_id", "row_idx", "input"]


def test_navigate_all_depth_quirk(spark, store, registry):
    """navigate-all registers children at the PARENT's depth
    (main.rs:212,219-221) — reproduced behind depth_offset=0."""
    oracle0 = run_oracle(
        seeds=[(C.page_url(1), C.PAGE_TYPE)],
        corpus={
            **{C.page_url(p): C.page_spans(p, N_PAGES) for p in range(1, N_PAGES + 1)},
            **{C.data_url(p * 10 + d): C.data_spans(p * 10 + d)
               for p in range(1, N_PAGES + 1) for d in range(10)},
        },
        registry=registry,
        batch_size=25,
        depth_offset=0,
    )
    stats = _run_spark_crawl(spark, store, registry, depth_offset=0)
    got = {
        r["url"]: (r["seq"], r["depth"], r["type_id"])
        for r in store.read("frontier").collect()
    }
    assert got == oracle0.seen
    assert stats.crawl_order == oracle0.crawl_order
    # everything stays at depth 0 under the quirk
    assert store.read("frontier").agg(F.max("depth")).collect()[0][0] == 0


def test_crawl_matches_oracle_random_topology(spark, tmp_path, registry):
    """Seeded-RANDOM link graphs through the full engine vs the
    pure-Python reference-loop oracle: the fixture topology above pins
    the reference e2e shape; this pins the scheduler on graphs nobody
    chose — random out-degrees, random data fan-out, random seed page,
    random batch size. Exact equality of the URL-seen set (seq, depth,
    type), the dispatch order, and the new-link count."""
    import random

    from crab_spark.corpus import CORPUS_SCHEMA, DATA_TYPE
    from crab_spark.store import TableStore

    rng = random.Random(511)
    for trial in range(2):
        n_pages = rng.randint(8, 14)
        corpus: dict[str, list[dict]] = {}
        for p in range(1, n_pages + 1):
            spans, off = [], 0

            def add(kind, text, media_ref=""):
                nonlocal off
                spans.append({"kind": kind, "text": text,
                              "media_ref": media_ref, "offset": off})
                off += max(len(text), 1)

            add("text", f"Random page {p}")
            # ≥1 page link keeps every page valid under the listing
            # parser's validate rule
            outs = rng.sample(
                range(1, n_pages + 1), rng.randint(1, min(5, n_pages))
            )
            for q in outs:
                add("link", f"/page/{q}")
            for d in range(rng.randint(0, 3)):
                n = p * 10 + d
                add("link", f"/data/{n}")
                corpus[C.data_url(n)] = C.data_spans(n)
            corpus[C.page_url(p)] = spans

        seed = C.page_url(rng.randint(1, n_pages))
        batch = rng.choice([5, 25])
        want = run_oracle(
            seeds=[(seed, C.PAGE_TYPE)], corpus=corpus,
            registry=registry, batch_size=batch,
        )

        rows = [
            (url, DATA_TYPE if "/data/" in url else C.PAGE_TYPE, spans)
            for url, spans in corpus.items()
        ]
        corpus_df = spark.createDataFrame(rows, CORPUS_SCHEMA)
        store = TableStore(tmp_path / f"w{trial}", spark)
        seed_frontier(
            store, spark.createDataFrame([(seed, C.PAGE_TYPE)], SEEDS)
        )
        stats = crawl(
            store, CorpusFetcher(corpus_df), registry,
            navigate=True, batch_size=batch, record_order=True,
        )
        got = {
            r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store.read("frontier").collect()
        }
        assert got == want.seen, f"trial {trial}"
        assert stats.crawl_order == want.crawl_order, f"trial {trial}"
        assert stats.new_links == want.new_links, f"trial {trial}"
        # span-sequence equality (kind, text, media_ref, order) per
        # document — the input_hint's per-row invariant, on random docs
        docs = store.read("documents")
        assert docs.count() == len(want.documents), f"trial {trial}"
        for row in docs.collect():
            ws = want.documents[row["doc_id"]]
            assert [(s["kind"], s["text"], s["media_ref"])
                    for s in row["spans"]] == \
                [(s["kind"], s["text"], s["media_ref"]) for s in ws], \
                f"trial {trial} {row['doc_id']}"


def _run_priority_mirror(seeds, corpus, registry, batch_size,
                         host_budget, rescore_every):
    """Independent Python replay of the PRIORITY crawl scheduler (the
    north_rule's depth/host-budget frontier — crab itself has no
    priority mode, so this mirror, not crawl_oracle, is the authority):

    - registration priority = depth (frontier.register);
    - every ``rescore_every`` completed epochs (so epochs 1, R+1, ...,
      crawler.py ``stats.epochs % rescore_every == 0``), the pending
      slice is re-scored per host: rows sorted by (depth, seq), the
      (k·budget+1)-th row sinks k levels — priority = depth + idx//B
      (frontier.score_host_budget's row_number window);
    - rows registered after a rescore ride at registration priority
      until the next pass (frontier.scored_head's since-rescore delta);
    - dequeue = pending sorted by (priority, seq) LIMIT batch, then the
      reference's swap_remove(0) dispatch remap;
    - fetch → validate → navigate → absolutize → first-wins register at
      depth+1, identical to the BFS oracle loop.
    """
    from urllib.parse import urlsplit

    from crab_spark.urlnorm import absolutize, canonicalize

    rows: list[dict] = []
    seen: dict[str, tuple[int, int, int]] = {}
    order: list[str] = []
    new_links = 0
    override: dict[str, float] = {}

    def register(url: str, type_id: int, depth: int) -> bool:
        if url in seen:
            return False
        seen[url] = (len(rows), depth, type_id)
        rows.append({"url": url, "type_id": type_id, "depth": depth,
                     "pending": True, "seq": len(rows)})
        return True

    for url, type_id in seeds:
        cu = canonicalize(url)
        if cu is not None:
            register(cu, type_id, 0)

    epochs_done = 0
    while True:
        if epochs_done % max(rescore_every, 1) == 0:
            override = {}
            by_host: dict[str, list[dict]] = {}
            for r in rows:
                if r["pending"]:
                    by_host.setdefault(
                        urlsplit(r["url"]).hostname or "", []
                    ).append(r)
            for host_rows in by_host.values():
                host_rows.sort(key=lambda r: (r["depth"], r["seq"]))
                for idx, r in enumerate(host_rows):
                    override[r["url"]] = float(
                        r["depth"] + idx // host_budget
                    )
        batch = sorted(
            (r for r in rows if r["pending"]),
            key=lambda r: (override.get(r["url"], float(r["depth"])),
                           r["seq"]),
        )[:batch_size]
        if not batch:
            break
        if len(batch) > 1:
            batch = [batch[0]] + batch[:0:-1]
        for page in batch:
            order.append(page["url"])
            spans = corpus.get(page["url"])
            if spans is None:
                continue
            if not registry.run_validate(page["type_id"], spans):
                continue
            page["pending"] = False
            for href, t in registry.run_navigate(page["type_id"], spans):
                absu = absolutize(href, page["url"])
                if absu is not None and register(absu, t, page["depth"] + 1):
                    new_links += 1
        epochs_done += 1
    return order, seen, new_links


def test_priority_crawl_matches_mirror_random_topology(
    spark, tmp_path, registry
):
    """Seeded-RANDOM multi-host graphs through the PRIORITY-mode engine
    (host_budget + rescore_every) vs the independent Python scheduler
    mirror above: exact equality of the dispatch order, the URL-seen
    set (seq, depth, type), and the new-link count. The fixed-fixture
    priority tests (test_crawl_dispatch) pin interleaving and
    crash-resume; this pins the banded-rescore dequeue + since-rescore
    delta folds on topologies and cadences nobody chose — random hosts,
    out-degrees, budgets, and rescore periods (including R=1 every-epoch
    and R=3 stale-snapshot windows)."""
    import random

    from crab_spark.corpus import CORPUS_SCHEMA, DATA_TYPE
    from crab_spark.store import TableStore
    from crab_spark.urlnorm import absolutize

    rng = random.Random(907)
    for trial, (budget, rescore) in enumerate([(2, 1), (3, 3)]):
        n_hosts = rng.randint(2, 3)
        n_pages = rng.randint(8, 12)

        def purl(p):
            return f"http://host{p % n_hosts}.example.com/page/{p}"

        corpus: dict[str, list[dict]] = {}
        for p in range(1, n_pages + 1):
            spans, off = [], 0

            def add(kind, text, media_ref=""):
                nonlocal off
                spans.append({"kind": kind, "text": text,
                              "media_ref": media_ref, "offset": off})
                off += max(len(text), 1)

            add("text", f"Priority page {p}")
            outs = rng.sample(
                range(1, n_pages + 1), rng.randint(1, min(5, n_pages))
            )
            for q in outs:
                add("link", purl(q))  # absolute: pager links cross hosts
            for d in range(rng.randint(0, 3)):
                n = p * 10 + d
                add("link", f"/data/{n}")  # relative: inherits the host
                corpus[absolutize(f"/data/{n}", purl(p))] = C.data_spans(n)
            corpus[purl(p)] = spans

        seed = purl(rng.randint(1, n_pages))
        batch = rng.choice([5, 6])
        want_order, want_seen, want_links = _run_priority_mirror(
            seeds=[(seed, C.PAGE_TYPE)], corpus=corpus, registry=registry,
            batch_size=batch, host_budget=budget, rescore_every=rescore,
        )

        rows = [
            (url, DATA_TYPE if "/data/" in url else C.PAGE_TYPE, spans)
            for url, spans in corpus.items()
        ]
        corpus_df = spark.createDataFrame(rows, CORPUS_SCHEMA)
        store = TableStore(tmp_path / f"pw{trial}", spark)
        seed_frontier(
            store, spark.createDataFrame([(seed, C.PAGE_TYPE)], SEEDS)
        )
        stats = crawl(
            store, CorpusFetcher(corpus_df), registry,
            navigate=True, batch_size=batch, record_order=True,
            host_budget=budget, rescore_every=rescore,
        )
        got = {
            r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store.read("frontier").collect()
        }
        assert got == want_seen, f"trial {trial}"
        assert stats.crawl_order == want_order, f"trial {trial}"
        assert stats.new_links == want_links, f"trial {trial}"


def test_crash_resume_matches_mirror_random_topology(spark, tmp_path, registry):
    """Random crash windows on random topologies: kill the crawl at a
    RANDOM commit window (docs/reg/done append of a random mid-crawl
    epoch) on a seeded-random graph, resume, and require the final
    seen-set AND the resumed dispatch order to equal the uninterrupted
    oracle/mirror run exactly (the resumed order is the golden order's
    tail). The fixed-window tests (test_crawl_dispatch) pin each commit
    window on the fixture; this sweeps window × epoch × topology ×
    scheduler mode. Priority mode runs rescore_every=1 so the rescore
    cadence (a per-call counter) is resume-invariant by construction —
    the crashed epoch itself must still skip the rescore and replay the
    committed snapshot."""
    import random

    from crab_spark.corpus import CORPUS_SCHEMA, DATA_TYPE
    from crab_spark.store import TableStore

    rng = random.Random(1733)
    for trial, mode in enumerate(["bfs", "priority"]):
        n_hosts = 1 if mode == "bfs" else rng.randint(2, 3)

        def purl(p):
            return (C.page_url(p) if n_hosts == 1
                    else f"http://host{p % n_hosts}.example.com/page/{p}")

        n_pages = rng.randint(8, 12)
        corpus: dict[str, list[dict]] = {}
        for p in range(1, n_pages + 1):
            spans, off = [], 0

            def add(kind, text):
                nonlocal off
                spans.append({"kind": kind, "text": text,
                              "media_ref": "", "offset": off})
                off += max(len(text), 1)

            add("text", f"Crash page {p}")
            for q in rng.sample(range(1, n_pages + 1),
                                rng.randint(1, min(5, n_pages))):
                add("link", purl(q))
            for d in range(rng.randint(1, 3)):
                n = p * 10 + d
                add("link", f"/data/{n}")
                from crab_spark.urlnorm import absolutize
                corpus[absolutize(f"/data/{n}", purl(p))] = C.data_spans(n)
            corpus[purl(p)] = spans

        seed = purl(rng.randint(1, n_pages))
        if mode == "bfs":
            want = run_oracle(seeds=[(seed, C.PAGE_TYPE)], corpus=corpus,
                              registry=registry, batch_size=5)
            want_order, want_seen = want.crawl_order, want.seen
            kw = {}
        else:
            want_order, want_seen, _ = _run_priority_mirror(
                seeds=[(seed, C.PAGE_TYPE)], corpus=corpus,
                registry=registry, batch_size=5,
                host_budget=2, rescore_every=1,
            )
            kw = {"host_budget": 2, "rescore_every": 1}

        rows = [
            (url, DATA_TYPE if "/data/" in url else C.PAGE_TYPE, spans)
            for url, spans in corpus.items()
        ]
        fetcher = CorpusFetcher(spark.createDataFrame(rows, CORPUS_SCHEMA))
        store = TableStore(tmp_path / f"cw{trial}", spark)
        seed_frontier(
            store, spark.createDataFrame([(seed, C.PAGE_TYPE)], SEEDS)
        )

        crash_tag = (f"{rng.choice(['docs', 'reg', 'done'])}-"
                     f"{rng.randint(2, 3):06d}")
        orig_append = store.append
        armed = {"on": True}

        def boom(name, df, tag, _tag=crash_tag):
            if armed["on"] and tag == _tag:
                armed["on"] = False
                raise RuntimeError("injected crash")
            return orig_append(name, df, tag)

        store.append = boom
        with pytest.raises(RuntimeError, match="injected crash"):
            crawl(store, fetcher, registry, batch_size=5, **kw)
        store.append = orig_append

        stats2 = crawl(store, fetcher, registry, batch_size=5,
                       record_order=True, **kw)
        got = {
            r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store.read("frontier").collect()
        }
        assert got == want_seen, f"{mode} @ {crash_tag}"
        n_resumed = len(stats2.crawl_order)
        assert stats2.crawl_order == want_order[len(want_order) - n_resumed:], \
            f"{mode} @ {crash_tag}"
        docs = store.read("documents")
        assert docs.select("doc_id").distinct().count() == docs.count()


def test_robots_gated_crawl_matches_mirror_random_topology(
    spark, tmp_path, registry
):
    """Random robots rule-sets inside random multi-host crawls vs a
    Python replay: denied rows must occupy their dequeue slots but
    never dispatch (they resolve as robots-skips, their children are
    never discovered), while the allowed rows keep the reference
    dispatch order. Pins the dispatch-path gating (broadcast robots
    join + rule eval + resolved-not-retried commit) end-to-end on
    topologies and rule-sets nobody chose — incl. Allow carve-outs
    under a broader Disallow (longest-prefix-wins, RFC 9309 §2.2.2)."""
    import random

    from crab_spark.corpus import CORPUS_SCHEMA, DATA_TYPE
    from crab_spark.robots import robots_table
    from crab_spark.store import TableStore
    from crab_spark.urlnorm import absolutize
    from urllib.parse import urlsplit

    rng = random.Random(4817)
    total_denied = 0
    for trial in range(2):
        n_hosts = rng.randint(2, 3)
        n_pages = rng.randint(8, 12)

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

            add("text", f"Robots page {p}")
            for q in rng.sample(range(1, n_pages + 1),
                                rng.randint(1, min(5, n_pages))):
                add("link", purl(q))
            for d in range(rng.randint(1, 3)):
                n = p * 10 + d
                add("link", f"/data/{n}")
                corpus[absolutize(f"/data/{n}", purl(p))] = C.data_spans(n)
            corpus[purl(p)] = spans

        # random rule-sets: host0 stays open (the seed host); others
        # get a random mix of data bans, page bans, and Allow carve-outs
        entries: dict[str, dict] = {}
        for h in range(1, n_hosts):
            spec: dict = {"disallow": [], "allow": []}
            if h == 1 or rng.random() < 0.7:
                spec["disallow"].append("/data/")
            if rng.random() < 0.5:
                spec["disallow"].append("/page/")
                carve = rng.sample(range(1, n_pages + 1), 2)
                spec["allow"] += [f"/page/{k}" for k in carve]
            entries[f"host{h}.example.com"] = spec
        robots = robots_table(spark, entries)

        def mirror_allowed(url):
            parts = urlsplit(url)
            spec = entries.get(parts.hostname or "")
            if spec is None:
                return True
            path = parts.path or "/"
            best_len, best_allow = -1, True
            for allow, prefixes in ((False, spec["disallow"]),
                                    (True, spec["allow"])):
                for pre in prefixes:
                    if path.startswith(pre) and (
                        len(pre) > best_len
                        or (len(pre) == best_len and allow and not best_allow)
                    ):
                        best_len, best_allow = len(pre), allow
            return best_allow

        seed = purl(rng.choice(
            [p for p in range(1, n_pages + 1) if p % n_hosts == 0]))
        batch = 5

        # -- mirror: the BFS oracle loop + the dispatch-slot gate ------
        rows_m: list[dict] = []
        seen: dict[str, tuple[int, int, int]] = {}
        order: list[str] = []
        denied = 0

        def register(url, type_id, depth):
            if url in seen:
                return False
            seen[url] = (len(rows_m), depth, type_id)
            rows_m.append({"url": url, "type_id": type_id, "depth": depth,
                           "pending": True, "seq": len(rows_m)})
            return True

        from crab_spark.urlnorm import canonicalize

        register(canonicalize(seed), C.PAGE_TYPE, 0)
        while True:
            b = sorted((r for r in rows_m if r["pending"]),
                       key=lambda r: (r["depth"], r["seq"]))[:batch]
            if not b:
                break
            if len(b) > 1:
                b = [b[0]] + b[:0:-1]
            for page in b:
                if not mirror_allowed(page["url"]):
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
        store = TableStore(tmp_path / f"rb{trial}", spark)
        seed_frontier(
            store, spark.createDataFrame([(seed, C.PAGE_TYPE)], SEEDS)
        )
        stats = crawl(
            store, CorpusFetcher(spark.createDataFrame(rows, CORPUS_SCHEMA)),
            registry, navigate=True, batch_size=batch,
            record_order=True, robots=robots,
        )
        got = {
            r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store.read("frontier").collect()
        }
        assert got == seen, f"trial {trial}"
        assert stats.crawl_order == order, f"trial {trial}"
        assert stats.robots_denied == denied, f"trial {trial}"
        skipped = store.read("fetched").filter(F.col("reason") == "robots")
        assert skipped.count() == denied, f"trial {trial}"
        total_denied += denied
    assert total_denied > 0  # the sweep must actually exercise the gate
