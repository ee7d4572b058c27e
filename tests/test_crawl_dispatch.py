"""Dispatch-path wiring tests: robots rules and proxy rotation INSIDE
crawl() (north_rule: per-host politeness + robots cache + proxy health
in the dispatch phase, reference crawler.rs:69-84, proxy.rs:116-137),
plus crash-resume atomicity (an epoch's fetched-append is the single
commit point; a crash in ANY earlier window re-runs the identical batch
exactly-once)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crab_spark import corpus as C
from crab_spark.crawler import CorpusFetcher, crawl
from crab_spark.frontier import pending, seed_frontier
from crab_spark.crawl_oracle import run_oracle
from crab_spark.parsers import load_registry
from crab_spark.parsers import data as parser_data
from crab_spark.parsers import listing as parser_listing
from crab_spark.proxy import ProxyPool
from crab_spark.robots import robots_table
from crab_spark.schemas import SEEDS

N_PAGES = 6


@pytest.fixture(scope="module")
def registry():
    return load_registry([parser_listing, parser_data])


def _seed(spark, store):
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))


def _corpus(spark):
    return C.corpus_df(spark, N_PAGES)


def test_robots_excludes_urls_inside_crawl(spark, store, registry):
    """A Disallow: /data/ rule for the fixture host must keep every data
    URL out of the fetch path: no data documents, rows marked resolved
    as robots-skipped (never retried), pages still crawled."""
    _seed(spark, store)
    robots = robots_table(spark, {"localhost": ["/data/"]})
    stats = crawl(
        store, CorpusFetcher(_corpus(spark)), registry,
        batch_size=25, robots=robots,
    )
    docs = {r["doc_id"] for r in store.read("documents").select("doc_id").collect()}
    assert docs == {C.page_url(p) for p in range(1, N_PAGES)}  # pages only
    n_data = 10 * (N_PAGES - 1)
    assert stats.robots_denied == n_data
    skipped = store.read("fetched").filter(F.col("reason") == "robots")
    assert skipped.count() == n_data
    # nothing left pending — denied rows are resolved, not retried
    assert pending(store).count() == 0


def test_robots_allows_everything_when_no_rule_matches(spark, store, registry):
    _seed(spark, store)
    robots = robots_table(spark, {"otherhost.example.com": ["/"]})
    stats = crawl(
        store, CorpusFetcher(_corpus(spark)), registry,
        batch_size=25, robots=robots,
    )
    assert stats.robots_denied == 0
    assert store.read("documents").count() == (N_PAGES - 1) * 11


class ProxyFailingFetcher(CorpusFetcher):
    """Corpus fetch with injected per-proxy failures: any row dispatched
    through a proxy id in ``fail_ids`` fails, simulating a dead proxy."""

    def __init__(self, corpus, fail_ids: list[int]):
        super().__init__(corpus)
        self.fail_ids = list(fail_ids)

    def fetch(self, batch):
        out = super().fetch(batch)
        bad = F.col("proxy_id").isin(self.fail_ids)
        return out.withColumn("ok", F.col("ok") & ~bad).withColumn(
            "spans", F.when(~bad, F.col("spans"))
        )


def test_proxy_counter_saturates_and_pool_fails_over(spark, store, registry):
    """Proxy 1 always fails: its alive counter must saturate at -2
    (proxy.rs:11 SaturatedDown) inside the crawl loop, after which
    dispatch routes everything through proxy 0 and the crawl completes —
    failed pages stay pending and are retried on the surviving proxy."""
    _seed(spark, store)
    pool = ProxyPool(["http://proxy0:3128", "http://proxy1:3128"])
    stats = crawl(
        store, ProxyFailingFetcher(_corpus(spark), fail_ids=[1]), registry,
        batch_size=25, proxy_pool=pool,
    )
    assert pool.stats[1].dead and pool.stats[1].alive_counter == -2
    assert pool.stats[1].successful_requests == 0
    assert pool.stats[1].requests > 0
    assert not pool.stats[0].dead and pool.stats[0].alive_counter == 2
    assert pool.stats[0].successful_requests == pool.stats[0].requests
    # failover completed the crawl: every reachable page downloaded
    assert store.read("documents").count() == (N_PAGES - 1) * 11
    assert pending(store).count() == 0
    assert stats.successful == (N_PAGES - 1) * 11


def test_proxy_all_alive_splits_traffic(spark, store, registry):
    _seed(spark, store)
    pool = ProxyPool(["http://proxy0:3128", "http://proxy1:3128"])
    crawl(store, CorpusFetcher(_corpus(spark)), registry,
          batch_size=25, proxy_pool=pool)
    assert all(s.requests > 0 for s in pool.stats)
    assert all(s.alive_counter == 2 for s in pool.stats)  # saturated up


@pytest.mark.parametrize("crash_tag", ["docs-000002", "reg-000002", "done-000002"])
def test_crash_mid_epoch_resumes_exactly_once(spark, store, registry, crash_tag):
    """Kill the crawl mid-epoch-2 at three different commit windows
    (before documents, before register, before the fetched commit-point)
    — the resumed crawl must re-run epoch 2 against the identical batch
    and converge to the uninterrupted run's exact state. The
    done-000002 window is the regression: documents + register are
    already committed when the crash hits, and the old commit ordering
    permanently lost that batch."""
    corpus = {}
    for p in range(1, N_PAGES + 1):
        corpus[C.page_url(p)] = C.page_spans(p, N_PAGES)
        for d in range(10):
            corpus[C.data_url(p * 10 + d)] = C.data_spans(p * 10 + d)
    golden = run_oracle(
        seeds=[(C.page_url(1), C.PAGE_TYPE)], corpus=corpus,
        registry=registry, batch_size=10,
    )

    _seed(spark, store)
    fetcher = CorpusFetcher(_corpus(spark))
    orig_append = store.append
    armed = {"on": True}

    def boom(name, df, tag):
        if armed["on"] and tag == crash_tag:
            armed["on"] = False
            raise RuntimeError("injected crash")
        return orig_append(name, df, tag)

    store.append = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        crawl(store, fetcher, registry, batch_size=10)
    store.append = orig_append

    stats2 = crawl(store, fetcher, registry, batch_size=10, record_order=True)
    got = {
        r["url"]: (r["seq"], r["depth"], r["type_id"])
        for r in store.read("frontier").collect()
    }
    assert got == golden.seen
    docs = store.read("documents")
    assert docs.count() == len(golden.documents)
    assert docs.select("doc_id").distinct().count() == docs.count()
    # the resumed run starts from epoch 2's batch: its dispatch order is
    # the tail of the golden order (epoch 1 = first 10 dispatches... the
    # seed epoch fetched 1 page; epoch boundaries at batch_size=10 give
    # golden order segments [1], [10], ... — resume replays from the
    # crashed epoch's segment onward)
    assert stats2.crawl_order == golden.crawl_order[len(golden.crawl_order) - len(stats2.crawl_order):]
    # lineage: metrics new_links over all epochs still adds up
    m = store.read("metrics").filter(F.col("part") == -1)
    assert m.agg(F.sum("new_links")).collect()[0][0] == golden.new_links


def test_crawl_host_budget_mode_interleaves_hosts(spark, store):
    """north_rule priority frontier, wired through crawl(): with
    host_budget set, each epoch rescores the pending slice and dequeues
    by (priority, seq), so a hot host's overflow sinks a level and the
    batch interleaves hosts. The default BFS mode on the same seeds
    drains the hot host first."""
    from collections import Counter

    import pyspark.sql.types as T

    from crab_spark.parsers import ParserRegistry, SpanParser
    from crab_spark.schemas import SPAN

    urls = [f"http://ahot/{i}" for i in range(8)] + [f"http://zzz/{i}" for i in range(3)]
    corpus = spark.createDataFrame(
        [(u, [("text", "x", "", 0)]) for u in urls],
        T.StructType([T.StructField("url", T.StringType()),
                      T.StructField("spans", T.ArrayType(SPAN))]),
    )
    registry = ParserRegistry([SpanParser(type_id=1)])
    seed_frontier(store, spark.createDataFrame([(u, 1) for u in urls], SEEDS))
    stats = crawl(store, CorpusFetcher(corpus), registry, navigate=False,
                  batch_size=6, host_budget=3, record_order=True)
    assert stats.requests == 11 and stats.successful == 11
    assert pending(store).count() == 0
    hosts = Counter(u.split("/")[2] for u in stats.crawl_order[:6])
    # budget 3: ahot's first 3 (prio 0) + zzz's 3 (prio 0) — interleaved
    assert hosts == Counter({"ahot": 3, "zzz": 3}), stats.crawl_order[:6]

    # BFS mode drains ahot (seq 0-7) first
    store2 = type(store)(store.root.parent / "wh-bfs-mode", spark)
    seed_frontier(store2, spark.createDataFrame([(u, 1) for u in urls], SEEDS))
    s2 = crawl(store2, CorpusFetcher(corpus), registry, navigate=False,
               batch_size=6, record_order=True)
    assert [u.split("/")[2] for u in s2.crawl_order[:6]] == ["ahot"] * 6


def test_crash_mid_epoch_priority_mode_resumes_exactly_once(spark, store, registry):
    """Regression (r3 review): in priority mode, re-scoring on a
    crashed-epoch re-run changed the re-dequeued batch, and register's
    idempotent tagged append then overwrote the committed reg tag with
    DIFFERENT rows — losing the original registrations. The re-run must
    skip the rescore and replay the committed delta: final state equals
    an uninterrupted priority-mode run."""
    _seed(spark, store)
    fetcher = CorpusFetcher(_corpus(spark))
    orig_append = store.append
    armed = {"on": True}

    def boom(name, df, tag):
        if armed["on"] and tag == "done-000002":
            armed["on"] = False
            raise RuntimeError("injected crash")
        return orig_append(name, df, tag)

    store.append = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        crawl(store, fetcher, registry, batch_size=10, host_budget=4)
    store.append = orig_append
    crawl(store, fetcher, registry, batch_size=10, host_budget=4)
    got = {r["url"]: (r["seq"], r["depth"])
           for r in store.read("frontier").collect()}

    store2 = type(store)(store.root.parent / "wh-prio-clean", spark)
    _seed(spark, store2)
    crawl(store2, fetcher, registry, batch_size=10, host_budget=4)
    want = {r["url"]: (r["seq"], r["depth"])
            for r in store2.read("frontier").collect()}
    assert got == want
    assert pending(store).count() == 0
    docs = store.read("documents")
    assert docs.select("doc_id").distinct().count() == docs.count()
    assert docs.count() == store2.read("documents").count()


def test_filter_fold_never_materializes_keys_on_driver(spark, store, registry):
    """r4 scale contract (r3 verdict item 2): the per-epoch seen-set
    filter maintenance must run executor-side. With DataFrame.toPandas
    forbidden for the whole crawl, the crawl still completes and the
    sidecar ends up COMPLETE (covers every committed reg tag, answers
    'maybe' for every frontier key) — i.e. the delta keys were folded
    into the part files by tasks, never via a driver materialization."""
    import numpy as np
    import pandas  # noqa: F401 — ensure pandas itself stays importable
    from pyspark.sql import DataFrame

    from crab_spark.bloom import load_sidecar

    _seed(spark, store)

    def boom(self, *a, **k):
        raise AssertionError("driver-side toPandas during crawl")

    orig = DataFrame.toPandas
    DataFrame.toPandas = boom
    try:
        stats = crawl(store, CorpusFetcher(_corpus(spark)), registry,
                      batch_size=10, use_bloom=True, bloom_min_frontier=0)
    finally:
        DataFrame.toPandas = orig
    assert stats.epochs > 2 and pending(store).count() == 0

    filt, covered = load_sidecar(store.root / "_manifests" / "bloom-frontier.d")
    assert covered == set(store.historic_tags("frontier"))
    keys = np.array(
        [r["url_hash"] for r in store.read("frontier").select("url_hash").collect()],
        dtype=np.int64,
    ).view(np.uint64)
    assert filt.might_contain(keys).all()  # no false negatives, ever

    # equivalence: the filter-on crawl produced the same frontier as a
    # filter-off crawl (the fold path is a pure optimization)
    store2 = type(store)(store.root.parent / "wh-fold-off", spark)
    _seed(spark, store2)
    crawl(store2, CorpusFetcher(_corpus(spark)), registry,
          batch_size=10, use_bloom=False)
    on = {(r["url"], r["seq"]) for r in store.read("frontier").collect()}
    off = {(r["url"], r["seq"]) for r in store2.read("frontier").collect()}
    assert on == off


def test_auto_compaction_bounds_dirs_and_preserves_state(spark, store, registry):
    """r3 review: per-epoch delta dirs grow the partitioned frontier's
    union plan linearly. With compact_threshold the live dir count stays
    bounded mid-crawl, the final state equals an uncompacted run, and a
    follow-up crawl resumes cleanly on the re-baselined sidecar."""
    _seed(spark, store)
    fetcher = CorpusFetcher(_corpus(spark))
    crawl(store, fetcher, registry, batch_size=10, compact_threshold=3)
    assert len(store._read_manifest("frontier")["dirs"]) <= 5
    # the fetched log is folded at the same threshold (dequeue anti-joins
    # it every epoch; without folding its listing grows one dir/epoch)
    assert len(store._read_manifest("fetched")["dirs"]) <= 5
    got = {r["url"]: (r["seq"], r["depth"], r["type_id"])
           for r in store.read("frontier").collect()}
    got_f = {(r["url_hash"], r["url"], r["depth"], r["epoch"], r["reason"])
             for r in store.read("fetched").collect()}

    store2 = type(store)(store.root.parent / "wh-nocompact", spark)
    _seed(spark, store2)
    crawl(store2, fetcher, registry, batch_size=10, compact_threshold=None)
    want = {r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store2.read("frontier").collect()}
    assert got == want
    want_f = {(r["url_hash"], r["url"], r["depth"], r["epoch"], r["reason"])
              for r in store2.read("fetched").collect()}
    assert got_f == want_f

    # resume on the compacted store: the sidecar's covered set was
    # re-baselined at compaction time, so this is a clean no-op
    s2 = crawl(store, fetcher, registry, batch_size=10, compact_threshold=3)
    assert s2.requests == 0


def test_priority_mode_crawl_order_survives_compaction(spark, store, registry):
    """Priority mode's scored_head folds the fetched epoch>r suffix and
    the since-rescore frontier deltas; in-crawl compaction collapses
    both tables' delta dirs mid-crawl (rescore_every=2 forces rescores
    to interleave with folds). The dequeue ORDER — not just the final
    set — must match an uncompacted priority run, and resume must stay
    a no-op."""
    _seed(spark, store)
    fetcher = CorpusFetcher(_corpus(spark))
    stats = crawl(store, fetcher, registry, batch_size=10, host_budget=4,
                  rescore_every=2, compact_threshold=3, record_order=True)
    assert len(store._read_manifest("frontier")["dirs"]) <= 5
    assert len(store._read_manifest("fetched")["dirs"]) <= 5

    store2 = type(store)(store.root.parent / "wh-prio-nocompact", spark)
    _seed(spark, store2)
    want = crawl(store2, fetcher, registry, batch_size=10, host_budget=4,
                 rescore_every=2, compact_threshold=None, record_order=True)
    assert stats.crawl_order == want.crawl_order
    got = {r["url"]: (r["seq"], r["depth"])
           for r in store.read("frontier").collect()}
    exp = {r["url"]: (r["seq"], r["depth"])
           for r in store2.read("frontier").collect()}
    assert got == exp

    s2 = crawl(store, fetcher, registry, batch_size=10, host_budget=4,
               rescore_every=2, compact_threshold=3)
    assert s2.requests == 0


def test_crawl_delay_host_pinned_to_single_politeness_group(spark):
    """RFC 9309 Crawl-delay is a HOST-level directive: a host that
    declares one must land in ONE sequential fetch group (salt pinned
    to 0) so the declared gap bounds the host's aggregate request rate;
    hosts without one keep the reference-parity HOST_SALT split."""
    from crab_spark.crawler import _host_salt

    rows = [(i, "cd.example", 1.0) for i in range(8)]
    rows += [(100 + i, "free.example", None) for i in range(8)]
    df = spark.createDataFrame(rows, "url_hash long, host string, crawl_delay double")
    hs = df.select("host", _host_salt(True).alias("_hs")).collect()
    by_host = {}
    for r in hs:
        by_host.setdefault(r["host"], set()).add(r["_hs"])
    assert len(by_host["cd.example"]) == 1          # pinned: one group
    assert len(by_host["free.example"]) > 1         # salted: skew split


def test_proxy_rotation_matches_mirror_random_topology(spark, tmp_path, registry):
    """Random topologies × a random failing proxy through the full
    dispatch path vs a Python replay of the pool semantics: per-row
    assignment alive[seq % n_alive] over the EPOCH's non-dead ids,
    failed rows staying pending and retrying on the shrunken pool, the
    per-epoch successes-then-failures saturating fold, and death at the
    -2 floor. Exact equality of dispatch order (incl. retries), seen
    set, and every proxy's final (requests, successes, counter)."""
    import random

    from crab_spark.corpus import CORPUS_SCHEMA, DATA_TYPE
    from crab_spark.proxy import ALIVE_MAX, ALIVE_MIN
    from crab_spark.store import TableStore
    from crab_spark.urlnorm import absolutize, canonicalize

    rng = random.Random(5531)
    for trial in range(2):
        n_pages = rng.randint(8, 12)
        corpus: dict[str, list[dict]] = {}
        for p in range(1, n_pages + 1):
            spans, off = [], 0

            def add(kind, text):
                nonlocal off
                spans.append({"kind": kind, "text": text,
                              "media_ref": "", "offset": off})
                off += max(len(text), 1)

            add("text", f"Proxy page {p}")
            for q in rng.sample(range(1, n_pages + 1),
                                rng.randint(1, min(5, n_pages))):
                add("link", f"/page/{q}")
            for d in range(rng.randint(0, 2)):
                n = p * 10 + d
                add("link", f"/data/{n}")
                corpus[C.data_url(n)] = C.data_spans(n)
            corpus[C.page_url(p)] = spans

        n_proxies = rng.randint(2, 3)
        fail_id = rng.randrange(n_proxies)
        seed = C.page_url(rng.randint(1, n_pages))
        batch = 5

        # -- mirror -----------------------------------------------------
        rows_m: list[dict] = []
        seen: dict[str, tuple[int, int, int]] = {}
        order: list[str] = []
        counter = [0] * n_proxies
        requests = [0] * n_proxies
        successes = [0] * n_proxies

        def register(url, type_id, depth):
            if url in seen:
                return False
            seen[url] = (len(rows_m), depth, type_id)
            rows_m.append({"url": url, "type_id": type_id, "depth": depth,
                           "pending": True, "seq": len(rows_m)})
            return True

        register(canonicalize(seed), C.PAGE_TYPE, 0)
        while True:
            b = sorted((r for r in rows_m if r["pending"]),
                       key=lambda r: (r["depth"], r["seq"]))[:batch]
            if not b:
                break
            if len(b) > 1:
                b = [b[0]] + b[:0:-1]
            alive = [i for i in range(n_proxies) if counter[i] > ALIVE_MIN]
            alive = alive or list(range(n_proxies))
            ep_ok = [0] * n_proxies
            ep_fail = [0] * n_proxies
            for page in b:
                pid = alive[page["seq"] % len(alive)]
                order.append(page["url"])
                ok = pid != fail_id and page["url"] in corpus
                valid = ok and registry.run_validate(
                    page["type_id"], corpus[page["url"]])
                if valid:
                    ep_ok[pid] += 1
                    page["pending"] = False
                    for href, t in registry.run_navigate(
                            page["type_id"], corpus[page["url"]]):
                        absu = absolutize(href, page["url"])
                        if absu is not None:
                            register(absu, t, page["depth"] + 1)
                else:
                    ep_fail[pid] += 1
            for i in range(n_proxies):
                if ep_ok[i] or ep_fail[i]:
                    requests[i] += ep_ok[i] + ep_fail[i]
                    successes[i] += ep_ok[i]
                    counter[i] = max(
                        ALIVE_MIN,
                        min(ALIVE_MAX, counter[i] + ep_ok[i]) - ep_fail[i],
                    )

        # -- engine -----------------------------------------------------
        rows = [
            (url, DATA_TYPE if "/data/" in url else C.PAGE_TYPE, spans)
            for url, spans in corpus.items()
        ]
        pool = ProxyPool([f"http://proxy{i}:3128" for i in range(n_proxies)])
        store = TableStore(tmp_path / f"px{trial}", spark)
        seed_frontier(
            store, spark.createDataFrame([(seed, C.PAGE_TYPE)], SEEDS)
        )
        stats = crawl(
            store,
            ProxyFailingFetcher(
                spark.createDataFrame(rows, CORPUS_SCHEMA), fail_ids=[fail_id]
            ),
            registry, batch_size=batch, proxy_pool=pool, record_order=True,
        )
        got = {
            r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store.read("frontier").collect()
        }
        assert got == seen, f"trial {trial}"
        assert stats.crawl_order == order, f"trial {trial}"
        for i, s in enumerate(pool.stats):
            assert (s.requests, s.successful_requests, s.alive_counter) == (
                requests[i], successes[i], counter[i]
            ), f"trial {trial} proxy {i}"
        assert pending(store).count() == 0, f"trial {trial}"
