"""navigate-all (F9) and validate --reset sweep (F8) vs the oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from crab_spark import corpus as C
from crab_spark.crawler import CorpusFetcher, crawl
from crab_spark.frontier import pending, seed_frontier
from crab_spark.maintenance import navigate_all, validate_sweep
from crab_spark.parsers import SpanParser, ParserRegistry, load_registry
from crab_spark.parsers import data as parser_data
from crab_spark.parsers import listing as parser_listing
from crab_spark.schemas import SEEDS
from crab_spark.util import local_df

N = 8


def _crawled_store(spark, store, navigate=False):
    registry = load_registry([parser_listing, parser_data])
    seed_frontier(store, local_df(spark, [(C.page_url(p), C.PAGE_TYPE)
                                          for p in range(1, N)], SEEDS))
    crawl(store, CorpusFetcher(C.corpus_df(spark, N)), registry,
          navigate=navigate, batch_size=100)
    return registry


def test_navigate_all_discovers_links_at_parent_depth(spark, store):
    """Crawl WITHOUT navigation (only seeds downloaded), then
    navigate-all: every link of the downloaded pages gets registered at
    the PARENT depth (main.rs:212,219-221 quirk)."""
    registry = _crawled_store(spark, store, navigate=False)
    before = store.read("frontier").count()
    assert before == N - 1  # only seeds
    n_new = navigate_all(store, registry)
    # each seeded page p has 10 data links + pager pages (new ones only)
    frontier = store.read("frontier")
    assert n_new == frontier.count() - before
    assert n_new > 10 * (N - 1) - 1  # all data links are new
    # quirk: children carry the parent's depth (seeds depth 0)
    assert frontier.agg(F.max("depth")).collect()[0][0] == 0
    # second run is a no-op (idempotent registration)
    assert navigate_all(store, registry) == 0


def test_validate_sweep_resets_invalid(spark, store):
    registry = _crawled_store(spark, store, navigate=False)
    assert validate_sweep(store, registry) == 0  # everything valid

    # a stricter validator: pages > 3 are "invalid" now
    strict = ParserRegistry([
        SpanParser(
            type_id=C.PAGE_TYPE,
            validate=lambda spans: any(
                s["kind"] == "text" and int(s["text"].rsplit(" ", 1)[-1]) <= 3
                for s in spans if s["text"].startswith("Page number")
            ),
        ),
        SpanParser(type_id=C.DATA_TYPE),
    ])
    assert pending(store).count() == 0
    n_bad = validate_sweep(store, strict, reset=True)
    assert n_bad == (N - 1) - 3          # pages 4..N-1 reset
    assert pending(store).count() == n_bad  # back to NotDownloaded


def test_recrawl_older_than(spark, store):
    """TTL recrawl: pages fetched ≤ (max_epoch - age) flip back to
    pending; fresher pages and robots-skipped rows stay resolved."""
    from crab_spark import corpus as C
    from crab_spark.crawler import CorpusFetcher, crawl
    from crab_spark.frontier import pending, seed_frontier
    from crab_spark.maintenance import recrawl_older_than
    from crab_spark.parsers import data as pd_
    from crab_spark.parsers import listing as pl_
    from crab_spark.parsers import load_registry
    from crab_spark.schemas import SEEDS
    from pyspark.sql import functions as F

    registry = load_registry([pl_, pd_])
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)
    assert pending(store).count() == 0
    epochs = store.read("fetched").select("epoch").distinct().count()
    assert epochs >= 3
    cur = store.read("fetched").agg(F.max("epoch")).collect()[0][0]
    old = store.read("fetched").filter(F.col("epoch") <= cur - 2).count()
    n = recrawl_older_than(store, max_age_epochs=2)
    assert n == old and n > 0
    assert pending(store).count() == n  # exactly the stale rows re-queued
    assert recrawl_older_than(store, max_age_epochs=2) == 0  # idempotent

    # and the crawl picks them back up to completion
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)
    assert pending(store).count() == 0


def test_repeated_recrawl_does_not_destroy_fetched_log(spark, store):
    """Regression (r2 advice): a second recrawl_older_than with rows to
    flip used to rmtree the live committed 'snap-recrawl' dir and then
    lazily read it — failing the write and corrupting the fetched log.
    overwrite() now lands in a version-unique dir, so periodic recrawl
    is safe to run forever."""
    from crab_spark.frontier import pending, seed_frontier
    from crab_spark.maintenance import recrawl_older_than
    from crab_spark.parsers import data as pd_
    from crab_spark.parsers import listing as pl_
    from crab_spark.parsers import load_registry
    from crab_spark.schemas import SEEDS

    registry = load_registry([pl_, pd_])
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    fetcher = CorpusFetcher(C.corpus_df(spark, 4))
    crawl(store, fetcher, registry, batch_size=10)
    assert recrawl_older_than(store, max_age_epochs=0) > 0   # first rewrite
    crawl(store, fetcher, registry, batch_size=10)           # re-fetch them
    n2 = recrawl_older_than(store, max_age_epochs=0)         # second rewrite
    assert n2 > 0
    # the log is intact and readable — every row accounted for
    assert store.read("fetched").count() >= 0
    crawl(store, fetcher, registry, batch_size=10)
    assert pending(store).count() == 0
    # and reset_pages (same overwrite pattern) survives repetition too
    from crab_spark.frontier import reset_pages

    some = store.read("frontier").limit(2).select("url_hash")
    reset_pages(store, some)
    reset_pages(store, some)
    assert pending(store).count() == 2


def test_resume_epoch_survives_fetched_compaction(spark, store):
    """Regression (r2 advice): compacting 'fetched' erased the done-*
    tags the resume epoch derives from, so a resumed crawl could reuse
    a committed epoch number. collapsed_tags in the manifest keep the
    done history across compaction/rewrites."""
    from crab_spark.crawler import _resume_epoch
    from crab_spark.frontier import seed_frontier
    from crab_spark.parsers import data as pd_
    from crab_spark.parsers import listing as pl_
    from crab_spark.parsers import load_registry
    from crab_spark.schemas import SEEDS

    registry = load_registry([pl_, pd_])
    seed_frontier(store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS))
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)
    before = _resume_epoch(store)
    assert before >= 3
    # wipe the state mirror so only the manifest history can answer
    store.write_state("crawl", {"epoch": 0})
    store.compact("fetched", n_files=1)
    assert _resume_epoch(store) == before


def test_navigate_all_matches_mirror_random_graph(spark, tmp_path):
    """Seeded-random graphs through navigate-all vs a pure-Python
    replay of the reference's sequential scan (main.rs:202-223):
    parents in (depth, doc_id) order, links in navigate-output order,
    first-wins registration at the parent's depth. The fixture test
    above pins the quirk; this pins the ordered_index registration
    path (seq assignment) on link graphs nobody chose."""
    import random

    from crab_spark.corpus import CORPUS_SCHEMA, DATA_TYPE
    from crab_spark.store import TableStore
    from crab_spark.urlnorm import absolutize, canonicalize

    rng = random.Random(7121)
    registry = load_registry([parser_listing, parser_data])
    for trial in range(2):
        n_pages = rng.randint(6, 10)
        corpus: dict[str, list[dict]] = {}
        for p in range(1, n_pages + 1):
            spans, off = [], 0

            def add(kind, text):
                nonlocal off
                spans.append({"kind": kind, "text": text,
                              "media_ref": "", "offset": off})
                off += max(len(text), 1)

            add("text", f"Nav page {p}")
            for q in rng.sample(range(1, n_pages + 1),
                                rng.randint(1, min(4, n_pages))):
                add("link", f"/page/{q}")
            for d in range(rng.randint(0, 2)):
                add("link", f"/data/{p * 10 + d}")
            corpus[C.page_url(p)] = spans

        rows = [(url, C.PAGE_TYPE, spans) for url, spans in corpus.items()]
        seeds = rng.sample(sorted(corpus), rng.randint(2, 4))
        store = TableStore(tmp_path / f"nav{trial}", spark)
        seed_frontier(store, local_df(
            spark, [(u, C.PAGE_TYPE) for u in seeds], SEEDS))
        crawl(store, CorpusFetcher(spark.createDataFrame(rows, CORPUS_SCHEMA)),
              registry, navigate=False, batch_size=100)
        n_new = navigate_all(store, registry)  # quirk default: parent depth

        # -- mirror ---------------------------------------------------
        seen: dict[str, tuple[int, int, int]] = {}
        # seed_frontier assigns seq in canonical-URL-ascending order
        # (frontier.py:50-58 — the CLI-call-order stand-in)
        for cu in sorted(filter(None, (canonicalize(u) for u in seeds))):
            if cu not in seen:
                seen[cu] = (len(seen), 0, C.PAGE_TYPE)
        downloaded = sorted(u for u in seen)  # all depth 0: doc_id order
        want_new = 0
        for doc_id in downloaded:
            for href, t in registry.run_navigate(C.PAGE_TYPE, corpus[doc_id]):
                absu = absolutize(href, doc_id)
                if absu is not None and absu not in seen:
                    seen[absu] = (len(seen), 0, t)  # parent depth quirk
                    want_new += 1

        got = {
            r["url"]: (r["seq"], r["depth"], r["type_id"])
            for r in store.read("frontier").collect()
        }
        assert n_new == want_new, f"trial {trial}"
        assert got == seen, f"trial {trial}"


def test_validate_sweep_matches_mirror_random_subset(spark, tmp_path):
    """Random invalid subsets through validate --reset: the sweep must
    reset exactly the pages the (arbitrary) validator rejects, and the
    pending set afterwards must be precisely that subset."""
    import random

    from crab_spark.store import TableStore

    rng = random.Random(9203)
    registry = load_registry([parser_listing, parser_data])
    for trial in range(2):
        n = rng.randint(6, 10)
        store = TableStore(tmp_path / f"vs{trial}", spark)
        seed_frontier(store, local_df(
            spark, [(C.page_url(p), C.PAGE_TYPE) for p in range(1, n + 1)],
            SEEDS))
        crawl(store, CorpusFetcher(C.corpus_df(spark, n + 1)), registry,
              navigate=False, batch_size=100)

        bad = set(rng.sample(range(1, n + 1), rng.randint(1, n - 1)))

        def is_ok(spans, _bad=bad):
            for s in spans:
                if s["kind"] == "text" and s["text"].startswith("Page number"):
                    return int(s["text"].rsplit(" ", 1)[-1]) not in _bad
            return True

        strict = ParserRegistry([
            SpanParser(type_id=C.PAGE_TYPE, validate=is_ok),
            SpanParser(type_id=C.DATA_TYPE),
        ])
        n_bad = validate_sweep(store, strict, reset=True)
        assert n_bad == len(bad), f"trial {trial}"
        got_pending = {r["url"] for r in pending(store).collect()}
        assert got_pending == {C.page_url(p) for p in bad}, f"trial {trial}"


def test_refetch_single_visible_document_version(spark, store):
    """A re-fetched page appends a SECOND documents row (append-only
    log, no two-table atomic rewrite) — every reader must see exactly
    ONE version, the newest (the reference's content-replaced
    semantics, storage.rs UPDATE pages)."""
    from crab_spark.frontier import reset_pages
    from crab_spark.maintenance import _downloaded_docs
    from crab_spark.report import dump_content
    from crab_spark.util import latest_documents

    registry = load_registry([parser_listing, parser_data])
    seed_frontier(
        store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS)
    )
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)
    url = C.page_url(1)
    first = store.read("documents").where(F.col("doc_id") == url).collect()
    assert len(first) == 1

    reset_pages(
        store,
        store.read("frontier").where(F.col("url") == url).select("url_hash"),
    )
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)

    # the log keeps both versions (lineage), readers see only the newest
    raw = store.read("documents").where(F.col("doc_id") == url)
    assert raw.count() == 2
    vis = latest_documents(store.read("documents")).where(
        F.col("doc_id") == url
    ).collect()
    assert len(vis) == 1
    assert vis[0]["fetched_epoch"] == max(r["fetched_epoch"] for r in raw.collect())
    assert vis[0]["spans"] == first[0]["spans"]  # deterministic corpus content

    # reader choke points: one row per doc everywhere
    dd = _downloaded_docs(store)
    assert dd.where(F.col("doc_id") == url).count() == 1
    assert dd.count() == dd.select("doc_id").distinct().count()
    assert dump_content(store, url).count() == 1
    # navigate-all over the doubled log registers nothing new
    assert navigate_all(store, registry) == 0


def test_prune_document_versions(spark, store):
    """Superseded versions fold away; visible content and resume
    semantics are untouched."""
    from crab_spark.frontier import reset_pages
    from crab_spark.maintenance import prune_document_versions
    from crab_spark.util import latest_documents

    registry = load_registry([parser_listing, parser_data])
    seed_frontier(
        store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS)
    )
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)
    url = C.page_url(1)
    reset_pages(
        store,
        store.read("frontier").where(F.col("url") == url).select("url_hash"),
    )
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)
    before = {
        r["doc_id"]: r["spans"]
        for r in latest_documents(store.read("documents")).collect()
    }
    assert store.read("documents").count() == len(before) + 1  # one superseded

    assert prune_document_versions(store) == 1
    assert store.read("documents").count() == len(before)
    after = {
        r["doc_id"]: r["spans"] for r in store.read("documents").collect()
    }
    assert after == before  # visible content identical
    assert prune_document_versions(store) == 0  # idempotent
    # resume unaffected: nothing pending, a follow-up crawl no-ops
    stats = crawl(
        store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10
    )
    assert stats.requests == 0
