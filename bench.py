#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the crawl-engine
throughput benchmark (the BASELINE.json headline metric: URLs
fetched+deduped per second) over a deterministic synthetic multi-host
corpus (no network; see crab_spark/corpus.py).

Queries are materialized with the noop sink (full pipeline execution,
no driver collect). The N-vs-4N scaling-efficiency evidence lives in
scripts/scaling_bench.py (it needs two SparkSessions at different
parallelism levels → separate processes) and is recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crab_spark.corpus import PAGE_TYPE, mh_page_url, multihost_corpus_df  # noqa: E402
from crab_spark.crawler import CorpusFetcher, crawl  # noqa: E402
from crab_spark.frontier import seed_frontier  # noqa: E402
from crab_spark.parsers import data, listing, load_registry  # noqa: E402
from crab_spark.queries import QUERIES  # noqa: E402
from crab_spark.schemas import SEEDS  # noqa: E402
from crab_spark.session import get_spark  # noqa: E402
from crab_spark.store import TableStore  # noqa: E402
from crab_spark.util import local_df  # noqa: E402

HEADLINE = [
    "q01_scan_filter_project",
    "q04_topk_order",
    "q07_anti_join",
    "q09_pricing_summary",
    "q10_broadcast_join",
    "q11_multi_join",
    "q12_window_topk",
    "q18_tumbling_window",
    "q19_sessionize",
    "q21_exact_dedup",
    "q23_lsh_pairs",
    "q27_embedding_topk",
    "q34_word_freq",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm plan + files (not timed)
        t0 = time.monotonic()
        materialize(fn(spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def bench_crawl(spark, n_pages: int, scratch: str,
                host_budget: int | None = None) -> tuple[float, float, int]:
    """Full crawl of the synthetic multi-host graph (11 URLs per page),
    densely seeded so epochs are fat (BFS diameter ~3). Returns
    (wall_sec, urls_per_sec, n_urls). ``host_budget`` switches to the
    north_rule's priority frontier (banded rescore snapshot + cutoff-
    pruned dequeue) — benched separately to pin that priority-mode
    epochs cost O(batch + head slice) like BFS mode."""
    corpus = multihost_corpus_df(spark, n_pages).cache()
    corpus.count()
    shutil.rmtree(scratch, ignore_errors=True)
    store = TableStore(scratch, spark)
    registry = load_registry([listing, data])
    seeds = local_df(
        spark,
        [(mh_page_url(p, 32), PAGE_TYPE) for p in range(1, n_pages + 1, 10)],
        SEEDS,
    )
    t0 = time.monotonic()
    seed_frontier(store, seeds)
    stats = crawl(store, CorpusFetcher(corpus), registry, batch_size=80_000,
                  host_budget=host_budget)
    wall = time.monotonic() - t0
    corpus.unpersist()
    shutil.rmtree(scratch, ignore_errors=True)
    return wall, stats.requests / wall, stats.requests


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "5000"))
    # sf is reporting metadata only — a dir not named .../sf<number>
    # must not crash the bench before any query runs
    m = re.search(r"sf(\d+(?:\.\d+)?)/*$", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("crab_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    queries = bench_queries(spark, sf_dir)
    # best-of-2: local-mode wall times vary ~2× run-to-run (GC + python
    # worker churn); min is the standard noise-robust point estimate
    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".tmp", "bench_wh")
    runs = [bench_crawl(spark, n_pages, scratch) for _ in range(2)]
    crawl_wall, crawl_thr, n_urls = min(runs, key=lambda r: r[0])
    queries["crawl_55k_urls"] = round(crawl_wall, 3)
    # headline total keeps the r1-r3 key set (comparable across rounds);
    # the priority-mode crawl is recorded as an extra key outside the sum
    total = round(sum(queries.values()), 3)
    # priority mode (host-budget frontier), single run: pins that the
    # banded-snapshot dequeue keeps priority epochs O(batch)-shaped
    prio_wall, prio_thr, _ = bench_crawl(spark, n_pages, scratch,
                                         host_budget=1_000)
    queries["crawl_priority_mode"] = round(prio_wall, 3)

    print(json.dumps({
        "metric": "headline suite wall time (13 queries + full synthetic crawl; crawl_priority_mode reported separately, outside the total)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl_urls_per_sec": round(crawl_thr, 1),
        "crawl_priority_urls_per_sec": round(prio_thr, 1),
        "crawl_n_urls": n_urls,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
