#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
measurement, so side measurements live here — guide §1.4 noop-sink
isolation, per-query subsets, and crawl phase profiles).

Usage:
  python bench_extra.py queries [name ...]   # noop-timed queries (best of N)
  python bench_extra.py crawl               # profiled crawl at bench scale
  python bench_extra.py plans [name ...]    # write plans/r06/<name>_after.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's r5
measurement scale), SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPEATS.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crab_spark.queries import QUERIES  # noqa: E402
from crab_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_scan_filter_project", "q04_topk_order", "q07_anti_join",
    "q09_pricing_summary", "q10_broadcast_join", "q11_multi_join",
    "q12_window_topk", "q18_tumbling_window", "q19_sessionize",
    "q21_exact_dedup", "q23_lsh_pairs", "q27_embedding_topk",
    "q34_word_freq",
]


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("crab_spark_bench_extra", master=f"local[{cpus}]",
                     shuffle_partitions=cpus)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(names: list[str]) -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = _spark()
    out = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        fn(spark, sf).count()  # warm plan + files, same as bench.py
        samples = []
        for _ in range(repeats):
            t0 = time.monotonic()
            noop(fn(spark, sf))
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name:28s} min={min(samples):7.3f}  {samples}", flush=True)
    print(json.dumps({"sf_dir": sf, "queries": out}))


def bench_crawl() -> None:
    from crab_spark.corpus import PAGE_TYPE, mh_page_url, multihost_corpus_df
    from crab_spark.crawler import CorpusFetcher, crawl
    from crab_spark.frontier import seed_frontier
    from crab_spark.parsers import data, listing, load_registry
    from crab_spark.schemas import SEEDS
    from crab_spark.store import TableStore
    from crab_spark.util import local_df

    spark = _spark()
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "5000"))
    corpus = multihost_corpus_df(spark, n_pages).cache()
    corpus.count()
    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".tmp", "bench_extra_wh")
    for run in range(2):
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
        t1 = time.monotonic()
        crawl(store, CorpusFetcher(corpus), registry, batch_size=80_000,
              profile=True)
        print(f"run{run}: seed={t1 - t0:.1f}s crawl={time.monotonic() - t1:.1f}s "
              f"total={time.monotonic() - t0:.1f}s", flush=True)
    shutil.rmtree(scratch, ignore_errors=True)


def write_plans(names: list[str], suffix: str = "after") -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = _spark()
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(d, exist_ok=True)
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, sf).explain("formatted")
        path = os.path.join(d, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if mode == "queries":
        bench_queries(rest or HEADLINE)
    elif mode == "crawl":
        bench_crawl()
    elif mode == "plans":
        write_plans(rest or HEADLINE, suffix=os.environ.get("PLAN_SUFFIX", "after"))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
