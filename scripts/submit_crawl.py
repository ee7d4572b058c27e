"""spark-submit entry point — the cluster deployment path the north
rule requires ("runs under spark-submit --py-files on multi-executor
clusters"). The package ships as a zip on --py-files; NOTHING here
assumes local mode — the session comes from the submit command's
--master, parsers are plain modules inside the zip (imported on
executors like any --py-files code), and all state lives in the
warehouse path (shared storage on a real cluster).

    cd <repo> && zip -qr /tmp/crab_spark.zip crab_spark
    spark-submit --master local[8] --py-files /tmp/crab_spark.zip \
        scripts/submit_crawl.py <warehouse> <corpus.parquet> <seed_url> [batch_size]

Prints ONE json line of crawl stats on success.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from crab_spark.crawler import CorpusFetcher, crawl
from crab_spark.frontier import seed_frontier
from crab_spark.parsers import data, listing, load_registry
from crab_spark.schemas import SEEDS
from crab_spark.store import TableStore
from crab_spark.util import local_df


def main() -> int:
    warehouse, corpus_path, seed_url = sys.argv[1:4]
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    spark = SparkSession.builder.appName("crab_spark_crawl").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    store = TableStore(warehouse, spark)
    registry = load_registry([listing, data])
    seed_frontier(store, local_df(spark, [(seed_url, listing.TYPE_ID)], SEEDS))
    stats = crawl(
        store, CorpusFetcher(spark.read.parquet(corpus_path)), registry,
        batch_size=batch,
    )
    print(json.dumps({
        "epochs": stats.epochs, "requests": stats.requests,
        "successful": stats.successful, "new_links": stats.new_links,
        "wall_sec": round(stats.wall_sec, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
