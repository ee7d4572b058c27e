"""robots.txt politeness filter.

The reference has NO robots handling (checked all of src/ — SURVEY §2.2
F13), but the north_rule requires a robots cache joined into dispatch.

Design: a small ``robots(host, disallow array, fetched_epoch)`` cache
table, refreshed per epoch for hosts the frontier is about to touch,
broadcast-joined into the dequeued batch as a filter. Rule evaluation is
the standard longest-match-prefix subset (RFC 9309 simplified: only
Disallow prefixes for '*' agents, which is what urllib.robotparser
implements for our use) evaluated vectorized per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import ROBOTS
from .util import local_df


def parse_robots_txt(body: str) -> list[str]:
    """Extract Disallow prefixes for User-agent: * (simplified RFC 9309:
    last '*' group wins; empty Disallow = allow all)."""
    disallow: list[str] = []
    applies = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
            if applies:
                disallow = []
        elif key == "disallow" and applies and val:
            disallow.append(val)
    return disallow


def robots_table(spark, entries: dict[str, list[str]], epoch: int = 0) -> DataFrame:
    return local_df(
        spark, [(h, d, epoch) for h, d in sorted(entries.items())], ROBOTS
    )


ROBOTS_BODY = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("body", T.StringType(), True),  # NULL = unreachable
    ]
)


def fetch_robots_http(hosts: DataFrame, scheme: str = "http",
                      timeout: float = 5.0) -> DataFrame:
    """Fetch ``{scheme}://{host}/robots.txt`` for every host — one GET
    per host, distributed over host partitions (the robots refresh is
    O(#hosts), tiny next to the crawl itself). Unreachable hosts yield
    NULL bodies (⇒ allow-all, the crawl-friendly default)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import ssl
        import urllib.request

        ctx = ssl._create_unverified_context()
        for pdf in batches:
            bodies = []
            for h in pdf["host"]:
                try:
                    with urllib.request.urlopen(
                        f"{scheme}://{h}/robots.txt", timeout=timeout, context=ctx
                    ) as resp:
                        bodies.append(resp.read().decode("utf-8", errors="replace"))
                except Exception:
                    bodies.append(None)
            yield pd.DataFrame({"host": pdf["host"], "body": bodies})

    n = max(hosts.sparkSession.sparkContext.defaultParallelism, 4)
    return hosts.select("host").distinct().repartition(n, "host").mapInPandas(
        run, schema=ROBOTS_BODY
    )


def robots_from_bodies(bodies: DataFrame, epoch: int = 0) -> DataFrame:
    """Parse fetched robots.txt bodies into the broadcastable cache
    table — rule extraction runs vectorized (one Arrow batch per task).
    bodies: DataFrame[host, body]."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def parse(bod: pd.Series) -> pd.Series:
        return bod.map(lambda b: parse_robots_txt(b) if b else [])

    return bodies.select(
        "host", parse("body").alias("disallow"),
        F.lit(epoch).alias("fetched_epoch"),
    )


def allowed_udf():
    """Vectorized path-vs-disallow check. Join shape: batch ⋈ broadcast
    robots on host → filter. NULL disallow (host absent from the cache)
    ⇒ allowed (crawl-friendly default, matching common crawler practice)."""

    @F.pandas_udf(T.BooleanType())
    def allowed(urls: pd.Series, disallows: pd.Series) -> pd.Series:
        out = []
        for url, dis in zip(urls, disallows):
            if dis is None or len(dis) == 0:
                out.append(True)
                continue
            path = urlsplit(url).path or "/"
            out.append(not any(path.startswith(p) for p in dis))
        return pd.Series(out)

    return allowed


def with_robots_flag(batch: DataFrame, robots: DataFrame, flag: str = "robots_ok") -> DataFrame:
    """Add a boolean ``flag`` column: True iff no robots rule disallows
    the row's URL. The robots cache is tiny (one row per host) →
    broadcast join, no shuffle of the batch; rule evaluation is one
    Arrow crossing over the batch."""
    r = robots.select(F.col("host").alias("r_host"), "disallow")
    joined = batch.join(F.broadcast(r), batch["host"] == F.col("r_host"), "left")
    return joined.withColumn(flag, allowed_udf()(F.col("url"), F.col("disallow"))).drop(
        "r_host", "disallow"
    )


def filter_allowed(batch: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop batch rows whose URL a robots rule disallows."""
    return with_robots_flag(batch, robots).filter(F.col("robots_ok")).drop("robots_ok")
