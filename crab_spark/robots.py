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
