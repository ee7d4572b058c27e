"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``      — flagship query (pricing-summary aggregation,
  TPC-H Q1 shape) over /root/testdata/sf0.001.
- ``queries()``         — one entry per implemented operator from
  SURVEY.md §2 + the training-data operator suite
  (see crab_spark/queries.py for the full inventory).
- ``oracle_sql()``      — matching DuckDB SQL for EVERY query in the
  registry (len(queries()) == len(oracle_sql()), asserted in tests):
  simhash via md5_number_upper bit math, the IVF assign/probe pipeline,
  and the media decode pipeline via the stub decoder's md5-derived
  contract (one SQL expression reproduces its widths/frames/features).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crab_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q09_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
