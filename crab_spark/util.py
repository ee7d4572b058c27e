"""Small shared helpers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_df(spark: SparkSession, rows: list[tuple], schema: T.StructType) -> DataFrame:
    """Tiny driver-side DataFrame via the pandas→Arrow path.

    ``spark.createDataFrame(list, schema)`` parallelizes through the
    legacy pickle RDD path — in local mode every action on it launches
    one Python worker per partition (~6-8 s for a 32-row frame at
    local[32]). The Arrow path ships a single batch, ~30× faster, and on
    a cluster avoids shipping a pickled RDD entirely.
    """
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf, schema=schema)
