"""Local stand-in for the driver's correctness gate: run a query's
Spark implementation AND its DuckDB oracle side-by-side and compare
row count, column set, and (order-insensitively) values.

Usage: python scripts/check_oracle.py [q36_media_features ...]
       (no args = all oracled queries)  [--sf DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crab_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from crab_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    names = args or [n for n in QUERIES if n in ORACLE_SQL]
    spark = get_spark(app_name="oracle-check",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    failed = []
    for name in names:
        try:
            got = canon(QUERIES[name](spark, sf).toPandas())
            want = canon(con.sql(ORACLE_SQL[name]).df())
            rows = len(got) == len(want)
            cols = list(got.columns) == list(want.columns)
            vals = rows and cols and got.equals(want)
            if not vals and rows and cols:
                # float tolerance second chance
                vals = True
                for c in got.columns:
                    a, b = got[c], want[c]
                    if np.issubdtype(a.dtype, np.number) and np.issubdtype(
                            b.dtype, np.number):
                        if not np.allclose(a.astype(float), b.astype(float),
                                           rtol=1e-9, atol=1e-9, equal_nan=True):
                            vals = False
                    elif not a.astype(str).equals(b.astype(str)):
                        vals = False
            status = "OK " if vals else "FAIL"
            if not vals:
                failed.append(name)
            print(f"{status} {name}: spark={len(got)} oracle={len(want)} "
                  f"cols_match={cols}")
            if not vals and rows and cols:
                diff = (got != want)
                bad_cols = [c for c in got.columns if diff[c].any()]
                print(f"     differing cols: {bad_cols[:5]}")
                for c in bad_cols[:2]:
                    i = int(np.argmax(diff[c].to_numpy()))
                    print(f"     {c}[{i}]: spark={got[c][i]!r} oracle={want[c][i]!r}")
            elif not cols:
                print(f"     spark cols={list(got.columns)}\n"
                      f"     oracle cols={list(want.columns)}")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(names) - len(failed)}/{len(names)} green"
          + (f"; failed: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
