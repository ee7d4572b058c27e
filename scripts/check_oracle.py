"""Local stand-in for the driver's correctness gate: run a query's
Spark implementation AND its DuckDB oracle side-by-side and compare
row count, column set, and (order-insensitively) values. The
comparison itself lives in crab_spark.oracle (shared with
tests/test_oracle_parity.py, which runs it over EVERY registry entry
at sf0.001 inside the test suite).

Usage: python scripts/check_oracle.py [q36_media_features ...]
       (no args = all oracled queries)  [--sf DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crab_spark.oracle import compare_one, register_views  # noqa: E402
from crab_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from crab_spark.session import get_spark  # noqa: E402


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
    register_views(con, sf)
    failed = []
    for name in names:
        try:
            ok, detail = compare_one(spark, con, name, sf)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        if not ok:
            failed.append(name)
        print(f"{'OK ' if ok else 'FAIL'} {name}: {detail}")
    print(f"\n{len(names) - len(failed)}/{len(names)} green"
          + (f"; failed: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
