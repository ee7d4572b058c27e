"""Shared oracle-parity comparison: run a registry query's Spark
implementation AND its DuckDB oracle on the same parquet tables and
compare row count, column set, and (order-insensitively) values. Used
by both scripts/check_oracle.py (the local stand-in for the driver's
correctness gate) and tests/test_oracle_parity.py (the in-suite gate
that makes ``pytest`` itself fail if any registry entry ever lacks
oracle parity — so no query can ship driver-unverified)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries import ORACLE_SQL, QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(con, sf_dir: str) -> None:
    """CREATE VIEWs for the standard table set on a DuckDB connection."""
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, floats
    rounded, rows sorted by every column — the driver's convention."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            # normalize null spellings first: Spark hands back None,
            # DuckDB np.nan/pd.NA inside object columns — astype(str)
            # would otherwise render 'None' vs 'nan' for the SAME NULL
            pdf[c] = pdf[c].map(
                lambda v: None
                if v is None or v is pd.NA
                or (isinstance(v, float) and np.isnan(v))
                else v
            ).astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif np.issubdtype(pdf[c].dtype, np.datetime64):
            # Spark hands back datetime64[ns], DuckDB datetime64[us]:
            # same instants, unequal dtypes — .equals() would fall to
            # the weaker per-column str path for every window query
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare_one(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    """(ok, detail) for one registry query vs its DuckDB oracle.
    ``detail`` carries the first mismatch for the failure message."""
    got = canon(QUERIES[name](spark, sf_dir).toPandas())
    want = canon(con.sql(ORACLE_SQL[name]).df())
    if len(got) != len(want):
        return False, f"rows: spark={len(got)} oracle={len(want)}"
    if list(got.columns) != list(want.columns):
        return False, (f"cols: spark={list(got.columns)} "
                       f"oracle={list(want.columns)}")
    if got.equals(want):
        return True, f"{len(got)} rows"
    # float tolerance second chance (duckdb DOUBLE vs spark rounding)
    for c in got.columns:
        a, b = got[c], want[c]
        if np.issubdtype(a.dtype, np.number) and np.issubdtype(b.dtype, np.number):
            if not np.allclose(a.astype(float), b.astype(float),
                               rtol=1e-9, atol=1e-9, equal_nan=True):
                i = int(np.argmax(~np.isclose(a.astype(float), b.astype(float),
                                              rtol=1e-9, atol=1e-9,
                                              equal_nan=True)))
                return False, f"{c}[{i}]: spark={a[i]!r} oracle={b[i]!r}"
        elif not a.astype(str).equals(b.astype(str)):
            i = int(np.argmax((a.astype(str) != b.astype(str)).to_numpy()))
            return False, f"{c}[{i}]: spark={a[i]!r} oracle={b[i]!r}"
    return True, f"{len(got)} rows (float-tol)"
