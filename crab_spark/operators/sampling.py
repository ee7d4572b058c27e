"""Deterministic corpus sampling — reproducible downsampling/mixing for
training-data pipelines.

Random sampling (df.sample) is seed- and partitioning-dependent; a
100 TB pipeline wants the SAME subset on every run, engine, and retry.
Hash sampling gives that: keep a row iff md5(salt || key) — uniform in
[0, 2^128) — falls under rate·2^128. Pure codegen expressions, no
shuffle, portable to any engine with md5 (the DuckDB oracle runs the
identical predicate; lowercase fixed-width hex compares lexicographic ==
numeric). The salt decorrelates independent samples of the same corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """32-nibble hex threshold for a keep-rate in [0, 1]."""
    rate = min(max(rate, 0.0), 1.0)
    return format(min(int(rate * (1 << 128)), (1 << 128) - 1), "032x")


def _key_hash(key_col: str, salt: str) -> Column:
    return F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic ~rate sample keyed on ``key_col``."""
    if rate >= 1.0:
        return df
    if rate <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(_key_hash(key_col, salt) < F.lit(_hex_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. language rebalancing:
    {'en': 0.1, 'de': 1.0}); strata absent from ``rates`` keep
    ``default_rate``. One codegen'd CASE over the stratum column — no
    shuffle, no per-stratum passes."""
    thresh = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strat_col) == value
        lit = F.lit(_hex_threshold(rate))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    thresh = (
        F.lit(_hex_threshold(default_rate)) if thresh is None
        else thresh.otherwise(F.lit(_hex_threshold(default_rate)))
    )
    return df.filter(_key_hash(key_col, salt) < thresh)
