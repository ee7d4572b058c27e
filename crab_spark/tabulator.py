"""Parse + tabulate + export — `crab export-table` (main.rs:246-260) and
the dynamic-schema tabulator (table.rs).

Reference semantics:
- parse() yields named tables of string→string rows; rows within a table
  may have **ragged, differing column sets** (lib.rs:67-68).
- the tabulator unions columns dynamically in FIRST-SEEN order and fills
  gaps with "" (table.rs:21-38, 40-59; golden test table.rs:74-83:
  rows {foo:bar},{bar:baz} → csv "foo,bar\\nbar,\\n,baz\\n").
- export-table takes one named table across all pages, with an optional
  CASE-INSENSITIVE column filter (main.rs:392-398, empty = all columns).
- pages whose parser lacks parse() or lacks the table contribute nothing
  (main.rs:253-254).

Spark shape: documents → one mapInPandas parse pass → LONG format
(doc_id, table_name, row_idx, col_idx, col, val) → pivot per table.
Long format is the scalable representation: ragged columns never force a
schema merge across 10^10 documents, and the pivot runs only over the
one exported table after a pushed-down table_name filter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parsers import ParserRegistry
from .schemas import PARSED


def parse_documents(docs: DataFrame, registry: ParserRegistry) -> DataFrame:
    """documents(doc_id, spans, ...) joined w/ type_id → long-format parsed
    rows. docs must carry (doc_id, type_id, spans)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, type_id, spans in zip(pdf["doc_id"], pdf["type_id"], pdf["spans"]):
                if spans is None or not registry.has(int(type_id)):
                    continue
                tables = registry.run_parse(int(type_id), [dict(s) for s in spans])
                for tname, rows in tables.items():
                    for ri, row in enumerate(rows):
                        for ci, (col, val) in enumerate(row.items()):
                            out.append((doc_id, tname, ri, ci, str(col), str(val)))
            yield pd.DataFrame(
                out, columns=["doc_id", "table_name", "row_idx", "col_idx", "col", "val"]
            )

    return docs.select("doc_id", "type_id", "spans").mapInPandas(run, schema=PARSED)


def _q(c: str):
    """Backtick-quoted column reference: parsers emit ARBITRARY column
    names (ragged string rows, lib.rs:67-68), and an unquoted name
    containing a dot ('price.usd') resolves as nested-field access and
    raises UNRESOLVED_COLUMN."""
    return F.col("`" + c.replace("`", "``") + "`")


def column_order(parsed: DataFrame, row_key: list[str]) -> list[str]:
    """First-seen column order (table.rs:21-38): a column's rank is the
    smallest (row position, col_idx) at which it appears."""
    first_seen = (
        parsed.groupBy("col")
        .agg(F.min(F.struct(*row_key, "col_idx")).alias("fs"))
        .orderBy("fs")
        .select("col")
        .collect()
    )
    return [r["col"] for r in first_seen]


def export_table(
    parsed: DataFrame,
    table_name: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """One named table, wide form, ragged gaps filled with "". Row order
    is (doc_id, row_idx) — the reference's stream order under its
    deterministic scan. ``columns``: case-insensitive filter."""
    t = parsed.filter(F.col("table_name") == table_name)
    if columns:
        wanted = [c.lower() for c in columns]
        t = t.filter(F.lower(F.col("col")).isin(wanted))
    cols = column_order(t, row_key=["doc_id", "row_idx"])
    if not cols:
        return t.select("doc_id", "row_idx").distinct()
    wide = (
        t.groupBy("doc_id", "row_idx")
        .pivot("col", cols)
        .agg(F.first("val"))
        .select("doc_id", "row_idx",
                *[F.coalesce(_q(c), F.lit("")).alias(c) for c in cols])
        .orderBy("doc_id", "row_idx")
    )
    return wide


def to_csv_string(wide: DataFrame, cols: list[str]) -> str:
    """Driver-side golden-string renderer (tests only — real exports go
    through df.write.csv). Matches table.rs:40-59 byte format."""
    lines = [",".join(cols)]
    for row in wide.select(*[_q(c) for c in cols]).collect():
        lines.append(",".join("" if v is None else str(v) for v in row))
    return "\n".join(lines) + "\n"


def write_csv(wide: DataFrame, path: str) -> None:
    """Distributed CSV sink (S8). Header on, empty string for gaps."""
    wide.write.mode("overwrite").option("header", "true").option("emptyValue", "").csv(path)
