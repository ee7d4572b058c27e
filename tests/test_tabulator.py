"""Tabulator unit tests — the dynamic-column CSV golden from the
reference (table.rs:74-83) plus parser-registry behavior."""

from __future__ import annotations

import pytest

from crab_spark.parsers import ParserRegistry, SpanParser, load_registry
from crab_spark.schemas import PARSED
from crab_spark.tabulator import column_order, export_table, to_csv_string


def test_ragged_union_golden(spark):
    """rows {foo:bar} then {bar:baz} → csv "foo,bar\\nbar,\\n,baz\\n"
    (table.rs:74-83): first-seen column order, "" fill."""
    parsed = spark.createDataFrame(
        [
            ("d", "t", 0, 0, "foo", "bar"),
            ("d", "t", 1, 0, "bar", "baz"),
        ],
        PARSED,
    )
    wide = export_table(parsed, "t")
    cols = [c for c in wide.columns if c not in ("doc_id", "row_idx")]
    assert cols == ["foo", "bar"]
    assert to_csv_string(wide, cols) == "foo,bar\nbar,\n,baz\n"


def test_first_seen_order_across_rows(spark):
    parsed = spark.createDataFrame(
        [
            ("d", "t", 0, 0, "a", "1"),
            ("d", "t", 0, 1, "c", "2"),
            ("d", "t", 1, 0, "b", "3"),
            ("d", "t", 1, 1, "a", "4"),
        ],
        PARSED,
    )
    assert column_order(parsed, ["doc_id", "row_idx"]) == ["a", "c", "b"]


def test_registry_dispatch_missing_type():
    reg = ParserRegistry([SpanParser(type_id=1)])
    with pytest.raises(KeyError, match="Page parser not found"):
        reg.get(9)


def test_registry_defaults():
    """missing validate ⇒ True (python.rs:99-101); missing navigate ⇒ no
    links; flat parse dict normalized to {'default': [row]}."""
    reg = ParserRegistry(
        [SpanParser(type_id=1, parse=lambda spans: {"k": "v"})]
    )
    assert reg.run_validate(1, []) is True
    assert reg.run_navigate(1, []) == []
    assert reg.run_parse(1, []) == {"default": [{"k": "v"}]}


def test_load_registry_describe():
    from crab_spark.parsers import data as d, listing as l

    reg = load_registry([l, d])
    desc = reg.describe()
    assert [p["type_id"] for p in desc] == [1, 2]
    assert desc[0]["navigate"] and not desc[0]["parse"]
    assert desc[1]["parse"] and not desc[1]["navigate"]
