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


def test_export_table_matches_mirror_random_ragged(spark):
    """Seeded-random ragged multi-table parses through the full Spark
    path (parse_documents mapInPandas → long format → first-seen
    column_order → pivot/""-fill → (doc_id, row_idx) order) vs a pure-
    Python replay of the reference's table semantics (table.rs:21-38,
    74-83). The golden tests above pin the reference fixture; this pins
    the distributed plumbing on shapes nobody chose — random column
    subsets/orders (raggedness), dotted + mixed-case names (the pivot
    quoting path), multiple tables per document."""
    import random

    from pyspark.sql import types as T

    from crab_spark.schemas import SPAN
    from crab_spark.tabulator import parse_documents

    COLS = ["a", "b", "price.usd", "Name", "x1", "x2"]
    DOCS_SCHEMA = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ])

    def fake_parse(spans):
        # each text span "table|c=v,..." is one row of that table
        tables: dict[str, list[dict]] = {}
        for s in spans:
            if s["kind"] != "text":
                continue
            tname, _, body = s["text"].partition("|")
            row = {}
            for kv in body.split(","):
                k, _, v = kv.partition("=")
                row[k] = v
            tables.setdefault(tname, []).append(row)
        return tables

    registry = ParserRegistry(
        [SpanParser(type_id=77, name="random-ragged", parse=fake_parse)]
    )
    rng = random.Random(2711)
    for trial in range(3):
        docs = []
        for i in range(rng.randint(5, 9)):
            spans = []
            for off in range(rng.randint(1, 4)):
                tname = rng.choice(["t1", "t2"])
                chosen = rng.sample(COLS, rng.randint(1, 4))
                body = ",".join(f"{c}={rng.randint(0, 99)}" for c in chosen)
                spans.append({"kind": "text", "text": f"{tname}|{body}",
                              "media_ref": "", "offset": off})
            docs.append((f"doc{i:02d}", 77, spans))

        parsed = parse_documents(
            spark.createDataFrame(docs, DOCS_SCHEMA), registry
        )
        for tname in ("t1", "t2"):
            wide = export_table(parsed, tname)
            got_cols = [c for c in wide.columns
                        if c not in ("doc_id", "row_idx")]
            got = [tuple(r) for r in wide.collect()]

            # -- mirror: replay parse + first-seen order + ragged fill
            long = []
            for doc_id, _, spans in docs:
                for tn, rows in fake_parse(spans).items():
                    if tn != tname:
                        continue
                    for ri, row in enumerate(rows):
                        for ci, (c, v) in enumerate(row.items()):
                            long.append((doc_id, ri, ci, c, str(v)))
            first: dict[str, tuple] = {}
            cells: dict[tuple, dict[str, str]] = {}
            for doc_id, ri, ci, c, v in long:
                key = (doc_id, ri, ci)
                if c not in first or key < first[c]:
                    first[c] = key
                cells.setdefault((doc_id, ri), {})[c] = v
            want_cols = sorted(first, key=first.__getitem__)
            want = [
                (doc_id, ri, *[cells[(doc_id, ri)].get(c, "")
                               for c in want_cols])
                for doc_id, ri in sorted(cells)
            ]
            assert got_cols == want_cols, f"trial {trial} {tname}"
            assert got == want, f"trial {trial} {tname}"
