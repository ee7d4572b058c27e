"""Deterministic synthetic crawl-graph corpus.

Reproduces the reference's end-to-end fixture topology
(/root/reference/examples/test_server/test-server.py:9-56) as an
*interleaved text+media span* table per BASELINE.json input_hint —
no network, fully closed-form, so golden outputs are exact:

- ``/page/{p}`` for p in 1..n_pages: a text span, one media span, ten
  link spans to ``/data/{p*10+d}`` (d in 0..9), then pager link spans to
  ``/page/{q}`` for q in max(1, p-5) .. min(n_pages, p+5)-1.
- ``/data/{d}``: text spans carrying ``input={d}`` and ``output={d*d}``
  (the reference renders these as .input/.output CSS spans that
  parser_data.py extracts).

Reachable set from seed page 1: all n_pages pages + all 10*n_pages data
URLs — the golden seen-set for the e2e crawl test.

Generation is distributed (spark.range → mapInPandas), so the bench can
scale the graph (n_pages=50_000 ⇒ 550k URLs) without driver memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schemas import SPAN
from pyspark.sql import types as T

BASE = "http://localhost:8080"
PAGE_TYPE = 1   # parser_listing.py TYPE_ID
DATA_TYPE = 2   # parser_data.py TYPE_ID

# Multi-host variant (bench): the fixture topology spread over H hosts so
# the per-host politeness groups and hot-host salting actually parallelize
# — page p lives on host{p mod H}; its data children inherit the host via
# relative hrefs; pager links are absolute (they cross hosts).


def mh_page_url(p: int, n_hosts: int) -> str:
    return f"http://host{p % n_hosts}.example.com/page/{p}"


def mh_page_spans(p: int, n_pages: int, n_hosts: int, fat: int = 0) -> list[dict]:
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str, media_ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += max(len(text), 1)

    add("text", f"Page number {p}")
    add("media", "", f"img:page/{p}/0")
    for d in range(0, 10):
        add("link", f"/data/{p * 10 + d}")
    for q in range(max(1, p - 5), min(n_pages, p + 5)):
        add("link", mh_page_url(q, n_hosts))
    # "fat" filler spans: realistic web pages are tens of KB with dozens
    # of text nodes — a bench on 200-byte toy pages measures driver
    # overhead, not engine throughput. Deterministic content.
    for i in range(fat):
        add("text", f"filler {p} {i} " + "lorem ipsum dolor sit amet " * 3)
    return spans


def multihost_corpus_df(
    spark: SparkSession, n_pages: int, n_hosts: int = 32, fat: int = 0
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["id"]:
                p = int(p)
                rows.append((mh_page_url(p, n_hosts), PAGE_TYPE,
                             mh_page_spans(p, n_pages, n_hosts, fat)))
                host = f"http://host{p % n_hosts}.example.com"
                for d in range(0, 10):
                    n = p * 10 + d
                    spans = data_spans(n)
                    if fat:
                        base = spans[-1]["offset"] + 16
                        spans = spans + [
                            {"kind": "text",
                             "text": f"filler {n} {i} " + "lorem ipsum dolor sit amet " * 3,
                             "media_ref": "", "offset": base + i}
                            for i in range(fat)
                        ]
                    rows.append((f"{host}/data/{n}", DATA_TYPE, spans))
            yield pd.DataFrame(rows, columns=["url", "type_id", "spans"])

    return (
        spark.range(1, n_pages + 1)
        .repartition(max(2, min(n_pages // 64, 256)))
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)


def page_url(p: int) -> str:
    return f"{BASE}/page/{p}"


def data_url(d: int) -> str:
    return f"{BASE}/data/{d}"


def page_spans(p: int, n_pages: int) -> list[dict]:
    """Span content of /page/{p} — document order mirrors the test
    server's HTML: title text, data-link list, pager section."""
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str, media_ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += max(len(text), 1)

    add("text", f"Page number {p}")
    add("media", "", f"img:page/{p}/0")
    for d in range(0, 10):
        add("link", f"/data/{p * 10 + d}")
    for q in range(max(1, p - 5), min(n_pages, p + 5)):
        add("link", f"/page/{q}")
    return spans


def data_spans(d: int) -> list[dict]:
    spans = []
    off = 0
    for text in (f"Data for {d} is {d * d}", f"input={d}", f"output={d * d}"):
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
        off += len(text)
    return spans


def corpus_df(spark: SparkSession, n_pages: int = 100) -> DataFrame:
    """The full corpus as a DataFrame — the engine 'fetches' by joining
    the dequeued batch against this table on canonical URL."""

    def gen_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["id"]:
                p = int(p)
                rows.append((page_url(p), PAGE_TYPE, page_spans(p, n_pages)))
                for d in range(0, 10):
                    n = p * 10 + d
                    rows.append((data_url(n), DATA_TYPE, data_spans(n)))
            yield pd.DataFrame(rows, columns=["url", "type_id", "spans"])

    return (
        spark.range(1, n_pages + 1)
        .repartition(max(2, min(n_pages // 64, 256)))
        .mapInPandas(gen_pages, schema=CORPUS_SCHEMA)
    )


def expected_seen_urls(n_pages: int = 100) -> set[str]:
    """Golden reachable set from seed /page/1. The pager window
    ``range(max(1, p-5), min(n_pages, p+5))`` (test-server.py:36) never
    emits a link to page n_pages itself — the last page is unreachable,
    so the reachable pages are 1..n_pages-1 (page 1 is the seed)."""
    last = max(n_pages - 1, 1)
    urls = {page_url(p) for p in range(1, last + 1)}
    urls |= {data_url(p * 10 + d) for p in range(1, last + 1) for d in range(10)}
    return urls
