"""Listing-page parser — span-world port of the reference's
examples/test_server/parser_listing.py.

The reference navigates with CSS selectors (pager links first, then the
data-link list — that order determines registration order and therefore
crawl order). Here links are already spans; we classify by href shape:
``/page/`` hrefs route back to this parser's type, ``/data/`` hrefs to
the data parser's type. Output order matches the reference exactly:
pager links first, then data links.
"""

from __future__ import annotations

TYPE_ID: int = 1
DATA_TYPE_ID: int = 2

# navigate/validate only read link spans — lets the engine prune the
# span array JVM-side before the Arrow crossing
SPAN_KINDS: tuple[str, ...] = ("link",)


def navigate(spans: list[dict]) -> list[tuple[str, int]]:
    pager = []
    data = []
    for s in spans:
        if s["kind"] != "link":
            continue
        href = s["text"]
        if "/page/" in href:
            pager.append((href, TYPE_ID))
        elif "/data/" in href:
            data.append((href, DATA_TYPE_ID))
    return pager + data


def validate(spans: list[dict]) -> bool:
    # a listing page must have at least one link span
    return any(s["kind"] == "link" for s in spans)
