"""Pure-Python oracle: the reference crawl loop's exact semantics.

An independent, driver-only reimplementation of crab's scheduler at its
default config (threads=1 ⇒ strictly sequential; crawler.rs:52-125,
storage.rs:84-123) used ONLY by tests to verify the Spark engine's
crawl order and URL-seen set byte-for-byte:

- frontier rows carry (url, type_id, depth, status, seq=rowid)
- refill: status=1, ORDER BY depth ASC then seq ASC, LIMIT batch
- dispatch: ``pages.swap_remove(0)`` (crawler.rs:71) — a refill of
  [p1..pn] dispatches as p1, pn, pn-1, ..., p2; registration (hence
  rowid/seq and later depth-tie dequeue order) follows dispatch order
- per page: fetch from the corpus dict → validate → mark downloaded →
  navigate → absolutize each link → register (first wins) at depth+1
- fetch miss ⇒ page stays status=1 (retried next refill)

This file deliberately shares the urlnorm module with the engine (URL
canonicalization parity is an *input* to both, tested separately) but
shares no Spark code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .parsers import ParserRegistry
from .schemas import STATUS_DOWNLOADED, STATUS_NOT_DOWNLOADED
from .urlnorm import absolutize, canonicalize


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)
    seen: dict[str, tuple[int, int, int]] = field(default_factory=dict)  # url -> (seq, depth, type)
    documents: dict[str, list[dict]] = field(default_factory=dict)
    new_links: int = 0
    requests: int = 0


def run_oracle(
    seeds: list[tuple[str, int]],
    corpus: dict[str, list[dict]],
    registry: ParserRegistry,
    navigate: bool = True,
    batch_size: int = 100,
    depth_offset: int = 1,
    max_requests: int = 1_000_000,
) -> OracleResult:
    res = OracleResult()
    rows: list[dict] = []  # the pages table; index = rowid order
    seen: set[str] = set()

    def register(url: str, type_id: int, depth: int) -> bool:
        if url in seen:
            return False
        seen.add(url)
        rows.append(
            {"url": url, "type_id": type_id, "depth": depth,
             "status": STATUS_NOT_DOWNLOADED, "seq": len(rows)}
        )
        res.seen[url] = (len(rows) - 1, depth, type_id)
        return True

    for url, type_id in seeds:
        cu = canonicalize(url)
        if cu is not None:
            register(cu, type_id, 0)

    while res.requests < max_requests:
        batch = sorted(
            (r for r in rows if r["status"] == STATUS_NOT_DOWNLOADED),
            key=lambda r: (r["depth"], r["seq"]),
        )[:batch_size]
        if not batch:
            break
        if len(batch) > 1:
            # swap_remove(0) dispatch order (crawler.rs:71): first
            # element, then the remainder back-to-front
            batch = [batch[0]] + batch[:0:-1]
        for page in batch:
            res.requests += 1
            res.crawl_order.append(page["url"])
            spans = corpus.get(page["url"])
            if spans is None:
                continue  # fetch error: stays NotDownloaded (crawler.rs:109-113)
            if not registry.run_validate(page["type_id"], spans):
                continue  # invalid: not stored, retried (lib.rs:119-124)
            page["status"] = STATUS_DOWNLOADED
            res.documents[page["url"]] = spans
            if navigate:
                for href, t in registry.run_navigate(page["type_id"], spans):
                    absu = absolutize(href, page["url"])
                    if absu is None:
                        continue  # dropped with warning (lib.rs:185-192)
                    if register(absu, t, page["depth"] + depth_offset):
                        res.new_links += 1
        # loop: next refill sees everything registered so far
    return res
