"""Parser registry — the user-extension surface of the engine.

Reference contract (/root/reference/src/lib.rs:110-127 ``PageParser``
trait and src/example_parser.py): a parser owns one ``type_id`` and
exposes up to three optional functions over a page's content —

- ``navigate(content) -> list[(url, type_id)]``  (link discovery)
- ``parse(content)    -> dict[table, list[dict[col, val]]]``  (extraction)
- ``validate(content) -> bool``  (missing ⇒ True, python.rs:99-101;
  invalid ⇒ content NOT stored and the page is retried, lib.rs:119-124)

We keep the exact same per-page contract (so a crab parser ports by
swapping BeautifulSoup selectors for span predicates) but the *content*
is the span list (interleaved text+media, input_hint) and execution is
batched: the engine ships whole Arrow record batches to Python and
dispatches rows to parsers by ``type_id`` inside the batch
(mapInPandas — one GIL crossing per batch, not per page, unlike
python.rs:55-109 which round-trips per row).

Parsers that return a plain ``dict[col, val]`` from parse() (like the
reference's parser_data.py) are normalized to the canonical
``{"default": [row]}`` single-table form, matching main.rs:253-254
handling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

Span = dict  # {"kind","text","media_ref","offset"}


@dataclass(frozen=True)
class SpanParser:
    type_id: int
    name: str = "parser"
    navigate: Optional[Callable[[list[Span]], list[tuple[str, int]]]] = None
    parse: Optional[Callable[[list[Span]], dict]] = None
    validate: Optional[Callable[[list[Span]], bool]] = None
    # Span-kind pushdown: the kinds navigate/validate actually read
    # (None = all). Declaring e.g. ("link",) lets the engine filter the
    # span array JVM-side before it crosses the Arrow boundary — the UDF
    # analogue of column pruning. parse() always sees the full document.
    span_kinds: Optional[tuple[str, ...]] = None
    # Expression validator: a callable (spans Column) -> boolean Column.
    # When EVERY parser with a validator provides one, validation runs
    # entirely JVM-side (whole-stage codegen over the span array) and the
    # Arrow boundary is skipped for it — the fast path for content
    # gates like length/token-count/language checks. `validate` remains
    # the general Python contract (and the semantic source of truth:
    # tests assert expr ≡ python on the same docs).
    validate_expr: Optional[Callable] = None


class ParserRegistry:
    """type_id → parser. Reference dispatch is a linear find with an
    error on a missing id (lib.rs:158-164); we keep the same error."""

    def __init__(self, parsers: list[SpanParser]):
        self._by_type: dict[int, SpanParser] = {}
        for p in parsers:
            if p.type_id in self._by_type:
                # the reference's linear find would silently shadow the
                # LATER parser (lib.rs:158-164); surfacing the conflict
                # beats either silent behavior
                raise ValueError(
                    f"duplicate parser for page type {p.type_id}: "
                    f"{self._by_type[p.type_id].name!r} and {p.name!r}"
                )
            self._by_type[p.type_id] = p

    def get(self, type_id: int) -> SpanParser:
        try:
            return self._by_type[type_id]
        except KeyError:
            raise KeyError(f"Page parser not found for page type: {type_id}") from None

    def has(self, type_id: int) -> bool:
        return type_id in self._by_type

    def jvm_validator_chain(self):
        """A boolean Column validating by type_id entirely JVM-side, or
        None if any parser's validator lacks an expression form. Rows
        whose type_id has no registered parser come out False (the
        Python dispatch path raises instead, lib.rs:158-164 — the
        navigate pass still raises for them when it runs)."""
        from pyspark.sql import functions as F

        chain = None
        for p in self._by_type.values():
            if p.validate is not None and p.validate_expr is None:
                return None
        for p in self._by_type.values():
            expr = (
                p.validate_expr(F.col("spans"))
                if p.validate_expr is not None
                else F.lit(True)
            )
            cond = F.col("type_id") == p.type_id
            chain = F.when(cond, expr) if chain is None else chain.when(cond, expr)
        return F.lit(True) if chain is None else chain.otherwise(F.lit(False))

    def needed_kinds(self, navigate: bool) -> Optional[set]:
        """Union of span kinds the crawl-path functions (validate +
        optionally navigate) consume across all parsers; None if any
        relevant parser needs the full document."""
        kinds: set = set()
        for p in self._by_type.values():
            uses_spans = p.validate is not None or (navigate and p.navigate is not None)
            if not uses_spans:
                continue
            if p.span_kinds is None:
                return None
            kinds.update(p.span_kinds)
        return kinds

    def describe(self) -> list[dict]:
        """Registry report — mirrors `crab parsers` (main.rs:316-331)."""
        return [
            {
                "module": p.name,
                "type_id": p.type_id,
                "navigate": p.navigate is not None,
                "parse": p.parse is not None,
                "validate": p.validate is not None,
            }
            for p in sorted(self._by_type.values(), key=lambda p: p.type_id)
        ]

    def run_validate(self, type_id: int, spans: list[Span]) -> bool:
        p = self.get(type_id)
        return True if p.validate is None else bool(p.validate(spans))

    def run_navigate(self, type_id: int, spans: list[Span]) -> list[tuple[str, int]]:
        p = self.get(type_id)
        return [] if p.navigate is None else list(p.navigate(spans))

    def run_parse(self, type_id: int, spans: list[Span]) -> dict[str, list[dict]]:
        p = self.get(type_id)
        if p.parse is None:
            return {}
        out = p.parse(spans)
        if not out:
            return {}
        # normalize dict[col,val] → {"default": [row]} (reference's
        # ParsedTables always maps table → rows; example parser_data.py
        # returns a single flat row)
        first = next(iter(out.values()))
        if not isinstance(first, list):
            return {"default": [out]}
        return out


def load_registry(modules: list) -> ParserRegistry:
    """Parser discovery over imported modules — the Spark analogue of the
    reference's cwd scan for parser_*.py (main.rs:362-389): each module
    must define TYPE_ID and may define navigate/parse/validate. Modules
    are shipped to executors via --py-files in cluster mode."""
    parsers = []
    for mod in modules:
        kinds = getattr(mod, "SPAN_KINDS", None)
        parsers.append(
            SpanParser(
                type_id=int(getattr(mod, "TYPE_ID")),
                name=getattr(mod, "__name__", "parser"),
                navigate=getattr(mod, "navigate", None),
                parse=getattr(mod, "parse", None),
                validate=getattr(mod, "validate", None),
                span_kinds=tuple(kinds) if kinds is not None else None,
            )
        )
    return ParserRegistry(parsers)
