"""HTML → interleaved span conversion.

The reference's parsers run BeautifulSoup selectors over raw HTML
(examples/test_server/parser_listing.py, parser_data.py). Our documents
are span sequences (input_hint), so the real-network path needs an
HTML→spans step: stdlib html.parser (no external deps), emitting

- text nodes       → ("text", text, "", offset)
- <a href>         → ("link", href, "", offset)
- <img src> / <video src> / <audio src> → ("media", "", src, offset)

with ``class`` attributes surfaced as ``class=value`` text spans so
selector-style parsers (.input/.output) can match. Offsets are source
positions, monotone — span order == document order, preserving the
span-sequence-equality invariant.

Executed vectorized: one ``html_to_spans_udf`` call per Arrow batch.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F

from ..schemas import SPAN
from pyspark.sql import types as T

_MEDIA_TAGS = {"img", "video", "audio", "source"}

# HTML5 void elements: no end tag ever arrives for these, so pushing
# them onto the class stack would leak an entry and every later text
# span could inherit a wrong `class=` prefix (real-web HTML hits
# this constantly: <img>, <br>, <input>, ...).
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _SpanExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[dict] = []
        self._stack: list[tuple[str, str]] = []  # (tag, class)

    def _offset(self) -> int:
        line, col = self.getpos()
        return line * 100_000 + col  # monotone in document order

    def _emit(self, tag: str, d: dict) -> None:
        if tag == "a" and d.get("href"):
            self.spans.append(
                {"kind": "link", "text": d["href"], "media_ref": "", "offset": self._offset()}
            )
        elif tag in _MEDIA_TAGS and d.get("src"):
            self.spans.append(
                {"kind": "media", "text": "", "media_ref": d["src"], "offset": self._offset()}
            )

    def handle_starttag(self, tag: str, attrs: list) -> None:
        d = dict(attrs)
        self._emit(tag, d)
        if tag not in _VOID_TAGS:
            self._stack.append((tag, d.get("class") or ""))

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        # self-closed (<br/>, <img/>, even <div/>): emit, never push —
        # no matching end tag will come
        self._emit(tag, dict(attrs))

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag; a stray end tag with no
        # open match (</p> after <img>, say) must leave the stack alone
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        text = data.strip()
        if not text:
            return
        cls = next((c for _, c in reversed(self._stack) if c), "")
        if cls:
            text = f"{cls}={text}"
        self.spans.append(
            {"kind": "text", "text": text, "media_ref": "", "offset": self._offset()}
        )


def html_to_spans(html: str) -> list[dict]:
    p = _SpanExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # salvage what parsed; malformed HTML is the norm on the web
    return p.spans


@F.pandas_udf(T.ArrayType(SPAN))
def html_to_spans_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: html_to_spans(h) if h else [])
