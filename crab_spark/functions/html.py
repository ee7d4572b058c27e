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


class _SpanExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[dict] = []
        self._class_stack: list[str] = []

    def _offset(self) -> int:
        line, col = self.getpos()
        return line * 100_000 + col  # monotone in document order

    def handle_starttag(self, tag: str, attrs: list) -> None:
        d = dict(attrs)
        cls = d.get("class")
        self._class_stack.append(cls or "")
        if tag == "a" and d.get("href"):
            self.spans.append(
                {"kind": "link", "text": d["href"], "media_ref": "", "offset": self._offset()}
            )
        elif tag in _MEDIA_TAGS and d.get("src"):
            self.spans.append(
                {"kind": "media", "text": "", "media_ref": d["src"], "offset": self._offset()}
            )

    def handle_endtag(self, tag: str) -> None:
        if self._class_stack:
            self._class_stack.pop()

    def handle_data(self, data: str) -> None:
        text = data.strip()
        if not text:
            return
        cls = next((c for c in reversed(self._class_stack) if c), "")
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
