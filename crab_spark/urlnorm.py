"""URL canonicalization and absolutization.

Reference behavior (/root/reference/src/lib.rs:166-194): a link string
that starts with ``http://``/``https://`` is parsed as-is, anything else
is joined against the source page's URL; unparseable URLs are dropped
with a warning, never an error. URLs are stored in the serialized form of
the Rust ``url`` crate (storage.rs:96 ``url.to_string()``), whose
normalization we must match because the URL-seen set (the UNIQUE index of
V3__url_uniq.sql) compares these strings for equality:

- scheme and host lowercased
- default port stripped (http:80, https:443)
- empty path with an authority serialized as "/"
- dot-segments resolved on join

Everything here has a plain-Python form (used by the pure-Python oracle
and driver-side code) and an Arrow-vectorized form (used in the engine's
hot path — one pandas batch per task, no per-row Python round trips).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": 80, "https": 443}
_ALLOWED_SCHEMES = ("http", "https")


def canonicalize(url: str) -> str | None:
    """Normalize an absolute URL to the reference's stored form.

    Returns None if the URL is not a fetchable absolute http(s) URL —
    the caller drops it (lib.rs:185-192 semantics).
    """
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in _ALLOWED_SCHEMES or not parts.hostname:
        return None
    host = parts.hostname.lower()
    if ":" in host:
        # urlsplit().hostname strips IPv6 brackets; the url crate
        # serializes the bracketed form (http://[::1]:8080/)
        host = f"[{host}]"
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    if parts.username is not None:
        cred = parts.username
        if parts.password is not None:
            cred = f"{cred}:{parts.password}"
        netloc = f"{cred}@{netloc}"
    path = parts.path or "/"
    path = _remove_dot_segments(path)
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


def absolutize(link: str, base_url: str) -> str | None:
    """Resolve ``link`` against ``base_url`` and canonicalize.

    Mirrors create_absolute_url (lib.rs:179-194): absolute http(s)
    strings parse directly; everything else joins against the base.
    """
    if link.startswith("http://") or link.startswith("https://"):
        return canonicalize(link)
    try:
        joined = urljoin(base_url, link)
    except ValueError:
        return None
    return canonicalize(joined)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — the url crate resolves these on parse/join."""
    if "." not in path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    if path.endswith(("/.", "/..")):
        output.append("")
    result = "/".join(output)
    return result or "/"


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


# ---------------------------------------------------------------------------
# Vectorized (Arrow) forms — the engine hot path.
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def absolutize_udf(links: pd.Series, bases: pd.Series) -> pd.Series:
    return pd.Series(
        [absolutize(l, b) if l is not None and b is not None else None
         for l, b in zip(links, bases)]
    )


@F.pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: host_of(u) if u is not None else "")


def with_url_hash(col: str = "url"):
    """xxhash64 of the canonical URL — the seen-set key (replaces the
    UNIQUE index of V3__url_uniq.sql). JVM-side, codegen'd."""
    return F.xxhash64(F.col(col))
