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
- path/query/fragment percent-encoded with the WHATWG component encode
  sets (space in a path serializes as %20; existing %-escapes pass
  through verbatim — '%' is never re-encoded, so the form is
  idempotent); backslashes in special-scheme paths convert to '/'
- non-ASCII hosts IDNA-encoded (the url crate's domain-to-ASCII;
  stdlib codec — IDNA2003, a documented approximation of UTS 46);
  hosts that fail IDNA are dropped like any unparseable URL

Everything here has a plain-Python form (used by the pure-Python oracle
and driver-side code) and an Arrow-vectorized form (used in the engine's
hot path — one pandas batch per task, no per-row Python round trips).
"""

from __future__ import annotations

from urllib.parse import quote, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": 80, "https": 443}
_ALLOWED_SCHEMES = ("http", "https")

# WHATWG component percent-encode sets, expressed as quote() SAFE sets
# (the complement over printable ASCII). '%' is in every safe set: the
# url crate never re-encodes an existing escape, which also makes the
# serialized form idempotent. Path encode set = C0/space/" # < > ? ` { };
# query adds ' (special schemes) but allows ? { } `; fragment allows # ?.
_PATH_SAFE = "!$%&'()*+,-./:;=@[]^_|~"
_QUERY_SAFE = "!$%&()*+,-./:;=?@[\\]^_`{|}~"
_FRAG_SAFE = "!#$%&'()*+,-./:;=?@[\\]^_{|}~"
_USERINFO_SAFE = "!$%&'()*+,-._~"


def _idna_host(host: str) -> str | None:
    """Lowercased domain-to-ASCII (the url crate's host serialization).
    Returns None when IDNA rejects the label — the URL is unparseable."""
    if host.isascii():
        return host
    try:
        return host.encode("idna").decode("ascii")
    except UnicodeError:
        return None


def canonicalize(url: str) -> str | None:
    """Normalize an absolute URL to the reference's stored form.

    Returns None if the URL is not a fetchable absolute http(s) URL —
    the caller drops it (lib.rs:185-192 semantics).
    """
    url = url.strip()
    # WHATWG treats '\' like '/' in special-scheme authority/path (the
    # url crate converts on parse) — but only BEFORE the query/fragment,
    # where backslashes are legal verbatim
    if "\\" in url:
        cut = len(url)
        for sep in ("?", "#"):
            i = url.find(sep)
            if i != -1:
                cut = min(cut, i)
        url = url[:cut].replace("\\", "/") + url[cut:]
    try:
        parts = urlsplit(url)
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
    else:
        host = _idna_host(host)
        if host is None:
            return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    if parts.username is not None:
        cred = quote(parts.username, safe=_USERINFO_SAFE)
        if parts.password is not None:
            cred = f"{cred}:{quote(parts.password, safe=_USERINFO_SAFE)}"
        netloc = f"{cred}@{netloc}"
    # special-scheme paths treat '\' as '/' (WHATWG; the url crate does
    # this during parsing), then dot-segments resolve, then the path
    # percent-encodes ('a b' serializes as 'a%20b' — the stored string
    # must be a valid request target AND byte-equal to url::to_string())
    path = (parts.path or "/").replace("\\", "/")
    path = quote(_remove_dot_segments(path), safe=_PATH_SAFE)
    query = quote(parts.query, safe=_QUERY_SAFE)
    fragment = quote(parts.fragment, safe=_FRAG_SAFE)
    return urlunsplit((scheme, netloc, path, query, fragment))


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
