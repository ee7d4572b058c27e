"""Sitemap ingestion: robots.txt ``Sitemap:`` discovery → sitemap-index
expansion → urlset parsing → frontier seeds — entirely as built-in
codegen expressions (regexp over the fetched bodies), zero Python.

Why this surface: the reference crawls from a hand-registered seed list
(main.rs ``register``), but a production frontier at 10^10 URLs is
bootstrapped and refreshed from sitemaps (sitemaps.org protocol): robots
bodies advertise ``Sitemap:`` URLs, those resolve to either a
``<sitemapindex>`` of child sitemaps or a ``<urlset>`` of page entries,
and the entries (with ``lastmod``/``changefreq``/``priority``) feed both
``seed_frontier`` and the recrawl scheduler (q110). The fetch half
reuses the engine's existing machinery — sitemap URLs are just rows for
``fetch_robots_http``-style GETs or the crawl loop itself; this module
is the parse half.

Scale shape: bodies arrive already distributed (one row per fetched
sitemap, ≤50 MB / ≤50k URLs each by protocol cap, so the per-row explode
is bounded); every extraction below is a per-row regexp in whole-stage
codegen — no shuffle, no UDF, no driver state. Dedup against the seen
set happens where it always does (``frontier.register``'s anti-join +
Bloom prefilter), not here.

Parsing policy (documented, mirrored by the tests' ElementTree replay):
tags are matched case-insensitively and namespace-agnostically (the
protocol pins lowercase + one default namespace; real-world feeds drift
on both); ``<loc>`` honors CDATA verbatim and otherwise unescapes the
five XML named entities (the protocol REQUIRES escaped ``&`` in URLs);
entries with an empty/absent ``<loc>`` are dropped; ``priority``
defaults to 0.5 (protocol default) when absent or malformed;
``lastmod`` keeps the raw string AND a best-effort ``lastmod_ts``
(W3C datetime: date-only or full offset form; ``try_to_timestamp`` so a
junk value yields NULL, never an ANSI error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One <url>…</url> (or <sitemap>…</sitemap>) block per match; (?is) =
# case-insensitive + dotall, non-greedy so adjacent blocks don't merge;
# (?:\w+:)? tolerates a namespace prefix on the tag name.
_URL_BLOCK = r"(?is)<(?:\w+:)?url[\s>].*?</(?:\w+:)?url\s*>"
_SM_BLOCK = r"(?is)<(?:\w+:)?sitemap[\s>].*?</(?:\w+:)?sitemap\s*>"


def _tag_text(block: Column, tag: str) -> Column:
    """Inner text of ``<tag>…</tag>`` within a block ('' if absent),
    trimmed, CDATA honored verbatim, XML named entities unescaped
    otherwise (&amp; LAST so '&amp;lt;' round-trips to the literal
    '&lt;' — the single-pass unescape order)."""
    raw = F.trim(
        F.regexp_extract(
            block,
            rf"(?is)<(?:\w+:)?{tag}[^>]*>(.*?)</(?:\w+:)?{tag}\s*>",
            1,
        )
    )
    cdata = F.regexp_extract(raw, r"(?s)^<!\[CDATA\[(.*)\]\]>$", 1)
    is_cdata = raw.rlike(r"(?s)^<!\[CDATA\[.*\]\]>$")
    unescaped = raw
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        unescaped = F.replace(unescaped, F.lit(ent), F.lit(ch))
    return F.when(is_cdata, cdata).otherwise(unescaped)


def _lastmod_ts(raw: Column) -> Column:
    """W3C datetime → timestamp (session tz = UTC): full offset form
    (with or without fractional seconds), minute-precision form, or
    date-only; anything else NULL (try_*, never an ANSI throw)."""
    return F.coalesce(
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd")),
    )


def sitemaps_from_robots(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``Sitemap:`` advertisements out of fetched robots.txt bodies:
    (host, sitemap_url). The directive is group-independent (sitemaps
    protocol §"informing search engine crawlers"), so this reads lines,
    not groups — key case-insensitive, one URL per line, NULL bodies
    (unreachable hosts) contribute nothing."""
    lines = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), F.lit(1)
    )
    return (
        # explode(NULL array) yields no rows — unreachable hosts vanish
        bodies.select(
            F.col(host_col).alias("host"),
            F.explode(lines).alias("sitemap_url"),
        )
        .where(F.col("sitemap_url") != "")
    )


def sitemap_index_entries(
    bodies: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Child sitemaps of ``<sitemapindex>`` bodies: (sitemap_url,
    child_url, child_lastmod, child_lastmod_ts). Feed child_url back
    through the fetch layer and this module again — the protocol allows
    exactly one index level, so the loop is two passes, not recursive."""
    blk = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(_SM_BLOCK), F.lit(0))
    ).alias("blk")
    rows = bodies.select(F.col(url_col).alias("sitemap_url"), blk)
    loc = _tag_text(F.col("blk"), "loc")
    lastmod = _tag_text(F.col("blk"), "lastmod")
    return (
        rows.select(
            "sitemap_url",
            loc.alias("child_url"),
            F.when(lastmod != "", lastmod).alias("child_lastmod"),
            _lastmod_ts(lastmod).alias("child_lastmod_ts"),
        )
        .where(F.col("child_url") != "")
    )


def sitemap_entries(
    bodies: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Page entries of ``<urlset>`` bodies: (sitemap_url, loc, lastmod,
    lastmod_ts, changefreq, priority). One explode per body (bounded at
    the protocol's 50k-entry cap), then per-block codegen extraction —
    the whole parse is one narrow stage."""
    blk = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(_URL_BLOCK), F.lit(0))
    ).alias("blk")
    rows = bodies.select(F.col(url_col).alias("sitemap_url"), blk)
    loc = _tag_text(F.col("blk"), "loc")
    lastmod = _tag_text(F.col("blk"), "lastmod")
    changefreq = F.lower(_tag_text(F.col("blk"), "changefreq"))
    priority = _tag_text(F.col("blk"), "priority")
    return (
        rows.select(
            "sitemap_url",
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            _lastmod_ts(lastmod).alias("lastmod_ts"),
            F.when(changefreq != "", changefreq).alias("changefreq"),
            F.coalesce(priority.try_cast("double"), F.lit(0.5)).alias(
                "priority"
            ),
        )
        .where(F.col("loc") != "")
    )


def sitemap_seeds(entries: DataFrame, type_id: int) -> DataFrame:
    """SEEDS-shaped frame (url, type_id) from ``sitemap_entries``
    output, ready for ``frontier.seed_frontier`` — which canonicalizes,
    drops invalid URLs, and dedupes against the seen set (register's
    anti-join), so this is a pure projection. ``distinct()`` here only
    trims the in-batch duplicates sitemaps legitimately contain across
    files, cutting register's candidate volume before the shuffle."""
    return (
        entries.select(F.col("loc").alias("url"))
        .distinct()
        .select("url", F.lit(int(type_id)).cast("int").alias("type_id"))
    )
