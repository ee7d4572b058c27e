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

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One <url>…</url> (or <sitemap>…</sitemap>) block per match; (?is) =
# case-insensitive + dotall, non-greedy so adjacent blocks don't merge;
# (?:\w+:)? tolerates a namespace prefix on the tag name.
_URL_BLOCK = r"(?is)<(?:\w+:)?url[\s>].*?</(?:\w+:)?url\s*>"
_SM_BLOCK = r"(?is)<(?:\w+:)?sitemap[\s>].*?</(?:\w+:)?sitemap\s*>"


# sitemaps.org size cap (uncompressed): bodies past this are failed fetches
_MAX_SITEMAP_BYTES = 50 * 1024 * 1024


def _tag_text(block: Column, tag: str) -> Column:
    """Inner text of ``<tag>…</tag>`` within a block ('' if absent),
    trimmed, CDATA honored verbatim, XML named entities unescaped
    otherwise (&amp; LAST so '&amp;lt;' round-trips to the literal
    '&lt;' — the single-pass unescape order).

    Tag-name matching is boundary-correct (``(?:\\s[^>]*)?>`` — a
    ``<locale>`` decoy can never open a ``loc`` span) and the PLAIN
    form is preferred over a namespace-prefixed one: sitemap extension
    tags live inside ``<url>`` blocks under their own prefix
    (``<image:loc>``, Google image/video/news extensions), so a
    prefixed match is only trusted when the block has no plain tag at
    all (the fully-prefixed-sitemap case)."""
    plain = F.regexp_extract(
        block, rf"(?is)<{tag}(?:\s[^>]*)?>(.*?)</{tag}\s*>", 1
    )
    # same prefix required on open AND close (backreference), and the
    # known extension prefixes (image/video/news) are excluded: in a
    # fully-prefixed urlset that also carries extension tags, a bare
    # any-prefix fallback let <image:loc> win over the page's own
    # <s:loc> (ADVICE r5)
    prefixed = F.regexp_extract(
        block,
        rf"(?is)<((?!image:|video:|news:)\w+):{tag}(?:\s[^>]*)?>"
        rf"(.*?)</\1:{tag}\s*>",
        2,
    )
    raw = F.trim(F.when(plain != "", plain).otherwise(prefixed))
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


_SITEMAP_BODY = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("body", T.StringType(), True),
    ]
)


def fetch_sitemap_bodies(
    urls: DataFrame, url_col: str = "url", timeout: float = 5.0
) -> DataFrame:
    """GET every sitemap URL → (url, body) — the robots-refresh fetch
    shape (robots.fetch_robots_http): one request per row, distributed
    over url partitions, failures yield NULL bodies (parsers above drop
    them for free). Sitemap fetches are O(#sitemaps) — thousands of
    rows against a crawl of billions — so plain per-row urllib inside
    an Arrow batch is the right cost tier; the politeness budget
    belongs to the page crawl, not this refresh.

    Gzip per the protocol (``sitemap.xml.gz``): payloads starting with
    the gzip magic are decompressed regardless of URL suffix."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip
        import ssl
        import urllib.request

        ctx = ssl._create_unverified_context()
        for pdf in batches:
            bodies = []
            for u in pdf["url"]:
                try:
                    with urllib.request.urlopen(
                        u, timeout=timeout, context=ctx
                    ) as resp:
                        # protocol cap: 50 MB uncompressed; read one
                        # byte past it and treat oversize as a failed
                        # fetch so a hostile/misconfigured URL cannot
                        # stream an executor OOM (ADVICE r5)
                        raw = resp.read(_MAX_SITEMAP_BYTES + 1)
                    if raw[:2] == b"\x1f\x8b":
                        raw = gzip.decompress(raw)
                    if len(raw) > _MAX_SITEMAP_BYTES:
                        bodies.append(None)
                        continue
                    bodies.append(raw.decode("utf-8", errors="replace"))
                except Exception:
                    bodies.append(None)
            yield pd.DataFrame({"url": pdf["url"], "body": bodies})

    spark = urls.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 4)
    return (
        urls.select(F.col(url_col).alias("url"))
        .distinct()
        .repartition(n, "url")
        .mapInPandas(run, schema=_SITEMAP_BODY)
    )


def ingest_sitemaps(
    sitemap_urls: DataFrame, url_col: str = "sitemap_url", timeout: float = 5.0
) -> DataFrame:
    """The full two-pass ingest (the protocol allows exactly ONE index
    level, so this is a fixed two-fetch composition, not a loop): fetch
    the advertised sitemaps, expand any ``<sitemapindex>`` bodies into
    their children, fetch those, and parse every ``<urlset>`` into one
    entries frame (``sitemap_entries`` schema). Index bodies contain no
    ``<url>`` blocks and urlsets no ``<sitemap>`` blocks, so the union
    double-counts nothing.

    Caching (the multi-consumer re-FETCH trap, twice over): the
    first-pass bodies feed BOTH the index expansion and the final
    parse, and the returned entries frame typically feeds BOTH seeding
    and a refresh (the CLI's ``sitemap --refresh``) — so the first-pass
    bodies AND the parsed entries are cached; without the latter every
    consumer of the result would re-GET all child sitemaps through the
    uncached second pass. ``df_pipeline_caches`` on the result is the
    caller-unpersist handle (the corpus_build convention)."""
    first = fetch_sitemap_bodies(
        sitemap_urls, url_col=url_col, timeout=timeout
    ).cache()
    kids = sitemap_index_entries(first).select(
        F.col("child_url").alias("url")
    ).join(  # a sitemap both advertised directly and listed in an
        # index must not be fetched (and parsed) twice (ADVICE r5)
        first.select("url"), "url", "left_anti"
    )
    second = fetch_sitemap_bodies(kids, timeout=timeout)
    out = sitemap_entries(first.unionByName(second)).cache()
    out.df_pipeline_caches = [first, out]
    return out


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


def sitemap_refresh(store, entries: DataFrame) -> int:
    """Sitemap-driven recrawl: re-queue every FETCHED page whose
    sitemap ``lastmod`` advanced since the last refresh; returns the
    re-queued count.

    The fetched log is deliberately wall-clock-free (epochs only — the
    determinism contract), so freshness is a SNAPSHOT DIFF, not a
    clock comparison: the ``sitemap_lastmod`` table records each URL's
    lastmod as of the previous refresh, and a URL re-queues iff its
    current lastmod is strictly newer than its recorded one — immune
    to clock skew between the crawl host and the sitemap publisher,
    and idempotent (running twice on the same sitemap state re-queues
    nothing the second time, because the snapshot advanced). The first
    refresh only seeds the snapshot. Entries without a parseable
    lastmod never re-queue (no signal ≠ stale — ``recrawl_older_than``
    is the TTL policy for those).

    Scale shape: canonicalize (the one Arrow crossing, same UDF as
    register) → groupBy(url).max(lastmod) — map-combinable over the
    ≤50k-entry sitemap explodes — then one join against the snapshot
    on url_hash and the fetched-log anti-join rewrite that
    ``reset_pages`` already is. Nothing here touches the frontier
    table. NEW urls are the seeding path's job (``sitemap_seeds``),
    not refresh's."""
    from .frontier import reset_pages
    from .urlnorm import canonicalize_udf, with_url_hash

    cur = (
        entries.select(
            canonicalize_udf(F.col("loc")).alias("url"), "lastmod_ts"
        )
        .where(F.col("url").isNotNull() & F.col("lastmod_ts").isNotNull())
        .groupBy("url")
        .agg(F.max("lastmod_ts").alias("lastmod_ts"))
        .select(with_url_hash().alias("url_hash"), "url", "lastmod_ts")
    )
    n = 0
    snap = cur
    if store.exists("sitemap_lastmod"):
        prev = store.read("sitemap_lastmod").select(
            "url_hash", "url", F.col("lastmod_ts").alias("prev_ts")
        )
        changed = (
            cur.join(prev, ["url_hash", "url"])
            .where(F.col("lastmod_ts") > F.col("prev_ts"))
            .select("url_hash", "url")
        )
        if store.exists("fetched"):
            # count only pages that were actually downloaded — a
            # pending or robots-skipped page has nothing to re-queue
            stale = changed.join(
                store.read("fetched")
                .where(F.col("reason") == "fetched")
                .select("url_hash", "url"),
                ["url_hash", "url"],
                "left_semi",
            ).cache()  # count + reset both consume it
            n = stale.count()
            if n:
                reset_pages(store, stale)
            stale.unpersist()
        # MERGE the snapshot, never replace it: a refresh legitimately
        # covers a SUBSET of hosts (one host's sitemap poll), and a
        # plain overwrite-with-current would wipe every other URL's
        # baseline — their next lastmod observation would look
        # first-seen and never re-queue. Matched rows keep the NEWEST
        # baseline (greatest: a publisher moving lastmod BACKWARDS is
        # noise, not freshness — monotone baselines keep the diff
        # idempotent); unmatched previous rows carry over verbatim.
        # Row-level MERGE on Iceberg; a rewrite here (snapshot is
        # O(known URLs), tiny next to content).
        snap = (
            cur.join(prev, ["url_hash", "url"], "left")
            .select(
                "url_hash",
                "url",
                F.greatest(
                    F.col("lastmod_ts"), F.coalesce("prev_ts", "lastmod_ts")
                ).alias("lastmod_ts"),
            )
            .unionByName(
                prev.join(
                    cur.select("url_hash", "url"),
                    ["url_hash", "url"],
                    "left_anti",
                ).select(
                    "url_hash", "url", F.col("prev_ts").alias("lastmod_ts")
                )
            )
        )
    store.overwrite("sitemap_lastmod", snap, tag="sitemap-refresh")
    return n


def bootstrap_from_robots(
    store,
    hosts: DataFrame,
    type_id: int,
    scheme: str = "http",
    timeout: float = 5.0,
    refresh: bool = False,
) -> dict:
    """One-call frontier bootstrap from a host list — the full
    discovery chain a production crawl starts with:

        hosts → GET robots.txt (``robots.fetch_robots_http``) →
        ``Sitemap:`` discovery → two-pass ingest (index expansion,
        gzip) → ``seed_frontier`` [→ lastmod snapshot refresh]

    Returns ``{"hosts": H, "sitemaps": S, "entries": E, "seeded": N,
    "requeued": R}`` (R only when ``refresh=True``). Hosts without a
    robots.txt or without ``Sitemap:`` lines simply contribute nothing
    — bootstrap is additive and idempotent (register's anti-join +
    the monotone snapshot merge), so it can run on every crawl cycle.

    Scale shape: every stage is the already-audited plan of its
    operator; the only news here is the composition, and the two
    multi-consumer frames (robots bodies feed discovery only; entries
    feed seeding + optional refresh) ride the ingest cache."""
    from .frontier import seed_frontier
    from .robots import fetch_robots_http

    bodies = fetch_robots_http(hosts, scheme=scheme, timeout=timeout)
    sm = sitemaps_from_robots(bodies).cache()  # counted + ingested
    n_sm = sm.count()
    out = {"hosts": hosts.select("host").distinct().count(), "sitemaps": n_sm}
    if n_sm == 0:
        sm.unpersist()
        out.update({"entries": 0, "seeded": 0})
        return out
    entries = ingest_sitemaps(sm, url_col="sitemap_url", timeout=timeout)
    out["entries"] = entries.count()
    out["seeded"] = seed_frontier(store, sitemap_seeds(entries, type_id))
    if refresh:
        out["requeued"] = sitemap_refresh(store, entries)
    for c in entries.df_pipeline_caches:
        c.unpersist()
    sm.unpersist()
    return out


def recrawl_by_changefreq(
    store, entries: DataFrame, freq_epochs: dict[str, int]
) -> int:
    """Per-page TTL recrawl driven by sitemap ``<changefreq>`` hints —
    the page-granular sibling of ``maintenance.recrawl_older_than``'s
    one-global-age policy. ``freq_epochs`` maps changefreq values to a
    max age in EPOCHS (the store's only clock — the fetched log is
    wall-clock-free by the determinism contract), e.g. ``{"hourly": 1,
    "daily": 2, "weekly": 8}``; a fetched page re-queues when
    ``epoch <= max(epoch) - freq_epochs[its hint]``. Unknown/absent
    changefreq = no hint = never re-queued here (``recrawl_older_than``
    is the catch-all). Duplicate hints for one URL take the most
    eager (min age). Returns the re-queued count; a second call finds
    the reset rows gone from the fetched log, so it is naturally
    idempotent.

    Scale shape: the hint map is a literal ``create_map`` (codegen),
    hints aggregate map-combinably per URL, and the only join is
    fetched ⋈ hints on (url_hash, url) — sitemap-entry scale, never a
    frontier scan."""
    from .frontier import reset_pages
    from .urlnorm import canonicalize_udf, with_url_hash

    if not store.exists("fetched") or not freq_epochs:
        return 0
    kv: list[Column] = []
    for k, v in freq_epochs.items():
        kv += [F.lit(str(k).lower()), F.lit(int(v))]
    age = F.create_map(*kv)[F.lower(F.col("changefreq"))]
    hints = (
        entries.where(F.col("changefreq").isNotNull())
        .select(canonicalize_udf(F.col("loc")).alias("url"), age.alias("age"))
        .where(F.col("url").isNotNull() & F.col("age").isNotNull())
        .groupBy("url")
        .agg(F.min("age").alias("age"))
        .select(with_url_hash().alias("url_hash"), "url", "age")
    )
    fetched = store.read("fetched")
    cur = fetched.agg(F.max("epoch")).collect()[0][0] or 0
    stale = (
        fetched.where(F.col("reason") == "fetched")
        .join(hints, ["url_hash", "url"])
        .where(F.col("epoch") <= F.lit(cur) - F.col("age"))
        .select("url_hash", "url")
    ).cache()  # count + reset both consume it
    n = stale.count()
    if n:
        reset_pages(store, stale)
    stale.unpersist()
    return n
