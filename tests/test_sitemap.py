"""Sitemap ingestion: planted-case extraction tests, a seeded-random
ElementTree cross-validation (the independent-mirror discipline — the
codegen regexp parser must agree with a real XML parser on sitemaps
nobody chose), and the end-to-end glue: robots ``Sitemap:`` discovery →
index expansion → urlset entries → seed_frontier (register dedup)."""

from __future__ import annotations

import random
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

from pyspark.sql import functions as F

from crab_spark.frontier import seed_frontier
from crab_spark.sitemap import (
    sitemap_entries,
    sitemap_index_entries,
    sitemap_seeds,
    sitemaps_from_robots,
)

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _bodies(spark, rows, cols=("url", "body")):
    return spark.createDataFrame(rows, list(cols))


# ---------------------------------------------------------------------------
# planted cases
# ---------------------------------------------------------------------------


def test_urlset_planted_cases(spark):
    body = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="{_NS}">
  <url>
    <loc>http://a.example/p?x=1&amp;y=2</loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>Daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[http://a.example/cdata?a=1&b=2]]></loc></url>
  <url>
    <LOC>  http://a.example/upper  </LOC>
    <lastmod>2026-01-05T10:30:00+02:00</lastmod>
    <priority>not-a-number</priority>
  </url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc></loc></url>
</urlset>"""
    out = sitemap_entries(_bodies(spark, [("http://a.example/sm.xml", body)]))
    rows = {r["loc"]: r for r in out.collect()}
    # entity unescape + all fields
    assert set(rows) == {
        "http://a.example/p?x=1&y=2",
        "http://a.example/cdata?a=1&b=2",  # CDATA verbatim, & kept
        "http://a.example/upper",  # case-insensitive tag, trimmed
    }
    r0 = rows["http://a.example/p?x=1&y=2"]
    assert r0["lastmod"] == "2026-01-05"
    assert r0["lastmod_ts"] == datetime(2026, 1, 5)  # session tz = UTC
    assert r0["changefreq"] == "daily"
    assert r0["priority"] == 0.8
    r1 = rows["http://a.example/cdata?a=1&b=2"]
    assert r1["lastmod"] is None and r1["lastmod_ts"] is None
    assert r1["changefreq"] is None
    assert r1["priority"] == 0.5  # protocol default when absent
    r2 = rows["http://a.example/upper"]
    # +02:00 offset normalizes to UTC
    assert r2["lastmod_ts"] == datetime(2026, 1, 5, 8, 30, 0)
    assert r2["priority"] == 0.5  # malformed -> default, never a throw


def test_sitemapindex_and_robots_discovery(spark):
    idx = f"""<sitemapindex xmlns="{_NS}">
  <sitemap><loc>http://a.example/sm1.xml</loc>
    <lastmod>2026-02-01T00:00:00Z</lastmod></sitemap>
  <sitemap><loc>http://a.example/sm2.xml</loc></sitemap>
</sitemapindex>"""
    out = sitemap_index_entries(
        _bodies(spark, [("http://a.example/smidx.xml", idx)])
    ).collect()
    kids = {r["child_url"]: r for r in out}
    assert set(kids) == {"http://a.example/sm1.xml", "http://a.example/sm2.xml"}
    assert kids["http://a.example/sm1.xml"]["child_lastmod_ts"] == datetime(
        2026, 2, 1
    )
    assert kids["http://a.example/sm2.xml"]["child_lastmod"] is None

    robots = (
        "User-agent: *\nDisallow: /private\n"
        "SITEMAP: http://a.example/smidx.xml\n"
        "  sitemap:\thttp://a.example/extra.xml\n"
    )
    found = sitemaps_from_robots(
        _bodies(spark, [("a.example", robots), ("dead.example", None)],
                cols=("host", "body"))
    ).collect()
    assert {(r["host"], r["sitemap_url"]) for r in found} == {
        ("a.example", "http://a.example/smidx.xml"),
        ("a.example", "http://a.example/extra.xml"),
    }


def test_namespace_prefixed_tags(spark):
    body = f"""<sm:urlset xmlns:sm="{_NS}">
  <sm:url><sm:loc>http://p.example/one</sm:loc>
    <sm:priority>0.3</sm:priority></sm:url>
</sm:urlset>"""
    out = sitemap_entries(_bodies(spark, [("http://p.example/sm.xml", body)]))
    rows = out.collect()
    assert [(r["loc"], r["priority"]) for r in rows] == [
        ("http://p.example/one", 0.3)
    ]


# ---------------------------------------------------------------------------
# seeded-random ElementTree mirror
# ---------------------------------------------------------------------------


def _gen_sitemap(rng: random.Random, n: int) -> str:
    """Random urlset: query strings needing &amp; escaping, optional
    CDATA locs, random tag whitespace, optional lastmod (all three W3C
    forms), optional changefreq/priority."""
    parts = [f'<urlset xmlns="{_NS}">']
    for i in range(n):
        url = f"http://h{rng.randrange(4)}.example/p/{i}?a={rng.randrange(9)}&b={rng.randrange(9)}"
        if rng.random() < 0.3:
            loc = f"<loc><![CDATA[{url}]]></loc>"
        else:
            loc = f"<loc>{url.replace('&', '&amp;')}</loc>"
        bits = [loc]
        roll = rng.random()
        if roll < 0.25:
            bits.append(f"<lastmod>2026-0{rng.randrange(1, 9)}-1{rng.randrange(9)}</lastmod>")
        elif roll < 0.5:
            bits.append(
                f"<lastmod>2026-03-0{rng.randrange(1, 9)}T0{rng.randrange(9)}"
                f":15:{10 + rng.randrange(40)}Z</lastmod>"
            )
        elif roll < 0.6:
            bits.append(
                f"<lastmod>2026-04-0{rng.randrange(1, 9)}T12:00:00"
                f"{rng.choice(['+02:00', '-05:00'])}</lastmod>"
            )
        if rng.random() < 0.4:
            bits.append(f"<changefreq>{rng.choice(['daily', 'WEEKLY', 'monthly'])}</changefreq>")
        if rng.random() < 0.5:
            bits.append(f"<priority>0.{rng.randrange(1, 10)}</priority>")
        rng.shuffle(bits)
        ws = " " * rng.randrange(3)
        parts.append(f"<url>{ws}" + "".join(bits) + f"{ws}</url>")
    parts.append("</urlset>")
    return "\n".join(parts)


def _mirror_parse(body: str):
    """Independent oracle: real XML parser + the module's documented
    policy (priority default 0.5, lastmod → UTC-naive timestamp)."""
    root = ET.fromstring(body)
    out = set()
    for u in root.findall(f"{{{_NS}}}url"):
        loc = (u.findtext(f"{{{_NS}}}loc") or "").strip()
        if not loc:
            continue
        lastmod = u.findtext(f"{{{_NS}}}lastmod")
        ts = None
        if lastmod is not None:
            dt = datetime.fromisoformat(lastmod.strip().replace("Z", "+00:00"))
            if dt.tzinfo is not None:
                dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
            ts = dt
        cf = u.findtext(f"{{{_NS}}}changefreq")
        pr = u.findtext(f"{{{_NS}}}priority")
        try:
            prv = float(pr) if pr is not None else 0.5
        except ValueError:
            prv = 0.5
        out.add(
            (
                loc,
                lastmod.strip() if lastmod is not None else None,
                ts,
                cf.strip().lower() if cf is not None else None,
                prv,
            )
        )
    return out


def test_urlset_matches_elementtree_mirror_random(spark):
    rng = random.Random(0x51737)
    rows = [
        (f"http://gen.example/sm{k}.xml", _gen_sitemap(rng, 5 + rng.randrange(20)))
        for k in range(6)
    ]
    got = sitemap_entries(_bodies(spark, rows)).collect()
    want = set()
    for _, body in rows:
        want |= _mirror_parse(body)
    assert {
        (r["loc"], r["lastmod"], r["lastmod_ts"], r["changefreq"], r["priority"])
        for r in got
    } == want
    assert len(got) == sum(len(_mirror_parse(b)) for _, b in rows)  # no cross-file merge


# ---------------------------------------------------------------------------
# e2e glue: discovery → entries → seeds → register dedup
# ---------------------------------------------------------------------------


def test_sitemap_seeds_feed_frontier(spark, store):
    body = f"""<urlset xmlns="{_NS}">
  <url><loc>http://s.example/a</loc></url>
  <url><loc>http://s.example/a</loc></url>
  <url><loc>http://S.EXAMPLE/b</loc></url>
  <url><loc>not a url at all</loc></url>
</urlset>"""
    entries = sitemap_entries(_bodies(spark, [("http://s.example/sm.xml", body)]))
    seeds = sitemap_seeds(entries, type_id=1)
    n = seed_frontier(store, seeds)
    # in-batch dup collapsed, host case-folded by canonicalization,
    # invalid URL dropped by seed_frontier's validation
    assert n == 2
    urls = {
        r["url"] for r in store.read("frontier").select("url").collect()
    }
    assert urls == {"http://s.example/a", "http://s.example/b"}
    # idempotent refresh: re-seeding the same sitemap registers nothing
    assert seed_frontier(store, sitemap_seeds(entries, type_id=1)) == 0


# ---------------------------------------------------------------------------
# fetch layer (file:// URLs, the test_httpfetcher convention) + full ingest
# ---------------------------------------------------------------------------


def test_ingest_sitemaps_two_pass_file_urls(spark, tmp_path):
    import gzip

    us1 = tmp_path / "us1.xml"
    us1.write_text(
        f'<urlset xmlns="{_NS}"><url><loc>http://f.example/a</loc></url>'
        "<url><loc>http://f.example/b</loc><priority>0.2</priority></url></urlset>"
    )
    us2 = tmp_path / "us2.xml"
    us2.write_text(
        f'<urlset xmlns="{_NS}"><url><loc>http://f.example/c</loc></url></urlset>'
    )
    idx = tmp_path / "idx.xml.gz"  # gzipped index -> us1 + one dead child
    idx.write_bytes(
        gzip.compress(
            (
                f'<sitemapindex xmlns="{_NS}">'
                f"<sitemap><loc>file://{us1}</loc></sitemap>"
                f"<sitemap><loc>file://{tmp_path}/missing.xml</loc></sitemap>"
                "</sitemapindex>"
            ).encode()
        )
    )
    from crab_spark.sitemap import ingest_sitemaps

    urls = spark.createDataFrame(
        [(f"file://{idx}",), (f"file://{us2}",)], ["sitemap_url"]
    )
    entries = ingest_sitemaps(urls)
    got = {(r["loc"], r["priority"]) for r in entries.collect()}
    for c in entries.df_pipeline_caches:
        c.unpersist()
    # index (gz) expanded to us1; dead child dropped (NULL body);
    # directly-advertised urlset parsed in pass one
    assert got == {
        ("http://f.example/a", 0.5),
        ("http://f.example/b", 0.2),
        ("http://f.example/c", 0.5),
    }


def test_prefixed_urlset_with_extension_tags(spark):
    """ADVICE r6-in: in a FULLY-prefixed urlset that also carries
    extension tags, the prefixed fallback must not let <image:loc>
    (appearing first) shadow the page's own <s:loc>; close tag must
    match the open tag's prefix (backreference)."""
    body = f"""<s:urlset xmlns:s="{_NS}" xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
  <s:url>
    <image:image><image:loc>http://y.example/img.jpg</image:loc></image:image>
    <s:loc>http://y.example/page</s:loc>
  </s:url>
</s:urlset>"""
    rows = sitemap_entries(
        _bodies(spark, [("http://y.example/sm.xml", body)])
    ).collect()
    assert [r["loc"] for r in rows] == ["http://y.example/page"]


def test_oversized_sitemap_body_is_failed_fetch(spark, tmp_path):
    """Bodies past the 50 MB protocol cap come back as failed fetches
    (NULL body), never streamed whole into an executor."""
    from crab_spark.sitemap import _MAX_SITEMAP_BYTES, fetch_sitemap_bodies

    big = tmp_path / "big.xml"
    head = f'<urlset xmlns="{_NS}"><url><loc>http://z.example/a</loc></url></urlset>'
    with open(big, "w") as f:
        f.write(head)
        f.write(" " * (_MAX_SITEMAP_BYTES + 1 - len(head)))
    ok = tmp_path / "ok.xml"
    ok.write_text(
        f'<urlset xmlns="{_NS}"><url><loc>http://z.example/b</loc></url></urlset>'
    )
    urls = spark.createDataFrame(
        [(f"file://{big}",), (f"file://{ok}",)], ["sitemap_url"]
    )
    got = {r["url"]: r["body"]
           for r in fetch_sitemap_bodies(urls, url_col="sitemap_url").collect()}
    assert got[f"file://{big}"] is None
    assert got[f"file://{ok}"] is not None


def test_index_child_also_advertised_fetched_once(spark, tmp_path):
    """A sitemap both advertised directly AND listed in an index must
    contribute its entries exactly once (the second pass anti-joins the
    index children against the first-pass URL set)."""
    from crab_spark.sitemap import ingest_sitemaps

    us = tmp_path / "us.xml"
    us.write_text(
        f'<urlset xmlns="{_NS}"><url><loc>http://d.example/a</loc></url></urlset>'
    )
    idx = tmp_path / "idx.xml"
    idx.write_text(
        f'<sitemapindex xmlns="{_NS}">'
        f"<sitemap><loc>file://{us}</loc></sitemap></sitemapindex>"
    )
    urls = spark.createDataFrame(
        [(f"file://{idx}",), (f"file://{us}",)], ["sitemap_url"]
    )
    entries = ingest_sitemaps(urls)
    rows = [r["loc"] for r in entries.collect()]
    for c in entries.df_pipeline_caches:
        c.unpersist()
    assert rows == ["http://d.example/a"]  # exactly once, not twice


# ---------------------------------------------------------------------------
# sitemap-driven recrawl (lastmod snapshot diff)
# ---------------------------------------------------------------------------


def _urlset(rows) -> str:
    """rows: [(loc, lastmod-or-None), ...] -> urlset body."""
    items = []
    for loc, lm in rows:
        lmx = f"<lastmod>{lm}</lastmod>" if lm else ""
        items.append(f"<url><loc>{loc}</loc>{lmx}</url>")
    return f'<urlset xmlns="{_NS}">' + "".join(items) + "</urlset>"


def test_sitemap_refresh_requeues_on_lastmod_advance(spark, store):
    from crab_spark.frontier import mark_fetched
    from crab_spark.sitemap import sitemap_refresh

    a, b, c = (f"http://r.example/{x}" for x in "abc")
    v1 = _urlset([(a, "2026-01-01"), (b, "2026-01-02"), (c, None)])
    e1 = sitemap_entries(_bodies(spark, [("http://r.example/sm.xml", v1)]))
    assert seed_frontier(store, sitemap_seeds(e1, type_id=1)) == 3
    frontier = store.read("frontier")
    mark_fetched(
        store,
        frontier.where(F.col("url").isin(a, b)).select("url_hash", "url", "depth"),
        epoch=1,
    )

    # first refresh only seeds the snapshot; repeat on same state = 0
    assert sitemap_refresh(store, e1) == 0
    assert sitemap_refresh(store, e1) == 0
    assert {r["url"] for r in store.read("fetched").collect()} == {a, b}

    # v2: a advanced, b unchanged, c gains a first lastmod (no baseline
    # -> no signal), d is brand new (seeding path's job, not refresh's)
    v2 = _urlset(
        [(a, "2026-02-01"), (b, "2026-01-02"), (c, "2026-03-01"),
         ("http://r.example/d", "2026-03-01")]
    )
    e2 = sitemap_entries(_bodies(spark, [("http://r.example/sm.xml", v2)]))
    assert sitemap_refresh(store, e2) == 1
    # only a was re-queued: its completion row is gone, b's remains
    assert {r["url"] for r in store.read("fetched").collect()} == {b}
    # idempotent: the snapshot advanced with the reset
    assert sitemap_refresh(store, e2) == 0
    assert {r["url"] for r in store.read("fetched").collect()} == {b}


def test_extension_tags_do_not_shadow_loc(spark):
    """Google image/video extension tags live INSIDE <url> blocks under
    their own prefix: <image:loc> must never win over the page <loc>,
    in either order; decoy tags sharing a name prefix (<locale>) must
    not open a loc span."""
    body = f"""<urlset xmlns="{_NS}" xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
  <url>
    <image:image><image:loc>http://x.example/img1.jpg</image:loc></image:image>
    <loc>http://x.example/page1</loc>
  </url>
  <url>
    <loc>http://x.example/page2</loc>
    <image:image><image:loc>http://x.example/img2.jpg</image:loc></image:image>
  </url>
  <url>
    <locale>en-US</locale>
    <loc>http://x.example/page3</loc>
  </url>
</urlset>"""
    got = sorted(
        r["loc"]
        for r in sitemap_entries(
            _bodies(spark, [("http://x.example/sm.xml", body)])
        ).collect()
    )
    assert got == [
        "http://x.example/page1",
        "http://x.example/page2",
        "http://x.example/page3",
    ]


def test_recrawl_by_changefreq(spark, store):
    """Per-page TTL from <changefreq> hints: ages are in epochs against
    the fetched log's max epoch; unhinted/unknown pages never re-queue;
    most-eager hint wins on duplicates; idempotent after the reset."""
    from crab_spark import corpus as C
    from crab_spark.crawler import CorpusFetcher, crawl
    from crab_spark.parsers import load_registry
    from crab_spark.parsers import data as pd_
    from crab_spark.parsers import listing as pl_
    from crab_spark.schemas import SEEDS
    from crab_spark.sitemap import recrawl_by_changefreq

    registry = load_registry([pl_, pd_])
    seed_frontier(
        store, spark.createDataFrame([(C.page_url(1), C.PAGE_TYPE)], SEEDS)
    )
    crawl(store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10)
    fetched = {
        r["url"]: r["epoch"] for r in store.read("fetched").collect()
    }
    cur = max(fetched.values())
    assert fetched[C.page_url(1)] < cur  # page 1 fetched in epoch 1

    fresh_data = next(u for u, e in fetched.items() if e == cur)
    body = _urlset(
        [(C.page_url(1), None), (fresh_data, None), (fresh_data, None)]
    ).replace(
        f"<url><loc>{C.page_url(1)}</loc></url>",
        f"<url><loc>{C.page_url(1)}</loc><changefreq>Daily</changefreq></url>",
    ).replace(
        f"<url><loc>{fresh_data}</loc></url>",
        f"<url><loc>{fresh_data}</loc><changefreq>daily</changefreq></url>",
        1,
    ).replace(
        f"<url><loc>{fresh_data}</loc></url>",
        f"<url><loc>{fresh_data}</loc><changefreq>yearly</changefreq></url>",
        1,
    )
    entries = sitemap_entries(_bodies(spark, [("sm", body)]))
    freq = {"daily": cur - fetched[C.page_url(1)], "yearly": 100}
    # page 1 is exactly at its daily age bound -> re-queued; the fresh
    # data page's most-eager hint (daily, age cur-cur=0 < bound) keeps
    # it... epoch == cur > cur - daily_age, so it stays; every unhinted
    # page stays
    n = recrawl_by_changefreq(store, entries, freq)
    assert n == 1
    assert C.page_url(1) not in {
        r["url"] for r in store.read("fetched").collect()
    }
    assert recrawl_by_changefreq(store, entries, freq) == 0  # idempotent
    # the re-queued page re-fetches alone
    stats = crawl(
        store, CorpusFetcher(C.corpus_df(spark, 4)), registry, batch_size=10
    )
    assert stats.requests == 1


def test_sitemap_refresh_merges_partial_snapshots(spark, store):
    """A refresh covering a SUBSET of URLs must not wipe the other
    baselines (per-host sitemap polls are the normal case), and a
    publisher moving lastmod BACKWARDS must not erode a baseline."""
    from crab_spark.frontier import mark_fetched
    from crab_spark.sitemap import sitemap_refresh

    a, b = "http://m.example/a", "http://m.example/b"
    both = _urlset([(a, "2026-01-01"), (b, "2026-01-01")])
    e_both = sitemap_entries(_bodies(spark, [("sm", both)]))
    assert seed_frontier(store, sitemap_seeds(e_both, type_id=1)) == 2
    frontier = store.read("frontier")
    mark_fetched(
        store, frontier.select("url_hash", "url", "depth"), epoch=1
    )
    assert sitemap_refresh(store, e_both) == 0  # baseline for a AND b

    # partial poll: only a, unchanged — b's baseline must survive
    e_a = sitemap_entries(
        _bodies(spark, [("sm", _urlset([(a, "2026-01-01")]))])
    )
    assert sitemap_refresh(store, e_a) == 0
    # b advances in a later full poll: requeued iff its baseline survived
    e_b2 = sitemap_entries(
        _bodies(spark, [("sm", _urlset([(b, "2026-02-01")]))])
    )
    assert sitemap_refresh(store, e_b2) == 1
    assert {r["url"] for r in store.read("fetched").collect()} == {a}

    # backwards lastmod is noise: baseline stays at its max, so
    # re-advancing to a value under the max does not requeue
    mark_fetched(
        store,
        frontier.where(F.col("url") == b).select("url_hash", "url", "depth"),
        epoch=2,
    )
    e_b_old = sitemap_entries(
        _bodies(spark, [("sm", _urlset([(b, "2026-01-15")]))])
    )
    assert sitemap_refresh(store, e_b_old) == 0
    e_b_mid = sitemap_entries(
        _bodies(spark, [("sm", _urlset([(b, "2026-01-20")]))])
    )
    assert sitemap_refresh(store, e_b_mid) == 0  # still under the 02-01 max
    e_b3 = sitemap_entries(
        _bodies(spark, [("sm", _urlset([(b, "2026-03-01")]))])
    )
    assert sitemap_refresh(store, e_b3) == 1  # past the max -> requeue


# ---------------------------------------------------------------------------
# one-call bootstrap: hosts -> robots -> discovery -> ingest -> seeds
# ---------------------------------------------------------------------------


def test_bootstrap_from_robots_file_scheme(spark, store, tmp_path):
    """The full discovery chain over file:// 'hosts' (fetch_robots_http
    builds {scheme}://{host}/robots.txt, so a directory path works as a
    host): robots advertises a gzipped index -> child urlset -> seeds.
    A host with no robots.txt contributes nothing; re-running is
    idempotent."""
    import gzip

    from crab_spark.sitemap import bootstrap_from_robots

    h1 = tmp_path / "h1"
    h1.mkdir()
    us = h1 / "us.xml"
    us.write_text(
        f'<urlset xmlns="{_NS}">'
        "<url><loc>http://b.example/a</loc><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>http://b.example/b</loc></url></urlset>"
    )
    (h1 / "idx.xml.gz").write_bytes(
        gzip.compress(
            (
                f'<sitemapindex xmlns="{_NS}">'
                f"<sitemap><loc>file://{us}</loc></sitemap></sitemapindex>"
            ).encode()
        )
    )
    (h1 / "robots.txt").write_text(
        f"User-agent: *\nAllow: /\nSitemap: file://{h1}/idx.xml.gz\n"
    )
    h2 = tmp_path / "h2"  # no robots.txt at all
    h2.mkdir()

    hosts = spark.createDataFrame([(str(h1),), (str(h2),)], ["host"])
    out = bootstrap_from_robots(store, hosts, type_id=1, scheme="file")
    assert out == {"hosts": 2, "sitemaps": 1, "entries": 2, "seeded": 2}
    urls = {r["url"] for r in store.read("frontier").select("url").collect()}
    assert urls == {"http://b.example/a", "http://b.example/b"}

    # idempotent + refresh path: snapshot seeds, nothing requeued
    out2 = bootstrap_from_robots(
        store, hosts, type_id=1, scheme="file", refresh=True
    )
    assert out2 == {
        "hosts": 2, "sitemaps": 1, "entries": 2, "seeded": 0, "requeued": 0
    }
