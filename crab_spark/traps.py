"""Crawl-trap detection: URL-template explosion analysis over the frontier.

At 10^10-URL scale the frontier's worst enemy is not volume but
*generated* URL spaces — calendars (``/cal/2024/01/31``), session ids,
faceted search — where one host manufactures unbounded distinct URLs
under a handful of path shapes. The reference has no defense (its
fixture graph is finite); a production frontier needs one, and the
idiomatic Spark shape is an offline analysis pass, not per-dispatch
bookkeeping:

1. ``url_template`` — collapse each URL to its path *shape* (numeric /
   id-like / token-like segments templated out, query reduced to its
   sorted key set). Pure built-in codegen: split + transform + rlike +
   array_join; no Python crossing.
2. ``trap_report`` — ONE map-combinable groupBy (host, template) count
   over the frontier, plus a host rollup; templates whose distinct-URL
   count exceeds the cap are flagged. Output is tiny by construction
   (only flagged shapes survive).
3. ``trap_rules`` — flagged shapes re-expressed as robots-style
   Disallow patterns (templated segments → ``*``) in the ROBOTS schema,
   so the guard composes with the EXISTING dispatch gate
   (crawler.crawl(robots=...)): trap URLs already registered resolve as
   robots-skips and never dispatch, their children are never
   discovered, and the crawl loop needs zero new code. ``merge_robots``
   folds them into a real robots cache.

The conversion to Disallow patterns deliberately fails CLOSED: robots
``*`` wildcards match across ``/``, so an emitted pattern can block
beyond the flagged shape — ``/page/*`` (from ``/page/{n}``) also denies
the distinct shape ``/page/about``, and a root-level numeric template
``/{n}`` yields ``/*``, capping the whole host. Over-blocking is the
safe direction for trap escape (never under-blocking), and both
recovery paths are first-class: an operator whitelist is a robots
Allow rule (wins by RFC 9309 longest-match precedence,
robots.rules_allow), and ``cli traps --clear`` drops the in-crawl
guard's persisted caps. A literal ``*``/``$`` inside a flagged URL's
static segment widens its pattern the same way — same safe direction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .schemas import ROBOTS

# a segment is templated when it LOOKS generated: all digits, an
# id-like hex/uuid run, or a long token — each requiring at least one
# digit so plain words ("deadbeef", "configuration") stay literal
_NUM = r"^[0-9]+$"
_ID = r"^[0-9a-fA-F-]{8,}$"
_TOKEN = r"^[A-Za-z0-9_=-]{16,}$"
_HAS_DIGIT = r"[0-9]"


def _template_segment(s: Column) -> Column:
    return (
        F.when(s.rlike(_NUM), F.lit("{n}"))
        .when(s.rlike(_ID) & s.rlike(_HAS_DIGIT), F.lit("{id}"))
        .when(s.rlike(_TOKEN) & s.rlike(_HAS_DIGIT), F.lit("{t}"))
        .otherwise(s)
    )


def url_template(url: Column | str) -> Column:
    """The URL's path shape: ``/cal/{n}/{n}?page,sort`` — templated path
    segments plus the sorted distinct query KEY set (values dropped, so
    session-id/offset churn collapses to one shape). Host is NOT part
    of the template (callers group by the frontier's host column)."""
    u = F.col(url) if isinstance(url, str) else url
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    shaped = F.array_join(
        F.transform(F.split(path, "/"), _template_segment), "/"
    )
    query = F.parse_url(u, F.lit("QUERY"))
    keys = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.split(query, "&"), lambda kv: F.split_part(kv, F.lit("="), F.lit(1))
                )
            )
        ),
        ",",
    )
    return F.when(
        query.isNull() | (query == ""), shaped
    ).otherwise(F.concat(shaped, F.lit("?"), keys))


def trap_report(frontier: DataFrame, max_urls_per_template: int = 1000,
                url_col: str = "url", host_col: str = "host") -> DataFrame:
    """Flag (host, template) shapes holding more registered URLs than
    any hand-written site plausibly has. Returns
    (host, template, n_urls, n_host_urls, host_share) for flagged
    shapes only — tiny by construction (each row summarizes ≥ cap
    URLs, so at most |frontier|/cap rows survive: broadcast-sized).

    Scale shape: the frontier is scanned ONCE — one map-combinable
    groupBy (host, template) count is its only row-grain shuffle; the
    per-host rollup is a window sum over the already-aggregated shape
    counts (template-grain rows, orders of magnitude fewer), not a
    second frontier pass."""
    from pyspark.sql import Window

    shaped = frontier.select(
        F.col(host_col).alias("host"),
        url_template(url_col).alias("template"),
    )
    per_tpl = shaped.groupBy("host", "template").agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    return (
        per_tpl.withColumn(
            "n_host_urls", F.sum("n_urls").over(Window.partitionBy("host"))
        )
        .filter(F.col("n_urls") > max_urls_per_template)
        .select(
            "host",
            "template",
            "n_urls",
            "n_host_urls",
            F.round(F.col("n_urls") / F.col("n_host_urls"), 4).alias("host_share"),
        )
    )


def _pattern_from_template(template: Column) -> Column:
    """Robots Disallow pattern for a flagged shape: templated segments
    become ``*`` wildcards; a query-key suffix becomes ``?*`` (the
    robots match target is path?query, robots._match_target)."""
    path = F.split_part(template, F.lit("?"), F.lit(1))
    pat = F.regexp_replace(path, r"\{(n|id|t)\}", "*")
    has_query = template.contains("?")
    return F.when(has_query, F.concat(pat, F.lit("?*"))).otherwise(pat)


def trap_rules(report: DataFrame, epoch: int = 0) -> DataFrame:
    """Flagged shapes → ROBOTS-schema rows (one per host, Disallow
    rules only, no crawl_delay) ready for crawler.crawl(robots=...) or
    merge_robots. Deterministic rule order (sorted patterns)."""
    return (
        report.select(
            "host", _pattern_from_template(F.col("template")).alias("pattern")
        )
        .distinct()
        .groupBy("host")
        .agg(
            F.transform(
                F.array_sort(F.collect_set("pattern")),
                lambda p: F.struct(
                    F.lit(False).alias("allow"), p.alias("pattern")
                ),
            ).alias("rules")
        )
        .select(
            "host",
            "rules",
            F.lit(None).cast("double").alias("crawl_delay"),
            F.lit(epoch).cast("int").alias("fetched_epoch"),
        )
    )


def pattern_for_template(template: str) -> str:
    """Driver-side twin of ``_pattern_from_template`` for the tiny
    collected report rows (the in-crawl guard keeps its active rules as
    plain state; parity with the column form is pinned by test)."""
    import re

    path, sep, _ = template.partition("?")
    pat = re.sub(r"\{(n|id|t)\}", "*", path)
    return pat + "?*" if sep else pat


def rules_from_state(spark, hosts: dict[str, list[str]],
                     epoch: int = 0) -> DataFrame | None:
    """ROBOTS-schema rows from a persisted {host: [Disallow pattern]}
    dict (the crawl's trap-guard checkpoint state). None when empty."""
    if not hosts:
        return None
    rows = [
        (h, [(False, p) for p in pats], None, epoch)
        for h, pats in sorted(hosts.items())
    ]
    return spark.createDataFrame(rows, ROBOTS)


def trap_gate(spark, robots: DataFrame | None,
              hosts: dict[str, list[str]]) -> DataFrame | None:
    """The effective dispatch-gate cache: the user's robots cache with
    the active trap caps folded in (either side may be absent)."""
    tr = rules_from_state(spark, hosts)
    if tr is None:
        return robots
    return merge_robots(robots, tr) if robots is not None else tr


def merge_robots(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two ROBOTS-schema caches into one row per host: rule lists
    concatenated (RFC 9309 evaluates the merged group; longest-match
    precedence makes order irrelevant), the most conservative
    crawl_delay (max) and the newest fetched_epoch kept. Both inputs
    are host-grain caches — tiny — so this is a trivially cheap agg."""
    cols = [f.name for f in ROBOTS.fields]
    return (
        a.select(cols)
        .unionByName(b.select(cols))
        .groupBy("host")
        .agg(
            F.flatten(F.collect_list("rules")).alias("rules"),
            F.max("crawl_delay").alias("crawl_delay"),
            F.max("fetched_epoch").alias("fetched_epoch"),
        )
        .select(cols)
    )
