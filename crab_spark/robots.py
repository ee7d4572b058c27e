"""robots.txt politeness filter — RFC 9309 rule evaluation.

The reference has NO robots handling (checked all of src/ — SURVEY §2.2
F13), but the north_rule requires a robots cache joined into dispatch.

Design: a small ``robots(host, rules, crawl_delay, fetched_epoch)``
cache table — one row per host, rules as an array of (allow, pattern)
structs — refreshed per epoch for hosts the frontier is about to touch,
broadcast-joined into the dequeued batch as a filter. Rule evaluation
implements RFC 9309 §2.2.2:

- both ``Allow:`` and ``Disallow:`` lines (real-web robots files carve
  Allow exceptions out of broad Disallows constantly — parsing only
  Disallow over-blocks those hosts);
- ``*`` wildcards and the ``$`` end-anchor inside patterns;
- longest-match-wins precedence (most octets in the matched pattern),
  with Allow winning exact-length ties;
- named-agent group selection (RFC 9309 §2.2.1): the crawler's product
  token picks the most specific matching User-agent group (longest
  prefix match, exact match being the longest possible prefix), falling
  back to the ``*`` groups; every group carrying the winning value
  contributes rules (rules of matching groups are combined, not
  last-one-wins);
- the de-facto ``Crawl-delay:`` extension is parsed per host and
  carried on the dispatch rows so the fetchers' per-host token buckets
  honor it (max of the configured politeness delay and the host's own).

Evaluation is vectorized: one Arrow crossing per batch, with compiled
rule lists memoized per distinct host rule-set inside the UDF.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import ROBOTS, ROBOTS_RULE
from .util import local_df


def _parse_groups(body: str) -> list[tuple[list[str], list, float | None]]:
    """First pass: split a robots.txt body into its groups —
    (user-agent values, [(allow, pattern), ...], crawl_delay) per group.
    A group is a run of consecutive User-agent lines followed by its
    rule lines (RFC 9309 §2.1). Empty Allow/Disallow values are no-ops
    (an empty Disallow means allow-all)."""
    groups: list[tuple[list[str], list, float | None]] = []
    uas: list[str] = []
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    in_group_header = False  # inside a run of consecutive User-agent lines
    started = False

    def flush():
        nonlocal uas, rules, delay
        if started:
            groups.append((uas, rules, delay))
        uas, rules, delay = [], [], None

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_group_header:  # a new group starts
                flush()
                started = True
                in_group_header = True
            uas.append(val.lower())
            continue
        in_group_header = False
        if not started:
            continue  # rule lines before any User-agent line: no group
        if key == "disallow" and val:
            rules.append((False, val))
        elif key == "allow" and val:
            rules.append((True, val))
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            delay = d if delay is None else max(delay, d)
    flush()
    return groups


def parse_robots_txt(body: str, agent: str = "*") -> dict:
    """Parse a robots.txt body into the rules that apply to ``agent``:
    {"rules": [(allow: bool, pattern: str), ...],
    "crawl_delay": float | None}.

    Group selection (RFC 9309 §2.2.1, with the de-facto most-specific
    extension every major crawler implements): a named User-agent value
    matches when it equals the agent's product token or is a prefix of
    it (case-insensitive) — e.g. ``googlebot`` applies to agent
    ``googlebot-news``. Among matching named values the LONGEST wins
    (exact match is the longest possible prefix, so RFC exact-match
    semantics are a special case), and ALL groups carrying that winning
    value are combined (RFC: rules of matching groups MUST be merged).
    If no named value matches — or ``agent`` is ``"*"``, the default —
    the ``*`` groups apply.

    Rule order is file order (precedence is by pattern length at match
    time, so order doesn't matter semantically)."""
    groups = _parse_groups(body)
    token = agent.lower()
    winner: str | None = None  # longest named UA value matching the token
    if token != "*":
        for uas, _, _ in groups:
            for v in uas:
                if v and v != "*" and token.startswith(v):
                    if winner is None or len(v) > len(winner):
                        winner = v
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    for uas, grules, gdelay in groups:
        applies = (winner in uas) if winner is not None else ("*" in uas)
        if not applies:
            continue
        rules.extend(grules)
        if gdelay is not None:
            delay = gdelay if delay is None else max(delay, gdelay)
    return {"rules": rules, "crawl_delay": delay}


def _compile_rules(rules) -> list[tuple[bool, int, re.Pattern]]:
    """Rule patterns → (allow, octet-length, anchored regex). ``*``
    matches any char sequence; a trailing ``$`` anchors the pattern to
    the path end; everything else is literal. Precedence is the RAW
    pattern's length (RFC 9309 'most octets')."""
    out = []
    for r in rules:
        allow, pat = (r["allow"], r["pattern"]) if isinstance(r, dict) else r
        anchored = pat.endswith("$")
        core = pat[:-1] if anchored else pat
        rx = ".*".join(re.escape(seg) for seg in core.split("*"))
        if anchored:
            rx += "$"
        out.append((bool(allow), len(pat), re.compile(rx)))
    return out


def rules_allow(path: str, compiled: list[tuple[bool, int, re.Pattern]]) -> bool:
    """Longest-match-wins over the compiled rules; Allow wins an exact
    length tie; no matching rule ⇒ allowed (RFC 9309 §2.2.2)."""
    best_len, best_allow = -1, True
    for allow, ln, rx in compiled:
        if rx.match(path) and (
            ln > best_len or (ln == best_len and allow and not best_allow)
        ):
            best_len, best_allow = ln, allow
    return best_allow


def _match_target(url: str) -> str:
    """The string robots rules match against: path plus query (RFC 9309
    matches the path-and-query suffix of the URI)."""
    parts = urlsplit(url)
    path = parts.path or "/"
    return f"{path}?{parts.query}" if parts.query else path


def robots_table(spark, entries: dict, epoch: int = 0) -> DataFrame:
    """Build the cache table from a plain dict. Each host maps to either
    a list of Disallow prefixes (the simple/legacy shape, e.g. a CLI
    JSON file) or a dict {"disallow": [...], "allow": [...],
    "crawl_delay": <sec>}."""
    rows = []
    for h, spec in sorted(entries.items()):
        if isinstance(spec, dict):
            rules = [(False, p) for p in spec.get("disallow", [])] + [
                (True, p) for p in spec.get("allow", [])
            ]
            delay = spec.get("crawl_delay")
            delay = float(delay) if delay is not None else None
        else:
            rules = [(False, p) for p in spec]
            delay = None
        rows.append((h, rules, delay, epoch))
    return local_df(spark, rows, ROBOTS)


ROBOTS_BODY = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("body", T.StringType(), True),  # NULL = unreachable
    ]
)


def fetch_robots_http(hosts: DataFrame, scheme: str = "http",
                      timeout: float = 5.0) -> DataFrame:
    """Fetch ``{scheme}://{host}/robots.txt`` for every host — one GET
    per host, distributed over host partitions (the robots refresh is
    O(#hosts), tiny next to the crawl itself). Unreachable hosts yield
    NULL bodies (⇒ allow-all, the crawl-friendly default)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import ssl
        import urllib.request

        ctx = ssl._create_unverified_context()
        for pdf in batches:
            bodies = []
            for h in pdf["host"]:
                try:
                    with urllib.request.urlopen(
                        f"{scheme}://{h}/robots.txt", timeout=timeout, context=ctx
                    ) as resp:
                        bodies.append(resp.read().decode("utf-8", errors="replace"))
                except Exception:
                    bodies.append(None)
            yield pd.DataFrame({"host": pdf["host"], "body": bodies})

    n = max(hosts.sparkSession.sparkContext.defaultParallelism, 4)
    return hosts.select("host").distinct().repartition(n, "host").mapInPandas(
        run, schema=ROBOTS_BODY
    )


_PARSED = T.StructType(
    [
        T.StructField("rules", T.ArrayType(ROBOTS_RULE), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)


def robots_from_bodies(bodies: DataFrame, epoch: int = 0,
                       agent: str = "*") -> DataFrame:
    """Parse fetched robots.txt bodies into the broadcastable cache
    table — rule extraction runs vectorized (one Arrow batch per task).
    bodies: DataFrame[host, body]. ``agent`` is the crawler's product
    token: named robots groups matching it take precedence over the
    ``*`` groups (RFC 9309 §2.2.1; see parse_robots_txt)."""

    @F.pandas_udf(_PARSED)
    def parse(bod: pd.Series) -> pd.DataFrame:
        # struct-returning pandas UDF contract: a DataFrame whose
        # columns are the struct fields
        rules, delays = [], []
        for b in bod:
            if not b:
                rules.append([])
                delays.append(None)
                continue
            p = parse_robots_txt(b, agent=agent)
            rules.append(
                [{"allow": a, "pattern": pat} for a, pat in p["rules"]]
            )
            delays.append(p["crawl_delay"])
        return pd.DataFrame({"rules": rules, "crawl_delay": delays})

    return bodies.select(
        "host", parse("body").alias("_p"), F.lit(epoch).alias("fetched_epoch")
    ).select(
        "host", F.col("_p.rules").alias("rules"),
        F.col("_p.crawl_delay").alias("crawl_delay"), "fetched_epoch",
    )


def allowed_udf():
    """Vectorized RFC 9309 rule check. Join shape: batch ⋈ broadcast
    robots on host → filter. NULL rules (host absent from the cache)
    ⇒ allowed (crawl-friendly default, matching common crawler
    practice). Compiled rule lists are memoized per distinct rule set —
    one compile per host per worker, not per row."""

    # memo lives in the UDF *closure*, not the per-batch call frame:
    # one compile per distinct host rule set per worker process, shared
    # across every Arrow batch of the crawl (a big crawl evaluates
    # thousands of batches against the same few hosts). Size-capped:
    # the hit rate only needs per-crawl locality, and a reused
    # long-lived worker serving many crawls over many distinct hosts
    # must not grow the dict unboundedly — on overflow we drop the
    # whole memo (recompiling a rule set is microseconds).
    cache: dict[tuple, list] = {}
    cache_max = 4096

    @F.pandas_udf(T.BooleanType())
    def allowed(urls: pd.Series, rule_col: pd.Series) -> pd.Series:
        out = []
        for url, rules in zip(urls, rule_col):
            if rules is None or len(rules) == 0:
                out.append(True)
                continue
            key = tuple((r["allow"], r["pattern"]) for r in rules)
            compiled = cache.get(key)
            if compiled is None:
                if len(cache) >= cache_max:
                    cache.clear()
                compiled = cache[key] = _compile_rules(rules)
            out.append(rules_allow(_match_target(url), compiled))
        return pd.Series(out)

    return allowed


def with_robots_flag(batch: DataFrame, robots: DataFrame, flag: str = "robots_ok") -> DataFrame:
    """Add a boolean ``flag`` column: True iff no robots rule disallows
    the row's URL — plus the host's ``crawl_delay`` (NULL when the cache
    has none) so the fetch path can honor per-host delays. The robots
    cache is tiny (one row per host) → broadcast join, no shuffle of
    the batch; rule evaluation is one Arrow crossing over the batch."""
    cols = ["rules"] + (["crawl_delay"] if "crawl_delay" in robots.columns else [])
    r = robots.select(F.col("host").alias("r_host"), *cols)
    joined = batch.join(F.broadcast(r), batch["host"] == F.col("r_host"), "left")
    return joined.withColumn(
        flag, allowed_udf()(F.col("url"), F.col("rules"))
    ).drop("r_host", "rules")


def filter_allowed(batch: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop batch rows whose URL a robots rule disallows."""
    out = with_robots_flag(batch, robots).filter(F.col("robots_ok")).drop("robots_ok")
    if "crawl_delay" in out.columns and "crawl_delay" not in batch.columns:
        out = out.drop("crawl_delay")
    return out
