"""The crawl scheduler — reference crawler.rs:52-125 re-expressed as a
deterministic epoch loop whose per-epoch DAG is pure DataFrame code.

Reference loop (threads=1 default): refill 100 from the frontier
(depth-ASC, rowid tiebreak) → dispatch via ``pages.swap_remove(0)``
(crawler.rs:71 — so a refill of [p1..pn] dispatches as p1, pn, pn-1,
..., p2) → fetch each (politeness sleep after every request) → validate
via Python → store content + flip status → navigate → absolutize →
register new links at depth+1 → repeat until a refill returns nothing.
Completion order == dispatch order at the default threads=1, which is
what pins our determinism contract.

Epoch mapping: one refill = one epoch. Within an epoch the batch is
processed as one distributed DAG; links are registered in
(dispatch position, navigate-output index) order, with dispatch
position remapped to the swap_remove sequence — byte-identical to the
reference's sequential registration order. The frontier state at every
refill boundary therefore matches the reference exactly, which is the
BASELINE.json crawl-order + seen-set equality criterion.

Scale shape per north_rule: the dequeued batch is repartitioned by a
*salted host* key so one hot host cannot serialise an epoch; politeness
is enforced per host inside the fetch task (token bucket); the seen-set
join is pre-filtered by a bucketed Bloom or partitioned cuckoo filter
(sidecar-persisted); every epoch appends per-partition
lineage/metrics rows and bumps a checkpoint so a killed crawl resumes
from the last committed epoch (idempotent tagged appends make a
re-run of a half-committed epoch exactly-once).
"""

from __future__ import annotations

import sys
import threading
import time
import warnings
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import bloom as bloom_mod
from .frontier import (
    apply_host_budget,
    dequeue,
    mark_fetched,
    pending_depth_counts,
    pending_priority_counts,
    register,
)
from .parsers import ParserRegistry
from .schemas import METRICS, SPAN
from .store import TableStore
from .urlnorm import absolutize_udf

HOST_SALT = 4  # sub-splits per host for hot-host skew (north_rule)

# Below this many seen URLs the bloom/cuckoo seen-set sidecar costs more
# than it saves: the exact membership check is ONE broadcast semi-join
# against a partition-pruned frontier slice (frontier.antijoin_new),
# while the sidecar adds a cold build, a per-epoch executor-side fold of
# the register delta, and a probe UDF crossing per epoch. The filter
# exists to avoid streaming a 10^9-10^10-row frontier; activating it
# only past this size keeps small/medium crawls on the cheap exact path
# and is purely an optimization threshold — both paths are exact
# (measured: ~4 s/crawl saved at the 55k-URL bench; crawl() callers can
# override, e.g. bloom_min_frontier=0 forces the sidecar on).
BLOOM_MIN_FRONTIER = 1_000_000

FETCH_RESULT = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("proxy_id", T.IntegerType(), False),  # -1 = direct
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("spans", T.ArrayType(SPAN), True),
    ]
)

# validate/navigate OUTPUT: flags + links only. The spans column goes
# INTO Python (the parser contract needs it) but never comes back out —
# shipping it both ways doubles the Arrow traffic and bloats the epoch
# cache with deserialized span objects (measured: flat 2→8-core scaling
# with fat documents until this was split).
PROCESSED = T.StructType(
    [f for f in FETCH_RESULT.fields if f.name != "spans"]
    + [
        T.StructField("valid", T.BooleanType(), False),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType(), False),
                        T.StructField("type_id", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

_BATCH_COLS = ["url_hash", "url", "host", "type_id", "depth", "part", "pos", "proxy_id"]


def _with_proxy_col(batch: DataFrame) -> DataFrame:
    """Standalone fetcher calls (tests, maintenance) may pass batches
    without a proxy assignment — default to direct (-1)."""
    if "proxy_id" not in batch.columns:
        batch = batch.withColumn("proxy_id", F.lit(-1))
    return batch


def _host_salt(has_cd: bool):
    """Politeness group key. The model is the REFERENCE's (crawler.rs:
    70-80, 173: `threads` concurrent futures each sleeping delay after
    its own fetch, with NO per-host coordination at all): delay is a
    per-worker budget, and salting a host over HOST_SALT groups bounds
    its concurrency at HOST_SALT — already strictly MORE polite than
    crab's unbounded per-host concurrency, and the skew-splitting the
    north_rule asks for. EXCEPT robots Crawl-delay (RFC 9309): that is
    a HOST-level directive, so any host that declares one is pinned to
    salt 0 — ONE sequential group, requests spaced by the declared gap,
    no 4× aggregate-rate violation."""
    salt = F.pmod(F.col("url_hash"), F.lit(HOST_SALT))
    if has_cd:
        salt = F.when(F.col("crawl_delay").isNotNull(), F.lit(0)).otherwise(salt)
    return F.concat_ws("#", F.col("host"), salt.cast("string"))


class CorpusFetcher:
    """Deterministic fetch: join the dequeued batch against an in-Spark
    corpus table on canonical URL (the sandbox replacement for HTTP GET,
    crawler.rs:177-179 — the e2e fixture's test server, as a table).

    ``delay_sec`` simulates the reference's politeness budget
    (sleep-after-every-request, crawler.rs:165-175) as a per-host token
    bucket inside the fetch task, so throughput-vs-budget comparisons
    are apples-to-apples.
    """

    def __init__(self, corpus: DataFrame, delay_sec: float = 0.0):
        self.corpus = corpus.select(
            F.col("url").alias("c_url"), F.col("spans").alias("c_spans")
        )
        self.delay_sec = delay_sec
        # politeness sleeps are a side effect: results must be pinned,
        # not recomputed (crawl() caches fetch output when True)
        self.side_effects = delay_sec > 0

    def fetch(self, batch: DataFrame) -> DataFrame:
        batch = _with_proxy_col(batch)
        # per-host Crawl-delay (robots cache) rides along when present:
        # the effective spacing is max(configured politeness, host's own)
        has_cd = "crawl_delay" in batch.columns
        cols = _BATCH_COLS + (["crawl_delay"] if has_cd else [])
        joined = (
            batch.select(*cols)
            .join(self.corpus, batch["url"] == F.col("c_url"), "left")
            .withColumn("ok", F.col("c_spans").isNotNull())
            .withColumn("spans", F.col("c_spans"))
            .drop("c_url", "c_spans")
            .select([f.name for f in FETCH_RESULT.fields]
                    + (["crawl_delay"] if has_cd else []))
        )
        if self.delay_sec <= 0 and not has_cd:
            return joined
        self.side_effects = True  # sleeps ahead: results must be pinned
        delay = self.delay_sec
        drop_cols = ["_hs"] + (["crawl_delay"] if has_cd else [])

        def polite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # rows of one host(-salt) group are co-partitioned; spacing
            # budget = Σ max(delay, crawl_delay), paid once per Arrow batch
            for pdf in batches:
                if has_cd:
                    time.sleep(float(
                        pdf["crawl_delay"].fillna(delay).clip(lower=delay).sum()
                    ))
                else:
                    time.sleep(delay * len(pdf))
                yield pdf.drop(columns=drop_cols)

        salted = joined.withColumn("_hs", _host_salt(has_cd))
        # explicit partition count: groupBy.applyInPandas would let AQE
        # coalesce the (tiny) shuffle into 1-2 partitions and SERIALIZE
        # the politeness sleeps; a user-specified repartition(N, key) is
        # never coalesced, so sleeping groups keep all executor slots busy
        sc = joined.sparkSession.sparkContext
        n_parts = max(4 * sc.defaultParallelism, 16)
        return (
            salted.repartition(n_parts, "_hs")
            .sortWithinPartitions("_hs", "pos")
            .mapInPandas(polite, FETCH_RESULT)
        )


class HttpFetcher:
    """Real-network fetch path (unused in the sandbox — no network).

    Mirrors crawler.rs:150-179: per-request GET, politeness sleep after
    every request, invalid-cert tolerance (danger_accept_invalid_certs,
    crawler.rs:160 → unverified SSL context), per-request proxy routing
    (crawler.rs:72-74 → the row's ``proxy_id`` picks from ``proxies``).
    reqwest has separate connect/read timeouts (crawler.rs:155-159);
    urllib exposes ONE socket timeout, so we apply max(cto, rto) to the
    whole request — documented approximation. Distributed shape: the
    batch is grouped by salted host (``_host_salt``); each group runs
    in one task as a sequential, delay-spaced session. The politeness
    model is the reference's per-WORKER budget (crab's threads sleep
    independently with no host coordination), with per-host concurrency
    bounded at HOST_SALT — stricter than the reference; a host that
    declares a robots Crawl-delay is pinned to ONE group, so the
    RFC 9309 host-level gap is honored exactly.
    Fetched bodies convert to interleaved span documents in-task
    (functions.html.html_to_spans by default; ``to_spans`` plugs in
    other content types), so downstream parsing is identical to the
    offline path. Tested end-to-end over file:// URLs (urllib serves
    them through the same opener machinery — no network needed).
    """

    side_effects = True  # network I/O: crawl() must pin fetch results

    def __init__(self, delay_sec: float = 5.0, connect_timeout: float = 5.0,
                 read_timeout: float = 5.0, proxies: list[str] | None = None,
                 to_spans=None):
        from .functions.html import html_to_spans

        self.delay_sec = delay_sec
        self.connect_timeout = connect_timeout
        self.read_timeout = read_timeout
        self.proxies = proxies or []
        # fetched bodies become interleaved span documents (input_hint)
        # — html.parser extraction by default, pluggable for other
        # content types
        self.to_spans = to_spans if to_spans is not None else html_to_spans

    def fetch(self, batch: DataFrame) -> DataFrame:
        delay, cto, rto = self.delay_sec, self.connect_timeout, self.read_timeout
        proxies = list(self.proxies)
        to_spans = self.to_spans

        def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
            import ssl
            import urllib.request

            ctx = ssl._create_unverified_context()  # accept invalid certs
            openers: dict[int, urllib.request.OpenerDirector] = {}

            def opener_for(pid: int):
                if pid not in openers:
                    handlers: list = [urllib.request.HTTPSHandler(context=ctx)]
                    if 0 <= pid < len(proxies):
                        p = proxies[pid]
                        handlers.append(
                            urllib.request.ProxyHandler({"http": p, "https": p})
                        )
                    openers[pid] = urllib.request.build_opener(*handlers)
                return openers[pid]

            pdf = pdf.sort_values("pos")
            # effective per-row spacing: max(configured delay, the
            # host's robots Crawl-delay) when the batch carries one
            cds = (
                pdf["crawl_delay"].fillna(delay).clip(lower=delay).tolist()
                if "crawl_delay" in pdf.columns else None
            )
            oks, spans = [], []
            for i, (url, pid) in enumerate(zip(pdf["url"], pdf["proxy_id"])):
                try:
                    with opener_for(int(pid)).open(url, timeout=max(cto, rto)) as resp:
                        body = resp.read().decode("utf-8", errors="replace")
                    parsed = to_spans(body)
                    if not parsed:  # non-HTML payload: one raw text span
                        parsed = [{"kind": "text", "text": body,
                                   "media_ref": "", "offset": 0}]
                    oks.append(True)
                    spans.append(parsed)
                except Exception:
                    oks.append(False)
                    spans.append(None)
                time.sleep(delay if cds is None else cds[i])
            pdf = pdf.copy()
            pdf["ok"], pdf["spans"] = oks, spans
            return pdf[[f.name for f in FETCH_RESULT.fields]]

        cd_cols = ["crawl_delay"] if "crawl_delay" in batch.columns else []
        salted = _with_proxy_col(batch).select(*_BATCH_COLS, *cd_cols).withColumn(
            "_hs", _host_salt(bool(cd_cols))
        )
        # explicit repartition (not groupBy): AQE must not coalesce the
        # host groups or the politeness sleeps serialize (see CorpusFetcher)
        sc = batch.sparkSession.sparkContext
        n_parts = max(4 * sc.defaultParallelism, 16)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fetch_group(pdf.drop(columns=["_hs"]))

        return (
            salted.repartition(n_parts, "_hs")
            .sortWithinPartitions("_hs", "pos")
            .mapInPandas(run, FETCH_RESULT)
        )


def _span_dicts(spans) -> list:
    # Arrow→pandas already materializes struct elements as dicts; only
    # convert when a backend hands us Row-like objects (copying 300
    # dicts per doc again was a measured memory-bandwidth bottleneck)
    if len(spans) and not isinstance(spans[0], dict):
        return [s.asDict() for s in spans]
    return list(spans)


def _process_batch(
    fetched: DataFrame,
    registry: ParserRegistry,
    navigate: bool,
    has_valid: bool = False,
) -> DataFrame:
    """validate + navigate in ONE Python pass over the fetch results —
    one Arrow crossing per task instead of the reference's two GIL
    round-trips per page (python.rs:55-109). With ``has_valid`` the
    `valid` column was already computed JVM-side (expression
    validators) and Python only runs navigate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            valids, links = [], []
            pre_valid = pdf["valid"] if has_valid else None
            for i, (type_id, ok, spans) in enumerate(
                zip(pdf["type_id"], pdf["ok"], pdf["spans"])
            ):
                if not ok or spans is None:
                    valids.append(False)
                    links.append([])
                    continue
                span_dicts = None
                if pre_valid is not None:
                    valid = bool(pre_valid.iloc[i])
                else:
                    span_dicts = _span_dicts(spans)
                    valid = bool(registry.run_validate(int(type_id), span_dicts))
                valids.append(valid)
                if valid and navigate:
                    if span_dicts is None:
                        span_dicts = _span_dicts(spans)
                    out = registry.run_navigate(int(type_id), span_dicts)
                    links.append([{"url": u, "type_id": int(t)} for u, t in out])
                else:
                    links.append([])
            pdf = pdf.copy()
            pdf["valid"], pdf["links"] = valids, links
            yield pdf.drop(columns=["spans"])

    return fetched.mapInPandas(run, schema=PROCESSED)


@dataclass
class CrawlStats:
    epochs: int = 0
    requests: int = 0
    successful: int = 0
    invalid: int = 0
    new_links: int = 0
    robots_denied: int = 0
    wall_sec: float = 0.0
    crawl_order: list[str] = field(default_factory=list)


def _resume_epoch(store: TableStore) -> int:
    """Last COMPLETED epoch. The authoritative record is the ``fetched``
    manifest's done-tags — the epoch's single atomic commit point (one
    os.replace). The state file is a human-readable mirror, also
    consulted so maintenance commands (navigate-all) that consumed an
    epoch number without fetching anything never get their tag reused."""
    state_epoch = int(store.read_state("crawl", {"epoch": 0})["epoch"])
    # done-tag derivation is shared with the rescore snapshot's as-of
    # epoch (frontier.last_done_epoch) — ONE implementation, so resume
    # and snapshot visibility can never silently diverge. historic_tags:
    # a compact()/reset rewrite of the fetched log collapses the done-*
    # dirs but must not rewind the resume epoch — the collapsed tags
    # stay visible through the manifest history.
    from .frontier import last_done_epoch

    return max(state_epoch, last_done_epoch(store))


def crawl(
    store: TableStore,
    fetcher,
    registry: ParserRegistry,
    navigate: bool = True,
    batch_size: int = 100,
    max_epochs: int | None = None,
    depth_offset: int = 1,
    use_bloom: bool | str = True,
    bloom_capacity: int = 1_000_000,
    record_order: bool = False,
    profile: bool = False,
    robots: DataFrame | None = None,
    proxy_pool=None,
    host_budget: int | None = None,
    rescore_every: int = 8,
    compact_threshold: int | None = 64,
    trap_cap: int | None = None,
    trap_check_every: int = 16,
    bloom_min_frontier: int = BLOOM_MIN_FRONTIER,
) -> CrawlStats:
    """Run the crawl to completion (or max_epochs). Mirrors
    `crab run-crawler [--navigate]` (main.rs:156-184, crawler.rs:52-125).

    depth_offset=1 is the crawl path (child = parent depth + 1,
    crawler.rs:138); depth_offset=0 reproduces the reference's
    navigate-all quirk (children registered at the PARENT's depth,
    main.rs:212,219-221).

    ``robots``: optional robots cache DataFrame (see robots.robots_table)
    broadcast-joined into every dequeued batch; disallowed rows are never
    dispatched and are marked resolved so they don't retry (north_rule:
    robots cache in the dispatch path — the reference itself has none).

    ``trap_cap``: optional self-defending mode — every
    ``trap_check_every`` epochs (absolute epoch number, so the cadence
    is resume-stable) the frontier's URL-template explosion report
    (traps.trap_report, one frontier scan) flags shapes holding more
    registered URLs than the cap, and their Disallow patterns join the
    dispatch gate alongside ``robots``: trapped URLs resolve as
    robots-skips, their children are never discovered, and the crawl
    escapes calendar/session-id URL generators without operator
    intervention. Active rules checkpoint to the store state BEFORE the
    epoch dispatches with them, so a crashed epoch re-runs under the
    identical gate (state write precedes every epoch commit); persisted
    caps gate every subsequent crawl on the workspace even when
    ``trap_cap`` is not passed (``cli traps --clear`` removes them).

    ``proxy_pool``: optional proxy.ProxyPool. Each dispatched row gets a
    deterministic proxy among the epoch's non-dead ids (seq % n_alive —
    the seeded stand-in for the reference's per-request thread_rng pick,
    crawler.rs:72, proxy.rs:79-111); per-epoch outcomes are folded back
    into the saturating counters (proxy.rs:116-122 at epoch granularity).

    ``host_budget``: switch the frontier to the north_rule's priority
    mode — every ``rescore_every`` epochs the pending slice is re-scored
    with host-budget overflow (frontier.apply_host_budget: a hot host's
    rows beyond the budget sink one priority level per overflow) and the
    dequeue orders by (priority, seq) instead of (depth, seq), so epochs
    interleave hosts instead of draining one hot host's shallow pages
    first. The reference has no such mode, so the crawl-order-equality
    contract applies only to the default BFS mode. Between rescores the
    epochs are O(batch + head slice), same as BFS: the rescore pass
    returns the snapshot's per-band pending counts, the loop maintains
    them incrementally (+registered at band=depth, −resolved from the
    batch), and dequeue scans only the banded-snapshot cutoff slice
    plus the since-rescore frontier/fetched deltas (frontier.scored_head).
    Priority-mode crash-resume is still exactly-once: a crashed epoch's
    re-run skips the rescore and dequeues with the committed snapshot it
    originally used, reproducing the identical batch (rescoring against
    the post-crash pending set would change the batch and overwrite the
    epoch's committed registrations with different rows).

    ``compact_threshold``: when the frontier's (or fetched log's) live
    delta-dir count exceeds this, the crawl folds that table into one
    compacted snapshot before the epoch starts (never on a crashed-epoch
    re-run) — the partitioned frontier read unions per-dir scans, and
    the fetched log drips one done-* dir per epoch even after the
    frontier stabilizes, so unbounded delta drip would grow plan/listing
    cost linearly with epochs. Each fold sorts to preserve its
    consumers' row-group pruning (frontier by depth; fetched by (depth,
    epoch): within a depth run epochs stay ascending, so both the BFS
    depth cutoff and priority mode's epoch>r suffix read keep pruning).
    None disables (e.g. when an external Iceberg-style rewrite service
    owns compaction). ``documents`` and ``metrics`` also drip one delta
    dir per epoch but are deliberately NOT folded in-crawl: nothing in
    the epoch loop reads them (docs are parsed in-task, metrics are
    dashboard-only), documents folds would rewrite payload bytes every
    threshold epochs, and the offline ``cli compact`` / an Iceberg
    rewrite service own their maintenance.

    Crash-resume contract: an epoch's writes commit in the order
    documents → register → metrics → fetched; the fetched append is the
    atomic commit point the resume epoch derives from. A crash anywhere
    before it re-runs the SAME epoch number against the IDENTICAL batch
    (dequeue excludes the crashed epoch's own registrations) and every
    write is an idempotent tagged overwrite, so resume is exactly-once.
    """
    spark = store.spark
    stats = CrawlStats()
    # One driver-side probe per crawl (the robots cache is tiny): when
    # NO host declares a Crawl-delay, the dispatch drops the all-NULL
    # crawl_delay column so delay_sec=0 fetchers keep their zero-cost
    # fast path (no politeness shuffle, no sleep-0 Arrow crossing).
    robots_has_delay = (
        robots is not None
        and "crawl_delay" in robots.columns
        and robots.filter(F.col("crawl_delay").isNotNull()).limit(1).count() > 0
    )
    # trap guard: the effective dispatch gate = user robots ∪ active
    # trap caps. Persisted caps gate EVERY crawl on this workspace —
    # including one whose operator forgot --trap-cap — so the
    # identical-gate re-run contract holds unconditionally; ``trap_cap``
    # only controls whether NEW shapes are swept. (Trap rules never
    # carry a Crawl-delay, so robots_has_delay stays the user-cache
    # probe. ``cli traps --clear`` is the recovery path.)
    gate_robots = robots
    trap_hosts: dict[str, list[str]] = (
        store.read_state("traps", {"hosts": {}})["hosts"]
    )
    if trap_hosts:
        from .traps import trap_gate

        gate_robots = trap_gate(spark, robots, trap_hosts)
    t0 = time.monotonic()
    epoch = _resume_epoch(store)

    # Incremental seen-set state across epochs so no per-epoch full
    # frontier rescan is needed (at 10^10 URLs a rescan per epoch is the
    # difference between O(frontier) and O(batch)):
    # - max_seq feeds deterministic seq assignment in register()
    # - the seen-set filter lives in the per-part sidecar FILES (the
    #   single source of truth once built; the driver never holds it
    #   beyond a cold build) — probes load parts lazily, per-epoch delta
    #   folds run executor-side (bloom.fold_delta_files)
    max_seq = -1
    use_filter = bool(use_bloom)
    if not store.exists("frontier"):
        # nothing registered: the reference's first refill returns empty
        # and the crawl completes immediately (crawler.rs:61-67)
        stats.wall_sec = time.monotonic() - t0
        return stats
    max_seq = store.read("frontier").agg(F.max("seq")).collect()[0][0]
    if use_filter and (max_seq + 1) < bloom_min_frontier:
        # scale-adaptive: the sidecar only pays past BLOOM_MIN_FRONTIER
        # seen rows (see the constant's rationale) — below it every
        # epoch uses the exact broadcast membership check and sidecar
        # maintenance (cold build + per-epoch folds) is skipped
        # entirely. A later crawl over a grown frontier cold-builds (or
        # catch-up-folds) the sidecar from the full table, so deferring
        # maintenance never loses keys.
        use_filter = False
    # Driver-side per-depth pending counts: computed once at resume, then
    # maintained incrementally (−resolved, +registered per epoch) so
    # steady-state dequeue never scans the frontier to pick its cutoff.
    depth_counts = pending_depth_counts(store)
    # Priority-mode twin: per-priority-band pending counts. None until
    # the first rescore pass seeds them (the first non-rerun epoch of
    # every crawl() call rescores, since stats.epochs starts at 0) —
    # dequeue recomputes on the rare rerun-first path.
    prio_counts: dict[int, int] | None = None
    bloom_path = store.root / "_manifests" / "bloom-frontier.d"
    # use_bloom: True/'bloom' = bucketed Bloom bitmaps (OR-mergeable
    # partials); 'cuckoo' = partitioned cuckoo filter (deletable, per
    # the north_rule's 'bloom/cuckoo' seen set — delta folds insert the
    # epoch's keys instead of OR-ing bitmaps)
    filter_kind = "cuckoo" if use_bloom == "cuckoo" else "bloom"

    warned_sat: set[int] = set()

    def _warn_saturated(meta: dict | None) -> None:
        """Surface cuckoo shard saturation ONCE per shard, with the knob
        that fixes it — the filter has already degraded gracefully
        (those shards answer 'maybe' for everything; register falls
        through to the exact membership check)."""
        if not meta or meta.get("kind") != "cuckoo":
            return
        fresh = set(meta.get("sat_parts", [])) - warned_sat
        if fresh:
            warned_sat.update(fresh)
            warnings.warn(
                f"cuckoo seen-set shard(s) {sorted(fresh)} over capacity "
                f"(bloom_capacity={bloom_capacity}); they now answer "
                "'maybe' for all keys — correctness is preserved via the "
                "exact membership check, at prefilter cost. Raise "
                "bloom_capacity (or recreate the sidecar) to restore "
                "full prefiltering.", stacklevel=2,
            )

    if use_filter:
        committed = set(store.tags("frontier"))
        historic = set(store.historic_tags("frontier"))
        meta = bloom_mod._read_meta(bloom_path)
        meta_kind = (
            None if meta is None
            else ("cuckoo" if meta.get("kind") == "cuckoo" else "bloom")
        )
        covered = set(meta.get("covered", [])) if meta else set()
        # Incremental resume is valid when every tag the sidecar hasn't
        # covered is a live, individually-foldable reg-* delta. A
        # compaction can collapse reg tags into one compact-* dir; the
        # in-crawl compactor re-baselines the covered set so this stays
        # true, but a compaction OVER an uncovered delta (e.g. offline
        # CLI compact while the sidecar lagged) forces the cold rebuild.
        sidecar_ok = (
            meta is not None and meta_kind == filter_kind
            and covered <= historic
            and all(t.startswith("reg-") for t in committed - covered)
            and not {t for t in historic - committed
                     if t.startswith("reg-")} - covered
        )
        if sidecar_ok:
            # resume catch-up: fold only the register deltas committed
            # after the last covered tag — executor-side, O(delta), no
            # full frontier rescan, no key bytes through the driver
            for tag in sorted(committed - covered):
                meta = bloom_mod.fold_delta_files(
                    spark, store.read_tag("frontier", tag), bloom_path, tag
                )
        else:
            # cold build: distributed partial build (driver holds the
            # filter only transiently for the initial full save — from
            # here on the sidecar FILES are the single source of truth).
            # Size from the LARGER of the configured capacity and the
            # actual frontier (max_seq+1 rows, known for free) so a
            # resumed crawl over an outgrown frontier doesn't start
            # degraded; growth DURING the crawl is handled by the cuckoo
            # per-shard saturation fallback / bloom FPR creep.
            capacity = max(bloom_capacity, 2 * (max_seq + 1))
            if filter_kind == "cuckoo":
                from . import cuckoo as cuckoo_mod

                built = cuckoo_mod.build_cuckoo(
                    store.read("frontier"), "url_hash",
                    proto=cuckoo_mod.CuckooFilter.sized_for(capacity),
                )
            else:
                built = bloom_mod.build_bloom(
                    store.read("frontier"), "url_hash",
                    proto=bloom_mod.BucketedBloom.sized_for(capacity),
                )
            # the build read the whole table → covers every historic tag
            bloom_mod.save_sidecar(bloom_path, built, set(historic))
            meta = bloom_mod._read_meta(bloom_path)
            del built
        _warn_saturated(meta)

    def _tick(label, t_prev, timings):
        now = time.monotonic()
        timings[label] = timings.get(label, 0.0) + (now - t_prev)
        return now

    while max_epochs is None or stats.epochs < max_epochs:
        epoch += 1
        timings: dict[str, float] = {}
        te = time.monotonic()
        # exclude_epoch: on a crashed-epoch re-run the frontier already
        # holds this epoch's registrations; hiding them reproduces the
        # original batch byte-for-byte (no-op on a clean run). On a
        # re-run the incremental counts include the crashed epoch's rows
        # → recompute them under the exclusion instead.
        rerun = f"reg-{epoch:06d}" in store.tags("frontier")
        if (compact_threshold and not rerun
                and len(store.tags("frontier")) > compact_threshold):
            # long crawls drip one delta dir per epoch, and the
            # partitioned frontier read unions per-dir scans — without
            # periodic folding, plan size (and file listing) grows
            # linearly with epochs. Amortized cost: one full rewrite per
            # `compact_threshold` epochs (Iceberg's rewrite_data_files
            # would run this as a background service instead). The
            # in-memory filter already covers everything committed, so
            # the covered set re-baselines to the compacted tag.
            n_files = max(1, (max_seq + 1) // 500_000 + 1)
            # sort by depth so the dequeue's head-depth cutoff keeps
            # pruning row groups AFTER the rewrite (append order gave
            # the depth↔file correlation for free; a compaction must
            # restore it explicitly)
            store.compact("frontier", n_files=n_files, sort_within=["depth"])
            if use_filter:
                # the sidecar already covers everything committed; only
                # the covered-tag set needs re-baselining to the
                # compacted history (meta-only write, no part files)
                bloom_mod.rewrite_covered(
                    bloom_path, set(store.historic_tags("frontier"))
                )
        if (compact_threshold and not rerun and store.exists("fetched")
                and len(store.tags("fetched")) > compact_threshold):
            # the fetched log drips one done-* dir per epoch too — and
            # keeps dripping after the frontier stabilizes (late epochs
            # register 0 new URLs but still resolve rows), so its
            # trigger is independent of the frontier's. dequeue
            # anti-joins fetched EVERY epoch (depth-pruned) and priority
            # mode folds its epoch>r suffix; at 10^6 epochs the
            # per-epoch file listing alone is O(epochs) without folding.
            # Same snapshot-swap rewrite; resume is immune because
            # _resume_epoch derives from historic_tags, which keep the
            # collapsed done-* tags visible. Sorting (depth, epoch)
            # preserves BOTH consumers' row-group pruning.
            store.compact(
                "fetched",
                n_files=max(1, (max_seq + 1) // 500_000 + 1),
                sort_within=["depth", "epoch"],
            )
        if (trap_cap is not None and not rerun
                and epoch % max(trap_check_every, 1) == 0):
            # periodic trap sweep: one frontier scan (amortized over
            # trap_check_every epochs), flagged-shape rows only come
            # back to the driver (tiny by construction). State commits
            # BEFORE this epoch dispatches under the new gate — a crash
            # anywhere later re-runs the epoch with the identical gate.
            from .traps import pattern_for_template, trap_gate, trap_report

            added = 0
            for r in trap_report(
                store.read("frontier"), max_urls_per_template=trap_cap
            ).collect():
                pats = trap_hosts.setdefault(r["host"], [])
                pat = pattern_for_template(r["template"])
                if pat not in pats:
                    pats.append(pat)
                    added += 1
            if added:
                store.write_state("traps", {"hosts": trap_hosts})
                gate_robots = trap_gate(spark, robots, trap_hosts)
        if (host_budget is not None and not rerun
                and (stats.epochs % max(rescore_every, 1)) == 0):
            # priority mode: refresh the host-budget scoring snapshot
            # over the current pending slice (O(pending) — the PERIODIC
            # maintenance pass; steady-state epochs below cost
            # O(batch + head slice) like BFS mode). NEVER on a
            # crashed-epoch re-run: the committed snapshot is the one
            # the crashed epoch dequeued with, and re-scoring against
            # post-crash pending (which now contains the crashed epoch's
            # own registrations) would produce a DIFFERENT batch — whose
            # register would then overwrite the committed reg tag with
            # different rows, losing the original registrations. Reusing
            # the committed snapshot reproduces the original batch
            # exactly, same as the BFS mode's exclude_epoch contract.
            # epoch-1 = everything committed so far, the snapshot's
            # as-of point for dequeue's since-rescore delta folds.
            prio_counts = apply_host_budget(store, host_budget, epoch=epoch - 1)
        batch0 = dequeue(
            store, batch_size=batch_size, exclude_epoch=epoch,
            by_priority=host_budget is not None,
            depth_counts=None if (rerun or host_budget is not None) else depth_counts,
            prio_counts=None if rerun else prio_counts,
        ).cache()
        batch = batch0
        n_total = batch.count()
        te = _tick("dequeue", te, timings)
        if n_total == 0:
            batch0.unpersist()
            break
        # dispatch order: the reference pops via pages.swap_remove(0)
        # (crawler.rs:71), so a refill of [p1..pn] in (depth, seq) order
        # dispatches as p1, pn, pn-1, ..., p2 — remap rank → dispatch pos
        if n_total > 1:
            batch = batch.withColumn(
                "pos",
                F.when(F.col("pos") == 1, F.lit(1).cast("long")).otherwise(
                    (F.lit(n_total + 2) - F.col("pos")).cast("long")
                ),
            )

        # robots gate (north_rule): broadcast the per-host rule cache
        # into the batch; disallowed rows are never dispatched and are
        # marked resolved at the epoch commit so they never retry
        denied = None
        flagged = None
        n = n_total
        if gate_robots is not None:
            from .robots import with_robots_flag

            flagged = with_robots_flag(batch, gate_robots).cache()
            denied = flagged.filter(~F.col("robots_ok"))
            dispatch = flagged.filter(F.col("robots_ok")).drop("robots_ok")
            if not robots_has_delay and "crawl_delay" in dispatch.columns:
                dispatch = dispatch.drop("crawl_delay")
            n = dispatch.count()
            stats.robots_denied += n_total - n
        else:
            dispatch = batch

        # proxy assignment at dispatch (crawler.rs:72-74): deterministic
        # pick among this epoch's non-dead ids, carried through fetch
        if proxy_pool is not None and proxy_pool.urls:
            alive = proxy_pool.alive_ids()
            id_arr = F.array(*[F.lit(int(i)) for i in alive])
            dispatch = dispatch.withColumn(
                "proxy_id",
                F.element_at(
                    id_arr, (F.pmod(F.col("seq"), F.lit(len(alive))) + 1).cast("int")
                ).cast("int"),
            )
        else:
            dispatch = dispatch.withColumn("proxy_id", F.lit(-1))

        if record_order:
            stats.crawl_order.extend(
                r["url"] for r in dispatch.orderBy("pos").select("url", "pos").collect()
            )

        # Always pin the fetch results: side-effectful fetchers (HTTP,
        # politeness sleeps) MUST not recompute, and even a pure fetch
        # is consumed twice per epoch (the processed pipeline and the
        # documents append, which needs the full spans) — uncached, the
        # whole fetch join ran twice, concurrently, per epoch. The cache
        # is epoch-bounded (batch_size rows) and released at epoch end.
        fetched_df = fetcher.fetch(dispatch).cache()
        # JVM fast path: when every validator has an expression form,
        # `valid` is computed in whole-stage codegen over the full span
        # array — no Arrow crossing for validation at all
        jvm_valid = registry.jvm_validator_chain()
        base = fetched_df
        has_valid = jvm_valid is not None
        if has_valid:
            base = fetched_df.withColumn("valid", F.col("ok") & jvm_valid)
        # span-kind pushdown: prune the span array JVM-side to the kinds
        # the Python functions still running declare they read — the
        # Arrow crossing then ships links only, not page text
        kinds = registry.needed_kinds(navigate)
        to_python = base
        if kinds is not None:
            kind_arr = F.array(*[F.lit(k) for k in sorted(kinds)])
            to_python = base.withColumn(
                "spans",
                F.filter("spans", lambda s: F.array_contains(kind_arr, s["kind"])),
            )
        if has_valid and not navigate:
            # no Python at all this epoch: links are empty JVM-side
            processed = base.withColumn(
                "links",
                F.array().cast("array<struct<url:string,type_id:int>>"),
            ).select([f.name for f in PROCESSED.fields]).cache()
        else:
            processed = _process_batch(
                to_python, registry, navigate, has_valid=has_valid
            ).cache()
        good = processed.filter(F.col("ok") & F.col("valid"))
        # Materialize the cache with a PARALLEL action (the metrics agg,
        # needed anyway) BEFORE any coalesced write: coalesce(k) collapses
        # its whole upstream stage to k tasks, so if the first action on
        # `processed` were a coalesced write, the entire fetch + parse
        # pipeline would run on k tasks (measured: flat scaling).
        # one collect serves the per-part lineage rows AND the per-depth
        # resolved counts (for the driver-side pending-counts upkeep)
        per_cell = processed.groupBy("part", "depth").agg(
            F.count("*").alias("requests"),
            F.sum((F.col("ok") & F.col("valid")).cast("long")).alias("successful"),
            F.sum((F.col("ok") & ~F.col("valid")).cast("long")).alias("invalid"),
        ).collect()
        per_part: dict[int, list[int]] = {}
        for r in per_cell:
            acc = per_part.setdefault(int(r["part"]), [0, 0, 0])
            acc[0] += int(r["requests"])
            acc[1] += int(r["successful"])
            acc[2] += int(r["invalid"])
        te = _tick("plan", te, timings)

        # fold this epoch's per-proxy outcomes into the saturating
        # counters (proxy.rs:116-122; success = fetched AND valid,
        # crawler.rs:93-115)
        if proxy_pool is not None and proxy_pool.urls:
            proxy_pool.fold_epoch_outcomes(
                processed.filter(F.col("proxy_id") >= 0).select(
                    "proxy_id", (F.col("ok") & F.col("valid")).alias("ok")
                )
            )

        # EPOCH COMMIT SEQUENCE — documents, register, metrics commit
        # first (all idempotent tagged overwrites); the fetched append
        # goes LAST as the epoch's atomic commit point. A crash anywhere
        # before it leaves the batch pending, so the resumed run re-runs
        # the same epoch against the identical batch and every re-write
        # lands on the same tags. The documents write and the register
        # pipeline are independent Spark jobs (different tables, commit
        # order between them doesn't matter — only fetched-last does),
        # so they run CONCURRENTLY: the docs append overlaps register's
        # shuffles instead of serializing the epoch's two biggest jobs.
        docs = (
            # (hash, url) like every other membership join: a 64-bit
            # collision between a good row and a failed/invalid row in
            # the same batch must not leak the bad row into documents
            fetched_df.join(good.select("url_hash", "url"),
                            ["url_hash", "url"], "left_semi")
            .select(
                F.col("url").alias("doc_id"),
                F.col("spans"),
                F.lit(epoch).alias("fetched_epoch"),
            )
        )
        docs_exc: list[BaseException] = []

        def _write_docs() -> None:
            try:
                store.append("documents", docs, tag=f"docs-{epoch:06d}")
            except BaseException as e:  # surfaced after join()
                docs_exc.append(e)

        docs_thread = threading.Thread(target=_write_docs, name=f"docs-{epoch}")
        docs_thread.start()

        n_new = 0
        try:
            if navigate:
                exploded = good.select(
                    "url", "depth", "pos", F.posexplode_outer("links").alias("link_idx", "link")
                ).filter(F.col("link").isNotNull())
                cands = (
                    exploded.withColumn("abs_url", absolutize_udf(F.col("link.url"), F.col("url")))
                    .filter(F.col("abs_url").isNotNull())
                    .select(
                        F.col("abs_url").alias("url"),
                        F.col("link.type_id").alias("type_id"),
                        (F.col("depth") + F.lit(depth_offset)).cast("int").alias("depth"),
                        F.col("pos").alias("parent_pos"),
                        F.col("link_idx").cast("int").alias("link_idx"),
                    )
                )
                # scale path: probe the seen-set via the per-part sidecar
                # FILES — executors lazily load only the part files their
                # batches route to; nothing filter-sized is broadcast.
                # (An unreadable sidecar yields None → register skips the
                # prefilter and pays the exact membership check only.)
                seen_probe = None
                if use_filter and max_seq >= 0:
                    seen_probe = bloom_mod.sidecar_probe_udf(spark, bloom_path)
                reg_out: dict[int, int] | None = None if rerun else {}
                n_new = register(
                    store, cands, epoch,
                    seen_bloom=seen_probe,
                    max_seq=max_seq,
                    depth_counts_out=reg_out,
                )
                if reg_out:
                    for d, nn in reg_out.items():
                        depth_counts[d] = depth_counts.get(d, 0) + nn
                        if prio_counts is not None:
                            # fresh rows score at registration priority
                            # (= depth), so their band is their depth
                            prio_counts[d] = prio_counts.get(d, 0) + nn
                te = _tick("register", te, timings)
                if n_new:
                    max_seq += n_new
                    if use_filter:
                        # fold ONLY this epoch's new keys into the
                        # touched sidecar part files, EXECUTOR-SIDE
                        # (bloom.fold_delta_files) — the driver commits
                        # meta.json only, never the keys. The sidecar
                        # lags the manifest at worst — resume catch-up
                        # folds the gap, never misses keys.
                        tag = f"reg-{epoch:06d}"
                        fold_meta = bloom_mod.fold_delta_files(
                            spark, store.read_tag("frontier", tag),
                            bloom_path, tag,
                        )
                        _warn_saturated(fold_meta)
                te = _tick("bloom", te, timings)
        finally:
            # documents must be committed before the epoch's commit
            # point (and joined even when register raises mid-epoch)
            docs_thread.join()
        if docs_exc:
            raise docs_exc[0]
        te = _tick("docs_write", te, timings)

        # crashed-epoch re-run: register() finds 0 new (its previous
        # output is already committed and seen) — recover the metric from
        # the epoch's own committed delta so lineage stays truthful.
        # max_seq must NOT be bumped: the resume scan already counted them.
        n_new_logged = n_new
        if n_new == 0 and navigate and f"reg-{epoch:06d}" in store.tags("frontier"):
            n_new_logged = store.read_tag("frontier", f"reg-{epoch:06d}").count()

        # lineage/metrics per (epoch, frontier partition) + a summary row
        # (per_cell computed up front, doubling as cache materialization)
        n_good = sum(v[1] for v in per_part.values())
        n_invalid = sum(v[2] for v in per_part.values())
        rows = [
            (epoch, part, v[0], v[1], v[2], 0)
            for part, v in sorted(per_part.items())
        ] + [(epoch, -1, n, n_good, n_invalid, n_new_logged)]
        # rows already live on the driver: the pyarrow append skips a
        # full Spark job submission per epoch for O(partitions) ints
        store.append_rows("metrics", rows, METRICS, tag=f"metrics-{epoch:06d}")
        te = _tick("metrics", te, timings)

        # ATOMIC COMMIT POINT: one manifest swap marks the whole epoch
        # done (downloaded rows + robots-skipped rows resolve together)
        mark_fetched(store, good, epoch, skipped=denied)
        te = _tick("fetched_write", te, timings)
        store.write_state("crawl", {"epoch": epoch})  # observability mirror

        # maintain the driver-side pending counts: −resolved (from the
        # per_cell collect; +registered was folded in by register()).
        # Only robots denial needs its own tiny agg.
        if rerun:
            depth_counts = pending_depth_counts(store)
            if host_budget is not None:
                prio_counts = pending_priority_counts(store)
        else:
            for r in per_cell:
                c = int(r["successful"])
                if not c:
                    continue
                d = int(r["depth"])
                depth_counts[d] = depth_counts.get(d, 0) - c
                if depth_counts[d] <= 0:
                    del depth_counts[d]
            if denied is not None:
                for r in denied.groupBy("depth").agg(F.count("*").alias("c")).collect():
                    d = int(r["depth"])
                    depth_counts[d] = depth_counts.get(d, 0) - int(r["c"])
                    if depth_counts[d] <= 0:
                        del depth_counts[d]
            if prio_counts is not None:
                # priority-band decrements for the resolved rows: the
                # (cached) batch carries each row's effective priority —
                # one O(batch) semi-join + tiny agg, no pending rescan
                resolved = good.select("url_hash", "url")
                if denied is not None:
                    resolved = resolved.unionByName(denied.select("url_hash", "url"))
                for r in (
                    batch0.join(resolved, ["url_hash", "url"], "left_semi")
                    .groupBy(F.floor("priority").cast("int").alias("b"))
                    .agg(F.count("*").alias("n")).collect()
                ):
                    b = int(r["b"])
                    prio_counts[b] = prio_counts.get(b, 0) - int(r["n"])
                    if prio_counts[b] <= 0:
                        del prio_counts[b]
        te = _tick("counts", te, timings)
        # one progress line per epoch, always — the batch-world mapping
        # of the reference's live dashboard (terminal.rs:28-157, 100 ms
        # tick): a long crawl is never silent between commits. Goes to
        # stderr (progress is a console artifact; stdout stays clean for
        # piped output like bench.py's single JSON line); the same
        # numbers land durably in the metrics table.
        total = sum(timings.values())
        print(
            f"[epoch {epoch}] dequeued={n_total} fetched={n} ok={n_good} "
            f"invalid={n_invalid} new={n_new_logged} "
            f"denied={n_total - n} pending~{sum(depth_counts.values())} "
            f"{total:.1f}s",
            file=sys.stderr, flush=True,
        )
        if profile:
            print("  " + " ".join(f"{k}={v:.1f}" for k, v in timings.items()),
                  file=sys.stderr, flush=True)

        stats.epochs += 1
        stats.requests += n
        stats.successful += n_good
        stats.invalid += n_invalid
        stats.new_links += n_new_logged
        processed.unpersist()
        fetched_df.unpersist()
        if flagged is not None:
            flagged.unpersist()
        batch0.unpersist()
        inner = getattr(batch0, "df_ordered_cache", None)
        if inner is not None:
            inner.unpersist()

    stats.wall_sec = time.monotonic() - t0
    return stats
