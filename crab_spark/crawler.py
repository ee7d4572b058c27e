"""The crawl scheduler — reference crawler.rs:52-125 re-expressed as a
deterministic epoch loop whose per-epoch DAG is pure DataFrame code.

Reference loop (threads=1 default): refill 100 from the frontier
(depth-ASC, rowid tiebreak) → fetch each (politeness sleep after every
request) → validate via Python → store content + flip status →
navigate → absolutize → register new links at depth+1 → repeat until a
refill returns nothing. Completion order == dispatch order at the
default threads=1, which is what pins our determinism contract.

Epoch mapping: one refill = one epoch. Within an epoch the batch is
processed as one distributed DAG; links are registered in
(dispatch position, navigate-output index) order — byte-identical to
the reference's sequential registration order. The frontier state at
every refill boundary therefore matches the reference exactly, which is
the BASELINE.json crawl-order + seen-set equality criterion.

Scale shape per north_rule: the dequeued batch is repartitioned by a
*salted host* key so one hot host cannot serialise an epoch; politeness
is enforced per host inside the fetch task (token bucket); the seen-set
join is Bloom-pre-filtered; every epoch appends per-partition
lineage/metrics rows and bumps a checkpoint so a killed crawl resumes
from the last committed epoch (idempotent tagged appends make a
re-run of a half-committed epoch exactly-once).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import bloom as bloom_mod
from .frontier import dequeue, mark_fetched, register
from .parsers import ParserRegistry
from .schemas import METRICS, SPAN
from .store import TableStore
from .urlnorm import absolutize_udf
from .util import local_df

HOST_SALT = 4  # sub-splits per host for hot-host skew (north_rule)

FETCH_RESULT = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("type_id", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("spans", T.ArrayType(SPAN), True),
    ]
)

PROCESSED = T.StructType(
    FETCH_RESULT.fields
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

_BATCH_COLS = ["url_hash", "url", "host", "type_id", "depth", "part", "pos"]


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

    def fetch(self, batch: DataFrame) -> DataFrame:
        joined = (
            batch.select(*_BATCH_COLS)
            .join(self.corpus, batch["url"] == F.col("c_url"), "left")
            .withColumn("ok", F.col("c_spans").isNotNull())
            .withColumn("spans", F.col("c_spans"))
            .drop("c_url", "c_spans")
            .select([f.name for f in FETCH_RESULT.fields])
        )
        if self.delay_sec <= 0:
            return joined
        delay = self.delay_sec

        def polite(key, pdf: pd.DataFrame) -> pd.DataFrame:
            # one host(-salt) group per task: spacing budget = delay × n
            pdf = pdf.sort_values("pos")
            time.sleep(delay * len(pdf))
            return pdf

        salted = joined.withColumn(
            "_hs",
            F.concat_ws(
                "#", F.col("host"), F.pmod(F.col("url_hash"), F.lit(HOST_SALT)).cast("string")
            ),
        )
        return (
            salted.groupBy("_hs")
            .applyInPandas(lambda k, p: polite(k, p.drop(columns=["_hs"])), FETCH_RESULT)
        )


class HttpFetcher:
    """Real-network fetch path (unused in the sandbox — no network).

    Mirrors crawler.rs:150-179: per-request GET with connect/read
    timeouts, politeness sleep after every request, invalid-cert
    tolerance. Distributed shape: the batch is grouped by salted host;
    each group runs in one task with a sequential, token-bucketed
    session — per-host politeness is then structurally guaranteed no
    matter how Spark schedules tasks. HTML→span conversion is the
    caller's parser concern; this returns one text span per page.
    """

    def __init__(self, delay_sec: float = 5.0, connect_timeout: float = 5.0,
                 read_timeout: float = 5.0, proxies: list[str] | None = None):
        self.delay_sec = delay_sec
        self.connect_timeout = connect_timeout
        self.read_timeout = read_timeout
        self.proxies = proxies or []

    def fetch(self, batch: DataFrame) -> DataFrame:
        delay, cto, rto = self.delay_sec, self.connect_timeout, self.read_timeout

        def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
            import urllib.request

            pdf = pdf.sort_values("pos")
            oks, spans = [], []
            for url in pdf["url"]:
                try:
                    with urllib.request.urlopen(url, timeout=max(cto, rto)) as resp:
                        body = resp.read().decode("utf-8", errors="replace")
                    oks.append(True)
                    spans.append([{"kind": "text", "text": body, "media_ref": "", "offset": 0}])
                except Exception:
                    oks.append(False)
                    spans.append(None)
                time.sleep(delay)
            pdf = pdf.copy()
            pdf["ok"], pdf["spans"] = oks, spans
            return pdf[[f.name for f in FETCH_RESULT.fields]]

        salted = batch.select(*_BATCH_COLS).withColumn(
            "_hs",
            F.concat_ws(
                "#", F.col("host"), F.pmod(F.col("url_hash"), F.lit(HOST_SALT)).cast("string")
            ),
        )
        return salted.groupBy("_hs").applyInPandas(
            lambda pdf: fetch_group(pdf.drop(columns=["_hs"])), FETCH_RESULT
        )


def _process_batch(fetched: DataFrame, registry: ParserRegistry, navigate: bool) -> DataFrame:
    """validate + navigate in ONE Python pass over the fetch results —
    one Arrow crossing per task instead of the reference's two GIL
    round-trips per page (python.rs:55-109)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            valids, links = [], []
            for type_id, ok, spans in zip(pdf["type_id"], pdf["ok"], pdf["spans"]):
                if not ok or spans is None:
                    valids.append(False)
                    links.append([])
                    continue
                span_dicts = [dict(s) for s in spans]
                valid = registry.run_validate(int(type_id), span_dicts)
                valids.append(bool(valid))
                if valid and navigate:
                    out = registry.run_navigate(int(type_id), span_dicts)
                    links.append([{"url": u, "type_id": int(t)} for u, t in out])
                else:
                    links.append([])
            pdf = pdf.copy()
            pdf["valid"], pdf["links"] = valids, links
            yield pdf

    return fetched.mapInPandas(run, schema=PROCESSED)


@dataclass
class CrawlStats:
    epochs: int = 0
    requests: int = 0
    successful: int = 0
    invalid: int = 0
    new_links: int = 0
    wall_sec: float = 0.0
    crawl_order: list[str] = field(default_factory=list)


def crawl(
    store: TableStore,
    fetcher,
    registry: ParserRegistry,
    navigate: bool = True,
    batch_size: int = 100,
    max_epochs: int | None = None,
    depth_offset: int = 1,
    use_bloom: bool = True,
    bloom_capacity: int = 1_000_000,
    record_order: bool = False,
    profile: bool = False,
) -> CrawlStats:
    """Run the crawl to completion (or max_epochs). Mirrors
    `crab run-crawler [--navigate]` (main.rs:156-184, crawler.rs:52-125).

    depth_offset=1 is the crawl path (child = parent depth + 1,
    crawler.rs:138); depth_offset=0 reproduces the reference's
    navigate-all quirk (children registered at the PARENT's depth,
    main.rs:212,219-221).
    """
    spark = store.spark
    stats = CrawlStats()
    t0 = time.monotonic()
    state = store.read_state("crawl", {"epoch": 0})
    epoch = int(state["epoch"])

    # Incremental seen-set state, maintained driver-side across epochs so
    # no per-epoch full frontier rescan is needed (at 10^10 URLs a rescan
    # per epoch is the difference between O(frontier) and O(batch)):
    # - max_seq feeds deterministic seq assignment in register()
    # - the Bloom is built once here (resume) and union()ed per epoch
    max_seq = -1
    seen_bloom = None
    if store.exists("frontier"):
        max_seq = store.read("frontier").agg(F.max("seq")).collect()[0][0]
        if use_bloom:
            seen_bloom = bloom_mod.build_bloom(
                store.read("frontier"), "url_hash",
                proto=bloom_mod.Bloom.sized_for(bloom_capacity),
            )
    elif use_bloom:
        seen_bloom = bloom_mod.Bloom.sized_for(bloom_capacity)

    def _tick(label, t_prev, timings):
        now = time.monotonic()
        timings[label] = timings.get(label, 0.0) + (now - t_prev)
        return now

    while max_epochs is None or stats.epochs < max_epochs:
        epoch += 1
        timings: dict[str, float] = {}
        te = time.monotonic()
        batch = dequeue(store, batch_size=batch_size).cache()
        n = batch.count()
        te = _tick("dequeue", te, timings)
        if n == 0:
            batch.unpersist()
            break
        if record_order:
            stats.crawl_order.extend(
                r["url"] for r in batch.orderBy("pos").select("url", "pos").collect()
            )

        processed = _process_batch(fetcher.fetch(batch), registry, navigate).cache()
        good = processed.filter(F.col("ok") & F.col("valid"))
        te = _tick("plan", te, timings)

        # store content + flip status (S9: append documents, mark fetched)
        docs = good.select(
            F.col("url").alias("doc_id"),
            F.col("spans"),
            F.lit(epoch).alias("fetched_epoch"),
        )
        store.append("documents", docs.coalesce(max(1, n // 100_000 + 1)),
                     tag=f"docs-{epoch:06d}")
        te = _tick("docs_write", te, timings)
        mark_fetched(store, good, epoch)
        te = _tick("fetched_write", te, timings)

        n_new = 0
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
            n_new = register(
                store, cands, epoch,
                seen_bloom=seen_bloom if (seen_bloom and max_seq >= 0) else None,
                max_seq=max_seq,
            )
            te = _tick("register", te, timings)
            if n_new:
                max_seq += n_new
                if seen_bloom is not None:
                    # fold ONLY this epoch's new keys into the filter
                    new_rows = store.read("frontier").filter(
                        F.col("epoch_discovered") == epoch
                    )
                    seen_bloom = seen_bloom.union(
                        bloom_mod.build_bloom(new_rows, "url_hash", proto=seen_bloom)
                    )
            te = _tick("bloom", te, timings)

        # lineage/metrics per (epoch, frontier partition) + a summary row.
        # ONE aggregation job: the per-part rows come back to the driver
        # (≤ N_BUCKETS rows) and the totals are derived from them.
        per_part = processed.groupBy("part").agg(
            F.count("*").alias("requests"),
            F.sum((F.col("ok") & F.col("valid")).cast("long")).alias("successful"),
            F.sum((F.col("ok") & ~F.col("valid")).cast("long")).alias("invalid"),
        ).collect()
        n_good = sum(r["successful"] for r in per_part)
        n_invalid = sum(r["invalid"] for r in per_part)
        rows = [
            (epoch, r["part"], r["requests"], r["successful"], r["invalid"], 0)
            for r in per_part
        ] + [(epoch, -1, n, n_good, n_invalid, n_new)]
        store.append("metrics", local_df(spark, rows, METRICS).coalesce(1),
                     tag=f"metrics-{epoch:06d}")
        store.write_state("crawl", {"epoch": epoch})  # commit point: epoch done
        te = _tick("metrics", te, timings)
        if profile:
            total = sum(timings.values())
            print(f"[epoch {epoch}] n={n} new={n_new} total={total:.1f}s "
                  + " ".join(f"{k}={v:.1f}" for k, v in timings.items()))

        stats.epochs += 1
        stats.requests += n
        stats.successful += n_good
        stats.invalid += n_invalid
        stats.new_links += n_new
        processed.unpersist()
        batch.unpersist()

    stats.wall_sec = time.monotonic() - t0
    return stats
