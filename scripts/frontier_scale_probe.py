"""Measure steady-state per-epoch frontier-op cost vs FRONTIER SIZE.

The 10^10-URL contract (BASELINE.json north_rule) says a crawl epoch's
frontier work is O(batch + touched parts + head-depth slice) —
independent of total frontier size. The scaling benches pin the cost
flat in EXECUTOR COUNT and the plan tests pin the pruned SHAPES
(PartitionFilters / PushedFilters); this probe supplies the third axis:
the same epoch ops measured against frontiers spanning ~25x in row
count, so growth (or flatness) is observed, not argued.

For each size S it builds a frontier the way the crawl does — one
append delta per depth band (BFS registers one depth per epoch), Hive-
partitioned by ``part``, with a constant-size head band (depth 0) and
the mass at the deepest band — plus a fetched log and the bloom
sidecar. Then it times, per size:

- ``dequeue``       batch_size=100 with incrementally-maintained depth
                    counts (the crawl loop's steady state). Contract:
                    scans only the depth<=cutoff row groups — flat in S.
- ``register/spread`` a 10k-candidate batch (half dups, half new) with
                    uniformly-hashed URLs: touches ALL N_BUCKETS=32
                    parts, the sandbox worst case. The seen side
                    streams (broadcast probe), so this bounds the
                    full-slice scan cost.
- ``register/confined`` a ~4k-candidate batch whose url hashes land in
                    parts {0,1} only: the production case (at 10^4
                    buckets a 100-URL refill touches <=1% of parts).
                    Contract: seen_slice file-prunes to 2/32 of the
                    frontier, so the gap vs spread widens with S.

Build time (untimed) writes through the engine's own TableStore
(set_partitioning + per-depth tagged appends), so the physical layout
— partition dirs, per-delta depth uniformity, row-group stats — is
exactly what the crawl produces; only dedup/seq assignment is
synthesized (deterministically) instead of re-running register over
millions of seed rows.

Usage:
  python scripts/frontier_scale_probe.py [--sizes 200000,1000000,5000000]
      [--batch 10000] [--k 100] [--reps 3] [--out BENCH_probe.json]

Prints one JSON line per size plus a summary line; solo-run it (the
timings are wall-clock on a shared host).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from crab_spark import bloom as bloom_mod  # noqa: E402
from crab_spark.frontier import dequeue, mark_fetched, register  # noqa: E402
from crab_spark.schemas import (  # noqa: E402
    FRONTIER,
    N_BUCKETS,
    STATUS_NOT_DOWNLOADED,
)
from crab_spark.session import get_spark  # noqa: E402
from crab_spark.store import TableStore  # noqa: E402

HEAD_ROWS = 1_000  # depth-0 band: constant across sizes (the BFS head)
FETCHED_HEAD = 800  # of which this many are already fetched


def _band_sizes(total: int) -> list[tuple[int, int]]:
    """(depth, rows) bands: constant head, mass at the deepest band."""
    d1 = max(total // 50, 1)   # 2%
    d2 = max(total // 12, 1)   # ~8%
    d3 = max(total - HEAD_ROWS - d1 - d2, 1)
    return [(0, HEAD_ROWS), (1, d1), (2, d2), (3, d3)]


def _urls(spark, depth: int, n: int, offset: int):
    """Deterministic synthetic band: URL embeds (depth, index) so dup
    candidates can be reconstructed exactly; ~1000 hosts."""
    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit("http://h"),
                F.lpad((F.col("id") % 997).cast("string"), 4, "0"),
                F.lit(".example.com/d"),
                F.lit(str(depth)),
                F.lit("/p"),
                F.col("id").cast("string"),
            ).alias("url"),
            (F.col("id") + offset).alias("seq"),
            F.lit(depth).cast("int").alias("depth"),
        )
    )


def build_frontier(store: TableStore, total: int) -> dict[int, int]:
    """Write the frontier through the engine's store layout (one delta
    per depth), the fetched log, and the bloom sidecar. Returns the
    PENDING per-depth counts (the crawl loop's incremental dict)."""
    spark = store.spark
    store.set_partitioning("frontier", "part")
    counts: dict[int, int] = {}
    offset = 0
    for depth, n in _band_sizes(total):
        rows = (
            _urls(spark, depth, n, offset)
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
            .withColumn("type_id", F.lit(1).cast("int"))
            .withColumn("status", F.lit(STATUS_NOT_DOWNLOADED))
            .withColumn("priority", F.col("depth").cast("double"))
            .withColumn("epoch_discovered", F.lit(depth).cast("int"))
            .withColumn(
                "part", F.pmod(F.col("url_hash"), F.lit(N_BUCKETS)).cast("int")
            )
            .select([f.name for f in FRONTIER.fields])
        )
        store.append("frontier", rows, tag=f"reg-{depth:06d}")
        counts[depth] = counts.get(depth, 0) + n
        offset += n
    # fetched: most of the head band is done — the steady-state shape
    done = (
        _urls(spark, 0, FETCHED_HEAD, 0)
        .withColumn("url_hash", F.xxhash64("url"))
        .select("url_hash", "url", "depth")
    )
    mark_fetched(store, done, epoch=1)
    counts[0] -= FETCHED_HEAD
    return counts


def build_sidecar(store: TableStore, path: str, total: int) -> None:
    built = bloom_mod.build_bloom(
        store.read("frontier"),
        "url_hash",
        proto=bloom_mod.BucketedBloom.sized_for(2 * total),
    )
    bloom_mod.save_sidecar(path, built, set(store.historic_tags("frontier")))


def _dup_urls(spark, n: int):
    """First n URLs of the depth-3 band — guaranteed-registered dups."""
    return _urls(spark, 3, n, 0).select("url")


def _new_urls(spark, n: int, salt: str):
    return spark.range(n).select(
        F.concat(
            F.lit(f"http://h9999.example.com/{salt}/p"),
            F.col("id").cast("string"),
        ).alias("url")
    )


def _as_candidates(df):
    """LINKS-shaped candidate frame with deterministic order columns."""
    return (
        df.withColumn("type_id", F.lit(1).cast("int"))
        .withColumn("depth", F.lit(4).cast("int"))
        .withColumn(
            "parent_pos", F.abs(F.xxhash64("url") % F.lit(1_000_000)).cast("long")
        )
        .withColumn("link_idx", F.lit(0).cast("int"))
        .select("url", "type_id", "depth", "parent_pos", "link_idx")
    )


def confined_candidates(spark, dups, news, parts: list[int], cap: int):
    """Candidates whose url hashes land in ``parts`` only — collected to
    a local list FIRST so the part filtering never sits inside the
    timed register plan. Tiny by construction (<= 2*cap rows)."""
    keep = [int(p) for p in parts]

    def pick(df):
        return [
            r["url"]
            for r in (
                df.withColumn("h", F.xxhash64("url"))
                .withColumn("part", F.pmod(F.col("h"), F.lit(N_BUCKETS)))
                .filter(F.col("part").isin(keep))
                .select("url")
                .limit(cap)
                .collect()
            )
        ]

    urls = pick(dups) + pick(news)
    return _as_candidates(
        spark.createDataFrame([(u,) for u in urls], ["url"])
    ), len(urls)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="200000,1000000,5000000")
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",") if s]
    if not args.no_warmup:
        # unreported warmup size: the first register/dequeue in a
        # process pays one-time JIT + UDF-import costs that would
        # otherwise contaminate the smallest measured size
        sizes = [20_000] + sizes

    spark = get_spark(app_name="frontier-scale-probe")
    results = []
    for i, total in enumerate(sizes):
        warm = i == 0 and not args.no_warmup
        root = tempfile.mkdtemp(prefix=f"probe_{total}_")
        store = TableStore(root, spark)
        t0 = time.monotonic()
        counts = build_frontier(store, total)
        bloom_path = str(Path(root) / "_seen_sidecar")
        build_sidecar(store, bloom_path, total)
        build_s = time.monotonic() - t0
        max_seq = sum(n for _, n in _band_sizes(total)) - 1

        rec: dict = {"size": total, "build_s": round(build_s, 2),
                     "pending": dict(counts)}

        # -- dequeue: steady-state (incrementally maintained counts) --
        dq = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            batch = dequeue(store, batch_size=args.k, depth_counts=dict(counts))
            n = batch.count()
            dq.append(time.monotonic() - t0)
        assert n == min(args.k, sum(counts.values())), n
        rec["dequeue_s"] = [round(x, 3) for x in dq]

        # -- register, spread batch (touches all parts) --
        half = args.batch // 2
        spread = _as_candidates(
            _dup_urls(spark, half).unionByName(_new_urls(spark, half, "new"))
        )
        probe = bloom_mod.sidecar_probe_udf(spark, bloom_path)
        t0 = time.monotonic()
        n_new = register(store, spread, epoch=90, seen_bloom=probe,
                         max_seq=max_seq)
        rec["register_spread_s"] = round(time.monotonic() - t0, 3)
        assert n_new == half, n_new
        max_seq += n_new

        # -- register, confined batch (parts {0,1} only) --
        conf, n_conf = confined_candidates(
            spark, _dup_urls(spark, 60_000), _new_urls(spark, 60_000, "new2"),
            parts=[0, 1], cap=args.batch // 4,
        )
        probe = bloom_mod.sidecar_probe_udf(spark, bloom_path)
        t0 = time.monotonic()
        n_new2 = register(store, conf, epoch=91, seen_bloom=probe,
                          max_seq=max_seq)
        rec["register_confined_s"] = round(time.monotonic() - t0, 3)
        rec["confined_batch"] = n_conf
        assert 0 < n_new2 < n_conf, (n_new2, n_conf)

        if not warm:
            results.append(rec)
            print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()
        shutil.rmtree(root, ignore_errors=True)

    lo, hi = results[0], results[-1]
    summary = {
        "span_x": round(hi["size"] / lo["size"], 1),
        "dequeue_growth_x": round(min(hi["dequeue_s"]) / min(lo["dequeue_s"]), 2),
        "register_spread_growth_x": round(
            hi["register_spread_s"] / lo["register_spread_s"], 2
        ),
        "register_confined_growth_x": round(
            hi["register_confined_s"] / lo["register_confined_s"], 2
        ),
    }
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        Path(args.out).write_text(
            json.dumps({"results": results, "summary": summary}, indent=1)
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
