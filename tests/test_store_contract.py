"""Iceberg-parity contract for the TableStore swap-in point.

The store interface claims the operational contract of an Iceberg
catalog (store.py module docstring): snapshot-isolated reads, atomic
single-swap commits, idempotent tagged appends (exactly-once per
epoch), rewrite-based row-level MERGE/DELETE, and expire-snapshots GC.
This module encodes that contract AGAINST THE INTERFACE ONLY — the
``make_store`` factory is the single construction point — so an
Iceberg-backed implementation can be dropped in behind the same
methods and must pass this suite unchanged.

Row-level semantics covered, mapped to the reference's SQLite ops:

- status flip (``UPDATE pages SET status=2``, reference
  storage.rs:126-143)  == MERGE: the fetched append log + derived
  status view must equal a per-row UPDATE;
- page reset (``UPDATE pages SET status=1 WHERE id``, reference
  storage.rs:125-132) == row-level DELETE from the fetched log, with
  snapshot history (resume tags) preserved across the rewrite;
- TTL recrawl == DELETE WHERE epoch <= cutoff AND reason='fetched'.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crab_spark.schemas import (
    STATUS_DOWNLOADED,
    STATUS_NOT_DOWNLOADED,
)
from crab_spark.store import TableStore
from crab_spark.util import local_df

FETCHED = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("reason", T.StringType(), False),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)

KV = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), False),
    ]
)


@pytest.fixture()
def make_store(spark, tmp_path):
    """THE swap-in point: an Iceberg-backed store passes this suite by
    changing only this factory."""

    def factory(name: str = "wh") -> TableStore:
        return TableStore(tmp_path / name, spark)

    return factory


def _rows(df, *cols):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def kv(spark, pairs):
    return local_df(spark, [(int(k), v) for k, v in pairs], KV)


# -- commit / append contract -------------------------------------------------


def test_atomic_commit_and_missing_table(spark, make_store):
    store = make_store()
    assert not store.exists("t")
    with pytest.raises(FileNotFoundError):
        store.read("t")
    store.append("t", kv(spark, [(1, "a"), (2, "b")]), tag="e1")
    assert store.exists("t")
    assert _rows(store.read("t")) == [(1, "a"), (2, "b")]
    assert store.tags("t") == ["e1"]


def test_idempotent_tagged_append(spark, make_store):
    """Same tag twice = ONE logical append; a re-run of a crashed epoch
    REPLACES its own delta (exactly-once), it does not duplicate it."""
    store = make_store()
    store.append("t", kv(spark, [(1, "a")]), tag="e1")
    store.append("t", kv(spark, [(1, "a")]), tag="e1")  # crash re-run, same data
    assert _rows(store.read("t")) == [(1, "a")]
    # re-run with corrected data: the tag's delta is replaced wholesale
    store.append("t", kv(spark, [(1, "A"), (9, "z")]), tag="e1")
    assert _rows(store.read("t")) == [(1, "A"), (9, "z")]
    store.append("t", kv(spark, [(2, "b")]), tag="e2")
    assert _rows(store.read("t")) == [(1, "A"), (2, "b"), (9, "z")]
    assert store.tags("t") == ["e1", "e2"]
    # read_tag: one committed delta, not the whole table
    assert _rows(store.read_tag("t", "e2")) == [(2, "b")]
    with pytest.raises(FileNotFoundError):
        store.read_tag("t", "nope")


def test_snapshot_isolation_across_overwrite(spark, make_store):
    """A reader resolved before an overwrite keeps its snapshot (old
    data dirs survive the commit); vacuum() is the explicit
    expire-snapshots step that reclaims them."""
    store = make_store()
    store.append("t", kv(spark, [(1, "old")]), tag="e1")
    pinned = store.read("t")  # snapshot-pinned reader
    store.overwrite("t", kv(spark, [(2, "new")]), tag="rewrite")
    assert _rows(pinned) == [(1, "old")]  # unchanged view
    assert _rows(store.read("t")) == [(2, "new")]  # new snapshot
    assert store.vacuum("t") >= 1  # expire: old dirs reclaimed
    assert _rows(store.read("t")) == [(2, "new")]  # live snapshot intact


def test_compact_preserves_contents_and_history(spark, make_store):
    """compact() == rewrite_data_files: contents identical, one data
    dir after, collapsed tags stay visible to resume derivation."""
    store = make_store()
    for i in range(1, 4):
        store.append("t", kv(spark, [(i, f"v{i}")]), tag=f"done-{i:06d}")
    before = _rows(store.read("t"))
    assert store.compact("t") == 3
    assert _rows(store.read("t")) == before
    assert len(store.tags("t")) == 1  # one live snapshot
    hist = store.historic_tags("t")
    assert {"done-000001", "done-000002", "done-000003"} <= set(hist)
    assert store.compact("t") == 0  # idempotent on a compacted table


def test_partitioning_declared_before_first_write(spark, make_store):
    store = make_store()
    store.set_partitioning("t", "k")
    store.set_partitioning("t", "k")  # re-declaring the same col is a no-op
    store.append("t", kv(spark, [(1, "a"), (2, "b")]), tag="e1")
    assert store.partition_by("t") == "k"
    with pytest.raises(ValueError):
        store.set_partitioning("t", "v")  # layout change needs a rewrite
    store.append("t", kv(spark, [(3, "c")]), tag="e2")
    assert _rows(store.read("t"), "k", "v") == [(1, "a"), (2, "b"), (3, "c")]


# -- row-level MERGE / DELETE parity ------------------------------------------


def _seed_fetch_log(spark, store):
    """A 6-URL fetched log across 3 epochs + a robots-denied row."""
    rows = [
        (10, "http://h/a", 0, "fetched", 1),
        (11, "http://h/b", 0, "fetched", 1),
        (12, "http://h/c", 1, "fetched", 2),
        (13, "http://h/d", 1, "robots", 2),  # denied, NOT a download
        (14, "http://h/e", 2, "fetched", 3),
        (15, "http://h/f", 2, "fetched", 3),
    ]
    for ep in (1, 2, 3):
        store.append(
            "fetched",
            local_df(spark, [r for r in rows if r[4] == ep], FETCHED),
            tag=f"done-{ep:06d}",
        )
    return rows


def test_merge_status_flip_parity(spark, make_store):
    """The derived status view (frontier ⋉ fetched) must equal what a
    row-level ``MERGE INTO frontier USING fetched SET status=2`` would
    produce — the parquet store emulates the UPDATE crab does in place
    (storage.rs:126-143) with an append + join, and this pins the
    equivalence an Iceberg MERGE implementation must also satisfy."""
    store = make_store()
    fetch_rows = _seed_fetch_log(spark, store)
    known = local_df(
        spark,
        [(h, u) for h, u, *_ in fetch_rows] + [(16, "http://h/g"), (17, "http://h/h")],
        T.StructType(
            [
                T.StructField("url_hash", T.LongType(), False),
                T.StructField("url", T.StringType(), False),
            ]
        ),
    )
    store.append("frontier", known, tag="reg-000001")
    # engine-side derivation through the interface
    flips = store.read("fetched").filter(F.col("reason") == "fetched")
    derived = (
        store.read("frontier")
        .join(flips.select("url_hash").distinct().withColumn("_hit", F.lit(1)),
              "url_hash", "left")
        .select(
            "url_hash",
            F.when(F.col("_hit").isNotNull(), F.lit(STATUS_DOWNLOADED))
            .otherwise(F.lit(STATUS_NOT_DOWNLOADED))
            .alias("status"),
        )
    )
    # row-level oracle: apply the UPDATE per row in plain Python
    downloaded = {h for h, _, _, reason, _ in fetch_rows if reason == "fetched"}
    expected = sorted(
        (h, STATUS_DOWNLOADED if h in downloaded else STATUS_NOT_DOWNLOADED)
        for h in [r[0] for r in fetch_rows] + [16, 17]
    )
    assert _rows(derived) == expected


def test_reset_pages_is_rowlevel_delete(spark, make_store):
    """reset_pages == DELETE FROM fetched WHERE url_hash IN (...):
    exactly the named rows disappear, every other row survives
    bit-for-bit, and the collapsed done-* tags remain visible so the
    crawl's resume epoch never goes backwards across the rewrite."""
    from crab_spark.frontier import reset_pages

    store = make_store()
    rows = _seed_fetch_log(spark, store)
    hist_before = set(store.historic_tags("fetched"))
    targets = local_df(
        spark, [(11,), (14,)],
        T.StructType([T.StructField("url_hash", T.LongType(), False)]),
    )
    reset_pages(store, targets)
    survivors = _rows(store.read("fetched"))
    assert survivors == sorted(r for r in rows if r[0] not in (11, 14))
    assert hist_before <= set(store.historic_tags("fetched"))


def test_ttl_recrawl_is_predicate_delete(spark, make_store):
    """recrawl_older_than == DELETE WHERE epoch <= max-age cutoff AND
    reason='fetched' — stale downloads are re-queued, the robots-denied
    row is NOT revived (a disallow is not staleness)."""
    from crab_spark.maintenance import recrawl_older_than

    store = make_store()
    rows = _seed_fetch_log(spark, store)
    # max epoch = 3, max_age = 1 → delete fetched rows with epoch <= 2
    assert recrawl_older_than(store, max_age_epochs=1) == 3
    survivors = _rows(store.read("fetched"))
    assert survivors == sorted(
        r for r in rows if not (r[4] <= 2 and r[3] == "fetched")
    )
    # history preserved across the rewrite
    assert {"done-000001", "done-000002", "done-000003"} <= set(
        store.historic_tags("fetched")
    )
    # idempotent: nothing left older than the cutoff
    assert recrawl_older_than(store, max_age_epochs=1) == 0
