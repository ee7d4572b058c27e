"""Epoch-versioned parquet table store — the Iceberg swap-in point.

The production design per BASELINE.json north_rule keeps frontier /
documents / metrics as **Iceberg tables** (snapshot isolation, row-level
MERGE, schema evolution). This sandbox ships no Iceberg runtime jar, so
this module provides the same operational contract over plain parquet:

- **snapshot reads**: every read resolves through a manifest JSON that
  lists immutable data directories; writers never mutate a directory a
  reader can see (same shape as an Iceberg snapshot's manifest list).
- **atomic commits**: a new manifest is written to a temp file and
  ``os.replace``d — readers see the old or the new table, never a blend.
- **idempotent tagged appends**: an append carries a tag (we use the
  epoch number). Re-running a crashed epoch overwrites its own directory
  and re-commits the same manifest entry — exactly-once per epoch without
  a transaction log.

Crucially the *engine* avoids needing row-level UPDATE at all (the one
thing parquet can't do): where crab flips ``pages.status`` in place
(storage.rs:126-143), we keep **append-only logs + derived views** —
``frontier`` (registrations) and ``fetched`` (download completions);
``status`` is derived by anti/semi join. On Iceberg you could keep the
same layout or collapse to MERGE; the interface stays identical.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, root: str | Path, spark: SparkSession):
        self.root = Path(root)
        self.spark = spark
        (self.root / "_manifests").mkdir(parents=True, exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------

    def _manifest_path(self, name: str) -> Path:
        return self.root / "_manifests" / f"{name}.json"

    def _read_manifest(self, name: str) -> dict:
        p = self._manifest_path(name)
        if not p.exists():
            return {"version": 0, "dirs": []}
        return json.loads(p.read_text())

    def _commit(self, name: str, dirs: list[str],
                record_collapsed: bool = True) -> None:
        m = self._read_manifest(name)
        # Tags of dirs a rewrite (compact / overwrite) drops are kept in
        # ``collapsed_tags``: resume logic derives the last completed
        # epoch from done-* tags, and a compaction or fetched-log rewrite
        # must never make that history go backwards (the Iceberg
        # analogue: snapshot metadata survives rewrite_data_files).
        # Tables with no resume value (keep_history=False overwrites)
        # skip the record so the list stays bounded.
        collapsed = m.get("collapsed_tags", [])
        if record_collapsed:
            dropped = [d for d in m["dirs"] if d not in dirs]
            collapsed = collapsed + [d[len("snap-"):] for d in dropped]
        manifest = {"version": m["version"] + 1, "dirs": dirs}
        if m.get("partition_by") is not None:
            manifest["partition_by"] = m["partition_by"]
        if collapsed:
            manifest["collapsed_tags"] = collapsed
        tmp = self._manifest_path(name).with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(json.dumps(manifest))
        os.replace(tmp, self._manifest_path(name))

    # -- table ops -----------------------------------------------------------

    def exists(self, name: str) -> bool:
        return bool(self._read_manifest(name)["dirs"])

    def tags(self, name: str) -> list[str]:
        """Committed append tags, in commit order (e.g. ['reg-000001',
        'reg-000002']). The crawl derives its resume epoch from these —
        the manifest commit IS the checkpoint."""
        return [d[len("snap-"):] for d in self._read_manifest(name)["dirs"]]

    def historic_tags(self, name: str) -> list[str]:
        """Live tags PLUS tags collapsed away by compact()/overwrite().
        Resume derivation must use this view: rewriting the fetched log
        (compaction, reset) replaces the done-* dirs, but the epochs
        they marked complete stay complete."""
        m = self._read_manifest(name)
        return m.get("collapsed_tags", []) + [d[len("snap-"):] for d in m["dirs"]]

    def read_tag(self, name: str, tag: str) -> DataFrame:
        """Read ONE committed append delta (e.g. a single epoch's
        registrations) without scanning the whole table."""
        if tag not in self.tags(name):
            raise FileNotFoundError(f"table {name!r} has no committed tag {tag!r}")
        return self.spark.read.parquet(str(self.root / name / f"snap-{tag}"))

    def partition_by(self, name: str) -> str | None:
        """The table's physical partition column (Hive-style layout), or
        None for flat tables. Set by the first partitioned write; all
        later writes must agree."""
        return self._read_manifest(name).get("partition_by")

    def read(self, name: str) -> DataFrame:
        dirs = self._read_manifest(name)["dirs"]
        if not dirs:
            raise FileNotFoundError(f"table {name!r} has no committed data")
        paths = [str(self.root / name / d) for d in dirs]
        if self.partition_by(name) is None:
            return self.spark.read.parquet(*paths)
        # Partitioned layout: each delta dir is its own partition-
        # discovery root (Spark refuses multiple roots with key=value
        # subdirs in one call — "conflicting directory structures").
        # The per-dir scans union; a filter on the partition column
        # reaches EVERY scan as a PartitionFilter, so file pruning works
        # across the whole history (asserted in test_frontier).
        out = self.spark.read.parquet(paths[0])
        for p in paths[1:]:
            out = out.unionByName(self.spark.read.parquet(p))
        return out

    def overwrite(self, name: str, df: DataFrame, tag: str = "base",
                  keep_history: bool = False,
                  vacuum_now: bool = False) -> None:
        """Replace the table's contents. The tag is suffixed with the
        current manifest version so the target directory is ALWAYS
        fresh: ``df`` is lazy and typically reads the table being
        overwritten, so writing into (or rmtree-ing) a committed
        directory would destroy the write's own input.

        ``keep_history=True`` (for tables whose dropped tags feed
        resume, e.g. the fetched log's done-* history) records the
        replaced tags in collapsed_tags. Old data dirs are left on disk
        either way by default — a concurrent reader (another session, a
        streaming job) pinned to the prior snapshot keeps its files,
        same as compact(); reclaim them with an offline vacuum().
        ``vacuum_now=True`` opts into immediate deletion of the
        replaced dirs — ONLY for single-writer/single-reader tables
        whose every read strictly follows the commit (the crawl loop's
        rescore delta): the write fully materializes ``df`` before the
        commit, so eager deletion is safe for this writer but not for
        snapshot-pinned readers."""
        version = self._read_manifest(name)["version"]
        d = self._write_dir(name, df, f"{tag}-{version:06d}")
        self._commit(name, [d], record_collapsed=keep_history)
        if vacuum_now and not keep_history:
            self.vacuum(name)

    def append(self, name: str, df: DataFrame, tag: str) -> None:
        """Idempotent tagged append: same tag twice = one logical append."""
        d = self._write_dir(name, df, tag)
        dirs = self._read_manifest(name)["dirs"]
        if d not in dirs:
            dirs = dirs + [d]
        self._commit(name, dirs)

    _PA_TYPES = {
        "integer": "int32", "long": "int64", "double": "float64",
        "float": "float32", "string": "string", "boolean": "bool",
    }

    def append_rows(self, name: str, rows: list[tuple], schema,
                    tag: str) -> None:
        """Driver-side append of a TINY driver-held row set (per-epoch
        metrics lineage: O(partitions) rows of plain ints). Writes one
        parquet file with pyarrow and commits the manifest — the
        Spark-job path (local_df → coalesce(1) → write) costs a full
        job submission + task round-trip per epoch for rows that are
        already ON the driver. Same on-disk contract as append():
        idempotent tagged dir, zstd parquet, manifest commit last.
        Flat tables only (the caller's bookkeeping tables)."""
        if self.partition_by(name) is not None:
            raise ValueError(f"append_rows: table {name!r} is partitioned")
        import pyarrow as pa
        import pyarrow.parquet as pq

        pa_schema = pa.schema(
            [
                (f.name, getattr(pa, self._PA_TYPES[f.dataType.typeName()])())
                for f in schema.fields
            ]
        )
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=field.type)
             for c, field in zip(cols, pa_schema)],
            schema=pa_schema,
        )
        dirname = f"snap-{tag}"
        target = self.root / name / dirname
        if target.exists():  # crashed previous attempt: replace wholesale
            shutil.rmtree(target)
        target.mkdir(parents=True)
        pq.write_table(table, target / "part-00000.parquet",
                       compression="zstd")
        # parquet dir markers Spark writes too, for reader parity
        (target / "_SUCCESS").touch()
        dirs = self._read_manifest(name)["dirs"]
        if dirname not in dirs:
            dirs = dirs + [dirname]
        self._commit(name, dirs)

    def set_partitioning(self, name: str, col: str) -> None:
        """Declare a table's Hive-style partition column BEFORE the
        first write (Iceberg: PARTITIONED BY in the DDL). Every
        subsequent append/overwrite/compact lays its data out as
        ``snap-<tag>/<col>=<v>/`` so partition-column filters prune at
        the FILE level in every reader."""
        m = self._read_manifest(name)
        cur = m.get("partition_by")
        if cur == col:
            return
        if m["dirs"]:
            raise ValueError(
                f"table {name!r} already has data partitioned by {cur!r}; "
                "cannot change layout in place (rewrite via compact)"
            )
        m["partition_by"] = col
        tmp = self._manifest_path(name).with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(json.dumps(m))
        os.replace(tmp, self._manifest_path(name))

    def _write_dir(self, name: str, df: DataFrame, tag: str) -> str:
        dirname = f"snap-{tag}"
        target = self.root / name / dirname
        if target.exists():
            # crashed previous attempt with this tag — replace wholesale
            shutil.rmtree(target)
        writer = df.write.mode("overwrite")
        pcol = self.partition_by(name)
        if pcol is not None:
            writer = writer.partitionBy(pcol)
        writer.parquet(str(target))
        return dirname

    def compact(self, name: str, n_files: int | None = None,
                sort_within: list[str] | None = None) -> int:
        """Rewrite a table's accumulated per-epoch append dirs into ONE
        directory (the Iceberg rewrite_data_files analogue): long crawls
        drip hundreds of tagged deltas and every subsequent scan pays
        the file-listing + tiny-file cost. Snapshot semantics hold — the
        rewrite lands in a fresh dir and one manifest swap publishes it;
        readers see the old or the new table, never a blend. Returns the
        number of dirs compacted away.

        ``sort_within``: physically sort the rewrite by these columns
        (within each output partition, after the partition column).
        Readers that prune by a column's parquet row-group MIN/MAX
        stats (the dequeue's depth/priority cutoff) rely on values
        correlating with file order; append deltas have that correlation
        naturally (one epoch ≈ one depth), a compaction rewrite only
        keeps it if told to sort — Iceberg's rewrite_data_files
        sort-order analogue."""
        dirs = self._read_manifest(name)["dirs"]
        if len(dirs) <= 1:
            return 0
        df = self.read(name)
        if n_files:
            df = df.coalesce(n_files)
        if sort_within:
            pcol = self.partition_by(name)
            cols = ([pcol] if pcol else []) + list(sort_within)
            df = df.sortWithinPartitions(*cols)
        version = self._read_manifest(name)["version"]
        d = self._write_dir(name, df, f"compact-{version:06d}")
        self._commit(name, [d])
        # old dirs stay on disk until a vacuum — readers mid-scan keep
        # working off the previous snapshot (same as Iceberg's expire)
        return len(dirs)

    def vacuum(self, name: str) -> int:
        """Delete data directories the manifest no longer references —
        the Iceberg expire-snapshots analogue for dirs left behind by
        compact()/overwrite() (which keep old dirs so in-flight readers
        finish on their snapshot). Run it as offline maintenance, not
        concurrently with long-lived readers pinned to an old snapshot.
        Also sweeps failed-write temp dirs. Returns dirs removed."""
        base = self.root / name
        if not base.exists():
            return 0
        live = set(self._read_manifest(name)["dirs"])
        n = 0
        for child in base.iterdir():
            if child.is_dir() and child.name not in live:
                shutil.rmtree(child)
                n += 1
        return n

    # -- checkpoint state (the epoch counter) ---------------------------------

    def read_state(self, key: str, default: dict | None = None) -> dict:
        p = self.root / "_manifests" / f"state-{key}.json"
        if not p.exists():
            return default if default is not None else {}
        return json.loads(p.read_text())

    def write_state(self, key: str, state: dict) -> None:
        p = self.root / "_manifests" / f"state-{key}.json"
        tmp = p.with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(json.dumps(state))
        os.replace(tmp, p)
