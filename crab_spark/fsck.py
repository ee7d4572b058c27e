"""Read-only workspace consistency checker (``crab_spark fsck``).

A 10^10-URL crawl is only as resumable as its store is sound. The
crash-resume contract (crawler._resume_epoch), the pending derivation
(pending = frontier ∖ fetched), the partition-pruned seen-set probe
(frontier.seen_slice) and the sidecar's no-false-negative guarantee
each lean on invariants that disk loss, a mis-run external tool, or an
operator mistake can break *silently* — the crawl would keep running
and quietly re-register seen URLs or skip committed work. The
reference's ``validate`` sweep checks page CONTENT against parsers
(main.rs:243-268); fsck is the missing companion that checks the STORE
itself, mirroring what ``iceberg.validate``/``fsck`` does for a real
lakehouse table.

Checks, grouped by layer (every row-level count is ONE distributed
aggregate per table — conditional sums and countDistinct, map-side
combinable; fsck never collects row-scale data and never mutates
anything, so it is safe to run against a live workspace snapshot):

manifest / filesystem
  - every committed data dir exists and holds parquet output
  - partition layout on disk matches the manifest's partition_by
  - orphan dirs (awaiting vacuum) and stray commit temp files → info

epoch / commit order (manifest-only)
  - writes commit docs → reg → done (crawler.py:462-467), so at most
    ONE epoch past the resume horizon may have dangling docs-/reg-
    deltas (the crash window); anything further is corruption
  - the human-readable state mirror lagging the done-log → warn

row level
  - frontier: url and seq unique; url_hash == xxhash64(url); part ==
    pmod(url_hash, N_BUCKETS) (a wrong part hides the row from the
    partition-pruned seen_slice ⇒ re-registration); status/depth domains
  - fetched: (url_hash, url) unique; reason domain; epoch ≤ resume
    horizon; every completion row has a frontier registration
  - documents: every doc_id is a registered URL; fetched_epoch inside
    the horizon (a reset page legitimately keeps its old documents rows
    with no fetched row, so content-without-completion is NOT flagged)

seen-set sidecar
  - meta.json readable; covered tags known to the manifest history
  - every part file the filter claims exists (a missing bucketed-bloom
    part reads back as all-zero bits ⇒ silent false negatives)
  - deep probe: every frontier key the sidecar claims to cover answers
    'maybe' (runs through sidecar_probe_udf — per-part files, nothing
    filter-sized ever leaves the executors)
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import functions as F

from .schemas import N_BUCKETS
from .store import TableStore

SIDECAR_DIR = "bloom-frontier.d"  # crawler.py keeps the seen-set filter here


@dataclass
class Finding:
    level: str  # error | warn | info
    check: str
    detail: str
    n: int = 0

    def line(self) -> str:
        return f"{self.level.upper():5s} {self.check}: {self.detail}"


def _epoch_tags(tags: list[str], prefix: str) -> list[int]:
    out = []
    for t in tags:
        if t.startswith(prefix):
            try:
                out.append(int(t[len(prefix):]))
            except ValueError:
                pass
    return out


def _check_manifests(store: TableStore, findings: list[Finding]) -> set[str]:
    """Filesystem layer. Returns table names whose committed dirs are
    broken — row-level checks skip those (the read would just throw)."""
    broken: set[str] = set()
    mdir = store.root / "_manifests"
    for tmp in sorted(mdir.glob("*.tmp-*")):
        findings.append(Finding(
            "info", "manifest_tmp",
            f"stray commit temp file {tmp.name} (crashed commit; harmless)"))
    for mpath in sorted(mdir.glob("*.json")):
        if mpath.name.startswith("state-"):
            continue
        name = mpath.stem
        try:
            m = json.loads(mpath.read_text())
        except (json.JSONDecodeError, OSError) as e:
            findings.append(Finding(
                "error", "manifest_unreadable", f"{name}: {e}"))
            broken.add(name)
            continue
        base = store.root / name
        pcol = m.get("partition_by")
        live = list(m.get("dirs", []))
        for d in live:
            target = base / d
            if not target.is_dir():
                findings.append(Finding(
                    "error", "missing_data_dir",
                    f"{name}: committed dir {d} is gone — table unreadable, "
                    f"resume history may be lost"))
                broken.add(name)
                continue
            has_parquet = any(target.rglob("*.parquet"))
            if not has_parquet and not (target / "_SUCCESS").exists():
                findings.append(Finding(
                    "error", "empty_data_dir",
                    f"{name}/{d}: no parquet output and no _SUCCESS marker "
                    f"(torn write published?)"))
                broken.add(name)
                continue
            if pcol and has_parquet:
                top_parquet = any(target.glob("*.parquet"))
                top_parts = any(
                    c.is_dir() and c.name.startswith(f"{pcol}=")
                    for c in target.iterdir())
                if top_parquet or not top_parts:
                    findings.append(Finding(
                        "error", "partition_layout",
                        f"{name}/{d}: manifest says partition_by={pcol!r} but "
                        f"the dir is not laid out as {pcol}=… subdirs — "
                        f"partition-pruned readers will miss or mis-key rows"))
                    broken.add(name)
        if base.is_dir():
            liveset = set(live)
            orphans = [c.name for c in base.iterdir()
                       if c.is_dir() and c.name not in liveset]
            if orphans:
                findings.append(Finding(
                    "info", "orphan_dirs",
                    f"{name}: {len(orphans)} unreferenced dir(s) awaiting "
                    f"vacuum (e.g. {sorted(orphans)[0]})", n=len(orphans)))
    return broken


def _resume_horizon(store: TableStore) -> tuple[int, int, int]:
    """(horizon, last_done, state_epoch) — the resume derivation,
    shared with crawler._resume_epoch / frontier.last_done_epoch."""
    from .frontier import last_done_epoch

    state_epoch = int(store.read_state("crawl", {"epoch": 0})["epoch"])
    done = last_done_epoch(store)
    return max(state_epoch, done), done, state_epoch


def _check_epochs(store: TableStore, findings: list[Finding]) -> int:
    horizon, last_done, state_epoch = _resume_horizon(store)
    if state_epoch < last_done:
        findings.append(Finding(
            "warn", "state_mirror_stale",
            f"state file says epoch {state_epoch} but the fetched log has "
            f"done-{last_done:06d} — resume is unaffected (it takes the "
            f"max) but the observability mirror is behind"))
    for table, prefix in (("frontier", "reg-"), ("documents", "docs-")):
        if not store.exists(table):
            continue
        for e in _epoch_tags(store.historic_tags(table), prefix):
            if e > horizon + 1:
                findings.append(Finding(
                    "error", "dangling_epoch",
                    f"{table}: {prefix}{e:06d} is {e - horizon} epochs past "
                    f"the resume horizon {horizon} — the commit order "
                    f"(docs → reg → done) allows at most one"))
            elif e == horizon + 1:
                findings.append(Finding(
                    "info", "crash_window_delta",
                    f"{table}: {prefix}{e:06d} has no matching done tag — "
                    f"normal crash window; the next crawl replays epoch {e}"))
    return horizon


def _check_frontier_rows(store: TableStore, findings: list[Finding]) -> None:
    fr = store.read("frontier")
    row = fr.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("url").alias("n_url"),
        F.countDistinct("seq").alias("n_seq"),
        F.sum(F.when(F.xxhash64("url") != F.col("url_hash"), 1)
              .otherwise(0)).alias("bad_hash"),
        F.sum(F.when(F.pmod(F.col("url_hash"), F.lit(N_BUCKETS)).cast("int")
                     != F.col("part"), 1).otherwise(0)).alias("bad_part"),
        F.sum(F.when(~F.col("status").isin(1, 2), 1)
              .otherwise(0)).alias("bad_status"),
        F.sum(F.when(F.col("depth") < 0, 1).otherwise(0)).alias("bad_depth"),
    ).collect()[0]
    if row["n_url"] < row["n"]:
        findings.append(Finding(
            "error", "frontier_dup_url",
            f"{row['n'] - row['n_url']} duplicate URL registration(s) — the "
            f"register anti-join invariant is broken", n=row["n"] - row["n_url"]))
    if row["n_seq"] < row["n"]:
        findings.append(Finding(
            "error", "frontier_dup_seq",
            f"{row['n'] - row['n_seq']} duplicate seq value(s) — dequeue "
            f"order is no longer deterministic", n=row["n"] - row["n_seq"]))
    if row["bad_hash"]:
        findings.append(Finding(
            "error", "frontier_bad_hash",
            f"{row['bad_hash']} row(s) where url_hash != xxhash64(url) — "
            f"membership joins will miss them", n=row["bad_hash"]))
    if row["bad_part"]:
        findings.append(Finding(
            "error", "frontier_bad_part",
            f"{row['bad_part']} row(s) where part != pmod(url_hash, "
            f"{N_BUCKETS}) — invisible to the partition-pruned seen_slice, "
            f"so they can be silently re-registered", n=row["bad_part"]))
    if row["bad_status"]:
        findings.append(Finding(
            "error", "frontier_bad_status",
            f"{row['bad_status']} row(s) outside status ∈ {{1,2}}",
            n=row["bad_status"]))
    if row["bad_depth"]:
        findings.append(Finding(
            "error", "frontier_bad_depth",
            f"{row['bad_depth']} row(s) with negative depth", n=row["bad_depth"]))


def _check_fetched_rows(store: TableStore, horizon: int,
                        findings: list[Finding],
                        frontier_ok: bool) -> None:
    fe = store.read("fetched")
    row = fe.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("url_hash", "url").alias("n_key"),
        F.sum(F.when(~F.col("reason").isin("fetched", "robots"), 1)
              .otherwise(0)).alias("bad_reason"),
        # the fetched append IS the done commit point (crawler.py
        # commit order), so epoch > horizon is already impossible —
        # no +1 crash window here, unlike the docs/reg delta checks
        # (ADVICE r5: the check was under-sensitive by one epoch)
        F.sum(F.when(F.col("epoch") > horizon, 1)
              .otherwise(0)).alias("bad_epoch"),
    ).collect()[0]
    if row["n_key"] < row["n"]:
        findings.append(Finding(
            "error", "fetched_dup",
            f"{row['n'] - row['n_key']} duplicate completion row(s) — "
            f"reset/recrawl rewrites should have collapsed these",
            n=row["n"] - row["n_key"]))
    if row["bad_reason"]:
        findings.append(Finding(
            "error", "fetched_bad_reason",
            f"{row['bad_reason']} row(s) outside reason ∈ "
            f"{{fetched, robots}}", n=row["bad_reason"]))
    if row["bad_epoch"]:
        findings.append(Finding(
            "error", "fetched_bad_epoch",
            f"{row['bad_epoch']} row(s) claim an epoch past the resume "
            f"horizon {horizon} — their done tag never committed",
            n=row["bad_epoch"]))
    if frontier_ok:  # membership needs a readable frontier; the
        # self-contained checks above run regardless
        n_orphan = (
            fe.select("url_hash", "url")
            .join(store.read("frontier").select("url_hash", "url"),
                  ["url_hash", "url"], "left_anti")
            .count())
        if n_orphan:
            findings.append(Finding(
                "error", "fetched_orphan",
                f"{n_orphan} completion row(s) for URLs the frontier never "
                f"registered", n=n_orphan))


def _check_documents_rows(store: TableStore, horizon: int,
                          findings: list[Finding],
                          frontier_ok: bool) -> None:
    docs = store.read("documents")
    bad_epoch = docs.filter(F.col("fetched_epoch") > horizon + 1).count()
    if bad_epoch:
        findings.append(Finding(
            "error", "documents_bad_epoch",
            f"{bad_epoch} document(s) claim a fetch epoch past the resume "
            f"horizon {horizon}", n=bad_epoch))
    if frontier_ok:
        n_orphan = (
            docs.select("doc_id").distinct()
            .join(store.read("frontier").select(F.col("url").alias("doc_id")),
                  "doc_id", "left_anti")
            .count())
        if n_orphan:
            findings.append(Finding(
                "error", "documents_orphan",
                f"{n_orphan} document(s) whose doc_id was never registered "
                f"in the frontier", n=n_orphan))


def _check_sidecar(store: TableStore, findings: list[Finding]) -> None:
    from . import bloom as bloom_mod

    d = store.root / "_manifests" / SIDECAR_DIR
    if not d.is_dir():
        return  # crawl ran with use_bloom=False, or fresh workspace
    meta = bloom_mod._read_meta(d)
    if meta is None:
        findings.append(Finding(
            "warn", "sidecar_unreadable",
            f"{SIDECAR_DIR}/meta.json missing or corrupt — next crawl "
            f"cold-rebuilds the seen-set filter from the frontier"))
        return
    covered = set(meta.get("covered", []))
    historic = set(store.historic_tags("frontier")) if store.exists("frontier") else set()
    unknown = covered - historic
    if unknown:
        findings.append(Finding(
            "info", "sidecar_unknown_tags",
            f"sidecar covers {len(unknown)} tag(s) the frontier manifest "
            f"history does not know (e.g. {sorted(unknown)[0]}) — extra "
            f"'maybe' probes only, never a false negative", n=len(unknown)))
    # part_versions records exactly the part files save_sidecar wrote
    # (absent bucketed parts are legitimately all-zero, so filename
    # enumeration can't be keyed on n_buckets); legacy cuckoo metas
    # carry the same assertion in "parts"
    pv = meta.get("part_versions")
    if pv is not None:
        expected = ["part-flat.bin" if p == "flat" else f"part-{int(p)}.bin"
                    for p in pv]
    elif meta.get("kind") == "cuckoo":
        expected = [f"part-{int(p)}.bin" for p in meta.get("parts", [])]
    else:
        expected = []
    missing = [f for f in expected if not (d / f).exists()]
    if missing:
        findings.append(Finding(
            "error", "sidecar_missing_part",
            f"{len(missing)} part file(s) missing (e.g. {missing[0]}) — a "
            f"missing part probes as all-absent: silent false negatives, "
            f"seen URLs would re-register", n=len(missing)))
        return  # the probe sweep below would re-report the same loss
    # deep probe: every key in the sidecar's covered slice of the
    # frontier must answer 'maybe'. Mirrors the crawl's own resume
    # derivation (crawler.py:538-556): the uncovered gap must be live
    # reg-* deltas we can subtract; otherwise the next crawl
    # cold-rebuilds anyway and a probe sweep proves nothing.
    if not store.exists("frontier"):
        return
    committed = set(store.tags("frontier"))
    gap = committed - covered
    if not all(t.startswith("reg-") for t in gap):
        findings.append(Finding(
            "info", "sidecar_stale",
            f"sidecar lags a compaction/rewrite ({len(gap)} non-delta "
            f"tag(s) uncovered) — next crawl cold-rebuilds it", n=len(gap)))
        return
    probe = bloom_mod.sidecar_probe_udf(store.spark, d)
    if probe is None:
        return
    covered_df = store.read("frontier").select("url_hash", "url")
    for t in sorted(gap):
        covered_df = covered_df.join(
            store.read_tag("frontier", t).select("url_hash", "url"),
            ["url_hash", "url"], "left_anti")
    n_neg = covered_df.filter(~probe(F.col("url_hash"))).count()
    if n_neg:
        findings.append(Finding(
            "error", "sidecar_false_negative",
            f"{n_neg} registered URL(s) probe as unseen in the sidecar — "
            f"the crawl would re-register them; delete {SIDECAR_DIR} to "
            f"force a cold rebuild", n=n_neg))


def fsck(store: TableStore, sidecar: bool = True) -> list[Finding]:
    """Run every check; returns findings (empty = clean). Read-only."""
    findings: list[Finding] = []
    broken = _check_manifests(store, findings)
    horizon = _check_epochs(store, findings)
    frontier_ok = store.exists("frontier") and "frontier" not in broken
    if frontier_ok:
        _check_frontier_rows(store, findings)
    if store.exists("fetched") and "fetched" not in broken:
        _check_fetched_rows(store, horizon, findings, frontier_ok)
    if store.exists("documents") and "documents" not in broken:
        _check_documents_rows(store, horizon, findings, frontier_ok)
    if sidecar and frontier_ok:
        _check_sidecar(store, findings)
    return findings
