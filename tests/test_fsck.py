"""Store consistency checker: a clean crawled workspace passes, and
each planted corruption is caught by exactly the check that guards the
invariant it breaks. Corruptions are planted in a COPY of a shared
crawled workspace so every test sees the same healthy baseline."""

from __future__ import annotations

import json
import shutil

import pytest
from pyspark.sql import functions as F

from crab_spark import corpus as C
from crab_spark.cli import main
from crab_spark.fsck import SIDECAR_DIR, fsck
from crab_spark.schemas import N_BUCKETS
from crab_spark.store import TableStore

LISTING_PARSER = """
from crab_spark.parsers.listing import TYPE_ID, SPAN_KINDS, navigate, validate  # noqa
"""
DATA_PARSER = """
from crab_spark.parsers.data import TYPE_ID, parse  # noqa
"""


@pytest.fixture(scope="module")
def workspace(spark, tmp_path_factory):
    ws = tmp_path_factory.mktemp("fsckws")
    assert main(["new", str(ws)]) == 0
    C.corpus_df(spark, 4).write.parquet(str(ws / "corpus.parquet"))
    cfg = json.loads((ws / "crab_spark.json").read_text())
    cfg["crawler"]["corpus_parquet"] = "corpus.parquet"
    cfg["crawler"]["batch_size"] = 10
    (ws / "crab_spark.json").write_text(json.dumps(cfg))
    (ws / "parser_example.py").unlink()
    (ws / "parser_listing.py").write_text(LISTING_PARSER)
    (ws / "parser_data.py").write_text(DATA_PARSER)
    assert main(["--workdir", str(ws), "register", C.page_url(1), "1"]) == 0
    # --bloom-min-frontier 0: force the seen-set sidecar on (the
    # scale-adaptive default keeps it off for tiny frontiers) so the
    # fsck sidecar checks have a sidecar to audit
    assert main(["--workdir", str(ws), "run-crawler", "--navigate",
                 "--bloom-min-frontier", "0"]) == 0
    return ws


def _copy(workspace, tmp_path):
    dst = tmp_path / "ws"
    shutil.copytree(workspace, dst)
    return dst


def _store(spark, ws) -> TableStore:
    cfg = json.loads((ws / "crab_spark.json").read_text())
    return TableStore(ws / cfg["database"], spark)


def _errors(findings):
    return [f for f in findings if f.level == "error"]


def _checks(findings, level=None):
    return {f.check for f in findings if level is None or f.level == level}


# -- clean baseline ----------------------------------------------------------

def test_clean_workspace_passes(spark, workspace, tmp_path, capsys):
    ws = _copy(workspace, tmp_path)
    findings = fsck(_store(spark, ws))
    assert _errors(findings) == []
    assert _checks(findings, "warn") == set()
    # CLI surface: exit 0 + the clean line
    assert main(["--workdir", str(ws), "fsck"]) == 0
    assert "fsck: clean" in capsys.readouterr().out


# -- manifest / filesystem layer ----------------------------------------------

def test_missing_committed_dir_is_error(spark, workspace, tmp_path, capsys):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    tag = store.tags("frontier")[0]
    shutil.rmtree(store.root / "frontier" / f"snap-{tag}")
    findings = fsck(store)
    assert "missing_data_dir" in _checks(findings, "error")
    assert main(["--workdir", str(ws), "fsck"]) == 1
    assert "missing_data_dir" in capsys.readouterr().out


def test_orphan_dir_is_info_only(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    (store.root / "frontier" / "snap-abandoned").mkdir()
    findings = fsck(store)
    assert _errors(findings) == []
    assert "orphan_dirs" in _checks(findings, "info")


# -- epoch / commit-order layer -----------------------------------------------

def test_stale_state_mirror_is_warning(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    store.write_state("crawl", {"epoch": 0})
    findings = fsck(store)
    assert _errors(findings) == []
    assert "state_mirror_stale" in _checks(findings, "warn")


def test_dangling_epoch_far_past_horizon_is_error(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    one_doc = store.read("documents").limit(1)
    store.append("documents", one_doc, tag="docs-000099")
    findings = fsck(store)
    assert "dangling_epoch" in _checks(findings, "error")


def test_crash_window_delta_is_info(spark, workspace, tmp_path):
    # a reg delta exactly one epoch past the horizon = normal crash window
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    from crab_spark.frontier import last_done_epoch

    horizon = max(last_done_epoch(store),
                  int(store.read_state("crawl", {"epoch": 0})["epoch"]))
    crafted = store.read("frontier").orderBy("seq").limit(1).select(
        F.xxhash64(F.lit("https://crash.test/x")).alias("url_hash"),
        F.lit("https://crash.test/x").alias("url"),
        F.lit("crash.test").alias("host"),
        "type_id", "depth", "status",
        (F.lit(100000)).cast("long").alias("seq"),
        "priority", "epoch_discovered",
        F.pmod(F.xxhash64(F.lit("https://crash.test/x")), F.lit(N_BUCKETS))
        .cast("int").alias("part"),
    )
    store.append("frontier", crafted, tag=f"reg-{horizon + 1:06d}")
    findings = fsck(store)
    assert "crash_window_delta" in _checks(findings, "info")
    assert "dangling_epoch" not in _checks(findings)


# -- frontier row invariants ---------------------------------------------------

def test_duplicate_registration_is_error(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    store.append("frontier", store.read("frontier").orderBy("seq").limit(1),
                 tag="fsck-dup")
    checks = _checks(fsck(store), "error")
    assert "frontier_dup_url" in checks and "frontier_dup_seq" in checks


def test_wrong_part_is_error(spark, workspace, tmp_path):
    url = "https://badpart.test/x"
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    crafted = store.read("frontier").orderBy("seq").limit(1).select(
        F.xxhash64(F.lit(url)).alias("url_hash"),
        F.lit(url).alias("url"),
        F.lit("badpart.test").alias("host"),
        "type_id", "depth", "status",
        F.lit(100001).cast("long").alias("seq"),
        "priority", "epoch_discovered",
        ((F.pmod(F.xxhash64(F.lit(url)), F.lit(N_BUCKETS)) + 1) % N_BUCKETS)
        .cast("int").alias("part"),
    )
    store.append("frontier", crafted, tag="fsck-badpart")
    findings = fsck(store)
    assert "frontier_bad_part" in _checks(findings, "error")
    assert next(f for f in findings if f.check == "frontier_bad_part").n == 1


def test_wrong_hash_is_error(spark, workspace, tmp_path):
    url = "https://badhash.test/x"
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    crafted = store.read("frontier").orderBy("seq").limit(1).select(
        F.lit(12345).cast("long").alias("url_hash"),
        F.lit(url).alias("url"),
        F.lit("badhash.test").alias("host"),
        "type_id", "depth", "status",
        F.lit(100002).cast("long").alias("seq"),
        "priority", "epoch_discovered",
        F.pmod(F.lit(12345), F.lit(N_BUCKETS)).cast("int").alias("part"),
    )
    store.append("frontier", crafted, tag="fsck-badhash")
    assert "frontier_bad_hash" in _checks(fsck(store), "error")


# -- fetched / documents row invariants ----------------------------------------

def test_fetched_orphan_is_error(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    crafted = store.read("fetched").limit(1).select(
        F.xxhash64(F.lit("https://ghost.test/x")).alias("url_hash"),
        F.lit("https://ghost.test/x").alias("url"),
        "depth", "reason", F.lit(1).cast("int").alias("epoch"),
    )
    store.append("fetched", crafted, tag="fsck-ghost")
    assert "fetched_orphan" in _checks(fsck(store), "error")


def test_fetched_duplicate_is_error(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    store.append("fetched", store.read("fetched").limit(1), tag="fsck-dup2")
    assert "fetched_dup" in _checks(fsck(store), "error")


def test_fetched_epoch_past_horizon_is_error(spark, workspace, tmp_path):
    """The fetched append IS the done commit point, so a fetched row
    claiming horizon+1 is impossible under the commit order and must
    flag (ADVICE r5: the check allowed a one-epoch blind spot)."""
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    horizon = max(
        int(t.split("-", 1)[1]) for t in store.historic_tags("fetched")
        if t.startswith("done-")
    )
    crafted = store.read("fetched").limit(1).select(
        "url_hash", "url", "depth", "reason",
        F.lit(horizon + 1).cast("int").alias("epoch"),
    )
    store.append("fetched", crafted, tag="fsck-future")
    findings = fsck(store)
    assert "fetched_bad_epoch" in _checks(findings, "error")


def test_documents_orphan_is_error(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    crafted = store.read("documents").limit(1).select(
        F.lit("https://nobody.test/x").alias("doc_id"),
        "spans", "fetched_epoch")
    store.append("documents", crafted, tag="fsck-nobody")
    assert "documents_orphan" in _checks(fsck(store), "error")


def test_reset_page_keeps_fsck_clean(spark, workspace, tmp_path):
    # a reset page has documents rows but no fetched row — that is the
    # designed recrawl state, not corruption
    ws = _copy(workspace, tmp_path)
    assert main(["--workdir", str(ws), "reset", C.data_url(10)]) == 0
    assert _errors(fsck(_store(spark, ws))) == []


# -- seen-set sidecar -----------------------------------------------------------

def test_sidecar_missing_part_is_error(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    d = store.root / "_manifests" / SIDECAR_DIR
    # delete a part meta.json asserts exists (absent-by-design all-zero
    # bucketed parts have no part_versions entry and are NOT errors)
    part = next(iter(json.loads((d / "meta.json").read_text())["part_versions"]))
    (d / f"part-{part}.bin").unlink()
    assert "sidecar_missing_part" in _checks(fsck(store), "error")


def test_sidecar_false_negative_is_error(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    d = store.root / "_manifests" / SIDECAR_DIR
    for part in d.glob("part-*.bin"):
        part.write_bytes(b"\x00" * part.stat().st_size)
    findings = fsck(store)
    neg = [f for f in findings if f.check == "sidecar_false_negative"]
    assert neg and neg[0].level == "error"
    # every registered URL routes to a zeroed bitmap
    assert neg[0].n == store.read("frontier").count()
    # --no-sidecar skips the sweep
    assert _errors(fsck(store, sidecar=False)) == []


def test_sidecar_corrupt_meta_is_warning(spark, workspace, tmp_path):
    ws = _copy(workspace, tmp_path)
    store = _store(spark, ws)
    (store.root / "_manifests" / SIDECAR_DIR / "meta.json").write_text("{not json")
    findings = fsck(store)
    assert _errors(findings) == []
    assert "sidecar_unreadable" in _checks(findings, "warn")
