"""Deployment-path proof (north_rule: "runs under spark-submit
--py-files on multi-executor clusters"): package the library as a zip,
spark-submit the crawl driver from OUTSIDE the repo so the code can
only come from --py-files, and check the crawl completes correctly."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(), reason="no spark-submit")
def test_spark_submit_py_files_crawl(spark, tmp_path):
    zip_path = tmp_path / "crab_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "crab_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))

    from crab_spark.corpus import corpus_df, page_url

    corpus = tmp_path / "corpus"
    corpus_df(spark, 4).write.parquet(str(corpus))

    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(zip_path),
         str(REPO / "scripts" / "submit_crawl.py"),
         str(tmp_path / "wh"), str(corpus), page_url(1), "10"],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-1500:] + out.stderr[-1500:]
    stats = json.loads(lines[-1])
    # n_pages=4 → reachable pages 1..3 + 10 data each = 33, all fetched
    assert stats["requests"] == 33 and stats["successful"] == 33
