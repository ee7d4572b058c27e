"""CLI drive — the 13-subcommand surface (reference main.rs:36-104)
over a scaffolded workspace with the offline corpus, exercised through
``main(argv)`` exactly as a shell user would."""

from __future__ import annotations

import json
import os

import pytest

from crab_spark import corpus as C
from crab_spark.cli import main

LISTING_PARSER = """
from crab_spark.parsers.listing import TYPE_ID, SPAN_KINDS, navigate, validate  # noqa
"""
DATA_PARSER = """
from crab_spark.parsers.data import TYPE_ID, parse  # noqa
"""


@pytest.fixture(scope="module")
def workspace(spark, tmp_path_factory):
    ws = tmp_path_factory.mktemp("cliws")
    assert main(["new", str(ws)]) == 0
    # offline corpus + parsers for the fixture graph
    C.corpus_df(spark, 4).write.parquet(str(ws / "corpus.parquet"))
    cfg = json.loads((ws / "crab_spark.json").read_text())
    cfg["crawler"]["corpus_parquet"] = "corpus.parquet"
    cfg["crawler"]["batch_size"] = 10
    (ws / "crab_spark.json").write_text(json.dumps(cfg))
    (ws / "parser_example.py").unlink()  # would clash with TYPE_ID 1
    (ws / "parser_listing.py").write_text(LISTING_PARSER)
    (ws / "parser_data.py").write_text(DATA_PARSER)
    assert main(["--workdir", str(ws), "register", C.page_url(1), "1"]) == 0
    assert main(["--workdir", str(ws), "run-crawler", "--navigate"]) == 0
    return ws


def _run(capsys, argv) -> str:
    assert main(argv) == 0
    return capsys.readouterr().out


def test_cli_list_pages_header_flag(workspace, capsys):
    out = _run(capsys, ["--workdir", str(workspace), "list-pages"])
    assert out.splitlines()[0].split() == ["id", "type_id", "depth", "status", "url"]
    assert C.page_url(1) in out and "Downloaded" in out
    no_h = _run(capsys, ["--workdir", str(workspace), "list-pages", "--no-header"])
    assert "id" not in no_h.splitlines()[0]
    assert len(no_h.splitlines()) == len(out.splitlines()) - 2


def test_cli_navigate_prints_links(workspace, capsys):
    out = _run(capsys, ["--workdir", str(workspace), "navigate", C.page_url(1)])
    lines = out.splitlines()
    # pager links (type 1) first, then the ten data links (type 2) —
    # reference prints "{:3}  {}" per link (main.rs:197-199)
    assert lines[0] == f"  1  /page/1"
    assert sum(1 for l in lines if l.startswith("  2  /data/")) == 10


def test_cli_parse_column_filter(workspace, capsys):
    url = C.data_url(10)
    out = _run(capsys, ["--workdir", str(workspace), "parse", url])
    assert "default" in out and "- input: 10" in out and "  output: 100" in out
    only = _run(capsys, ["--workdir", str(workspace), "parse", url, "-n", "INPUT"])
    assert "- input: 10" in only and "output" not in only


def test_cli_reset_flips_status(workspace, capsys):
    url = C.data_url(11)
    out = _run(capsys, ["--workdir", str(workspace), "reset", url])
    assert f"reset {url}" in out
    pages = _run(capsys, ["--workdir", str(workspace), "list-pages", "-n"])
    row = next(l for l in pages.splitlines() if l.endswith(url))
    assert "NotDownloaded" in row
    # re-crawl refetches exactly the reset page
    assert main(["--workdir", str(workspace), "run-crawler"]) == 0
    cap = capsys.readouterr()
    assert "requests=1 " in cap.out + " "
    # the per-epoch progress line (reference dashboard analogue) is
    # always visible during a crawl (on stderr — stdout stays clean for
    # piped output), not only under --profile
    assert "[epoch " in cap.err and "dequeued=1" in cap.err


def test_cli_missing_page_errors(workspace, capsys):
    assert main(["--workdir", str(workspace), "navigate", "http://nope/x"]) == 1
    assert main(["--workdir", str(workspace), "reset", "http://nope/x"]) == 1


def test_cli_export_csv(workspace, capsys, tmp_path):
    out_dir = tmp_path / "csv"
    _run(capsys, ["--workdir", str(workspace), "export-csv", "default", str(out_dir)])
    files = [f for f in os.listdir(out_dir) if f.endswith(".csv")]
    assert files
    body = "\n".join((out_dir / f).read_text() for f in files)
    assert "input" in body and "100" in body


def test_load_config_merges_sections(tmp_path):
    """A partial [crawler] section keeps the other crawler defaults
    (a shallow update used to wipe the nested dict and crash
    run-crawler on the first missing key); DEFAULT_CONFIG itself is
    never aliased or mutated."""
    import json as _json

    from crab_spark import cli as C

    (tmp_path / "crab_spark.json").write_text(
        _json.dumps({"crawler": {"threads": 4}})
    )
    cfg = C.load_config(str(tmp_path))
    assert cfg["crawler"]["threads"] == 4
    assert cfg["crawler"]["delay_sec"] == 5.0      # default preserved
    assert cfg["database"] == "warehouse"
    cfg["crawler"]["threads"] = 99                 # caller mutation...
    assert C.DEFAULT_CONFIG["crawler"]["threads"] == 1  # ...never leaks
    # no config file: still a fresh copy, not the module object
    assert C.load_config(str(tmp_path / "none")) is not C.DEFAULT_CONFIG


def test_fresh_workspace_reports_and_reset(spark, tmp_path):
    """A registered-but-never-crawled workspace: list-pages prints the
    row, reset succeeds (reference's UPDATE no-ops), validate/
    navigate-all report zero — nothing tracebacks on missing tables."""
    from crab_spark import frontier as fr
    from crab_spark.maintenance import navigate_all, validate_sweep
    from crab_spark.parsers import load_registry
    from crab_spark.report import dump_content, list_pages, page_row
    from crab_spark.schemas import SEEDS
    from crab_spark.store import TableStore
    from crab_spark.util import local_df

    store = TableStore(str(tmp_path / "wh"), spark)
    registry = load_registry([])
    # completely empty store: all reports empty, maintenance no-ops
    assert list_pages(store).count() == 0
    assert page_row(store, "http://h/x").count() == 0
    assert dump_content(store, "http://h/x").count() == 0
    assert navigate_all(store, registry) == 0
    assert validate_sweep(store, registry) == 0
    # registered but never fetched: reset must succeed
    fr.seed_frontier(store, local_df(spark, [("http://h/x", 1)], SEEDS))
    hashes = store.read("frontier").select("url_hash")
    fr.reset_pages(store, hashes)                  # used to crash
    assert list_pages(store, limit=None).count() == 1


def test_export_table_arbitrary_column_names(spark):
    """Parsers emit arbitrary column names (ragged string rows): a name
    with a dot must export, not resolve as nested-field access."""
    from crab_spark.schemas import PARSED
    from crab_spark.tabulator import export_table, to_csv_string
    from crab_spark.util import local_df

    rows = [("d1", "t", 0, 0, "price.usd", "9"),
            ("d1", "t", 0, 1, "qty", "2"),
            ("d2", "t", 0, 0, "price.usd", "7")]
    parsed = local_df(spark, rows, PARSED)
    wide = export_table(parsed, "t")
    assert wide.columns == ["doc_id", "row_idx", "price.usd", "qty"]
    got = {(r["doc_id"]): (r["price.usd"], r["qty"]) for r in wide.collect()}
    assert got == {"d1": ("9", "2"), "d2": ("7", "")}
    csv = to_csv_string(wide, ["price.usd", "qty"])
    assert csv == "price.usd,qty\n9,2\n7,\n"


def test_cli_sitemap_seed_and_refresh(spark, tmp_path, capsys):
    """`crab_spark sitemap <url> <type>`: bulk-register from a sitemap
    file, then --refresh re-queues on a lastmod advance (snapshot diff)."""
    ws = tmp_path / "smws"
    assert main(["new", str(ws)]) == 0
    C.corpus_df(spark, 4).write.parquet(str(ws / "corpus.parquet"))
    cfg = json.loads((ws / "crab_spark.json").read_text())
    cfg["crawler"]["corpus_parquet"] = "corpus.parquet"
    (ws / "crab_spark.json").write_text(json.dumps(cfg))
    (ws / "parser_example.py").unlink()
    (ws / "parser_listing.py").write_text(LISTING_PARSER)
    (ws / "parser_data.py").write_text(DATA_PARSER)

    def sm(lastmod):
        p = ws / "sm.xml"
        p.write_text(
            "<urlset><url><loc>%s</loc><lastmod>%s</lastmod></url></urlset>"
            % (C.page_url(1), lastmod)
        )
        return f"file://{p}"

    out = _run(capsys, ["--workdir", str(ws), "sitemap", sm("2026-01-01"), "1"])
    assert "registered 1 page(s) from sitemap" in out
    assert main(["--workdir", str(ws), "run-crawler"]) == 0
    # baseline refresh: snapshot recorded, nothing re-queued
    out = _run(capsys, ["--workdir", str(ws), "sitemap", sm("2026-01-01"), "1",
                        "--refresh"])
    assert "registered 0 page(s) from sitemap; re-queued 0" in out
    # lastmod advance: already-registered (0 new) but 1 re-queued
    out = _run(capsys, ["--workdir", str(ws), "sitemap", sm("2026-02-01"), "1",
                        "--refresh"])
    assert "registered 0 page(s) from sitemap; re-queued 1" in out
