"""CLI — the reference's subcommand surface (main.rs:31-109, 13
subcommands) over the Spark engine.

    python -m crab_spark.cli new <dir>            # scaffold workspace (S10)
    python -m crab_spark.cli register <url> <type_id>
    python -m crab_spark.cli run-crawler [--navigate] [--batch N]
    python -m crab_spark.cli navigate-all
    python -m crab_spark.cli validate [--reset]
    python -m crab_spark.cli list-pages
    python -m crab_spark.cli parsers
    python -m crab_spark.cli dump <url>
    python -m crab_spark.cli parse <url>
    python -m crab_spark.cli export-table <name> [-n col ...]
    python -m crab_spark.cli export-csv <name> <out_dir> [-n col ...]
    python -m crab_spark.cli migrate                # no-op: schema lives in code

Workspace config (crab.toml analogue) is ``crab_spark.toml`` JSON-ish
via tomllib: [crawler] threads/delay_sec/timeouts map to batch size and
the politeness budget (lib.rs:86-108 defaults preserved).

Parser discovery mirrors the reference cwd scan (main.rs:362-389):
every ``parser_*.py`` in the workspace is imported and must define
TYPE_ID (+ optional navigate/parse/validate over span lists).
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import sys

DEFAULT_CONFIG = {
    "database": "warehouse",
    "crawler": {"threads": 1, "delay_sec": 5.0, "read_timeout_sec": 10.0,
                "connect_timeout_sec": 10.0, "batch_size": 100},
}

EXAMPLE_PARSER = '''"""Example crab_spark parser (navigate/parse/validate over spans).

Contract identical to the reference's example_parser.py, with `content`
being the document's span list (kind/text/media_ref/offset dicts)."""

TYPE_ID: int = 1


def navigate(spans: list[dict]) -> list[tuple[str, int]]:
    return [(s["text"], TYPE_ID) for s in spans if s["kind"] == "link"]


def parse(spans: list[dict]) -> dict:
    return {"default": [{"text": s["text"]} for s in spans if s["kind"] == "text"]}
'''


def load_config(workdir: str) -> dict:
    p = os.path.join(workdir, "crab_spark.json")
    if os.path.exists(p):
        cfg = dict(DEFAULT_CONFIG)
        cfg.update(json.loads(open(p).read()))
        return cfg
    return DEFAULT_CONFIG


def discover_parsers(workdir: str):
    """Import every parser_*.py in the workspace (main.rs:362-389)."""
    mods = []
    for path in sorted(glob.glob(os.path.join(workdir, "parser_*.py"))):
        name = os.path.splitext(os.path.basename(path))[0]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        if hasattr(mod, "TYPE_ID"):
            mods.append(mod)
    return mods


def _ctx(args):
    from .parsers import load_registry
    from .session import get_spark
    from .store import TableStore

    cfg = load_config(args.workdir)
    spark = get_spark("crab_spark_cli")
    store = TableStore(os.path.join(args.workdir, cfg["database"]), spark)
    registry = load_registry(discover_parsers(args.workdir))
    return cfg, spark, store, registry


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crab_spark")
    ap.add_argument("--workdir", default=".")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("new").add_argument("dir")
    p = sub.add_parser("register"); p.add_argument("url"); p.add_argument("type_id", type=int)
    p = sub.add_parser("run-crawler")
    p.add_argument("--navigate", action="store_true")
    p.add_argument("--batch", type=int, default=None)
    sub.add_parser("navigate-all")
    p = sub.add_parser("validate"); p.add_argument("--reset", action="store_true")
    sub.add_parser("list-pages")
    sub.add_parser("parsers")
    sub.add_parser("migrate")
    p = sub.add_parser("dump"); p.add_argument("url")
    p = sub.add_parser("parse"); p.add_argument("url")
    for name in ("export-table", "export-csv"):
        p = sub.add_parser(name)
        p.add_argument("table")
        if name == "export-csv":
            p.add_argument("out_dir")
        p.add_argument("-n", "--columns", action="append", default=[])
    args = ap.parse_args(argv)

    if args.cmd == "new":  # S10 workspace scaffold (main.rs:136-149)
        os.makedirs(args.dir, exist_ok=True)
        with open(os.path.join(args.dir, "crab_spark.json"), "w") as f:
            json.dump(DEFAULT_CONFIG, f, indent=2)
        with open(os.path.join(args.dir, "parser_example.py"), "w") as f:
            f.write(EXAMPLE_PARSER)
        print(f"workspace created at {args.dir}")
        return 0
    if args.cmd == "migrate":
        print("schemas are code-defined (crab_spark/schemas.py); nothing to migrate")
        return 0

    cfg, spark, store, registry = _ctx(args)

    if args.cmd == "register":
        from .frontier import seed_frontier
        from .schemas import SEEDS
        from .util import local_df

        n = seed_frontier(store, local_df(spark, [(args.url, args.type_id)], SEEDS))
        print(f"registered {n} page(s)")
    elif args.cmd == "run-crawler":
        from .crawler import CorpusFetcher, HttpFetcher, crawl

        c = cfg["crawler"]
        if c.get("corpus_parquet"):
            # offline mode: fetch from a corpus table instead of HTTP
            # (deterministic testing / replay of a stored mirror)
            fetcher = CorpusFetcher(
                spark.read.parquet(os.path.join(args.workdir, c["corpus_parquet"])),
                delay_sec=0.0,
            )
        else:
            fetcher = HttpFetcher(delay_sec=c["delay_sec"],
                                  connect_timeout=c["connect_timeout_sec"],
                                  read_timeout=c["read_timeout_sec"])
        stats = crawl(store, fetcher, registry, navigate=args.navigate,
                      batch_size=args.batch or c["batch_size"])
        print(f"epochs={stats.epochs} requests={stats.requests} "
              f"successful={stats.successful} new_links={stats.new_links}")
    elif args.cmd == "navigate-all":
        from .maintenance import navigate_all

        print(f"registered {navigate_all(store, registry)} new page(s)")
    elif args.cmd == "validate":
        from .maintenance import validate_sweep

        n = validate_sweep(store, registry, reset=args.reset)
        print(f"{n} invalid page(s)" + (" reset" if args.reset else ""))
    elif args.cmd == "list-pages":
        from .report import list_pages

        list_pages(store).show(1000, truncate=False)
    elif args.cmd == "parsers":
        from .report import parser_report

        for row in parser_report(registry):
            print(row)
    elif args.cmd == "dump":
        from .report import dump_content

        for r in dump_content(store, args.url).collect():
            for s in r["spans"]:
                print(dict(s))
    elif args.cmd == "parse":
        from pyspark.sql import functions as F

        from .maintenance import _downloaded_docs
        from .tabulator import parse_documents

        one = _downloaded_docs(store).where(F.col("doc_id") == args.url)
        for r in parse_documents(one, registry).collect():
            print(r.asDict())
    elif args.cmd in ("export-table", "export-csv"):
        from .maintenance import _downloaded_docs
        from .tabulator import export_table, parse_documents, write_csv

        parsed = parse_documents(_downloaded_docs(store), registry)
        wide = export_table(parsed, args.table, columns=args.columns or None)
        if args.cmd == "export-csv":
            write_csv(wide, args.out_dir)
            print(f"csv written to {args.out_dir}")
        else:
            wide.show(1000, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
