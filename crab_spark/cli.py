"""CLI — the reference's subcommand surface (main.rs:31-109, 13
subcommands) over the Spark engine.

    python -m crab_spark.cli new <dir>            # scaffold workspace (S10)
    python -m crab_spark.cli register <url> <type_id>
    python -m crab_spark.cli run-crawler [--navigate] [--batch N] [--host-budget K]
    python -m crab_spark.cli navigate <url>         # print outgoing links
    python -m crab_spark.cli navigate-all
    python -m crab_spark.cli validate [--reset]
    python -m crab_spark.cli list-pages [-n|--no-header]
    python -m crab_spark.cli parsers
    python -m crab_spark.cli dump <url>
    python -m crab_spark.cli parse <url> [-n col ...]
    python -m crab_spark.cli reset <url>            # flip back to pending
    python -m crab_spark.cli export-table <name> [-n col ...]
    python -m crab_spark.cli export-csv <name> <out_dir> [-n col ...]
    python -m crab_spark.cli compact <table> [--files N]  # fold append deltas
    python -m crab_spark.cli vacuum <table>         # expire unreferenced dirs
    python -m crab_spark.cli migrate                # no-op: schema lives in code

The 13-command surface mirrors the reference's clap enum
(main.rs:36-104); page ids are canonical URLs here (the engine's key)
instead of SQLite rowids.

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
    """Config merge is per-SECTION: a crab_spark.json that sets only
    {"crawler": {"threads": 4}} keeps every other crawler default (a
    shallow dict.update used to wipe the whole nested section and crash
    run-crawler on the first missing key). Always returns a fresh copy
    so caller mutation can't corrupt DEFAULT_CONFIG."""
    import copy

    cfg = copy.deepcopy(DEFAULT_CONFIG)
    p = os.path.join(workdir, "crab_spark.json")
    if os.path.exists(p):
        user = json.loads(open(p).read())
        for k, v in user.items():
            if isinstance(v, dict) and isinstance(cfg.get(k), dict):
                cfg[k].update(v)
            else:
                cfg[k] = v
    return cfg


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
    # beyond the reference: bulk-register from a sitemap / sitemap index
    # (gzip-aware fetch, one index level), optionally re-queueing fetched
    # pages whose <lastmod> advanced since the recorded snapshot
    p = sub.add_parser("sitemap"); p.add_argument("url"); p.add_argument("type_id", type=int)
    p.add_argument("--refresh", action="store_true",
                   help="also re-queue fetched pages whose lastmod advanced")
    p = sub.add_parser("run-crawler")
    p.add_argument("--navigate", action="store_true")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--host-budget", type=int, default=None,
                   help="priority-frontier mode: cap per-host rows per "
                        "priority level (north_rule host-budget scoring)")
    p.add_argument("--bloom-min-frontier", type=int, default=None,
                   help="frontier size below which the bloom/cuckoo "
                        "seen-set sidecar stays off (exact broadcast "
                        "check instead); 0 forces the sidecar on "
                        "(default: crawler.BLOOM_MIN_FRONTIER)")
    p.add_argument("--trap-cap", type=int, default=None,
                   help="self-defending mode: periodically cap URL-template "
                        "shapes holding more registered URLs than this")
    p.add_argument("--trap-every", type=int, default=16,
                   help="epochs between trap sweeps (with --trap-cap)")
    sub.add_parser("navigate-all")
    p = sub.add_parser("navigate"); p.add_argument("url")
    p = sub.add_parser("reset"); p.add_argument("url")
    p = sub.add_parser("validate"); p.add_argument("--reset", action="store_true")
    p = sub.add_parser("list-pages")
    p.add_argument("-n", "--no-header", action="store_true")
    p.add_argument("--limit", type=int, default=None,
                   help="max rows (default: unbounded, reference parity)")
    sub.add_parser("parsers")
    sub.add_parser("migrate")
    p = sub.add_parser("compact")  # maintenance: fold append deltas
    p.add_argument("table")
    p.add_argument("--files", type=int, default=None)
    # physical sort of the rewrite (comma-separated), so row-group-stat
    # pruning (e.g. the dequeue depth cutoff) survives the compaction;
    # defaults to depth for the frontier table
    p.add_argument("--sort", type=str, default=None)
    p = sub.add_parser("vacuum")  # maintenance: expire unreferenced dirs
    p.add_argument("table")
    # maintenance: read-only store consistency check (manifest/epoch/
    # row/sidecar invariants the crash-resume contract relies on)
    p = sub.add_parser("fsck")
    p.add_argument("--no-sidecar", action="store_true",
                   help="skip the seen-set sidecar probe sweep")
    # maintenance: URL-template explosion report over the frontier;
    # --apply merges the flagged shapes into the workspace robots file
    # so the next run-crawler caps them via the dispatch gate
    p = sub.add_parser("traps")
    p.add_argument("--cap", type=int, default=1000,
                   help="flag shapes holding more registered URLs than this")
    p.add_argument("--apply", action="store_true",
                   help="write Disallow patterns into the robots cache file")
    p.add_argument("--clear", action="store_true",
                   help="drop the in-crawl trap-guard state (caps applied to "
                        "the robots file are operator-owned and kept)")
    p = sub.add_parser("dump"); p.add_argument("url")
    p = sub.add_parser("parse"); p.add_argument("url")
    p.add_argument("-n", "--columns", action="append", default=[])
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
    elif args.cmd == "sitemap":
        from .frontier import seed_frontier
        from .sitemap import ingest_sitemaps, sitemap_refresh, sitemap_seeds

        entries = ingest_sitemaps(
            spark.createDataFrame([(args.url,)], ["sitemap_url"])
        )
        n = seed_frontier(store, sitemap_seeds(entries, args.type_id))
        line = f"registered {n} page(s) from sitemap"
        if args.refresh:
            line += f"; re-queued {sitemap_refresh(store, entries)}"
        for c in entries.df_pipeline_caches:
            c.unpersist()
        print(line)
    elif args.cmd == "run-crawler":
        from .crawler import CorpusFetcher, HttpFetcher, crawl

        c = cfg["crawler"]
        pool = None
        if c.get("corpus_parquet"):
            # offline mode: fetch from a corpus table instead of HTTP
            # (deterministic testing / replay of a stored mirror)
            fetcher = CorpusFetcher(
                spark.read.parquet(os.path.join(args.workdir, c["corpus_parquet"])),
                delay_sec=0.0,
            )
        else:
            # optional proxy list file (lib.rs:82-83 `proxies` path;
            # proxy.rs from_file) — pool drives per-request routing
            if c.get("proxies"):
                from .proxy import ProxyPool

                with open(os.path.join(args.workdir, c["proxies"])) as f:
                    pool = ProxyPool.from_lines(f.read())
            fetcher = HttpFetcher(delay_sec=c["delay_sec"],
                                  connect_timeout=c["connect_timeout_sec"],
                                  read_timeout=c["read_timeout_sec"],
                                  proxies=pool.urls if pool else None)
        # optional robots cache: {"host": ["/prefix", ...]} JSON file —
        # joined into the dispatch path (north_rule; no reference analogue)
        robots = None
        if c.get("robots"):
            from .robots import robots_table

            with open(os.path.join(args.workdir, c["robots"])) as f:
                robots = robots_table(spark, json.load(f))
        stats = crawl(store, fetcher, registry, navigate=args.navigate,
                      batch_size=args.batch or c["batch_size"],
                      robots=robots, proxy_pool=pool,
                      host_budget=args.host_budget,
                      trap_cap=args.trap_cap, trap_check_every=args.trap_every,
                      **({"bloom_min_frontier": args.bloom_min_frontier}
                         if args.bloom_min_frontier is not None else {}))
        # robots_denied prints whenever gate material existed: a user
        # robots cache, a trap-cap sweep, OR persisted trap state from
        # a prior run (ADVICE r5 — the persisted-only case printed
        # nothing when the count was 0)
        persisted_traps = bool(
            store.read_state("traps", {"hosts": {}})["hosts"]
        )
        print(f"epochs={stats.epochs} requests={stats.requests} "
              f"successful={stats.successful} new_links={stats.new_links}"
              + (f" robots_denied={stats.robots_denied}"
                 if robots is not None or args.trap_cap is not None
                 or persisted_traps or stats.robots_denied else ""))
        if pool is not None:
            for row in pool.report():
                print(row)
    elif args.cmd == "navigate":
        # run navigation rules on ONE page, print outgoing links
        # (main.rs:192-200: "{:3}  {}" per (type_id, link))
        from .report import dump_content, page_row

        meta = page_row(store, args.url).select("type_id").collect()
        spans = dump_content(store, args.url).collect()
        if not meta or not spans:
            print(f"Page not found: {args.url}", file=sys.stderr)
            return 1
        for link, type_id in registry.run_navigate(
            int(meta[0]["type_id"]), [s.asDict() for s in spans[0]["spans"]]
        ):
            print(f"{type_id:3}  {link}")
    elif args.cmd == "reset":
        # flip one page back to pending (main.rs:311-314, storage.rs
        # reset_page)
        from pyspark.sql import functions as F

        from .frontier import reset_pages

        hashes = store.read("frontier").filter(F.col("url") == args.url).select("url_hash")
        if not hashes.count():
            print(f"Page not found: {args.url}", file=sys.stderr)
            return 1
        reset_pages(store, hashes)
        print(f"reset {args.url}")
    elif args.cmd == "navigate-all":
        from .maintenance import navigate_all

        print(f"registered {navigate_all(store, registry)} new page(s)")
    elif args.cmd == "validate":
        from .maintenance import validate_sweep

        n = validate_sweep(store, registry, reset=args.reset)
        print(f"{n} invalid page(s)" + (" reset" if args.reset else ""))
    elif args.cmd == "list-pages":
        from .report import list_pages

        if not args.no_header:  # main.rs:263-268 header + rule
            print(f"{'id':>7}  {'type_id':>7}  {'depth':>5}  {'status':<15}  {'url':<20}")
            print("-" * 120)
        # toLocalIterator: the reference's SELECT is unbounded
        # (storage.rs:71-79) — stream partitions to the console instead
        # of collecting a potentially frontier-sized result
        for r in list_pages(store, limit=args.limit).toLocalIterator():
            print(f"{r['seq']:>7}  {r['type_id']:>7}  {r['depth']:>5}  "
                  f"{r['status_name']:<15}  {r['url']:<20}")
    elif args.cmd == "compact":
        sort = (args.sort.split(",") if args.sort
                else (["depth"] if args.table == "frontier" else None))
        n = store.compact(args.table, n_files=args.files, sort_within=sort)
        print(f"compacted {n} snapshot dir(s) of {args.table}" if n
              else f"{args.table}: nothing to compact")
    elif args.cmd == "vacuum":
        n = store.vacuum(args.table)
        print(f"vacuumed {n} unreferenced dir(s) of {args.table}" if n
              else f"{args.table}: nothing to vacuum")
    elif args.cmd == "fsck":
        from .fsck import fsck

        findings = fsck(store, sidecar=not args.no_sidecar)
        for f in findings:
            print(f.line())
        n_err = sum(1 for f in findings if f.level == "error")
        if n_err:
            print(f"fsck: {n_err} error(s), {len(findings) - n_err} other finding(s)")
            return 1
        print("fsck: clean" if not findings
              else f"fsck: clean ({len(findings)} non-error finding(s))")
    elif args.cmd == "traps":
        from .traps import pattern_for_template, trap_report

        if args.clear:
            n = len(store.read_state("traps", {"hosts": {}})["hosts"])
            store.write_state("traps", {"hosts": {}})
            print(f"cleared in-crawl trap state for {n} host(s)")
            return 0
        rows = []
        if store.exists("frontier"):
            rep = trap_report(store.read("frontier"),
                              max_urls_per_template=args.cap)
            rows = rep.collect()  # flagged shapes only: tiny by construction
        for r in sorted(rows, key=lambda r: (-r["n_urls"], r["host"], r["template"])):
            print(f"{r['n_urls']:8d}  {r['host']}{r['template']}"
                  f"  ({float(r['host_share']):.1%} of host)")
        if not rows:
            print(f"no url-template explosions at cap {args.cap}")
        elif args.apply:
            # patterns derive driver-side from the ALREADY-collected
            # report rows (same helper the in-crawl guard uses) — no
            # second frontier scan, and the applied rules can never
            # diverge from the printed report on a live workspace
            per_host: dict[str, list[str]] = {}
            for r in rows:
                pats = per_host.setdefault(r["host"], [])
                pat = pattern_for_template(r["template"])
                if pat not in pats:
                    pats.append(pat)
            per_host = {h: sorted(p) for h, p in per_host.items()}
            cfg_path = os.path.join(args.workdir, "crab_spark.json")
            with open(cfg_path) as f:
                raw = json.load(f)
            rel = raw.get("crawler", {}).get("robots") or "robots.json"
            path = os.path.join(args.workdir, rel)
            existing = {}
            if os.path.exists(path):
                with open(path) as f:
                    existing = json.load(f)
            n_new = 0
            for host, pats in sorted(per_host.items()):
                spec = existing.get(host)
                if isinstance(spec, dict):
                    have = spec.setdefault("disallow", [])
                elif isinstance(spec, list):
                    have = spec
                else:
                    have = existing[host] = []
                fresh = [p for p in pats if p not in have]
                have += fresh
                n_new += len(fresh)
            with open(path, "w") as f:
                json.dump(existing, f, indent=2)
            if raw.setdefault("crawler", {}).get("robots") != rel:
                raw["crawler"]["robots"] = rel
                with open(cfg_path, "w") as f:
                    json.dump(raw, f, indent=2)
            print(f"applied {n_new} new Disallow rule(s) to {rel}")
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
        # pretty-print one page's parsed tables with the reference's
        # layout (main.rs:237-256): table name, rule, "- col: val" for a
        # row's first printed column, "  col: val" after; -n filters
        # columns case-insensitively (column_contains, main.rs:392-398)
        from pyspark.sql import functions as F

        from .maintenance import _downloaded_docs
        from .tabulator import parse_documents

        one = _downloaded_docs(store).where(F.col("doc_id") == args.url)
        rows = parse_documents(one, registry).orderBy(
            "table_name", "row_idx", "col_idx"
        ).collect()
        wanted = [c.lower() for c in args.columns]
        by_table: dict[str, dict[int, list]] = {}
        for r in rows:
            if wanted and r["col"].lower() not in wanted:
                continue
            by_table.setdefault(r["table_name"], {}).setdefault(
                r["row_idx"], []
            ).append((r["col"], r["val"]))
        for table_name, trows in by_table.items():
            print(table_name)
            print("------------------------")
            for _, cols in sorted(trows.items()):
                for idx, (col, val) in enumerate(cols):
                    prefix = "-" if idx == 0 else " "
                    print(f"{prefix} {col}: {val}")
            print()
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
