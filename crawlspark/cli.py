"""CLI — crawl / status / reset / export subcommands.

Mirrors the reference's intended CLI surface (src/cli.py:27-54 subcommands;
status/reset/export at cli.py:110-184 — note the reference's `crawl` path
is dead code, importing a nonexistent orchestrator at cli.py:15; this one
works). Runs via plain python or spark-submit:

    python -m crawlspark.cli crawl --workdir /tmp/run1 --pages 5
    python -m crawlspark.cli status --workdir /tmp/run1
    python -m crawlspark.cli export --workdir /tmp/run1 --out posts.jsonl
    python -m crawlspark.cli reset --workdir /tmp/run1

    spark-submit --py-files crawlspark.zip scripts/submit_crawl.py ...
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _spark(args):
    from crawlspark.session import get_spark

    return get_spark("crawlspark-cli", master=args.master)


def cmd_crawl(args) -> int:
    from crawlspark.config import EngineConfig
    from crawlspark.driver import crawl
    from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
    from crawlspark.schema import PAGE_STORE

    # layered config (defaults <- INI <- env, config.py analog); explicit
    # CLI flags override it
    cfg = EngineConfig.load(args.config) if args.config else EngineConfig.load()
    pages_per_wave = (
        args.pages_per_wave if args.pages_per_wave is not None
        else cfg.pages_per_wave
    )
    spark = _spark(args)
    spec = SiteSpec(pages=args.pages, posts_per_page=args.posts_per_page,
                    seed=args.seed)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    result = crawl(
        spark,
        store,
        spec.base_url,
        args.workdir,
        pages=spec.pages,
        pages_per_wave=pages_per_wave,
        image_keep_bytes=cfg.image_keep_bytes,
        listing_source=cfg.listing_source,
    )
    print(json.dumps({"stats": result.stats,
                      "virtual_seconds": result.virtual_seconds,
                      "waves": result.waves}, ensure_ascii=False))
    spark.stop()
    return 0


def cmd_status(args) -> int:
    from crawlspark.catalog import Catalog

    spark = _spark(args)
    cat = Catalog(args.workdir)
    out: dict = {"workdir": args.workdir, "tables": {}}
    for t in ("posts", "images", "seen", "crawl_order", "lineage",
              "checkpoints", "metrics", "errors", "frontier", "politeness"):
        df = cat.read(spark, t)
        out["tables"][t] = {
            "rows": df.count() if df is not None else 0,
            "version": cat.version(t),
        }
    m = cat.read(spark, "metrics")
    if m is not None:
        agg = m.agg(
            F.max("wave").alias("last_wave"),
            F.sum("posts_processed").alias("posts"),
            F.sum("posts_skipped").alias("skipped"),
            F.sum("files_processed").alias("files"),
            F.sum("errors").alias("errors"),
            F.sum("virtual_seconds").alias("virtual_seconds"),
        ).collect()[0]
        out["progress"] = {k: (float(agg[k]) if k == "virtual_seconds" else int(agg[k]))
                           for k in ("last_wave", "posts", "skipped", "files",
                                      "errors", "virtual_seconds")}
    print(json.dumps(out, ensure_ascii=False, indent=2))
    spark.stop()
    return 0


def cmd_reset(args) -> int:
    from crawlspark.catalog import Catalog

    cat = Catalog(args.workdir)
    for t in ("posts", "images", "seen", "crawl_order", "lineage",
              "checkpoints", "metrics", "robots", "errors", "frontier",
              "politeness"):
        cat.drop(t)
    print(f"reset: cleared state under {args.workdir}")
    return 0


def cmd_export(args) -> int:
    """Export posts in the reference JSONL record shape, sorted by post_id
    (storage.py:53,65-82 field order)."""
    from crawlspark.catalog import Catalog

    spark = _spark(args)
    cat = Catalog(args.workdir)
    df = cat.read(spark, "posts")
    if df is None:
        print("no posts table", file=sys.stderr)
        return 1
    rows = df.orderBy("post_id").collect()
    with open(args.out, "w", encoding="utf-8") as f:
        for r in rows:
            rec = {
                "url": r["url"],
                "meta": {
                    "title": r["meta"]["title"],
                    "author": r["meta"]["author"],
                    "date": r["meta"]["date"],
                },
                "body": r["body"],
                "parsed_content": r["parsed_content"],
                "file_sources": list(r["file_sources"]),
                "crawl_timestamp": r["crawl_timestamp"],
                "post_id": r["post_id"],
                "_download_summary": r["_download_summary"],
                "has_download": r["has_download"],
                "file_formats": list(r["file_formats"]),
            }
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"exported {len(rows)} records to {args.out}")
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crawlspark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the synthetic-site crawl")
    c.add_argument("--workdir", required=True)
    c.add_argument("--pages", type=int, default=3)
    c.add_argument("--posts-per-page", type=int, default=10)
    c.add_argument("--pages-per-wave", type=int, default=None)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--config", default=None, help="INI file ([crawlspark])")
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("status", help="show state-table stats")
    s.add_argument("--workdir", required=True)
    s.set_defaults(fn=cmd_status)

    r = sub.add_parser("reset", help="drop all state tables")
    r.add_argument("--workdir", required=True)
    r.set_defaults(fn=cmd_reset)

    e = sub.add_parser("export", help="export posts as reference-shape JSONL")
    e.add_argument("--workdir", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
