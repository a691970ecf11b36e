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
import os
import sys

from pyspark.sql import functions as F

# every state table the engine can write under a workdir (status/vacuum
# iterate this; reset enumerates the filesystem instead so nothing new can
# ever be missed)
STATE_TABLES = (
    "posts", "images", "image_index", "image_pairs", "image_bands",
    "image_clusters", "files", "seen", "crawl_order", "lineage",
    "checkpoints", "metrics", "robots", "errors", "frontier",
    "politeness", "politeness_state",
)


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
    # The politeness/retry budget is PINNED to the reference values — the
    # byte-for-byte crawl-order/virtual-time parity contract is defined
    # against them. Overrides must be loudly rejected, never silently
    # ignored (an operator setting CRAWLSPARK_RATE_LIMIT_REQUESTS=2 would
    # otherwise believe it took effect).
    pinned = (
        "wait_page_load", "wait_post_nav", "wait_between_pages",
        "rate_limit_requests", "rate_limit_period", "max_retries",
        "retry_delay",
    )
    defaults = EngineConfig()
    overridden = [
        k for k in pinned if getattr(cfg, k) != getattr(defaults, k)
    ]
    if overridden:
        raise SystemExit(
            "config error: the engine pins the reference politeness budget; "
            f"cannot honor overrides of: {', '.join(overridden)} "
            "(remove the INI/env override)"
        )
    pages_per_wave = (
        args.pages_per_wave if args.pages_per_wave is not None
        else cfg.pages_per_wave
    )
    pages = args.pages
    if cfg.max_pages > 0:
        pages = min(pages, cfg.max_pages)
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
        pages=pages,
        pages_per_wave=pages_per_wave,
        image_keep_bytes=cfg.image_keep_bytes,
        listing_source=cfg.listing_source,
        n_host_buckets=cfg.host_buckets,
        hot_host_salts=cfg.hot_host_salts,
        download_selector=cfg.download_selector,
        posts_per_checkpoint=cfg.posts_per_checkpoint,
        vacuum_keep_last=cfg.vacuum_keep_last,
        image_dedup_every_waves=cfg.image_dedup_every_waves,
    )
    out = {"stats": result.stats,
           "virtual_seconds": result.virtual_seconds,
           "scope_virtual_seconds": result.scope_virtual_seconds,
           "waves": result.waves}
    if result.image_dedup is not None:
        out["image_dedup"] = result.image_dedup
    print(json.dumps(out, ensure_ascii=False))
    spark.stop()
    return 0


def cmd_status(args) -> int:
    from crawlspark.catalog import Catalog

    spark = _spark(args)
    cat = Catalog(args.workdir)
    out: dict = {"workdir": args.workdir, "tables": {}}
    for t in STATE_TABLES:
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


def cmd_vacuum(args) -> int:
    """Manual retention pass (the crawl lifecycle also vacuums on every
    commit when vacuum_keep_last > 0 — this command covers state written
    with retention disabled, or tightening retention after the fact)."""
    from crawlspark.catalog import Catalog

    cat = Catalog(args.workdir)
    out: dict = {}
    for t in STATE_TABLES:
        if cat.exists(t):
            out[t] = cat.vacuum(t, keep_last=args.keep_last)
    print(json.dumps({"workdir": args.workdir, "keep_last": args.keep_last,
                      "vacuumed": out}))
    return 0


def cmd_reset(args) -> int:
    """Drop EVERY table directory under the workdir — enumerated from the
    filesystem, not a hardcoded tuple, so a newly added state table (the
    round-5 dedup tables were once missed here) can never survive a reset
    and silently poison a re-crawl's anti-joins with stale state."""
    import os

    from crawlspark.catalog import Catalog

    cat = Catalog(args.workdir)
    if os.path.isdir(args.workdir):
        for t in sorted(os.listdir(args.workdir)):
            if os.path.isdir(os.path.join(args.workdir, t)):
                cat.drop(t)
    print(f"reset: cleared state under {args.workdir}")
    return 0


def export_posts(spark, workdir: str, out: str) -> int | None:
    """Export posts in the reference JSONL record shape, sorted by post_id
    (storage.py:53,65-82 field order). Returns the record count, or None if
    the posts table doesn't exist.

    Serializes executor-side: to_json over the record struct keeps the
    whole table off the driver (the old collect() loop pulled every post
    row through driver memory). Sorted single file only because the
    reference's JSONL is one sorted file — the repartition(1) is the
    explicit cost of that contract, not an accident."""
    from crawlspark.catalog import Catalog

    cat = Catalog(workdir)
    df = cat.read(spark, "posts")
    if df is None:
        return None
    rec = F.struct(
        F.col("url"),
        F.struct(
            F.col("meta.title").alias("title"),
            F.col("meta.author").alias("author"),
            F.col("meta.date").alias("date"),
        ).alias("meta"),
        F.col("body"),
        F.col("parsed_content"),
        F.col("file_sources"),
        F.col("crawl_timestamp"),
        F.col("post_id"),
        F.col("_download_summary"),
        F.col("has_download"),
        F.col("file_formats"),
    )
    n = df.count()
    lines = (
        df.select(
            F.col("post_id"),
            # keep nulls explicit like the old json.dumps record shape
            F.to_json(rec, {"ignoreNullFields": "false"}).alias("line"),
        )
        .repartition(1)
        .sortWithinPartitions("post_id")
        .select("line")
    )
    tmp_dir = out + ".spark_tmp"
    lines.write.mode("overwrite").text(tmp_dir)
    import glob
    import shutil

    parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*")))
    with open(out, "wb") as out_f:
        for p in parts:
            with open(p, "rb") as in_f:
                shutil.copyfileobj(in_f, out_f)
    shutil.rmtree(tmp_dir)
    return n


def text_blob_col():
    """S9 per-post text blob (crawler.py:503-516 _save_post_text):
    'Title: {title}\\n\\n{content}'."""
    return F.concat(
        F.lit("Title: "),
        F.coalesce(F.col("meta.title"), F.lit("")),
        F.lit("\n\n"),
        F.coalesce(F.col("parsed_content"), F.lit("")),
    )


def export_text_blobs(spark, workdir: str, out_dir: str) -> int | None:
    """S9 sink: one `<post_id>.txt` per post under `out_dir`, matching the
    reference's output/<post_id>/<post_id>.txt record shape. Files are
    written EXECUTOR-side via foreachPartition (each task writes its own
    partition's files to the shared FS) — no driver collect; the driver
    only receives the count."""
    from crawlspark.catalog import Catalog

    cat = Catalog(workdir)
    df = cat.read(spark, "posts")
    if df is None:
        return None
    os.makedirs(out_dir, exist_ok=True)
    blobs = df.select("post_id", text_blob_col().alias("blob"))
    # count in the same pass (accumulator) — a separate count() job would
    # re-scan posts and re-build every blob string just to count rows
    acc = spark.sparkContext.accumulator(0)

    def _write(rows):
        c = 0
        for r in rows:
            with open(
                os.path.join(out_dir, f"{r['post_id']}.txt"),
                "w",
                encoding="utf-8",
            ) as f:
                f.write(r["blob"])
            c += 1
        acc.add(c)

    blobs.foreachPartition(_write)
    return acc.value


def export_images(
    spark, workdir: str, out_dir: str, dedup: bool = False
) -> int | None:
    """S10 consumer: one `<out_dir>/<post_id>/image_<img_idx>.<fmt>` file
    per crawled image — the reference's on-disk image layout
    (crawler.py:573-596 naming). dedup=True additionally drops every
    non-keeper member of a phash near-dup cluster (the `image_clusters`
    table maintained by the incremental dedup pass) — content-level dedup
    the reference's URL-only seen set cannot express. Files are written
    EXECUTOR-side via foreachPartition; the driver only gets the count."""
    from crawlspark.catalog import Catalog

    cat = Catalog(workdir)
    df = cat.read(spark, "images")
    if df is None:
        return None
    if dedup:
        members = cat.read(spark, "image_clusters")
        if members is None:
            raise SystemExit(
                "export --dedup: no image_clusters table — run "
                "dedup-images (or crawl with image_dedup_every_waves) first"
            )
        dupes = members.filter(~F.col("is_keeper")).select("image_id")
        df = df.join(dupes, "image_id", "left_anti")
    sel = df.select("post_id", "img_idx", "fmt", "bytes").filter(
        F.col("bytes").isNotNull()
    )
    os.makedirs(out_dir, exist_ok=True)

    # count inside the write pass via an accumulator: the former separate
    # sel.count() job scanned the bytes-bearing images table a second time
    # (bytes sit in the projection, so the count job read them too). File
    # writes are idempotent (fixed path per image), so a retried task
    # re-writes the same files; the accumulator could then over-count, in
    # which case fall back on nothing — the count is reporting, the files
    # are the product.
    acc = spark.sparkContext.accumulator(0)

    def _write(rows):
        c = 0
        for r in rows:
            d = os.path.join(out_dir, r["post_id"])
            os.makedirs(d, exist_ok=True)
            name = f"image_{r['img_idx']}.{r['fmt']}"
            with open(os.path.join(d, name), "wb") as f:
                f.write(bytes(r["bytes"]))
            c += 1
        acc.add(c)

    sel.foreachPartition(_write)
    return acc.value


def cmd_export(args) -> int:
    spark = _spark(args)
    if args.shape == "text":
        n = export_text_blobs(spark, args.workdir, args.out)
    elif args.shape == "images":
        n = export_images(spark, args.workdir, args.out, dedup=args.dedup)
    else:
        n = export_posts(spark, args.workdir, args.out)
    if n is None:
        print("no posts table" if args.shape != "images" else
              "no images table", file=sys.stderr)
        return 1
    print(f"exported {n} records to {args.out}")
    spark.stop()
    return 0


def cmd_dedup_images(args) -> int:
    """Content-level image dedup over the workdir's images table (the
    reference dedups by URL only — crawler.py:560-573; this pass catches
    the same picture stored under different URLs via the phash emitted by
    the S5 decode stage)."""
    from crawlspark.imagededup import dedup_images

    spark = _spark(args)
    stats = dedup_images(spark, args.workdir, threshold=args.threshold,
                         vacuum_keep_last=args.keep_last)
    print(json.dumps({"workdir": args.workdir, **stats}))
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

    v = sub.add_parser(
        "vacuum", help="expire old snapshots + orphaned data dirs"
    )
    v.add_argument("--workdir", required=True)
    v.add_argument("--keep-last", type=int, default=2, dest="keep_last")
    v.set_defaults(fn=cmd_vacuum)

    e = sub.add_parser("export", help="export posts as reference-shape JSONL")
    e.add_argument("--workdir", required=True)
    e.add_argument("--out", required=True)
    e.add_argument(
        "--shape", choices=("jsonl", "text", "images"), default="jsonl",
        help="jsonl: storage.py record lines; text: one 'Title: ...' "
             "blob file per post (S9, crawler.py:503-516); images: "
             "<post_id>/image_<idx>.<fmt> files (S10, crawler.py:573-596)",
    )
    e.add_argument(
        "--dedup", action="store_true",
        help="images shape only: drop non-keeper near-dup cluster members "
             "(requires the image_clusters table from dedup-images)",
    )
    e.set_defaults(fn=cmd_export)

    d = sub.add_parser(
        "dedup-images",
        help="content-level image near-dup pass -> image_clusters table",
    )
    d.add_argument("--workdir", required=True)
    d.add_argument("--threshold", type=int, default=8,
                   help="max phash hamming distance for a near-dup pair")
    d.add_argument("--keep-last", type=int, default=8, dest="keep_last",
                   help="snapshot retention for the image_clusters commit")
    d.set_defaults(fn=cmd_dedup_images)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
