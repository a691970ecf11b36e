"""CLI JSONL export parity: the executor-side to_json export must byte-for-
record match the oracle's storage.py:65-82 record shape, sorted by post_id,
with null fields kept explicit — and never collect() the posts table."""

from __future__ import annotations

import json

from crawlspark.cli import export_posts
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE


def test_export_matches_oracle_records(spark, tmp_path):
    spec = SiteSpec(pages=3, posts_per_page=8, seed=7)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "exp_run")
    crawl(spark, store, spec.base_url, wd, pages=3, run_id="exp")
    out = str(tmp_path / "posts.jsonl")
    n = export_posts(spark, wd, out)

    golden = run_oracle(site).records
    with open(out, encoding="utf-8") as f:
        got = [json.loads(line) for line in f]
    assert n == len(got) == len(golden)
    assert got == golden  # order (post_id-sorted) and every field, incl nulls


def test_export_missing_table_returns_none(spark, tmp_path):
    assert export_posts(spark, str(tmp_path / "nope"), str(tmp_path / "o")) is None


def test_export_text_blobs_matches_reference_shape(spark, tmp_path):
    """S9 (crawler.py:503-516): one '<post_id>.txt' per post containing
    'Title: {title}\\n\\n{content}', written executor-side."""
    import os

    from crawlspark.cli import export_text_blobs

    spec = SiteSpec(pages=2, posts_per_page=8, seed=9)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "blob_run")
    crawl(spark, store, spec.base_url, wd, pages=2, run_id="b1")
    out = str(tmp_path / "blobs")
    n = export_text_blobs(spark, wd, out)

    golden = run_oracle(site).records
    assert n == len(golden)
    for g in golden:
        path = os.path.join(out, f"{g['post_id']}.txt")
        with open(path, encoding="utf-8") as f:
            assert f.read() == (
                f"Title: {g['meta']['title']}\n\n{g['parsed_content']}"
            )
