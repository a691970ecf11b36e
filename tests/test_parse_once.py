"""The wave hot path evaluates the listing-parse lineage exactly once.

VERDICT r3 "What's wrong" #1: the bloom's bucket-discovery collect plus the
definitely-new/confirmed-new union branches re-ran the Arrow listing parse
~3x per wave. driver._run_wave now caches the pre-bloom frame; this test
pins that down by counting actual parse executions (per-batch row trace
captured in the UDF closure — see parse.set_parse_trace)."""

from __future__ import annotations

import pytest

from crawlspark import parse
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.schema import PAGE_STORE

SPEC = SiteSpec(pages=4, posts_per_page=6)


def _trace_sum(trace_dir, kind: str) -> int:
    return sum(
        int(p.read_text())
        for p in trace_dir.iterdir()
        if p.name.startswith(f"{kind}-")
    )


@pytest.fixture()
def traced_parse(tmp_path):
    trace = tmp_path / "parse-trace"
    trace.mkdir()
    parse.set_parse_trace(str(trace))
    try:
        yield trace
    finally:
        parse.set_parse_trace(None)


def test_listing_parse_once_per_wave(spark, tmp_path, traced_parse):
    site = build_site(SPEC)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(
        spark, store, SPEC.base_url, str(tmp_path / "wd"),
        pages=SPEC.pages, pages_per_wave=2, run_id="trace1",
    )
    # 4 listing pages over 2 waves: each page's HTML goes through the parse
    # UDF exactly once. Before the pre-bloom cache this was ~3x (bucket
    # collect + each seen-filter union branch re-ran the lineage).
    assert _trace_sum(traced_parse, "page") == SPEC.pages


def test_post_parse_bounded_per_wave(spark, tmp_path, traced_parse):
    site = build_site(SPEC)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    result = crawl(
        spark, store, SPEC.base_url, str(tmp_path / "wd"),
        pages=SPEC.pages, run_id="trace2",
    )
    # every alive post parses exactly once (fetched is cached before the
    # post parse; all consumers read that cache)
    n_alive = result.stats["posts_processed"] + result.stats["posts_skipped"]
    assert _trace_sum(traced_parse, "post") == n_alive
