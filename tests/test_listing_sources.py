"""S1/S2/S3 listing sources — the REST API scan and the API→render fallback
must produce byte-for-byte the same crawl as the HTML render scan.

Reference: API-first listing legacy/crawler_legacy.py:235-282 (GET
/api/v1/community/posts?tab&subTab&page&size=30 → content[] → (title,
/community/{id})), render fallback legacy:285-311, dispatch legacy:313-319.
"""

from __future__ import annotations

import pytest

from crawlspark.catalog import Catalog
from crawlspark.driver import crawl
from crawlspark.fixtures import (
    SiteSpec,
    api_page_available,
    build_site,
    page_store_rows,
)
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE


def _order(cat: Catalog, spark):
    rows = (
        cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    )
    return [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]


def _run(spark, site, tmp_path, source: str):
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / f"crawl_{source}")
    res = crawl(
        spark, store, site.spec.base_url, wd, pages=site.spec.pages,
        run_id=f"src_{source}", listing_source=source,
    )
    return res, Catalog(wd)


def test_api_source_matches_oracle(spark, tmp_path):
    site = build_site(SiteSpec(pages=3, posts_per_page=10))
    golden = run_oracle(site)
    res, cat = _run(spark, site, tmp_path, "api")
    assert res.stats == golden.stats
    assert _order(cat, spark) == golden.crawl_order
    assert {r["url"] for r in cat.read(spark, "seen").collect()} == golden.seen
    assert res.virtual_seconds == pytest.approx(golden.virtual_seconds)


def test_auto_fallback_matches_oracle(spark, tmp_path):
    """Some pages lack API rows → 'auto' renders those pages (S3) and the
    final state is still identical to the oracle."""
    spec = SiteSpec(pages=5, posts_per_page=8, api_missing_rate=0.45, seed=7)
    site = build_site(spec)
    missing = [
        p for p in range(1, spec.pages + 1) if not api_page_available(spec, p)
    ]
    assert missing and len(missing) < spec.pages, "fallback not exercised"
    golden = run_oracle(site)
    res, cat = _run(spark, site, tmp_path, "auto")
    assert res.stats == golden.stats
    assert _order(cat, spark) == golden.crawl_order


def test_pure_api_mode_skips_missing_pages(spark, tmp_path):
    """'api' without fallback serves only API-available pages — the dispatch
    is real, not cosmetic."""
    spec = SiteSpec(pages=5, posts_per_page=8, api_missing_rate=0.45, seed=7)
    site = build_site(spec)
    n_avail = sum(
        api_page_available(spec, p) for p in range(1, spec.pages + 1)
    )
    res, _ = _run(spark, site, tmp_path, "api")
    assert res.stats["pages_processed"] == n_avail < spec.pages
