"""Retry/error parity — failed fetches retry up to MAX_FETCH_ATTEMPTS then
land in the errors table (S12), matching the sequential oracle byte-for-byte.

Reference semantics: retry <=3 with backoff (src/crawler/auth.py:91-108,
src/config.py:87-89 max_retries=3/retry_delay=5s), 5 s error backoff
(crawler.py:696), error records in the sink (storage.py:85-86,
legacy/crawler_legacy.py:920-940), errors counter (crawler.py:695).
"""

from __future__ import annotations

import pytest

from crawlspark.catalog import Catalog
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.oracle import run_oracle
from crawlspark.politeness import MAX_FETCH_ATTEMPTS
from crawlspark.schema import PAGE_STORE

# seed chosen so the draw contains BOTH failure modes (dead + recoverable
# flaky) and enough healthy posts — asserted by
# test_fixture_has_both_failure_modes
SPEC = SiteSpec(pages=4, posts_per_page=10, dead_rate=0.15, flaky_rate=0.2,
                seed=2)


@pytest.fixture(scope="module")
def site():
    return build_site(SPEC)


@pytest.fixture(scope="module")
def golden(site):
    return run_oracle(site)


@pytest.fixture(scope="module")
def engine(spark, site, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("crawl_retry"))
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    result = crawl(
        spark, store, SPEC.base_url, workdir, pages=SPEC.pages,
        pages_per_wave=2, run_id="r1",
    )
    return result, Catalog(workdir), spark


def test_fixture_has_both_failure_modes(site):
    fails = [t.fail_attempts for t in site.posts.values()]
    assert any(f >= MAX_FETCH_ATTEMPTS for f in fails), "no dead posts drawn"
    assert any(0 < f < MAX_FETCH_ATTEMPTS for f in fails), "no flaky posts"
    assert any(f == 0 for f in fails)


def test_stats_include_errors(engine, golden):
    result, _, _ = engine
    assert golden.stats["errors"] > 0
    assert result.stats == golden.stats


def test_errors_table_matches_oracle(engine, golden):
    _, cat, spark = engine
    rows = cat.read(spark, "errors").orderBy("page", "pos_in_page").collect()
    got = [
        {
            "url": r["url"],
            "post_id": r["post_id"],
            "page": r["page"],
            "pos_in_page": r["pos_in_page"],
            "error": r["error"],
            "attempts": r["attempts"],
        }
        for r in rows
    ]
    assert got == golden.errors


def test_dead_posts_visited_and_seen_but_not_stored(engine, golden):
    _, cat, spark = engine
    order = [
        (i, r["url"], r["page"], r["pos_in_page"])
        for i, r in enumerate(
            cat.read(spark, "crawl_order")
            .orderBy("page", "pos_in_page")
            .collect()
        )
    ]
    assert order == golden.crawl_order  # dead posts occupy visit slots
    seen = {r["url"] for r in cat.read(spark, "seen").collect()}
    assert seen == golden.seen  # dead URLs are marked seen (never re-tried)
    dead_urls = {e["url"] for e in golden.errors}
    posts = {r["url"] for r in cat.read(spark, "posts").collect()}
    assert not (dead_urls & posts)  # no record for a post that never served


def test_flaky_posts_recovered(engine, golden, site):
    """Posts that fail 1-2 attempts then succeed must produce records —
    provided they are reachable at all: a listing anchor whose title was
    blanked (empty_title_rate, crawler.py:179) is never extracted, so
    those posts are correctly absent from BOTH engine and oracle."""
    _, cat, spark = engine
    extractable = {
        href
        for anchors in site.listing
        for title, href in anchors
        if title.strip()
    }
    flaky = {
        t.url for t in site.posts.values()
        if 0 < t.fail_attempts < MAX_FETCH_ATTEMPTS
        and not t.expected_skipped
        and t.url in extractable
    }
    assert flaky
    posts = {r["url"] for r in cat.read(spark, "posts").collect()}
    assert flaky <= posts


def test_frontier_states_and_attempts(engine, site):
    _, cat, spark = engine
    fr = {r["url"]: r for r in cat.read(spark, "frontier").collect()}
    for t in site.posts.values():
        if t.url not in fr:
            continue  # dup listing slots collapse to first occurrence
        row = fr[t.url]
        if t.fail_attempts >= MAX_FETCH_ATTEMPTS:
            assert row["state"] == "error"
            assert row["attempt"] == MAX_FETCH_ATTEMPTS
        else:
            assert row["state"] == "done"
            assert row["attempt"] == t.fail_attempts + 1


def test_politeness_accounts_failed_attempts(engine, golden):
    """Each failed attempt costs one token + RETRY_DELAY virtual seconds."""
    result, _, _ = engine
    assert result.virtual_seconds == pytest.approx(golden.virtual_seconds)
    # sanity: the retry site is strictly slower than a failure-free clone
    clean = run_oracle(
        build_site(
            SiteSpec(
                pages=SPEC.pages,
                posts_per_page=SPEC.posts_per_page,
                dead_rate=0.0,
                flaky_rate=0.0,
            )
        )
    )
    assert golden.virtual_seconds > clean.virtual_seconds
