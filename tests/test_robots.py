"""Robots cache + frontier filtering (engine addition, RFC 9309 prefix
semantics) and its integration with the crawl driver."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.robots import ROBOTS_SCHEMA, filter_allowed, parse_robots_txt


def test_parse_robots_txt():
    body = """
# comment
User-agent: other
Disallow: /x

User-agent: *
Disallow: /private
Allow: /private/pub
Disallow: /tmp
"""
    rows = parse_robots_txt("h.example.com", body, wave=1)
    assert rows == [
        ("h.example.com", "/private", False, 1),
        ("h.example.com", "/private/pub", True, 1),
        ("h.example.com", "/tmp", False, 1),
    ]


def test_filter_allowed_longest_prefix(spark):
    robots = spark.createDataFrame(
        [
            ("h.example.com", "/private", False, 0),
            ("h.example.com", "/private/pub", True, 0),
            ("h.example.com", "/tmp", False, 0),
        ],
        ROBOTS_SCHEMA,
    )
    cand = spark.createDataFrame(
        [
            ("https://h.example.com/open/1",),  # no rule -> allowed
            ("https://h.example.com/private/secret",),  # disallow
            ("https://h.example.com/private/pub/ok",),  # longest prefix: allow
            ("https://h.example.com/tmp/x",),  # disallow
            ("https://other.example.com/private/x",),  # unknown host -> allowed
        ],
        "url string",
    )
    got = {r["url"] for r in filter_allowed(cand, robots).collect()}
    assert got == {
        "https://h.example.com/open/1",
        "https://h.example.com/private/pub/ok",
        "https://other.example.com/private/x",
    }


def test_filter_allowed_keeps_duplicate_occurrences(spark):
    """Duplicate URL occurrences within a wave band (cross-page dups) must
    ALL survive robots filtering, preserving (page, link_pos) identity — the
    old per-url window collapsed them to one arbitrary row, corrupting crawl
    order before first_occurrence could pick the structurally-first one."""
    robots = spark.createDataFrame(
        [("h.example.com", "/private", False, 0)], ROBOTS_SCHEMA
    )
    cand = spark.createDataFrame(
        [
            ("https://h.example.com/post/1", 1, 0),
            ("https://h.example.com/post/1", 1, 3),  # same url, same page
            ("https://h.example.com/post/1", 2, 1),  # same url, other page
            ("https://h.example.com/private/x", 1, 2),
        ],
        "url string, page int, link_pos int",
    )
    got = sorted(
        (r["url"], r["page"], r["link_pos"])
        for r in filter_allowed(cand, robots).collect()
    )
    assert got == [
        ("https://h.example.com/post/1", 1, 0),
        ("https://h.example.com/post/1", 1, 3),
        ("https://h.example.com/post/1", 2, 1),
    ]


def test_driver_respects_robots(spark, tmp_path):
    """A disallow rule for /community blocks every post fetch: zero posts,
    zero seen entries — disallowed URLs are never visited NOR marked seen."""
    from crawlspark.catalog import Catalog
    from crawlspark.driver import crawl
    from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
    from crawlspark.schema import PAGE_STORE

    spec = SiteSpec(pages=2, posts_per_page=5)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    robots = spark.createDataFrame(
        [("weolbu.example.com", "/community/", False, 0)], ROBOTS_SCHEMA
    )
    wd = str(tmp_path / "robots_run")
    res = crawl(spark, store, spec.base_url, wd, pages=2, robots_df=robots,
                run_id="rb")
    assert res.stats["posts_processed"] == 0
    cat = Catalog(wd)
    seen = cat.read(spark, "seen")
    assert seen is None or seen.count() == 0


def test_frontier_table_partitioned_by_host_bucket(spark, tmp_path):
    from crawlspark.catalog import Catalog
    from crawlspark.driver import crawl
    from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
    from crawlspark.schema import PAGE_STORE

    spec = SiteSpec(pages=2, posts_per_page=5)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "frontier_run")
    crawl(spark, store, spec.base_url, wd, pages=2, run_id="fr",
          hot_hosts=["weolbu.example.com"])
    cat = Catalog(wd)
    fr = cat.read(spark, "frontier")
    rows = fr.collect()
    assert len(rows) > 0
    assert all(r["state"] == "done" for r in rows)
    assert all(r["host"] == "weolbu.example.com" for r in rows)
    assert len({r["salt"] for r in rows}) > 1  # hot-host salting fans out
    # physical layout: one directory per host_bucket value
    import os

    snap = cat.current_snapshot("frontier")
    assert any(d.startswith("host_bucket=") for d in os.listdir(snap))

def test_robots_fetched_from_store_and_cached_with_ttl(spark, tmp_path):
    """North-rule robots caching: the driver fetches robots.txt from the
    page store, commits the parsed rules to the `robots` table, refreshes
    on the TTL, and the crawl honors the rules — matching the oracle's
    longest-prefix semantics on the same site (disallowed posts never
    visited nor marked seen)."""
    from crawlspark.catalog import Catalog
    from crawlspark.driver import crawl
    from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
    from crawlspark.oracle import run_oracle
    from crawlspark.schema import PAGE_STORE

    spec = SiteSpec(
        pages=4, posts_per_page=6, seed=13,
        robots_rules=(("/community/101", False), ("/community/1013", True)),
    )
    site = build_site(spec)
    golden = run_oracle(site)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "robots_cache")
    result = crawl(spark, store, spec.base_url, wd, pages=4,
                   pages_per_wave=1, run_id="rc", robots_ttl_waves=2)

    # parity with the oracle under the same robots rules
    assert result.stats == golden.stats
    cat = Catalog(wd)
    rows = cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order
    seen = {r["url"] for r in cat.read(spark, "seen").collect()}
    assert seen == golden.seen
    # the disallow actually bit (1010..1019 except the 1013 Allow override)
    blocked = {u for u in seen if "/community/101" in u}
    assert blocked <= {f"{spec.base_url}/community/1013"}

    # cache bookkeeping: parsed rules committed, TTL refresh at wave 3
    robots = cat.read(spark, "robots").collect()
    assert {(r["rule"], r["allow"]) for r in robots} == {
        ("/community/101", False), ("/community/1013", True),
    }
    fetch_waves = [e["wave"] for e in cat.log("robots") if "wave" in e]
    assert fetch_waves == [1, 3]  # ttl=2 over 4 single-page waves
