"""P16 network-log strategy + strategy-0 user selector (round-3 items).

The reference's browser detect path has two inputs the rendered-HTML union
couldn't see before: Chrome performance logs (download_detector.py:333-349,
CDN doc requests merged behind the download-button gate) and a user-supplied
CSS selector (py:286-306, has_download only). Fixtures emit both; engine and
sequential oracle must agree byte-for-byte on the resulting records/files.
"""

from __future__ import annotations

import re

import pytest

from crawlspark import ops
from crawlspark.config import EngineConfig
from crawlspark.driver import crawl
from crawlspark.fixtures import (
    CUSTOM_BADGE_HTML,
    CUSTOM_BADGE_SELECTOR,
    SiteSpec,
    affordance_fires,
    build_site,
    netlog_doc_fmt,
    page_store_rows,
    render_post_html,
)
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE

SPEC = SiteSpec(
    pages=3, posts_per_page=12, seed=7, netlog_rate=0.6, custom_badge_rate=0.4
)


@pytest.fixture(scope="module")
def site():
    return build_site(SPEC)


@pytest.fixture(scope="module")
def golden(site):
    return run_oracle(site, download_selector=CUSTOM_BADGE_SELECTOR)


@pytest.fixture(scope="module")
def engine(spark, site, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("detect_extras"))
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(
        spark, store, SPEC.base_url, workdir, pages=SPEC.pages, run_id="dx1",
        download_selector=CUSTOM_BADGE_SELECTOR,
    )
    from crawlspark.catalog import Catalog

    return Catalog(workdir), spark


def _good_netlog_urls(truth):
    return [
        u
        for method, u in truth.netlog_entries
        if method == "Network.requestWillBeSent" and netlog_doc_fmt(u)
    ]


def test_fixture_exercises_all_cases(site):
    """The spec rates must actually produce every case the strategies gate
    on — otherwise the parity below is vacuous."""
    badge_only = netlog_merged = netlog_ignored = 0
    for truth in site.posts.values():
        good = _good_netlog_urls(truth)
        if truth.custom_badge:
            # badge posts that no other strategy detects
            html = render_post_html(site, truth)
            base_has, _, _ = _oracle_detect(html, truth)
            if not base_has:
                badge_only += 1
        if good and affordance_fires(truth.dom_affordance, truth.notice_lines):
            netlog_merged += 1
        if good and not affordance_fires(
            truth.dom_affordance, truth.notice_lines
        ):
            netlog_ignored += 1
    assert badge_only >= 1
    assert netlog_merged >= 1
    assert netlog_ignored >= 1


def _oracle_detect(html, truth):
    from crawlspark.fixtures import render_netlog_json
    from crawlspark.oracle import _content, _detect_downloads

    netlog = render_netlog_json(truth) if truth.netlog_entries else None
    return _detect_downloads(html, _content(html), netlog, None)


def test_records_parity(engine, golden):
    cat, spark = engine
    rows = cat.read(spark, "posts").orderBy("post_id").collect()
    got = [
        {
            "post_id": r["post_id"],
            "has_download": r["has_download"],
            "file_formats": list(r["file_formats"]),
            "file_sources": list(r["file_sources"]),
            "_download_summary": r["_download_summary"],
        }
        for r in rows
    ]
    want = [
        {
            "post_id": g["post_id"],
            "has_download": g["has_download"],
            "file_formats": g["file_formats"],
            "file_sources": g["file_sources"],
            "_download_summary": g["_download_summary"],
        }
        for g in golden.records
    ]
    assert got == want


def test_files_parity(engine, golden):
    """Netlog-discovered docs flow through the payload join: file rows match
    the oracle's synthesized set including content hashes."""
    cat, spark = engine
    rows = cat.read(spark, "files").collect()
    got = {(r["file_id"], r["url"], r["fmt"], r["sha256"]) for r in rows}
    want = {(g["file_id"], g["url"], g["fmt"], g["sha256"]) for g in golden.files}
    assert got == want
    # the netlog path contributed at least one file
    assert any("/net/pack_" in u for _, u, _, _ in want)


def test_selector_gates_detection(site, golden):
    """Without download_selector the badge-only posts are NOT detected; with
    it they are — and nothing else changes."""
    base = run_oracle(site)  # no selector
    by_id = {r["post_id"]: r for r in base.records}
    flipped = [
        r["post_id"]
        for r in golden.records
        if r["has_download"] and not by_id[r["post_id"]]["has_download"]
    ]
    assert flipped, "selector never made a difference — fixture too weak"
    for pid in flipped:
        assert site.posts[pid].custom_badge
        # selector adds no links/formats (reference strategy 0 shape)
        assert golden.records[0] is not None
        g = next(r for r in golden.records if r["post_id"] == pid)
        b = by_id[pid]
        assert g["file_formats"] == b["file_formats"]
        assert g["file_sources"] == b["file_sources"]


def test_netlog_requires_affordance(site, golden):
    """CDN doc requests in the log merge ONLY when download buttons fired."""
    recs = {r["post_id"]: r for r in golden.records}
    checked_gated = checked_merged = False
    for truth in site.posts.values():
        good = _good_netlog_urls(truth)
        if not good or truth.post_id not in recs:
            continue
        sources = recs[truth.post_id]["file_sources"]
        if not affordance_fires(truth.dom_affordance, truth.notice_lines):
            assert not any(u in sources for u in good), truth.post_id
            checked_gated = True
        else:
            assert all(u in sources for u in good), truth.post_id
            checked_merged = True
    assert checked_gated and checked_merged


def test_selector_to_regex_units():
    pat = re.compile(ops.selector_to_regex(CUSTOM_BADGE_SELECTOR))
    assert pat.search(CUSTOM_BADGE_HTML)
    # class order in the attribute must not matter
    assert pat.search('<span class="asset-badge vip-extra">x</span>')
    # exact token match: superstring classes must not match
    assert not pat.search('<span class="vip-extra2 asset-badge">x</span>')
    assert not pat.search('<span class="vip-extra asset-badge-lg">x</span>')
    # wrong tag / missing class
    assert not pat.search('<div class="vip-extra asset-badge">x</div>')
    assert not pat.search('<span class="vip-extra">x</span>')
    # bare-tag selector
    assert re.compile(ops.selector_to_regex("div > button")).search(
        "<button onclick=x>y</button>"
    )
    # unsupported simple-selector syntax must fail LOUDLY, not compile a
    # never-matching pattern
    with pytest.raises(ValueError, match="unsupported simple selector"):
        ops.selector_to_regex("div#download-btn")
    with pytest.raises(ValueError, match="unsupported simple selector"):
        ops.selector_to_regex('a[href$=".pdf"]')
    with pytest.raises(ValueError, match="unsupported simple selector"):
        ops.selector_to_regex("span:contains(다운로드)")


def test_config_knob_threads():
    cfg = EngineConfig.load(
        env={
            "CRAWLSPARK_DOWNLOAD_SELECTOR": "span.vip-extra.asset-badge",
            "CRAWLSPARK_POSTS_PER_CHECKPOINT": "3",
        }
    )
    assert cfg.download_selector == "span.vip-extra.asset-badge"
    assert cfg.posts_per_checkpoint == 3
    assert EngineConfig().download_selector == ""
    assert EngineConfig().posts_per_checkpoint == 0
    with pytest.raises(ValueError):
        EngineConfig.load(env={"CRAWLSPARK_POSTS_PER_CHECKPOINT": "-1"})
