"""Legacy v5 typed-record stream (legacy/crawler_legacy.py record shapes):
structure, typing, ordering, the default-to-pptx heuristic, and error
records — reconstructed relationally from the engine's committed tables.
"""

from __future__ import annotations

import pytest

from crawlspark.catalog import Catalog
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.legacy_records import to_legacy_records
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE

SPEC = SiteSpec(pages=3, posts_per_page=10, dead_rate=0.1, seed=11)


@pytest.fixture(scope="module")
def state(spark, tmp_path_factory):
    site = build_site(SPEC)
    golden = run_oracle(site)
    wd = str(tmp_path_factory.mktemp("legacy"))
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(spark, store, SPEC.base_url, wd, pages=SPEC.pages, run_id="lg")
    recs = to_legacy_records(spark, Catalog(wd)).collect()
    return site, golden, recs


def test_every_post_has_core_records(state):
    _, golden, recs = state
    by_pid: dict[str, list] = {}
    for r in recs:
        by_pid.setdefault(r["post_id"], []).append(r)
    for g in golden.records:
        types = [r["type"] for r in by_pid[g["post_id"]]]
        assert "post_info" in types
        assert "text_content" in types
        assert ("download_info" in types) == g["has_download"]


def test_image_records_ordered(state):
    _, golden, recs = state
    got = [
        (r["post_id"], r["idx"], r["src"])
        for r in recs
        if r["type"] == "image"
    ]
    want = [(g["post_id"], g["img_idx"], g["url"]) for g in golden.images]
    assert got == want  # legacy emission order == oracle image order


def test_extract_records_per_link_with_pptx_default(state):
    _, golden, recs = state
    extracts = [r for r in recs if r["type"].endswith("_extract")]
    n_links = sum(len(g["file_sources"]) for g in golden.records)
    assert len(extracts) == n_links > 0
    fetched = {(f["post_id"], f["url"]): f["content"] for f in golden.files}
    for r in extracts:
        fmt = r["type"].removesuffix("_extract")
        key = (r["post_id"], r["src"])
        if key in fetched:
            # S6: fetchable links carry the payload-extracted text body
            assert r["content"] == fetched[key]
        else:
            # unfetchable (keyword-only) links keep the deterministic stub
            assert r["content"].startswith(f"[{fmt} extract of ")
        assert r["file_formats"] == [fmt]
    assert fetched, "fixture drew no fetchable attachments"
    # keyword-only anchors (javascript:void(0)) take the legacy pptx default
    kw = [r for r in extracts if r["src"] == "javascript:void(0)"]
    assert all(r["type"] == "pptx_extract" for r in kw)


def test_error_records(state):
    _, golden, recs = state
    errs = [(r["post_id"], r["content"]) for r in recs if r["type"] == "error"]
    assert sorted(errs) == sorted(
        (e["post_id"], e["error"]) for e in golden.errors
    )
    assert errs  # the spec draws dead posts


def test_stream_is_globally_ordered(state):
    _, _, recs = state
    keys = [
        (r["page"], r["pos_in_page"], r["type_rank"], r["idx"] or 0)
        for r in recs
    ]
    assert keys == sorted(keys)
