"""Engine vs sequential-oracle parity — the BASELINE correctness gate.

Byte-for-byte: crawl order, URL-seen set, JSONL record fields (incl. exact
download-summary strings), ordered image rows with caption equality and
decoded-pixel PSNR >= 40 dB for lossy formats, reference counter dict, and
politeness virtual-time under the same budget."""

from __future__ import annotations

import pytest

from crawlspark import codec
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE

SPEC = SiteSpec(pages=3, posts_per_page=10)


@pytest.fixture(scope="module")
def site():
    return build_site(SPEC)


@pytest.fixture(scope="module")
def golden(site):
    return run_oracle(site)


@pytest.fixture(scope="module")
def engine(spark, site, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("crawl"))
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    result = crawl(
        spark, store, SPEC.base_url, workdir, pages=SPEC.pages, run_id="t1"
    )
    from crawlspark.catalog import Catalog

    return result, Catalog(workdir), spark


def test_crawl_order_byte_for_byte(engine, golden):
    _, cat, spark = engine
    rows = (
        cat.read(spark, "crawl_order")
        .orderBy("page", "pos_in_page")
        .select("url", "page", "pos_in_page")
        .collect()
    )
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order


def test_seen_set_exact(engine, golden):
    _, cat, spark = engine
    seen = {r["url"] for r in cat.read(spark, "seen").collect()}
    assert seen == golden.seen


def test_records_match(engine, golden):
    _, cat, spark = engine
    rows = cat.read(spark, "posts").orderBy("post_id").collect()
    got = [
        {
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
        for r in rows
    ]
    assert got == golden.records


def test_images_match_and_psnr(engine, golden):
    _, cat, spark = engine
    rows = (
        cat.read(spark, "images")
        .orderBy("page", "pos_in_page", "img_idx")
        .collect()
    )
    gold = {g["image_id"]: g for g in golden.images}
    assert [r["image_id"] for r in rows] == [g["image_id"] for g in golden.images]
    for r in rows:
        g = gold[r["image_id"]]
        assert r["fmt"] == g["fmt"]
        assert r["caption"] == g["caption"], r["image_id"]
        assert r["phash"] == g["phash"], r["image_id"]
        assert r["ocr_text"] == g["ocr_text"], r["image_id"]
        assert bytes(r["bytes"]) == g["bytes"]
        # decoded-pixel invariant vs ground-truth pixels (BASELINE input_hint)
        truth_px = codec.synth_pixels(r["url"], g["w"], g["h"])
        dec = codec.decode_image(bytes(r["bytes"]), r["fmt"])
        p = codec.psnr(truth_px, dec)
        if r["fmt"].lower() in codec.LOSSY_FMTS:
            assert p >= 40.0, (r["image_id"], p)
        else:
            assert p == float("inf"), (r["image_id"], p)


def test_stats_and_politeness(engine, golden):
    result, _, _ = engine
    assert result.stats == golden.stats
    assert result.virtual_seconds == pytest.approx(golden.virtual_seconds)


def test_resume_equivalence(spark, site, golden, tmp_path_factory):
    """Run waves 1..2, then resume a fresh crawl() to completion: final state
    must equal the single-shot run (north rule: resumes exactly)."""
    from crawlspark.catalog import Catalog

    workdir = str(tmp_path_factory.mktemp("resume"))
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(spark, store, SPEC.base_url, workdir, pages=2, pages_per_wave=1,
          run_id="r1")
    result = crawl(spark, store, SPEC.base_url, workdir, pages=SPEC.pages,
                   pages_per_wave=1, run_id="r2")
    cat = Catalog(workdir)
    rows = (
        cat.read(spark, "crawl_order")
        .orderBy("page", "pos_in_page")
        .select("url", "page", "pos_in_page")
        .collect()
    )
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order
    assert result.stats == golden.stats
    assert result.virtual_seconds == pytest.approx(golden.virtual_seconds)
    seen = {r["url"] for r in cat.read(spark, "seen").collect()}
    assert seen == golden.seen


def test_idempotent_rerun(spark, site, tmp_path_factory):
    """Re-running a fully committed crawl adds zero new rows
    (reference analog: test_jsonl_storage.py:108-119)."""
    from crawlspark.catalog import Catalog

    workdir = str(tmp_path_factory.mktemp("idem"))
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(spark, store, SPEC.base_url, workdir, pages=SPEC.pages, run_id="i1")
    cat = Catalog(workdir)
    n_posts = cat.read(spark, "posts").count()
    n_images = cat.read(spark, "images").count()
    crawl(spark, store, SPEC.base_url, workdir, pages=SPEC.pages, run_id="i2")
    assert cat.read(spark, "posts").count() == n_posts
    assert cat.read(spark, "images").count() == n_images
