"""S6 attachment payload fetch parity — the engine's `files` table must
match the sequential oracle per-attachment: url, filename, normalized fmt,
payload size, sha256 (byte equality), and the JVM-extracted text body
(reference: crawler.py:467-501 download + legacy:743-777 parse_file)."""

from __future__ import annotations

import pytest

from crawlspark import codec
from crawlspark.catalog import Catalog
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.legacy_records import to_legacy_records
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE

SPEC = SiteSpec(pages=3, posts_per_page=10, seed=5)


@pytest.fixture(scope="module")
def site():
    return build_site(SPEC)


@pytest.fixture(scope="module")
def golden(site):
    return run_oracle(site)


@pytest.fixture(scope="module")
def engine(spark, site, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("files_run"))
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    result = crawl(spark, store, SPEC.base_url, wd, pages=SPEC.pages,
                   pages_per_wave=2, run_id="f1")
    return result, Catalog(wd), spark


def test_files_table_matches_oracle(engine, golden):
    _, cat, spark = engine
    assert golden.files, "fixture drew no fetchable attachments"
    rows = cat.read(spark, "files").collect()
    got = {
        r["file_id"]: (
            r["post_id"], r["url"], r["filename"], r["fmt"],
            r["size"], r["sha256"], r["content"],
        )
        for r in rows
    }
    want = {
        f["file_id"]: (
            f["post_id"], f["url"], f["filename"], f["fmt"],
            f["size"], f["sha256"], f["content"],
        )
        for f in golden.files
    }
    assert got == want


def test_file_payload_bytes_roundtrip(golden):
    """sha256 equality above is byte equality; spot-check the codec
    round-trip explicitly: encode_doc(url) -> decode_doc == stored content."""
    for f in golden.files[:10]:
        payload = codec.encode_doc(f["url"], f["fmt"])
        assert len(payload) == f["size"]
        assert codec.decode_doc(payload, f["fmt"]) == f["content"]


def test_extract_records_carry_payload_text(engine, golden):
    """*_extract legacy records for fetchable links carry the extracted
    text body, not the stub."""
    _, cat, spark = engine
    recs = to_legacy_records(spark, cat).filter(
        "type like '%_extract'"
    ).collect()
    by_src = {(r["post_id"], r["src"]): r["content"] for r in recs}
    for f in golden.files:
        assert by_src[(f["post_id"], f["url"])] == f["content"]
    # keyword-only anchors (no payload) keep the deterministic stub
    stubs = [r for r in recs if r["content"].startswith("[")]
    for r in stubs:
        assert "extract of" in r["content"]


def test_files_merge_idempotent(engine, golden, site, spark, tmp_path):
    """Re-crawling the same workdir must not duplicate file rows."""
    _, cat, _ = engine
    n1 = cat.read(spark, "files").count()
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(spark, store, SPEC.base_url, cat.root, pages=SPEC.pages,
          pages_per_wave=2, run_id="f2")
    assert cat.read(spark, "files").count() == n1 == len(golden.files)
