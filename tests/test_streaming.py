"""Structured Streaming wrapper parity — frontier bands arriving as a file
stream produce, wave by wave (one micro-batch each), exactly the state the
batch driver and the sequential oracle produce.

Covers SURVEY §2.8: unbounded source (the stream), monotone URL-seen state,
page-cursor checkpointing (stream checkpoint + catalog waves), and
politeness virtual-time carried across micro-batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.catalog import Catalog
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE
from crawlspark.streaming import stream_crawl

SPEC = SiteSpec(pages=4, posts_per_page=8)


@pytest.fixture(scope="module")
def site():
    return build_site(SPEC)


@pytest.fixture(scope="module")
def golden(site):
    return run_oracle(site)


def _write_band(spark, stream_dir: str, name: str, pages: list[int]) -> None:
    """Land one parquet file in the watched directory (the file source does
    not recurse, so write to a staging dir and move the part file in)."""
    import glob
    import os
    import shutil

    staging = f"{stream_dir}__staging_{name}"
    spark.createDataFrame([(p,) for p in pages], "page int").coalesce(
        1
    ).write.mode("overwrite").parquet(staging)
    os.makedirs(stream_dir, exist_ok=True)
    (part,) = glob.glob(f"{staging}/part-*.parquet")
    shutil.move(part, f"{stream_dir}/{name}.parquet")
    shutil.rmtree(staging)


def test_stream_crawl_matches_oracle(spark, site, golden, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    stream_dir = str(base / "frontier_in")
    workdir = str(base / "catalog")
    ckpt = str(base / "stream_ckpt")
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)

    # two stream "arrivals": pages 1-2, then (after a restart) pages 3-4 —
    # each availableNow run drains what has arrived as one micro-batch/wave
    _write_band(spark, stream_dir, "band1", [1, 2])
    stream_crawl(
        spark, stream_dir, store, SPEC.base_url, workdir, ckpt, run_id="s1"
    )
    cat = Catalog(workdir)
    mid_pages = cat.read(spark, "metrics").agg(
        F.sum("pages_processed")
    ).collect()[0][0]
    assert mid_pages == 2  # first arrival processed alone

    _write_band(spark, stream_dir, "band2", [3, 4])
    stream_crawl(
        spark, stream_dir, store, SPEC.base_url, workdir, ckpt, run_id="s1"
    )

    # final state == oracle, byte-for-byte
    rows = (
        cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    )
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order
    assert {r["url"] for r in cat.read(spark, "seen").collect()} == golden.seen

    m = cat.read(spark, "metrics").agg(
        *[
            F.sum(c).alias(c)
            for c in (
                "pages_processed", "posts_processed", "posts_skipped",
                "posts_with_downloads", "files_processed", "errors",
            )
        ],
        F.sum("virtual_seconds").alias("virtual_seconds"),
    ).collect()[0]
    assert {k: int(m[k]) for k in golden.stats} == golden.stats
    assert float(m["virtual_seconds"]) == pytest.approx(golden.virtual_seconds)

    # wave ids are the stream's batch ids — exactly-once bookkeeping
    waves = sorted(
        r["wave"]
        for r in cat.read(spark, "checkpoints").select("wave").distinct().collect()
    )
    assert waves == [1, 2]
