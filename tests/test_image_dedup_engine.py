"""Engine-side image dedup: phash near-dup pass over the crawled images
table -> image_clusters, via both the library call and the CLI subcommand.

The reference dedups images by URL only (crawler.py:560-573), so the same
picture under two URLs is stored twice; this pass catches it at content
level using the phash column the S5 decode stage already emitted. Fixture
sites synthesize distinct pixels per URL, so duplicates are planted by
appending shifted copies (phash XOR 5 = 2 bits inside band 0, hamming 2)
at a LATER page — the keeper must be the crawl-order-first original.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from crawlspark.catalog import Catalog
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.imagededup import dedup_images, image_cluster_members
from crawlspark.schema import PAGE_STORE


def _crawl_with_planted_copies(spark, workdir: str) -> int:
    spec = SiteSpec(pages=2, posts_per_page=6, seed=11)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(spark, store, spec.base_url, workdir, pages=spec.pages,
          run_id="imgdedup")
    cat = Catalog(workdir)
    imgs = cat.read(spark, "images")
    n = imgs.count()
    assert n > 0
    copies = imgs.select(
        F.concat(F.lit("copy_"), "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption",
        F.col("phash").bitwiseXOR(F.lit(5)).alias("phash"),
        "ocr_text", "post_id", "url", "img_idx",
        (F.col("page") + 1000).cast("int").alias("page"),
        "pos_in_page",
    )
    cat.append(spark, copies, "images", meta={"planted": True})
    return n


def test_dedup_images_clusters_and_keepers(spark, tmp_path):
    wd = str(tmp_path / "wd")
    n = _crawl_with_planted_copies(spark, wd)
    stats = dedup_images(spark, wd)
    assert stats["images"] == 2 * n
    # every original got exactly one copy; identical crawled images (if
    # any) can merge clusters, so clustered >= 2n is exact while the
    # cluster count is bounded by n
    assert stats["clustered"] == 2 * n
    assert stats["clusters"] <= n
    assert stats["duplicates"] == stats["clustered"] - stats["clusters"]

    cat = Catalog(wd)
    members = cat.read(spark, "image_clusters")
    rows = {r.image_id: r for r in members.collect()}
    for image_id, r in rows.items():
        if image_id.startswith("copy_"):
            orig = rows[image_id.removeprefix("copy_")]
            assert r.cluster == orig.cluster
            # the copy sits at page+1000: never the crawl-order keeper
            assert not r.is_keeper
    # exactly one keeper per cluster
    per_cluster = (
        members.groupBy("cluster")
        .agg(F.sum(F.col("is_keeper").cast("int")).alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in per_cluster)


def test_dedup_images_empty_workdir(spark, tmp_path):
    stats = dedup_images(spark, str(tmp_path / "nowhere"))
    assert stats == {"images": 0, "clustered": 0, "clusters": 0,
                     "duplicates": 0}


def test_threshold_zero_keeps_only_exact(spark, tmp_path):
    """threshold=0 must not pair the hamming-2 planted copies."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    imgs = Catalog(wd).read(spark, "images")
    members = image_cluster_members(imgs, threshold=0)
    assert members.filter(F.col("image_id").startswith("copy_")).count() == 0


def test_cli_dedup_images_and_status(spark, tmp_path, capsys, monkeypatch):
    from crawlspark import cli

    # the CLI builds its own session; point it at the test master and make
    # its get_spark reuse the active one instead of stopping it
    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    rc = cli.main(["dedup-images", "--workdir", wd])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["clustered"] > 0 and out["duplicates"] > 0
    rc = cli.main(["status", "--workdir", wd])
    assert rc == 0
    status = json.loads(capsys.readouterr().out)
    assert status["tables"]["image_clusters"]["rows"] == out["clustered"]
