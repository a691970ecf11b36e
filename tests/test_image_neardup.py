"""Image-axis near-dup ops: phash band-LSH pairs, clusters, caption dedup.

The contract queries (img_phash_neardup / img_phash_clusters /
img_caption_quality_dedup) are value-hashed against DuckDB by the driver;
these tests pin the properties the oracle comparison cannot express:
- the planted near/exact pairs are found with the exact hamming distances;
- the all-band-straddling plant is a REAL near-dup (brute-force hamming 4)
  that band LSH provably misses — the documented recall bound;
- phash_neardup_pairs is generic: applied to the ENGINE's crawled images
  table (a shifted-copy plant), every original pairs with its copy;
- NULL phashes (failed decodes) never reach the band stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.pipeline_ops import (
    PHASH_HAM_T,
    _STRADDLE_MASK,
    img_caption_quality_dedup,
    img_phash_clusters,
    img_phash_neardup,
    phash_neardup_pairs,
    synth_images,
)

SF_DIR = "/root/testdata/sf0.001"


def test_planted_pairs_found_with_exact_hamming(spark):
    pairs = {
        (r.img_a, r.img_b): r.hamming
        for r in img_phash_neardup(spark, SF_DIR).collect()
    }
    anchors = [i for i in range(0, 500, 40) if i + 2 < 500]
    assert anchors, "fixture must contain planted triples"
    for i in anchors:
        assert pairs[(i, i + 1)] == 3  # 3 bits flipped inside band 0
        assert pairs[(i, i + 2)] == 0  # exact duplicate
        assert pairs[(i + 1, i + 2)] == 3
    # no pair ever exceeds the threshold
    assert all(h <= PHASH_HAM_T for h in pairs.values())


def test_straddle_plant_is_the_lsh_recall_bound(spark):
    """Image 7 carries phash(0) with one bit flipped per 16-bit band:
    a true near-dup (hamming 4 <= T) that shares no band with image 0.
    Band LSH must NOT report it; a threshold-only brute force must."""
    imgs = synth_images(spark, SF_DIR)
    ph = {r.image_id: r.phash for r in imgs.filter("image_id IN (0, 7)").collect()}
    assert ph[7] == ph[0] ^ _STRADDLE_MASK
    assert bin(ph[0] ^ ph[7]).count("1") == 4  # a real near-dup at T=8
    lsh = img_phash_neardup(spark, SF_DIR)
    assert lsh.filter("img_a = 0 AND img_b = 7").count() == 0


def test_clusters_collapse_planted_triples(spark):
    rows = img_phash_clusters(spark, SF_DIR).collect()
    cluster = {r.image_id: r.cluster for r in rows}
    for i in range(0, 500, 40):
        if i + 2 < 500:
            assert cluster[i] == cluster[i + 1] == cluster[i + 2] == i
    # every clustered node belongs to some pair (no isolated labels)
    assert set(cluster) == {
        x
        for r in img_phash_neardup(spark, SF_DIR).collect()
        for x in (r.img_a, r.img_b)
    }


def test_caption_dedup_normalizes_variants_and_gates(spark):
    out = {
        r.caption_norm: r
        for r in img_caption_quality_dedup(spark, SF_DIR).collect()
    }
    # the empty-caption group is gated out entirely
    assert "" not in out
    # variants (upper / double-space) normalized into one group per base
    base = "a photo of item 0 on display"
    r = out[base]
    # images 0, 120, 240, 360, 480 share caption base 0; 0 and 480 hit the
    # %17 empty-caption plant? 0%17==0 -> empty, others not
    members = [i for i in range(0, 500) if i % 120 == 0 and i % 17 != 0]
    passing = [
        i for i in members if i % 11 != 0 and i % 13 != 0
    ]
    assert r.n_total == len(members)
    assert r.n_pass == len(passing)
    assert r.keeper_id == min(passing)


def test_generic_pairs_on_engine_images_table(spark, tmp_path):
    """phash_neardup_pairs over the CRAWL's images table: union the real
    crawled images with a copy whose phash has 2 bits flipped inside band
    0 — every original must pair with exactly its copy at hamming 2."""
    from crawlspark.catalog import Catalog
    from crawlspark.driver import crawl
    from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
    from crawlspark.schema import PAGE_STORE

    spec = SiteSpec(pages=2, posts_per_page=6, seed=11)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "wd")
    crawl(spark, store, spec.base_url, wd, pages=spec.pages, run_id="imgdup")
    imgs = Catalog(wd).read(spark, "images").select("image_id", "phash")
    n = imgs.count()
    assert n > 0
    shifted = imgs.select(
        F.concat(F.lit("copy:"), "image_id").alias("image_id"),
        F.col("phash").bitwiseXOR(F.lit(5)).alias("phash"),  # 2 bits, band 0
    )
    pairs = phash_neardup_pairs(imgs.unionByName(shifted), threshold=4)
    got = {(r.img_a, r.img_b, r.hamming) for r in pairs.collect()}
    expected = set()
    for r in imgs.collect():
        a, b = sorted([r.image_id, "copy:" + r.image_id])
        expected.add((a, b, 2))
    # every original<->copy pair found at hamming 2; identical crawled
    # images (if any) may add extra hamming-0 pairs, so use superset
    assert expected <= got
    assert len(expected) == n


def test_null_phash_rows_are_dropped(spark):
    df = spark.createDataFrame(
        [("a", 7), ("b", None), ("c", 7)], "image_id string, phash long"
    )
    got = phash_neardup_pairs(df).collect()
    assert [(r.img_a, r.img_b, r.hamming) for r in got] == [("a", "c", 0)]
