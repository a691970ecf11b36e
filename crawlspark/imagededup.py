"""Engine-side image near-dup pass over the crawl's `images` table.

The reference crawler dedups images only by URL (crawler.py:560-573 ordered
first-occurrence over src attributes) — two posts embedding the SAME picture
under different CDN URLs are stored twice. This pass closes that gap at the
content level: the S5 decode stage already emitted a 64-bit perceptual hash
per image (imageops.py), so near-dup detection is pure scalar relational
work — band LSH over the int64 phash, connected components, one keeper per
cluster by deterministic crawl order — and the image BYTES never move again.

Output is a derived `image_clusters` table (full-replace commit — it is
recomputable from `images` at any time, so it carries no incremental
state): one row per image that belongs to a near-dup cluster, with the
cluster label and whether this image is the cluster's keeper. Images with
no near-dup are absent (the common case at any scale — keeping the table
to duplicate rows only keeps it O(dup rate), not O(corpus)).

Scale shape (100 TB of crawled images):
- the input scan prunes to (image_id, phash, page, pos_in_page, img_idx) —
  the binary `bytes` column stays on disk;
- phash_neardup_pairs shuffles 4 scalar rows per image and generates pairs
  inside the grouped band arrays (no join, no O(n^2) path);
- cluster_from_pairs shuffles only (id, label) pairs per round, rounds
  bounded by component diameter (dense near-dup cliques -> a few rounds),
  lineage truncated with localCheckpoint;
- keeper election is one window over cluster members ONLY (the pairs'
  node set), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawlspark.catalog import Catalog
from crawlspark.pipeline_ops import (
    PHASH_HAM_T,
    cluster_from_pairs,
    phash_neardup_pairs,
)


def image_cluster_members(
    imgs: DataFrame, threshold: int = PHASH_HAM_T
) -> DataFrame:
    """(image_id, cluster, is_keeper) for every image in a phash near-dup
    cluster. Keeper = first cluster member in deterministic crawl order
    (page, pos_in_page, img_idx, image_id) — the same order the reference
    would have stored it first, so re-running dedup after more waves can
    only keep the SAME keeper or an earlier-crawled one, never flap
    between equals."""
    pairs = phash_neardup_pairs(imgs, threshold=threshold)
    members = cluster_from_pairs(
        pairs.select(
            F.col("img_a").alias("doc_a"), F.col("img_b").alias("doc_b")
        )
    ).select(F.col("doc_id").alias("image_id"), "cluster")
    order_cols = imgs.select("image_id", "page", "pos_in_page", "img_idx")
    w = Window.partitionBy("cluster").orderBy(
        "page", "pos_in_page", "img_idx", "image_id"
    )
    return (
        members.join(order_cols, "image_id")
        .select(
            "image_id",
            "cluster",
            (F.row_number().over(w) == 1).alias("is_keeper"),
            "page",
            "pos_in_page",
            "img_idx",
        )
    )


def dedup_images(
    spark: SparkSession,
    workdir: str,
    threshold: int = PHASH_HAM_T,
    vacuum_keep_last: int = 8,
) -> dict:
    """Run the near-dup pass over `workdir`'s images table and commit the
    `image_clusters` table. Returns summary stats (all counts are exact,
    derived from the committed frame)."""
    cat = Catalog(workdir, vacuum_keep_last=vacuum_keep_last)
    imgs = cat.read(spark, "images")
    if imgs is None:
        return {"images": 0, "clustered": 0, "clusters": 0, "duplicates": 0}
    out = image_cluster_members(imgs, threshold=threshold).orderBy(
        "cluster", "page", "pos_in_page", "img_idx", "image_id"
    )
    cat.commit(
        out,
        "image_clusters",
        meta={"threshold": threshold, "source_version": cat.version("images")},
    )
    committed = cat.read(spark, "image_clusters")
    agg = committed.agg(
        F.count("*").alias("clustered"),
        F.countDistinct("cluster").alias("clusters"),
    ).collect()[0]
    return {
        "images": imgs.count(),
        "clustered": int(agg["clustered"]),
        "clusters": int(agg["clusters"]),
        # non-keeper members: what an export with dedup applied would drop
        "duplicates": int(agg["clustered"]) - int(agg["clusters"]),
        "threshold": threshold,
    }
