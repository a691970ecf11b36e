"""Engine-side image near-dup pass over the crawl's `images` table.

The reference crawler dedups images only by URL (crawler.py:560-573 ordered
first-occurrence over src attributes) — two posts embedding the SAME picture
under different CDN URLs are stored twice. This pass closes that gap at the
content level: the S5 decode stage already emitted a 64-bit perceptual hash
per image (imageops.py), so near-dup detection is pure scalar relational
work — band LSH over the int64 phash, connected components, one keeper per
cluster by deterministic crawl order — and the image BYTES never move again.

The pass is INCREMENTAL: a long-lived crawl calls it after every few waves,
and each run's cost is proportional to the images added since the last run,
never the corpus. State tables (all scalar-only):

- `image_index` (append-only): one row per already-processed image —
  (image_id, phash, page, pos_in_page, img_idx). The processed-set anti-
  join key AND the keeper-election order source. Its commit meta records
  the hamming threshold and the `images` snapshot version processed.
- `image_pairs` (append-only): the accumulated near-dup edge set. Each run
  appends only pairs that involve at least one NEW image (new-vs-index and
  new-vs-new from a band join); old-vs-old pairs are already present.
- `image_clusters` (full-replace, derived): one row per clustered image
  with cluster label + crawl-order keeper flag. Recomputed per run by
  connected components over the WHOLE edge set — edges are O(duplicate
  density), tiny relative to the corpus, and recomputing CC sidesteps the
  cluster-merge problem (a new image can bridge two old clusters) exactly.

Scale shape (100 TB of crawled images, waves forever):
- the new-image scan reads ONLY the `images` delta dirs committed since
  the last processed snapshot version (manifest dir-diff, the Iceberg
  incremental-read analog); the anti-join against `image_index` keys
  catches rows a compaction rewrote into fresh dirs;
- the band join shuffles 4 scalar rows per NEW image against the band
  explosion of the index; in a real Iceberg deployment `image_index`
  would be written bucketed by (band_id, band_val) so only the new side
  shuffles — here both sides shuffle on the band key, and AQE splits a
  viral band key if one appears;
- image bytes are never read: every scan prunes to
  (image_id, phash, page, pos_in_page, img_idx);
- cluster_from_pairs shuffles only (id, label) pairs per round, rounds
  bounded by component diameter, lineage truncated with localCheckpoint;
- keeper election is one window over cluster members ONLY (the pairs'
  node set), not the corpus.

A threshold change invalidates the accumulated edge set (pairs were
confirmed at the old threshold), so the pass detects it from the index
meta and rebuilds from scratch — loudly, in the returned stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawlspark.catalog import Catalog
from crawlspark.pipeline_ops import (
    PHASH_HAM_T,
    cluster_from_pairs,
    explode_phash_bands,
    phash_neardup_pairs,
)

_ORDER_COLS = ("page", "pos_in_page", "img_idx")


def image_cluster_members(
    imgs: DataFrame, threshold: int = PHASH_HAM_T
) -> DataFrame:
    """One-shot (image_id, cluster, is_keeper, page, pos_in_page, img_idx)
    for every image in a phash near-dup cluster — the non-incremental
    reference semantics `dedup_images` must match after any number of
    incremental runs. Keeper = first cluster member in deterministic crawl
    order (page, pos_in_page, img_idx, image_id)."""
    pairs = phash_neardup_pairs(imgs, threshold=threshold)
    members = cluster_from_pairs(
        pairs.select(
            F.col("img_a").alias("doc_a"), F.col("img_b").alias("doc_b")
        )
    ).select(F.col("doc_id").alias("image_id"), "cluster")
    order_cols = imgs.select("image_id", *_ORDER_COLS)
    return _elect_keepers(members.join(order_cols, "image_id"))


def _elect_keepers(members_with_order: DataFrame) -> DataFrame:
    w = Window.partitionBy("cluster").orderBy(
        *_ORDER_COLS, "image_id"
    )
    return members_with_order.select(
        "image_id",
        "cluster",
        (F.row_number().over(w) == 1).alias("is_keeper"),
        *_ORDER_COLS,
    )


def _new_images_frame(
    spark: SparkSession, cat: Catalog, prev_src_version: int
) -> DataFrame:
    """Images committed after `prev_src_version`, scanning only the delta
    dirs where possible. Falls back to the full table scan when the old
    manifest was vacuumed. Rows are NOT yet anti-joined against the
    processed set (compaction can rewrite old rows into new dirs)."""
    cur = cat.manifest("images")
    old = (
        cat.manifest("images", prev_src_version)
        if prev_src_version > 0
        else None
    )
    cols = ["image_id", "phash", *_ORDER_COLS]
    if old is None:
        return cat.read(spark, "images").select(*cols)
    old_dirs = set(old["data_dirs"])
    new_rels = [d for d in cur["data_dirs"] if d not in old_dirs]
    if not new_rels:
        return cat._read_dirs(spark, "images", [], cur["schema"]).select(*cols)
    return cat._read_dirs(spark, "images", new_rels, cur["schema"]).select(
        *cols
    )


def incremental_band_pairs(
    new: DataFrame, all_side: DataFrame, threshold: int = PHASH_HAM_T
) -> DataFrame:
    """Near-dup pairs (img_a, img_b, hamming) that involve at least one
    image from `new`: band join of NEW bands x (index + new) bands. Old-
    vs-old pairs are already in the accumulated edge set and never
    recompute. Scale shape: an equi shuffle join on (band_id, band_val) —
    4 scalar rows per image on each side, never a cartesian; AQE splits a
    viral band key. In a real Iceberg deployment the index side would be
    written bucketed by the band key so only the new side shuffles."""
    nb = explode_phash_bands(new.select("image_id", "phash"))
    ab = explode_phash_bands(all_side.select("image_id", "phash"))
    joined = nb.alias("n").join(
        ab.alias("o"),
        ["band_id", "band_val"],
    ).filter(F.col("n.image_id") != F.col("o.image_id"))
    return (
        joined.select(
            F.least("n.image_id", "o.image_id").alias("img_a"),
            F.greatest("n.image_id", "o.image_id").alias("img_b"),
            F.bit_count(
                F.col("n.phash").bitwiseXOR(F.col("o.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= threshold)
        .distinct()  # band multiplicity + both-new double count
    )


def _state_entry(cat: Catalog, table: str) -> dict | None:
    """Latest VISIBLE dedup-state commit-log entry for `table`. log[-1] is
    NOT that entry in two real histories: (a) auto-compaction commits carry
    only {"compaction": true} — treating one as state would misread a
    missing threshold as a threshold change and silently rebuild from
    scratch every ~compact_threshold runs; (b) a crash between the log
    write and the _current pointer swap leaves an ORPHAN entry whose
    source_version claims images processed that the readable index lacks —
    trusting it would skip those images forever (same version<=current
    guard as Catalog.append's wave-replay check)."""
    cur_ver = cat.version(table)
    for e in reversed(cat.log(table)):
        if "threshold" in e and e.get("version", 0) <= cur_ver:
            return e
    return None


def dedup_images(
    spark: SparkSession,
    workdir: str,
    threshold: int = PHASH_HAM_T,
    vacuum_keep_last: int = 8,
) -> dict:
    """Incremental near-dup pass over `workdir`'s images table; commits /
    refreshes `image_index`, `image_pairs`, and `image_clusters`. The
    committed `image_clusters` is always equal to a from-scratch
    `image_cluster_members(images)` at the same threshold
    (tests/test_image_dedup_engine.py asserts this across multi-run
    histories). Returns summary stats."""
    cat = Catalog(workdir, vacuum_keep_last=vacuum_keep_last)
    imgs_version = cat.version("images")
    if imgs_version == 0:
        return {"images": 0, "new_images": 0, "clustered": 0, "clusters": 0,
                "duplicates": 0}

    last = _state_entry(cat, "image_index")
    rebuilt = False
    if last is not None and last.get("threshold") != threshold:
        # accumulated pairs were confirmed at a different threshold —
        # the edge set is not reusable; start over
        cat.drop("image_index")
        cat.drop("image_pairs")
        cat.drop("image_clusters")
        last, rebuilt = None, True
    prev_src = int(last.get("source_version", 0)) if last else 0

    index = cat.read(spark, "image_index")
    candidates = _new_images_frame(spark, cat, prev_src)
    if index is not None:
        new = candidates.join(
            index.select("image_id"), "image_id", "left_anti"
        )
    else:
        new = candidates
    new = new.persist()
    try:
        n_new = new.count()
        if n_new > 0:
            all_side = (
                index.unionByName(new) if index is not None else new
            )
            pairs_new = incremental_band_pairs(new, all_side, threshold)
            cat.append(
                spark, pairs_new.orderBy("img_a", "img_b"), "image_pairs",
                meta={"source_version": imgs_version},
            )
            cat.append(
                spark, new.orderBy(*_ORDER_COLS, "image_id"), "image_index",
                meta={"threshold": threshold,
                      "source_version": imgs_version},
            )
        elif last is None or prev_src != imgs_version:
            # nothing to index, but record the processed source version +
            # threshold (empty delta). Without this marker on no-op runs,
            # an images-table compaction (which rewrites the whole corpus
            # into a fresh dir) would make EVERY subsequent run re-scan
            # that full-corpus dir and anti-join the entire index —
            # O(corpus) per cadence tick instead of O(new images)
            cat.append(
                spark, new, "image_index",
                meta={"threshold": threshold,
                      "source_version": imgs_version},
            )
    finally:
        new.unpersist()

    pairs_version = cat.version("image_pairs")
    cl_state = _state_entry(cat, "image_clusters")
    if (
        n_new == 0
        and not rebuilt
        and cl_state is not None
        and cl_state.get("threshold") == threshold
        and cl_state.get("pairs_version") == pairs_version
    ):
        # nothing new and the committed clusters were derived from exactly
        # this edge set at this threshold — skip the CC recompute + commit
        # entirely (the driver's final catch-up after an every-wave cadence
        # hits this path, as does every imageless cadence tick)
        index = cat.read(spark, "image_index")
        committed = cat.read(spark, "image_clusters")
        agg = committed.agg(
            F.count("*").alias("clustered"),
            F.countDistinct("cluster").alias("clusters"),
        ).collect()[0]
        clustered, clusters = int(agg["clustered"]), int(agg["clusters"])
        return {
            "images": int(index.count()) if index is not None else 0,
            "new_images": 0,
            "clustered": clustered,
            "clusters": clusters,
            "duplicates": clustered - clusters,
            "threshold": threshold,
            "rebuilt": False,
        }

    all_pairs = cat.read(spark, "image_pairs")
    index = cat.read(spark, "image_index")
    if all_pairs is not None and all_pairs.head(1):
        members = cluster_from_pairs(
            all_pairs.select(
                F.col("img_a").alias("doc_a"), F.col("img_b").alias("doc_b")
            )
        ).select(F.col("doc_id").alias("image_id"), "cluster")
        out = _elect_keepers(
            members.join(index.select("image_id", *_ORDER_COLS), "image_id")
        ).orderBy("cluster", *_ORDER_COLS, "image_id")
    else:
        out = index.select(
            "image_id",
            F.col("image_id").alias("cluster"),
            F.lit(True).alias("is_keeper"),
            *_ORDER_COLS,
        ).filter(F.lit(False))
    cat.commit(
        out, "image_clusters",
        # pairs_version pins the edge-set snapshot these clusters derive
        # from — the no-op early exit above compares it to skip recompute
        meta={"threshold": threshold, "source_version": imgs_version,
              "pairs_version": cat.version("image_pairs")},
    )
    committed = cat.read(spark, "image_clusters")
    agg = committed.agg(
        F.count("*").alias("clustered"),
        F.countDistinct("cluster").alias("clusters"),
    ).collect()[0]
    clustered, clusters = int(agg["clustered"]), int(agg["clusters"])
    return {
        "images": int(index.count()),
        "new_images": int(n_new),
        "clustered": clustered,
        "clusters": clusters,
        # non-keeper members: what an export with dedup applied would drop
        "duplicates": clustered - clusters,
        "threshold": threshold,
        "rebuilt": rebuilt,
    }
