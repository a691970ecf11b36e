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


def _crawl_with_planted_copies(
    spark, workdir: str, distinct_posts: bool = False
) -> int:
    spec = SiteSpec(pages=2, posts_per_page=6, seed=11)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(spark, store, spec.base_url, workdir, pages=spec.pages,
          run_id="imgdedup")
    cat = Catalog(workdir)
    imgs = cat.read(spark, "images")
    n = imgs.count()
    assert n > 0
    post_id = (
        F.concat(F.lit("c_"), "post_id").alias("post_id")
        if distinct_posts  # distinct file paths for the export tests
        else F.col("post_id")
    )
    copies = imgs.select(
        F.concat(F.lit("copy_"), "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption",
        F.col("phash").bitwiseXOR(F.lit(5)).alias("phash"),
        "ocr_text", post_id, "url", "img_idx",
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
    assert stats == {"images": 0, "new_images": 0, "clustered": 0,
                     "clusters": 0, "duplicates": 0}


def _clusters_as_sets(members_df) -> set[frozenset]:
    """Cluster partition as a set of member-id sets (label-independent),
    plus keeper identity baked in by tagging the keeper id."""
    by_cluster: dict = {}
    for r in members_df.collect():
        by_cluster.setdefault(r.cluster, set()).add(
            (r.image_id, bool(r.is_keeper))
        )
    return {frozenset(v) for v in by_cluster.values()}


def test_incremental_matches_one_shot(spark, tmp_path):
    """Two incremental runs (second one over newly planted images only)
    must commit the SAME image_clusters a from-scratch pass over the full
    images table computes — partition AND keepers."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)  # run 0 input: originals+copies
    s1 = dedup_images(spark, wd)
    assert s1["new_images"] == s1["images"]  # first run processes all

    # plant a second generation: copies of the copies at yet-later pages
    cat = Catalog(wd)
    imgs = cat.read(spark, "images")
    gen2 = (
        imgs.filter(F.col("image_id").startswith("copy_"))
        .select(
            F.concat(F.lit("g2_"), "image_id").alias("image_id"),
            "bytes", "w", "h", "fmt", "caption",
            F.col("phash").bitwiseXOR(F.lit(3)).alias("phash"),
            "ocr_text", "post_id", "url", "img_idx",
            (F.col("page") + 1000).cast("int").alias("page"),
            "pos_in_page",
        )
    )
    n_g2 = gen2.count()
    cat.append(spark, gen2, "images", meta={"planted": "g2"})

    s2 = dedup_images(spark, wd)
    assert s2["new_images"] == n_g2  # only the delta was processed
    assert s2["images"] == s1["images"] + n_g2

    incremental = cat.read(spark, "image_clusters")
    one_shot = image_cluster_members(cat.read(spark, "images"))
    assert _clusters_as_sets(incremental) == _clusters_as_sets(one_shot)


def test_incremental_noop_run(spark, tmp_path):
    """A run with no new images processes nothing and leaves the
    committed clusters identical."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    s1 = dedup_images(spark, wd)
    before = _clusters_as_sets(Catalog(wd).read(spark, "image_clusters"))
    s2 = dedup_images(spark, wd)
    assert s2["new_images"] == 0
    assert s2["clustered"] == s1["clustered"]
    assert _clusters_as_sets(Catalog(wd).read(spark, "image_clusters")) == before


def test_exact_dup_multiplicity_never_inflates_edges(spark, tmp_path):
    """The edge set lives at DISTINCT-phash level: k exact copies of one
    image contribute one node to the band join, not k — per-image edges
    would be k*(k-1)/2 pairs, a quadratic output no skew handling fixes
    (web corpora are exact-dup heavy: blank thumbnails, logos). The copies
    still cluster via the shared phash, and the crawl-order keeper wins."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)  # near-dups at distinct phashes
    dedup_images(spark, wd)
    cat = Catalog(wd)
    p1 = cat.read(spark, "image_pairs").count()

    one = cat.read(spark, "images").orderBy(
        "page", "pos_in_page", "img_idx"
    ).limit(1).persist()
    k = 30
    exact = one.crossJoin(
        spark.range(k).select(F.col("id").alias("ci"))
    ).select(
        F.concat(F.lit("ex"), F.col("ci").cast("string"), F.lit("_"),
                 "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption", "phash", "ocr_text",
        "post_id", "url", "img_idx",
        (F.col("page") + 9000 + F.col("ci")).cast("int").alias("page"),
        "pos_in_page",
    )
    cat.append(spark, exact, "images", meta={"planted": "exact"})
    s = dedup_images(spark, wd)
    assert s["new_images"] == k
    # the k copies share an already-indexed phash: ZERO new edges (a
    # per-image edge set would have added >= k*(k-1)/2 = 435 pairs)
    assert cat.read(spark, "image_pairs").count() == p1
    # but every copy is clustered with the original, keeper = crawl-first
    members = cat.read(spark, "image_clusters")
    orig = one.collect()[0]
    ex_rows = members.filter(F.col("image_id").startswith("ex")).collect()
    assert len(ex_rows) == k
    orig_row = members.filter(F.col("image_id") == orig.image_id).collect()[0]
    assert {r.cluster for r in ex_rows} == {orig_row.cluster}
    assert all(not r.is_keeper for r in ex_rows)
    one.unpersist()
    # and the committed table still equals the from-scratch reference
    one_shot = image_cluster_members(cat.read(spark, "images"))
    assert _clusters_as_sets(members) == _clusters_as_sets(one_shot)


def test_compaction_entry_does_not_reset_state(spark, tmp_path):
    """An auto-compaction commit on the state tables (meta {compaction:
    true}, no threshold key) must not be mistaken for a threshold change:
    the next run stays incremental instead of silently dropping all state
    and rebuilding the corpus — which would otherwise recur every
    compact_threshold appends of a long-lived crawl."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    s1 = dedup_images(spark, wd)
    cat = Catalog(wd)
    cat.compact(spark, "image_index")  # log[-1] now lacks `threshold`
    cat.compact(spark, "image_pairs")
    s2 = dedup_images(spark, wd)
    assert not s2["rebuilt"]
    assert s2["new_images"] == 0
    # and a genuinely new image is still processed incrementally
    extra = cat.read(spark, "images").limit(1).select(
        F.concat(F.lit("y_"), "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption", "phash", "ocr_text",
        "post_id", "url", "img_idx",
        (F.col("page") + 5000).cast("int").alias("page"), "pos_in_page",
    )
    cat.append(spark, extra, "images", meta={"planted": "y"})
    s3 = dedup_images(spark, wd)
    assert not s3["rebuilt"]
    assert s3["new_images"] == 1
    assert s3["images"] == s1["images"] + 1
    one_shot = image_cluster_members(cat.read(spark, "images"))
    assert _clusters_as_sets(cat.read(spark, "image_clusters")) == \
        _clusters_as_sets(one_shot)


def test_orphan_log_entry_ignored(spark, tmp_path):
    """A crash between the _log write and the _current pointer swap leaves
    an orphan log entry whose source_version claims images were processed
    that the readable index lacks. Trusting it would skip those images
    forever (silent missing clusters); replay must re-process them."""
    import os

    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    dedup_images(spark, wd)
    cat = Catalog(wd)
    imgs = cat.read(spark, "images")
    extra = imgs.limit(2).select(
        F.concat(F.lit("z_"), "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption",
        F.col("phash").bitwiseXOR(F.lit(1)).alias("phash"),
        "ocr_text", "post_id", "url", "img_idx",
        (F.col("page") + 7000).cast("int").alias("page"), "pos_in_page",
    )
    cat.append(spark, extra, "images", meta={"planted": "z"})
    # forge the orphan: a log entry past the current pointer claiming the
    # new images snapshot was already processed (no snapshot, no pointer
    # swap — exactly what a crash inside _commit_manifest leaves behind)
    orphan_ver = cat.version("image_index") + 1
    with open(
        os.path.join(cat._tdir("image_index"), "_log",
                     f"v{orphan_ver}.json"), "w",
    ) as f:
        json.dump({"version": orphan_ver, "threshold": 8,
                   "source_version": cat.version("images")}, f)
    s = dedup_images(spark, wd)
    assert s["new_images"] == 2  # orphan not trusted; z_ images processed
    one_shot = image_cluster_members(cat.read(spark, "images"))
    assert _clusters_as_sets(cat.read(spark, "image_clusters")) == \
        _clusters_as_sets(one_shot)


def test_noop_run_skips_cluster_recommit(spark, tmp_path):
    """A run with nothing new and an up-to-date derived table must not
    re-run connected components or commit a new image_clusters snapshot
    (the driver's final catch-up after an every-wave cadence is exactly
    this no-op)."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    dedup_images(spark, wd)
    cat = Catalog(wd)
    v_before = cat.version("image_clusters")
    s = dedup_images(spark, wd)
    assert s["new_images"] == 0
    assert cat.version("image_clusters") == v_before


def test_noop_after_images_compaction_advances_marker(spark, tmp_path):
    """Compacting the images table rewrites the corpus into a fresh dir.
    The next dedup run finds nothing new but must still record the new
    processed snapshot version — otherwise EVERY later run re-scans the
    full-corpus dir and anti-joins the whole index, O(corpus) per cadence
    tick instead of O(new images)."""
    from crawlspark.imagededup import _new_images_frame, _state_entry

    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    dedup_images(spark, wd)
    cat = Catalog(wd)
    cat.compact(spark, "images")
    s = dedup_images(spark, wd)  # pays the one post-compaction rescan
    assert s["new_images"] == 0
    st = _state_entry(cat, "image_index")
    assert st["source_version"] == cat.version("images")
    # the NEXT run's candidate scan is now empty, not the full corpus
    cand = _new_images_frame(spark, cat, st["source_version"])
    assert not cand.inputFiles()


def test_threshold_change_rebuilds(spark, tmp_path):
    """Accumulated pairs are only valid at the threshold that confirmed
    them — a different threshold must rebuild from scratch and report it."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    s1 = dedup_images(spark, wd, threshold=8)
    assert not s1["rebuilt"]
    s2 = dedup_images(spark, wd, threshold=0)
    assert s2["rebuilt"]
    assert s2["new_images"] == s2["images"]  # reprocessed everything
    cat = Catalog(wd)
    members = cat.read(spark, "image_clusters")
    # hamming-2 planted copies no longer pair at threshold 0
    assert members.filter(F.col("image_id").startswith("copy_")).count() == 0
    one_shot = image_cluster_members(cat.read(spark, "images"), threshold=0)
    assert _clusters_as_sets(members) == _clusters_as_sets(one_shot)


def test_incremental_scan_reads_only_delta_dirs(spark, tmp_path):
    """The second run's candidate scan must touch only the images delta
    dirs committed after the first run's processed snapshot."""
    from crawlspark.imagededup import _new_images_frame

    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    dedup_images(spark, wd)
    cat = Catalog(wd)
    pre_dirs = set(cat.manifest("images")["data_dirs"])
    prev_src = cat.log("image_index")[-1]["source_version"]
    imgs = cat.read(spark, "images")
    extra = imgs.limit(2).select(
        F.concat(F.lit("x_"), "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption", "phash", "ocr_text",
        "post_id", "url", "img_idx", "page", "pos_in_page",
    )
    cat.append(spark, extra, "images", meta={"planted": "x"})
    cand = _new_images_frame(spark, cat, prev_src)
    touched = set(cand.inputFiles())
    old_abs = {cat._tdir("images") + "/" + d for d in pre_dirs}
    assert touched, "delta scan must read the new dir"
    for f in touched:
        assert not any(f.startswith(o + "/") or f.startswith(o)
                       for o in old_abs), f"scanned pre-existing dir: {f}"


def test_lifecycle_dedup_every_wave(spark, tmp_path):
    """crawl(image_dedup_every_waves=1) runs the incremental pass after
    every committed wave; the final committed clusters equal a
    from-scratch pass over the full images table, and the index log shows
    one incremental append per wave (not one full rebuild per wave)."""
    wd = str(tmp_path / "wd")
    spec = SiteSpec(pages=3, posts_per_page=6, seed=7)
    site = build_site(spec)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    result = crawl(spark, store, spec.base_url, wd, pages=spec.pages,
                   pages_per_wave=1, run_id="lifecycle",
                   image_dedup_every_waves=1)
    assert result.image_dedup is not None
    assert result.image_dedup["new_images"] == 0  # final catch-up: no-op

    cat = Catalog(wd)
    imgs = cat.read(spark, "images")
    assert result.image_dedup["images"] == imgs.count()
    committed = cat.read(spark, "image_clusters")
    one_shot = image_cluster_members(imgs)
    assert _clusters_as_sets(committed) == _clusters_as_sets(one_shot)
    # one index append per wave that produced images — incremental cadence
    index_log = cat.log("image_index")
    assert len(index_log) == result.waves
    versions = [e["source_version"] for e in index_log]
    assert versions == sorted(versions) and len(set(versions)) == len(versions)


def test_export_images_dedup(spark, tmp_path):
    """export --shape images writes the reference's on-disk layout
    (<post_id>/image_<idx>.<fmt>); --dedup drops exactly the non-keeper
    cluster members and keeps byte content intact."""
    import os

    import pytest

    from crawlspark.cli import export_images

    wd = str(tmp_path / "wd")
    out_all, out_dd = str(tmp_path / "all"), str(tmp_path / "dd")

    n = _crawl_with_planted_copies(spark, wd, distinct_posts=True)

    # dedup export without the clusters table must fail loudly
    with pytest.raises(SystemExit, match="image_clusters"):
        export_images(spark, wd, out_dd, dedup=True)

    stats = dedup_images(spark, wd)
    n_all = export_images(spark, wd, out_all)
    n_dd = export_images(spark, wd, out_dd, dedup=True)
    assert n_all == 2 * n
    assert n_dd == n_all - stats["duplicates"]

    cat = Catalog(wd)
    keeper = {
        r.image_id: bool(r.is_keeper)
        for r in cat.read(spark, "image_clusters").collect()
    }
    for r in cat.read(spark, "images").collect():
        rel = os.path.join(r.post_id, f"image_{r.img_idx}.{r.fmt}")
        assert os.path.exists(os.path.join(out_all, rel))
        expect_kept = keeper.get(r.image_id, True)  # unclustered: kept
        assert os.path.exists(os.path.join(out_dd, rel)) == expect_kept
        if expect_kept:
            with open(os.path.join(out_dd, rel), "rb") as f:
                assert f.read() == bytes(r.bytes)


def test_threshold_zero_keeps_only_exact(spark, tmp_path):
    """threshold=0 must not pair the hamming-2 planted copies."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    imgs = Catalog(wd).read(spark, "images")
    members = image_cluster_members(imgs, threshold=0)
    assert members.filter(F.col("image_id").startswith("copy_")).count() == 0


def test_small_delta_reads_bounded_band_state(spark, tmp_path):
    """A tick with a tiny delta must read only the band_pt bucket subdirs
    its delta's band values map to — never the whole accumulated band
    state (the round-6 O(delta) fix: no per-tick full-index distinct or
    band explosion)."""
    from crawlspark.imagededup import _band_state_scan, _bands_frame

    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    dedup_images(spark, wd)
    cat = Catalog(wd)
    full = _band_state_scan(spark, cat, None)
    all_files = set(full.inputFiles())
    assert all_files

    fresh_phash = 0x0123456789ABCDEF  # not derived from any fixture pixel
    new_ph = spark.createDataFrame([(fresh_phash,)], "phash long")
    pts = [
        r.band_pt
        for r in _bands_frame(new_ph).select("band_pt").distinct().collect()
    ]
    assert len(pts) <= 4
    pruned = _band_state_scan(spark, cat, pts)
    pruned_files = set(pruned.inputFiles()) if pruned is not None else set()
    assert pruned_files <= all_files
    assert len(pruned_files) < len(all_files), (
        "small-delta scan read the full band state"
    )

    # and the end-to-end tick over that delta stays correct
    one = cat.read(spark, "images").limit(1).select(
        F.lit("bs_new").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption",
        F.lit(fresh_phash).alias("phash"),
        "ocr_text", "post_id", "url", "img_idx",
        (F.col("page") + 8000).cast("int").alias("page"), "pos_in_page",
    )
    cat.append(spark, one, "images", meta={"planted": "bs"})
    s = dedup_images(spark, wd)
    assert s["new_images"] == 1
    one_shot = image_cluster_members(cat.read(spark, "images"))
    assert _clusters_as_sets(cat.read(spark, "image_clusters")) == \
        _clusters_as_sets(one_shot)


def test_pre_band_state_workdir_backfills_once(spark, tmp_path):
    """A workdir written before the image_bands state existed (simulated
    by dropping the table) must backfill it from the index exactly once,
    report it in stats, and keep incremental == one-shot."""
    wd = str(tmp_path / "wd")
    _crawl_with_planted_copies(spark, wd)
    s0 = dedup_images(spark, wd)
    assert not s0["bands_backfilled"]
    cat = Catalog(wd)
    cat.drop("image_bands")  # round-5-shaped workdir

    imgs = cat.read(spark, "images")
    extra = imgs.limit(2).select(
        F.concat(F.lit("bf_"), "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption",
        F.col("phash").bitwiseXOR(F.lit(2)).alias("phash"),
        "ocr_text", "post_id", "url", "img_idx",
        (F.col("page") + 6000).cast("int").alias("page"), "pos_in_page",
    )
    cat.append(spark, extra, "images", meta={"planted": "bf"})
    s1 = dedup_images(spark, wd)
    assert s1["bands_backfilled"]
    assert s1["new_images"] == 2
    s2_extra = imgs.limit(1).select(
        F.concat(F.lit("bf2_"), "image_id").alias("image_id"),
        "bytes", "w", "h", "fmt", "caption",
        F.col("phash").bitwiseXOR(F.lit(6)).alias("phash"),
        "ocr_text", "post_id", "url", "img_idx",
        (F.col("page") + 6500).cast("int").alias("page"), "pos_in_page",
    )
    cat.append(spark, s2_extra, "images", meta={"planted": "bf2"})
    s2 = dedup_images(spark, wd)
    assert not s2["bands_backfilled"]  # state now present: no re-backfill
    one_shot = image_cluster_members(cat.read(spark, "images"))
    assert _clusters_as_sets(cat.read(spark, "image_clusters")) == \
        _clusters_as_sets(one_shot)


def test_cli_dedup_images_and_status(spark, tmp_path, capsys, monkeypatch):
    from crawlspark import cli

    # the CLI builds its own session; point it at the test master and make
    # its get_spark reuse the active one instead of stopping it
    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    # patch stop on the CLASS, not the instance: undoing an instance-level
    # patch of a class attribute leaves the bound method behind as an
    # instance attribute, which would shadow (and defeat) any later test's
    # type(spark).stop patch and kill the shared session
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
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
