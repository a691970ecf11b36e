"""Mid-wave crash replay — a run killed AFTER data-table commits but
BEFORE the wave's checkpoint marker must replay the wave without
duplicating rows in append-only tables (crawl_order, lineage, metrics,
errors, frontier, politeness). Catalog.append is wave-idempotent; the
Iceberg analog is one multi-table transaction per wave."""

from __future__ import annotations

import json
import os

import pytest

from crawlspark.catalog import Catalog
from crawlspark.driver import crawl
from crawlspark.fixtures import SiteSpec, build_site, page_store_rows
from crawlspark.oracle import run_oracle
from crawlspark.schema import PAGE_STORE

SPEC = SiteSpec(pages=4, posts_per_page=8, seed=3)


def _rollback_last_commit(workdir: str, table: str) -> None:
    """Simulate a crash before this table's last commit became durable:
    swing the pointer back one snapshot and drop the orphan log entry."""
    tdir = os.path.join(workdir, table)
    with open(os.path.join(tdir, "_current")) as f:
        cur = f.read().strip()
    n = int(os.path.basename(cur).split("-")[0][1:])
    assert n >= 2, "need a prior snapshot to roll back to"
    prev = None
    for name in os.listdir(os.path.join(tdir, "snapshots")):
        if name.startswith(f"v{n - 1}-"):
            prev = os.path.join("snapshots", name)
    assert prev, "previous snapshot missing"
    with open(os.path.join(tdir, "_current"), "w") as f:
        f.write(prev)
    os.remove(os.path.join(tdir, "_log", f"v{n}.json"))


def test_midwave_crash_replay_no_duplicates(spark, tmp_path):
    site = build_site(SPEC)
    golden = run_oracle(site)
    wd = str(tmp_path / "midwave")
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(spark, store, SPEC.base_url, wd, pages=SPEC.pages,
          pages_per_wave=2, run_id="m1")

    # crash simulation: wave 2's data tables committed, checkpoint did not
    _rollback_last_commit(wd, "checkpoints")
    cat = Catalog(wd)
    waves = {e["wave"] for e in cat.log("checkpoints") if "wave" in e}
    assert waves == {1}, "rollback should leave only wave 1 checkpointed"

    # replay: the driver re-runs wave 2; append-only tables must not grow
    before = cat.read(spark, "crawl_order").count()
    result = crawl(spark, store, SPEC.base_url, wd, pages=SPEC.pages,
                   pages_per_wave=2, run_id="m2")
    after = cat.read(spark, "crawl_order").count()
    assert after == before, "replayed wave duplicated crawl_order rows"
    assert result.stats == golden.stats

    rows = cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order
    # metrics not double-counted either
    m = cat.read(spark, "metrics")
    assert m.count() == 2  # one row per wave
    # and the wave-2 checkpoint COMMIT now exists (the replayed wave
    # rightfully checkpoints zero rows — all its URLs were already seen,
    # so the completion marker is the commit log entry, not row presence)
    waves = {e["wave"] for e in cat.log("checkpoints") if "wave" in e}
    assert waves == {1, 2}
    # a third run must now skip both waves entirely (idempotent)
    result3 = crawl(spark, store, SPEC.base_url, wd, pages=SPEC.pages,
                    pages_per_wave=2, run_id="m3")
    assert result3.stats == golden.stats
    assert cat.read(spark, "crawl_order").count() == before


def test_nonfinal_wave_replay_keeps_bucket_state_exact(spark, tmp_path):
    """Crash replay on a NON-final wave: the replayed wave must restore the
    persisted politeness bucket instead of re-running the recurrence over
    its empty link set (phantom listing tokens would shift every later
    wave's schedule whenever the 5-req/10-s budget binds across the wave
    boundary — max_images=8 makes back-to-back image fetches bind it)."""
    spec = SiteSpec(pages=6, posts_per_page=6, seed=11, max_images=8)
    site = build_site(spec)
    golden = run_oracle(site)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)

    wd = str(tmp_path / "nonfinal")
    # run waves 1-2 only (pages 1..4 of 6)
    crawl(spark, store, spec.base_url, wd, pages=4, pages_per_wave=2,
          run_id="n1")
    # crash: wave 2's data tables committed, checkpoint marker did not
    _rollback_last_commit(wd, "checkpoints")
    # resume to completion: wave 2 replays, wave 3 (pages 5-6) is FRESH and
    # must schedule against the restored — not polluted — bucket state
    result = crawl(spark, store, spec.base_url, wd, pages=6,
                   pages_per_wave=2, run_id="n2")

    assert result.stats == golden.stats
    assert result.virtual_seconds == golden.virtual_seconds

    # and the final state matches an uninterrupted 3-wave run exactly
    cat = Catalog(wd)
    rows = cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order


CHUNK_SPEC = SiteSpec(pages=2, posts_per_page=9, seed=5, max_images=6)


def test_per_post_checkpoint_chunked_equivalence(spark, tmp_path):
    """posts_per_checkpoint=3 splits each page-wave into 3-post chunk
    commits; final state AND politeness virtual time must equal the
    oracle's single-pass run exactly (the chunked max-plus fold threads
    bucket state across chunk boundaries bit-for-bit)."""
    site = build_site(CHUNK_SPEC)
    golden = run_oracle(site)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "chunked")
    result = crawl(spark, store, CHUNK_SPEC.base_url, wd, pages=2,
                   pages_per_wave=1, posts_per_checkpoint=3, run_id="ck1")
    assert result.stats == golden.stats
    assert result.virtual_seconds == golden.virtual_seconds

    cat = Catalog(wd)
    rows = cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order
    # the checkpoint log records within-wave (page, chunk) offsets, and the
    # per-wave completion markers still exist for done_waves
    offsets = {
        (e["page"], e["chunk"])
        for e in cat.log("checkpoints")
        if e.get("chunk") is not None
    }
    expected = {(p, pos // 3) for _, _, p, pos in golden.crawl_order}
    assert expected <= offsets
    assert len(expected) >= 3, "spec must yield multiple chunks per page"
    done = {
        e["wave"]
        for e in cat.log("checkpoints")
        if "wave" in e and e.get("chunk") is None
    }
    assert done == {1, 2}
    # records identical to the oracle's
    posts = cat.read(spark, "posts").orderBy("post_id").collect()
    assert [r["post_id"] for r in posts] == [g["post_id"] for g in golden.records]
    gold = {g["post_id"]: g for g in golden.records}
    for r in posts:
        g = gold[r["post_id"]]
        assert r["_download_summary"] == g["_download_summary"]
        assert list(r["file_sources"]) == g["file_sources"]


def test_per_post_checkpoint_midpage_crash(spark, tmp_path, monkeypatch):
    """Kill the run BETWEEN POSTS OF ONE PAGE (after two 3-post chunk
    commits, before the third): resume must complete with final state and
    virtual time identical to an uninterrupted run — committed posts are
    not refetched, so no duplicate fetch tokens enter the politeness
    accounting and no frontier/crawl_order rows duplicate."""
    import crawlspark.driver as drv

    site = build_site(CHUNK_SPEC)
    golden = run_oracle(site)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "midpage")

    real = drv._process_links
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # page 1's second chunk — dies between posts
            raise RuntimeError("simulated mid-page crash")
        return real(*a, **kw)

    monkeypatch.setattr(drv, "_process_links", boom)
    with pytest.raises(RuntimeError, match="mid-page crash"):
        crawl(spark, store, CHUNK_SPEC.base_url, wd, pages=2,
              pages_per_wave=1, posts_per_checkpoint=3, run_id="cr1")
    monkeypatch.setattr(drv, "_process_links", real)

    cat = Catalog(wd)
    committed = {
        (e["page"], e["chunk"])
        for e in cat.log("checkpoints")
        if e.get("chunk") is not None
    }
    assert committed == {(1, 0)}, "crash left a 1-chunk prefix of page 1"
    assert not {
        e["wave"]
        for e in cat.log("checkpoints")
        if "wave" in e and e.get("chunk") is None
    }, "no wave may be marked complete"
    seen_partial = {r["url"] for r in cat.read(spark, "seen").collect()}
    assert 0 < len(seen_partial) < len(golden.seen)

    # resume: only the unprocessed tail of page 1 (+ page 2) runs
    result = crawl(spark, store, CHUNK_SPEC.base_url, wd, pages=2,
                   pages_per_wave=1, posts_per_checkpoint=3, run_id="cr2")
    assert result.stats == golden.stats
    assert result.virtual_seconds == golden.virtual_seconds
    rows = cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order
    assert {r["url"] for r in cat.read(spark, "seen").collect()} == golden.seen
    # no post was fetched twice: frontier holds exactly one row per URL
    fr = cat.read(spark, "frontier")
    assert fr.count() == fr.select("url").distinct().count()


def test_per_page_checkpoint_cadence(spark, tmp_path):
    """Legacy checkpoint-per-post cadence analog (legacy:1180): with
    pages_per_wave=1 every page is its own checkpointed wave, so a crash
    loses at most one page of work and resume is per-page. (Within-wave
    granularity finer than this is subsumed by wave-atomic replay +
    merge_new idempotence — a replayed wave never duplicates rows.)"""
    spec = SiteSpec(pages=3, posts_per_page=6, seed=21)
    site = build_site(spec)
    golden = run_oracle(site)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "perpage")

    crawl(spark, store, spec.base_url, wd, pages=3, pages_per_wave=1,
          run_id="pp1")
    cat = Catalog(wd)
    waves = {e["wave"] for e in cat.log("checkpoints") if "wave" in e}
    assert waves == {1, 2, 3}  # one checkpoint commit per page

    # crash on the last page, resume: only page 3 is re-crawled
    _rollback_last_commit(wd, "checkpoints")
    result = crawl(spark, store, spec.base_url, wd, pages=3,
                   pages_per_wave=1, run_id="pp2")
    assert result.stats == golden.stats
    rows = cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order


def test_chunk_crash_before_seen_commit_recovers(spark, tmp_path, monkeypatch):
    """Crash AFTER a chunk's append-table commits but BEFORE its `seen`
    merge: the chunk's URLs are still absent from `seen`, so resume
    re-processes it in full — the replayed appends are (wave,chunk)-
    idempotent no-ops, the metrics replay guard restores the bucket, and
    the seen merge finally lands. Nothing is lost and nothing duplicates
    (the commit ORDER — seen second-to-last — is what closes this window;
    committing seen before the appends would skip the chunk forever)."""
    from crawlspark.catalog import Catalog as Cat

    site = build_site(CHUNK_SPEC)
    golden = run_oracle(site)
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    wd = str(tmp_path / "seencrash")

    real_merge = Cat.merge_new
    calls = {"n": 0}

    def boom(self, spark_, batch, table, key, meta=None, partition_by=None):
        if table == "seen":
            calls["n"] += 1
            if calls["n"] == 2:  # second chunk: appends+metrics durable
                raise RuntimeError("simulated crash before seen commit")
        return real_merge(
            self, spark_, batch, table, key=key, meta=meta,
            partition_by=partition_by,
        )

    monkeypatch.setattr(Cat, "merge_new", boom)
    with pytest.raises(RuntimeError, match="before seen commit"):
        crawl(spark, store, CHUNK_SPEC.base_url, wd, pages=2,
              pages_per_wave=1, posts_per_checkpoint=3, run_id="sc1")
    monkeypatch.setattr(Cat, "merge_new", real_merge)

    cat = Catalog(wd)
    # the crashed chunk's metrics row IS durable but its URLs are not seen
    n_metrics_chunks = len(
        [e for e in cat.log("metrics") if e.get("chunk") is not None]
    )
    assert n_metrics_chunks == 2
    seen_partial = {r["url"] for r in cat.read(spark, "seen").collect()}
    assert 0 < len(seen_partial) < len(golden.seen)

    result = crawl(spark, store, CHUNK_SPEC.base_url, wd, pages=2,
                   pages_per_wave=1, posts_per_checkpoint=3, run_id="sc2")
    assert result.stats == golden.stats
    assert result.virtual_seconds == golden.virtual_seconds
    rows = cat.read(spark, "crawl_order").orderBy("page", "pos_in_page").collect()
    got = [(i, r["url"], r["page"], r["pos_in_page"]) for i, r in enumerate(rows)]
    assert got == golden.crawl_order
    assert {r["url"] for r in cat.read(spark, "seen").collect()} == golden.seen
    fr = cat.read(spark, "frontier")
    assert fr.count() == fr.select("url").distinct().count()
