"""Mid-wave crash replay — a run killed AFTER data-table commits but
BEFORE the wave's checkpoint marker must replay the wave without
duplicating rows in append-only tables (crawl_order, lineage, metrics,
errors, frontier, politeness). Catalog.append is wave-idempotent; the
Iceberg analog is one multi-table transaction per wave."""

from __future__ import annotations

import json
import os

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
