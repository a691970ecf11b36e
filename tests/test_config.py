"""Layered config (reference src/config.py:34-169 semantics): defaults <-
INI <- env with typed coercion and validation."""

from __future__ import annotations

import pytest

from crawlspark.config import EngineConfig


def test_defaults_match_reference_budgets():
    c = EngineConfig.load(env={})
    assert c.rate_limit_requests == 5 and c.rate_limit_period == 10.0
    assert c.wait_page_load == 3.0 and c.wait_between_pages == 1.0
    assert c.max_retries == 3 and c.retry_delay == 5.0
    assert c.excluded_extensions == ["jpg", "jpeg", "png", "gif", "svg"]


def test_ini_overlay_and_coercion(tmp_path):
    ini = tmp_path / "cfg.ini"
    ini.write_text(
        "[crawlspark]\n"
        "max_pages = 1,000\n"
        "retry_delay = 2.5\n"
        "image_keep_bytes = no\n"
        "excluded_extensions = jpg, svg\n"
        "listing_source = api\n"
    )
    c = EngineConfig.load(str(ini), env={})
    assert c.max_pages == 1000  # comma-stripped int (reference coercion)
    assert c.retry_delay == 2.5
    assert c.image_keep_bytes is False
    assert c.excluded_extensions == ["jpg", "svg"]
    assert c.listing_source == "api"


def test_env_wins_over_ini(tmp_path):
    ini = tmp_path / "cfg.ini"
    ini.write_text("[crawlspark]\nmax_pages = 7\nlisting_source = api\n")
    c = EngineConfig.load(
        str(ini),
        env={"CRAWLSPARK_MAX_PAGES": "9", "CRAWLSPARK_HOT_HOST_SALTS": "2"},
    )
    assert c.max_pages == 9
    assert c.listing_source == "api"  # ini survives where env silent
    assert c.hot_host_salts == 2


def test_rejects_unknown_key_and_bad_values(tmp_path):
    ini = tmp_path / "cfg.ini"
    ini.write_text("[crawlspark]\nnot_a_key = 1\n")
    with pytest.raises(KeyError):
        EngineConfig.load(str(ini), env={})
    with pytest.raises(ValueError):
        EngineConfig.load(env={"CRAWLSPARK_IMAGE_KEEP_BYTES": "maybe"})
    with pytest.raises(ValueError):
        EngineConfig.load(env={"CRAWLSPARK_RATE_LIMIT_REQUESTS": "0"})
    with pytest.raises(ValueError):
        EngineConfig.load(env={"CRAWLSPARK_LISTING_SOURCE": "selenium"})
    with pytest.raises(FileNotFoundError):
        EngineConfig.load(str(tmp_path / "missing.ini"), env={})


def test_cli_threads_engine_knobs_and_rejects_pinned(tmp_path, monkeypatch, spark):
    """ADVICE: INI/env knobs must be either effective or loudly rejected.
    host_buckets/hot_host_salts/max_pages thread into crawl(); politeness
    budget overrides exit with a clear error instead of a silent no-op."""
    import json

    import pytest

    from crawlspark import cli

    # pinned politeness knob -> loud rejection
    monkeypatch.setenv("CRAWLSPARK_RATE_LIMIT_REQUESTS", "2")
    with pytest.raises(SystemExit, match="rate_limit_requests"):
        cli.main(["crawl", "--workdir", str(tmp_path / "w0"), "--pages", "1"])
    monkeypatch.delenv("CRAWLSPARK_RATE_LIMIT_REQUESTS")

    # threadable knobs take effect: host_buckets shows up in the frontier,
    # max_pages truncates the crawl. (cmd_crawl stops its session on exit —
    # keep the shared test session alive.)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setenv("CRAWLSPARK_HOST_BUCKETS", "2")
    monkeypatch.setenv("CRAWLSPARK_MAX_PAGES", "1")
    wd = str(tmp_path / "w1")
    rc = cli.main(
        ["crawl", "--workdir", wd, "--pages", "3", "--posts-per-page", "6"]
    )
    assert rc == 0
    from crawlspark.catalog import Catalog

    cat = Catalog(wd)
    fr = cat.read(spark, "frontier")
    assert fr.count() > 0
    assert {r["host_bucket"] for r in fr.collect()} <= {0, 1}
    m = cat.read(spark, "metrics")
    assert m.agg({"wave": "max"}).collect()[0][0] == 1  # max_pages honored
