"""Per-(host,salt) politeness schedule — the scale path (SURVEY §7.3): each
host gets its own token window; a salt-split hot host divides its budget
across salts (period*k per salt). The global bucket (oracle parity) is
tested elsewhere; this checks the committed `politeness` table per wave.
"""

from __future__ import annotations

from crawlspark.catalog import Catalog
from crawlspark.driver import HOT_HOST_SALTS, crawl
from crawlspark.fixtures import CDN_HOST, SiteSpec, build_site, page_store_rows
from crawlspark.oracle import run_oracle
from crawlspark.politeness import RATE_LIMIT_PERIOD, RATE_LIMIT_REQUESTS
from crawlspark.schema import PAGE_STORE

SPEC = SiteSpec(pages=4, posts_per_page=10, seed=5)


def test_politeness_scopes(spark, tmp_path):
    site = build_site(SPEC)
    golden = run_oracle(site)
    wd = str(tmp_path / "scopes")
    store = spark.createDataFrame(page_store_rows(site), PAGE_STORE)
    crawl(
        spark, store, SPEC.base_url, wd, pages=SPEC.pages, run_id="ps",
        hot_hosts=[CDN_HOST],
    )
    rows = Catalog(wd).read(spark, "politeness").collect()
    by_scope = {r["scope"]: r for r in rows}

    # every token-bucket event is scoped exactly once — the FULL event
    # model (same frame the global fold consumes): listing tokens + posts
    # (all visited links, incl. skipped — they are fetched) + images (this
    # spec draws no retries, so no attempt events)
    n_visits = len(golden.crawl_order)
    n_images = len(golden.images)
    assert (
        sum(r["n_requests"] for r in rows)
        == SPEC.pages + n_visits + n_images
    )

    # hot host: salted scopes with the budget divided (period * k)
    cdn_scopes = [r for r in rows if r["host"] == CDN_HOST]
    assert len(cdn_scopes) > 1, "hot host not salt-split"
    for r in cdn_scopes:
        assert r["period"] == RATE_LIMIT_PERIOD * HOT_HOST_SALTS
    # cold hosts: one scope, full budget
    cold = [r for r in rows if r["host"] not in (None, CDN_HOST)]
    assert cold
    for r in cold:
        assert r["salt"] == 0
        assert r["period"] == RATE_LIMIT_PERIOD

    # image-only scopes have all-zero sleeps -> closed-form finish time:
    # floor((n-1)/burst) * period
    site_host = SPEC.base_url.split("//")[1]
    for r in cold:
        if r["host"] == site_host:
            continue  # post fetches carry nav sleeps
        want = ((r["n_requests"] - 1) // RATE_LIMIT_REQUESTS) * r["period"]
        assert r["finish_at"] == want, r["scope"]


def test_legacy_politeness_schema_raises_migration_error(spark, tmp_path):
    """Advisor r4 (low): resuming a workdir whose `politeness` table predates
    the unified per-scope fold (no carried-state columns) must fail with a
    clear incompatible-workdir message, not an AnalysisException deep inside
    the durable-repair select."""
    import pytest

    from crawlspark import driver

    cat = Catalog(str(tmp_path / "legacy"))
    legacy = spark.createDataFrame(
        [("h#0", "h", 0, 10.0, 3, 12.0, 0)],
        "scope string, host string, salt int, period double,"
        " n_requests long, finish_at double, wave int",
    )
    cat.append(spark, legacy, "politeness", meta={"wave": 0})
    ev = spark.createDataFrame(
        [],
        "seq long, emits double, extra double, host string, salt int,"
        " period double",
    )
    with pytest.raises(RuntimeError, match="incompatible workdir"):
        driver._commit_politeness(
            spark, cat, ev, 0, 1.0, "https://weolbu.com", meta={"wave": 0}
        )
