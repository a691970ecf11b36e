"""Operator-level unit tests (SURVEY §2 semantics, edge cases)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawlspark import ops


def test_keep_predicate_three_valued_logic(spark):
    """crawler.py:272: skip iff NOT vip AND count IS NOT NULL AND count<100.
    NULL count must PASS — the 3VL trap from SURVEY §7.3."""
    df = spark.createDataFrame(
        [
            (False, None, True),  # null count -> keep
            (False, 99, False),  # below threshold -> skip
            (False, 100, True),  # boundary -> keep
            (False, 101, True),
            (True, 5, True),  # vip always kept
            (True, None, True),
        ],
        "is_vip boolean, post_count int, expect boolean",
    )
    got = df.withColumn(
        "kept", ops.keep_predicate(F.col("is_vip"), F.col("post_count"))
    ).collect()
    for r in got:
        assert r["kept"] == r["expect"], (r["is_vip"], r["post_count"])


def test_infer_ext_cases(spark):
    """P10 (crawler.py:576-580): known image suffixes, else jpg."""
    cases = [
        ("https://x/a.png", "png"),
        ("https://x/a.JPEG", "JPEG"),  # case preserved (crawler.py:578-580)
        ("https://x/a.webp?v=1", "webp"),
        ("https://x/a.gif", "gif"),
        ("https://x/a.svg", "jpg"),  # not in the image set -> default
        ("https://x/a", "jpg"),
        ("https://x/a.bin", "jpg"),
        ("https://x/a?b.png", "png"),  # query split AFTER the dot split
        ("https://x/a.png?v=2.1", "jpg"),  # LAST dot wins -> '1' not in set
        ("https://x/a.PNG", "PNG"),
    ]
    df = spark.createDataFrame(cases, "url string, expect string")
    for r in df.withColumn("ext", ops.infer_ext(F.col("url"))).collect():
        assert r["ext"] == r["expect"], r["url"]


def test_normalize_format(spark):
    df = spark.createDataFrame(
        [("ppt", "pptx"), ("doc", "docx"), ("xls", "xlsx"), ("pdf", "pdf"),
         ("hwp", "hwp")],
        "ext string, expect string",
    )
    for r in df.withColumn("n", ops.normalize_format(F.col("ext"))).collect():
        assert r["n"] == r["expect"]


def test_ordered_distinct_first_occurrence(spark):
    df = spark.createDataFrame([(["b", "a", "b", "c", "a"],)], "arr array<string>")
    got = df.select(ops.ordered_distinct(F.col("arr")).alias("o")).collect()[0]["o"]
    assert got == ["b", "a", "c"]


def test_detect_array_matches_exploded_variant(spark):
    """The zero-shuffle array implementation must agree with the explode+
    groupBy implementation on the fixture anchor zoo."""
    from crawlspark.fixtures import SiteSpec, build_site, render_post_html
    from crawlspark.parse import parse_post_html

    site = build_site(SiteSpec(pages=3, posts_per_page=10))
    rows = [(t.post_id, render_post_html(site, t)) for t in site.posts.values()]
    df = spark.createDataFrame(rows, "post_id string, html string").withColumn(
        "parsed", parse_post_html(F.col("html"))
    )
    arr = df.select(
        "post_id",
        ops.detect_downloads_array(
            F.col("parsed.content"), F.col("parsed.content_anchors")
        ).alias("d"),
    ).select("post_id", "d.*")
    exp = ops.detect_downloads(df.select("post_id", "parsed"))
    a = {r["post_id"]: r.asDict() for r in arr.collect()}
    e = {r["post_id"]: r.asDict() for r in exp.collect()}
    assert set(a) == set(e)
    for pid in a:
        assert a[pid]["has_download"] == e[pid]["has_download"], pid
        assert list(a[pid]["file_formats"]) == list(e[pid]["file_formats"]), pid
        assert list(a[pid]["file_sources"]) == list(e[pid]["file_sources"]), pid
        assert a[pid]["_download_summary"] == e[pid]["_download_summary"], pid


def test_image_urls_array_matches_exploded_variant(spark):
    from crawlspark.fixtures import SiteSpec, build_site, render_post_html
    from crawlspark.parse import parse_post_html

    site = build_site(SiteSpec(pages=3, posts_per_page=10))
    rows = [(t.post_id, render_post_html(site, t)) for t in site.posts.values()]
    df = spark.createDataFrame(rows, "post_id string, html string").withColumn(
        "parsed", parse_post_html(F.col("html"))
    )
    base = site.spec.base_url
    arr = {
        r["post_id"]: list(r["urls"])
        for r in df.select(
            "post_id",
            ops.image_urls_array(F.col("parsed.img_srcs"), base).alias("urls"),
        ).collect()
    }
    for t in site.posts.values():
        assert arr[t.post_id] == t.expected_image_urls, t.post_id


def test_content_fallback_stateful_scan(spark):
    """P7 (crawler.py:375-394): drop short/UI lines, start at first >30-char
    line."""
    body = "\n".join(
        [
            "로그인",  # UI word -> dropped
            "short",  # 5 chars -> kept only after start
            "x" * 31,  # starts content
            "mid line that stays",
            "메뉴",  # UI word -> dropped
            "tail",  # short but >=5? 'tail'=4 chars -> dropped
            "tail5",  # 5 chars -> kept
        ]
    )
    df = spark.createDataFrame([(body,)], "body string")
    got = df.select(
        ops.content_fallback(F.col("body")).alias("c")
    ).collect()[0]["c"]
    assert got == "\n".join(["x" * 31, "mid line that stays", "tail5"])
