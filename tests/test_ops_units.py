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
            F.col("parsed.content"), F.col("parsed.content_anchors"),
            F.col("html"),
        ).alias("d"),
    ).select("post_id", "d.*")
    exp = ops.detect_downloads(
        df.select("post_id", "parsed", "html"), html_col="html"
    )
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


def test_page_source_strategy_union_crafted(spark):
    """P13/P14/P15/P17 on a crafted page: DOM affordance flags, proximity
    positive adds a format, padded negative does not, and the CDN direct
    link is APPENDED to file_sources (no cdn anchor precedes it) — engine
    array op == oracle Python mirror == explicit expectation."""
    from crawlspark.oracle import _detect_downloads
    from crawlspark.parse import parse_post_html

    pad = "서울 아파트 전세 매매 분양 청약 금리 대출 투자 상승 하락 규제 정책 단지"
    cdn = "https://cdn.weolbu.example.com/files/extra_9.pdf"
    html = (
        '<html><body>\n'
        '<div class="post-content">본문 내용입니다 충분히 길게 씁니다 서른 자 이상으로\n'
        '<a href="/files/doc_9.docx">문서 다운로드</a></div>\n'
        f'<div class="notice">{pad} 자료집_9.hwp {pad}</div>\n'
        '<div class="notice">다운로드 안내: 특강자료_9.pptx</div>\n'
        f'<div class="notice">{cdn} 다운로드 가능</div>\n'
        '<button class="dl-btn">자료 다운로드</button>\n'
        "</body></html>"
    )
    has, formats, links = _detect_downloads(html, "")
    assert has is True
    assert formats == ["docx", "pptx", "pdf"]
    assert links == ["/files/doc_9.docx", cdn]

    df = spark.createDataFrame([(html,)], "html string").withColumn(
        "parsed", parse_post_html(F.col("html"))
    )
    got = df.select(
        ops.detect_downloads_array(
            F.col("parsed.content"), F.col("parsed.content_anchors"),
            F.col("html"),
        ).alias("d")
    ).collect()[0]["d"]
    assert got["has_download"] is True
    assert list(got["file_formats"]) == formats
    assert list(got["file_sources"]) == links


def test_dom_affordance_only_sets_flag(spark):
    """A bare span affordance detects with no links/formats -> the
    '[다운로드 감지됨] ' summary case (models.py:252)."""
    from crawlspark.oracle import _detect_downloads, _download_summary
    from crawlspark.parse import parse_post_html

    html = (
        '<html><body><div class="post-content">본문</div>\n'
        '<span class="text-sm font-semibold">다운로드</span></body></html>'
    )
    has, formats, links = _detect_downloads(html, "")
    assert (has, formats, links) == (True, [], [])
    assert _download_summary(has, formats, len(links)) == "[다운로드 감지됨] "
    df = spark.createDataFrame([(html,)], "html string").withColumn(
        "parsed", parse_post_html(F.col("html"))
    )
    got = df.select(
        ops.detect_downloads_array(
            F.col("parsed.content"), F.col("parsed.content_anchors"),
            F.col("html"),
        ).alias("d")
    ).collect()[0]["d"]
    assert got["has_download"] is True
    assert list(got["file_formats"]) == []
    assert list(got["file_sources"]) == []
    assert got["_download_summary"] == "[다운로드 감지됨] "
