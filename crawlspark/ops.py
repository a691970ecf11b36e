"""Relational crawl operators — pure DataFrame column expressions.

Each function is the Spark-first re-expression of one operator row from
SURVEY.md §2 (reference file:line cited per function). No Python UDFs here:
everything is built-in pyspark.sql.functions, so the whole layer runs inside
whole-stage codegen and Catalyst is free to push filters below it.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.canonical import absolutize

# -------------------------------------------------------------- P1: links


def extract_links(listing: DataFrame, base_url: str) -> DataFrame:
    """P1 (crawler.py:165-186): from listing-page anchors, keep hrefs
    matching ^{base}/community/\\d+$ with non-empty titles; per-page
    first-occurrence dedup. Input: (page:int, parsed:PARSED_PAGE).
    Output: (page, link_pos, url, link_title)."""
    pat = f"^{base_url}/community/[0-9]+$".replace(".", r"\.")
    a = listing.select(
        "page", F.posexplode(F.col("parsed.anchors")).alias("pos", "anchor")
    ).select(
        "page",
        "pos",
        F.col("anchor.href").alias("url"),
        F.trim(F.col("anchor.text")).alias("link_title"),
    )
    a = a.filter(F.col("url").rlike(pat) & (F.col("link_title") != ""))
    w = Window.partitionBy("page", "url").orderBy("pos")
    a = a.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    w2 = Window.partitionBy("page").orderBy("pos")
    return a.withColumn("link_pos", F.row_number().over(w2) - 1).drop("pos")


def first_occurrence(df: DataFrame, key: str, order: list[str]) -> DataFrame:
    """W3 (crawler.py:169-181, storage.py:220-222): global first-occurrence-
    wins dedup by structural order — never by arrival."""
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ----------------------------------------------------- P2-P4: skip filter


def vip_flag(sidebar: Column) -> Column:
    """P2 (crawler.py:242-252): sidebar mentions 크리에이터 or 에이스."""
    sb = F.coalesce(sidebar, F.lit(""))
    return sb.contains("크리에이터") | sb.contains("에이스")


def post_count(sidebar: Column) -> Column:
    """P3 (crawler.py:254-265): first integer after 게시글, commas stripped;
    null when absent."""
    raw = F.regexp_extract(F.coalesce(sidebar, F.lit("")), r"게시글\s*([\d,]+)", 1)
    digits = F.regexp_extract(F.regexp_replace(raw, ",", ""), r"\d+", 0)
    return F.nullif(digits, F.lit("")).cast("int")


def keep_predicate(is_vip: Column, count: Column) -> Column:
    """P4 flagship skip filter (crawler.py:267-274): keep iff vip OR count
    unknown OR count >= 100. Three-valued-logic: NULL count must PASS."""
    return is_vip | count.isNull() | (count >= 100)


# ----------------------------------------------------------- P9/P10: images


def image_urls(posts: DataFrame, base_url: str) -> DataFrame:
    """P9 (crawler.py:521-557): DOM-ordered img srcs, drop data:/svg decoys,
    absolutize, ordered dedup; W1 index enumeration (crawler.py:573-582).
    Input: rows with (post_id, page, pos_in_page, parsed). Output adds
    (img_url, img_idx 1-based)."""
    im = posts.select(
        "post_id",
        "page",
        "pos_in_page",
        F.posexplode(F.col("parsed.img_srcs")).alias("pos", "src"),
    )
    im = im.filter(
        ~F.col("src").startswith("data:") & ~F.col("src").endswith(".svg")
    ).withColumn("img_url", absolutize(F.col("src"), base_url))
    im = first_occurrence(im, "img_url", ["pos"]).drop("src")
    # NB: partitionBy includes post_id so dedup is per post
    w = Window.partitionBy("post_id").orderBy("pos")
    return im.withColumn("img_idx", F.row_number().over(w)).drop("pos")


def image_urls_per_post(posts: DataFrame, base_url: str) -> DataFrame:
    """Like image_urls but dedup scoped per post (reference semantics —
    the per-post ordered set, crawler.py:521 'Use list to preserve order')."""
    im = posts.select(
        "post_id",
        "page",
        "pos_in_page",
        F.posexplode(F.col("parsed.img_srcs")).alias("pos", "src"),
    )
    im = im.filter(
        ~F.col("src").startswith("data:") & ~F.col("src").endswith(".svg")
    ).withColumn("img_url", absolutize(F.col("src"), base_url))
    w = Window.partitionBy("post_id", "img_url").orderBy("pos")
    im = (
        im.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    w2 = Window.partitionBy("post_id").orderBy("pos")
    return im.withColumn("img_idx", F.row_number().over(w2)).drop("pos", "src")


def infer_ext(url: Column) -> Column:
    """P10 (crawler.py:576-580): extension from the LAST dot of the full
    final path segment, query stripped AFTER the dot split, original case
    preserved — the reference's exact order of operations
    (`split('/')[-1].split('.')[-1].split('?')[0]`), so 'a.PNG' -> 'PNG',
    'a?b.png' -> 'png', and 'a.png?v=2.1' -> 'jpg' (the last dot wins)."""
    last = F.element_at(F.split(url, "/"), -1)
    possible = F.substring_index(F.substring_index(last, ".", -1), "?", 1)
    return F.when(
        last.contains(".")
        & F.lower(possible).isin("png", "jpeg", "jpg", "gif", "webp"),
        possible,
    ).otherwise(F.lit("jpg"))


# ------------------------------------------------- P11-P19: download detect

CERT_PATTERNS = ["원격평생교육원", "certificate", "인증서", "증명서", "수료증"]
DOC_EXTS = ["pdf", "pptx", "ppt", "docx", "doc", "hwp", "xlsx", "xls"]
EXCLUDED_EXTS = ["jpg", "jpeg", "png", "gif", "svg"]
DOWNLOAD_KEYWORDS = ["다운로드", "download", "첨부파일"]
FILE_REF_PATTERN = r"([가-힣\w\-\[\]\(\)]+\.(?:pdf|pptx?|docx?|hwp|xlsx?|xls))"
# P13 (download_detector.py:259-267, 425-433): full CDN direct-link URL over
# content/page source (fixture CDN host stands in for cdn.weolbu.com)
CDN_URL_PATTERN = (
    r"https?://cdn\.weolbu\.example\.com/(?:[A-Za-z0-9_\-]+/)?"
    r"[가-힣A-Za-z0-9_\-\[\]\(\)]+\.(?:pdf|pptx?|docx?|hwp|xlsx?|xls)"
)
# P14/P17 (download_detector.py:271-390 DOM strategies; 94-168 static
# selector list): span/button/div whose leading text carries a download
# keyword — anchors are handled by the anchor strategy
DOM_AFFORDANCE_PATTERN = r"<(?:span|button|div)[^>]*>[^<]*(?:다운로드|download|첨부파일)"


def normalize_format(ext: Column) -> Column:
    """P18 (download_detector.py:64-70): ppt->pptx, doc->docx, xls->xlsx."""
    return (
        F.when(ext == "ppt", "pptx")
        .when(ext == "doc", "docx")
        .when(ext == "xls", "xlsx")
        .otherwise(ext)
    )


def _anchor_ext(href: Column) -> Column:
    last = F.substring_index(F.element_at(F.split(href, "/"), -1), "?", 1)
    return F.when(
        last.contains("."), F.lower(F.element_at(F.split(last, r"\."), -1))
    ).otherwise(F.lit(""))


def detect_downloads(posts: DataFrame, html_col: str | None = None) -> DataFrame:
    """P11-P19 + J3 + A3/A4 (download_detector.py:64-267, 439-457;
    models.py:228-255): per post -> (has_download, file_formats ordered
    distinct, file_sources ordered distinct, _download_summary).

    Input: (post_id, parsed) rows. Anchor strategy + content file-reference
    scan, certificate filter, excluded image types, format normalization.
    With `html_col` (raw page source column name), the full strategy union
    runs — DOM affordances (P14/P17), proximity window (P15), CDN direct
    link (P13) — matching detect_downloads_array.
    """
    html = F.col(html_col) if html_col else F.lit(None).cast("string")
    an = posts.select(
        "post_id",
        F.col("parsed.content").alias("content"),
        html.alias("__page_html"),
        F.posexplode_outer(F.col("parsed.content_anchors")).alias("pos", "anchor"),
    ).select(
        "post_id",
        "content",
        "__page_html",
        "pos",
        F.col("anchor.href").alias("href"),
        F.col("anchor.text").alias("text"),
    )
    blob = F.lower(F.concat_ws(" ", F.col("href"), F.col("text")))
    is_cert = F.lit(False)
    for p in CERT_PATTERNS:
        is_cert = is_cert | blob.contains(p.lower())
    ext = _anchor_ext(F.col("href"))
    is_excluded = ext.isin(EXCLUDED_EXTS)
    is_doc = ext.isin(DOC_EXTS)
    has_kw = F.lit(False)
    for k in DOWNLOAD_KEYWORDS:
        has_kw = has_kw | F.lower(F.col("text")).contains(k) | F.lower(
            F.col("href")
        ).contains(k)
    an = an.withColumn(
        "a_detected",
        F.col("href").isNotNull() & ~is_cert & ~is_excluded & (is_doc | has_kw),
    ).withColumn(
        "a_format",
        F.when(
            F.col("href").isNotNull() & ~is_cert & ~is_excluded & is_doc,
            normalize_format(ext),
        ),
    )
    # per-post ordered aggregation — collect in anchor DOM order
    agg = an.groupBy("post_id").agg(
        F.max(F.coalesce(F.col("a_detected"), F.lit(False))).alias("anchor_has"),
        F.array_distinct(
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("a_format").isNotNull(),
                                F.struct("pos", F.col("a_format").alias("v")),
                            )
                        )
                    ),
                    lambda s: s["v"],
                ),
                lambda v: v.isNotNull(),
            )
        ).alias("anchor_formats"),
        F.array_distinct(
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("a_detected"),
                                F.struct("pos", F.col("href").alias("v")),
                            )
                        )
                    ),
                    lambda s: s["v"],
                ),
                lambda v: v.isNotNull(),
            )
        ).alias("file_sources"),
        F.first("content", ignorenulls=False).alias("content"),
        F.first("__page_html", ignorenulls=False).alias("__page_html"),
    )
    # P12 content file-reference scan (download_detector.py:218-256)
    refs = F.regexp_extract_all(
        F.coalesce(F.col("content"), F.lit("")), F.lit(FILE_REF_PATTERN), 1
    )
    ref_formats = F.array_distinct(
        F.transform(
            refs,
            lambda fn: normalize_format(
                F.lower(F.element_at(F.split(fn, r"\."), -1))
            ),
        )
    )
    out = agg.withColumn("ref_formats", ref_formats)
    if html_col:
        ph = F.col("__page_html")
        out = out.withColumn("__dom_has", dom_affordance_flag(ph)).withColumn(
            "__prox", proximity_formats(ph)
        ).withColumn("__cdn", cdn_direct_link(ph))
        out = out.withColumn(
            "file_sources",
            F.when(
                (F.size("__prox") > 0)
                & (F.col("__cdn") != "")
                & ~_fname_cert(F.col("__cdn"))
                & ~F.array_contains(F.col("file_sources"), F.col("__cdn")),
                F.concat(F.col("file_sources"), F.array(F.col("__cdn"))),
            ).otherwise(F.col("file_sources")),
        )
    else:
        out = out.withColumn("__dom_has", F.lit(False)).withColumn(
            "__prox", F.array().cast("array<string>")
        )
    out = out.withColumn(
        "has_download",
        F.col("anchor_has")
        | (F.size("ref_formats") > 0)
        | F.col("__dom_has")
        | (F.size("__prox") > 0),
    ).withColumn(
        "file_formats",
        F.array_distinct(
            F.concat(F.col("anchor_formats"), F.col("ref_formats"), F.col("__prox"))
        ),
    )
    return out.select(
        "post_id",
        "has_download",
        "file_formats",
        "file_sources",
        download_summary(
            F.col("has_download"), F.col("file_formats"), F.size("file_sources")
        ).alias("_download_summary"),
    )


def download_summary(has: Column, formats: Column, n_links: Column) -> Column:
    """A3 (models.py:228-255): five-case summary text, exact strings."""
    fstr = F.array_join(formats, ", ")
    return (
        F.when(
            has & (F.size(formats) > 0) & (n_links > 0),
            F.concat(
                F.lit("[다운로드 파일: "),
                fstr,
                F.lit(", "),
                n_links.cast("string"),
                F.lit("개 파일] "),
            ),
        )
        .when(
            has & (F.size(formats) > 0),
            F.concat(F.lit("[다운로드 파일: "), fstr, F.lit("] ")),
        )
        .when(
            has & (n_links > 0),
            F.concat(
                F.lit("[다운로드 가능: "), n_links.cast("string"), F.lit("개 파일] ")
            ),
        )
        .when(has, F.lit("[다운로드 감지됨] "))
        .otherwise(F.lit("[다운로드 없음] "))
    )


# ------------------------------------------- per-row array variants (scale)
#
# The per-POST semantics (ordered image dedup, download detection) are
# functions of one row's arrays — expressing them with higher-order array
# functions instead of explode+window keeps the whole fetch->parse->extract
# ->detect path ONE narrow stage: no shuffle, no window, no cache needed.
# The explode variants above remain for stages that genuinely need one row
# per image (e.g. joining payload bytes).


def ordered_distinct(arr: Column) -> Column:
    """First-occurrence-preserving distinct via aggregate() (W3 as an array
    op). Per-post arrays are tiny, so the O(n^2) contains-check is free."""
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )


def image_urls_array(img_srcs: Column, base_url: str) -> Column:
    """P9 as a pure array expression: drop data:/svg decoys, absolutize,
    ordered dedup — returns array<string> in DOM order."""
    kept = F.filter(
        img_srcs, lambda s: ~s.startswith("data:") & ~s.endswith(".svg")
    )
    absu = F.transform(kept, lambda s: absolutize(s, base_url))
    return ordered_distinct(absu)


def dom_affordance_flag(page_html: Column) -> Column:
    """P14/P17 (download_detector.py:271-320, 94-168): span/button/div
    download affordances (user CSS selector, exact span, generic keyword
    elements) — a pure boolean, these elements carry no href."""
    return F.lower(F.coalesce(page_html, F.lit(""))).rlike(DOM_AFFORDANCE_PATTERN)


def _fname_cert(fn: Column) -> Column:
    c = F.lit(False)
    for p in CERT_PATTERNS:
        c = c | F.lower(fn).contains(p.lower())
    return c


def proximity_formats(page_html: Column) -> Column:
    """P15 (download_detector.py:392-433): filename matches over the raw
    page source count only if a download keyword occurs within +/-50 chars
    of the filename's FIRST occurrence (the reference uses
    page_source.find). Certificate filenames are dropped. Returns the
    ordered-distinct normalized formats — all JVM HOFs, no UDF."""
    html = F.coalesce(page_html, F.lit(""))
    fnames = F.regexp_extract_all(html, F.lit(FILE_REF_PATTERN), 1)

    # context window around the first occurrence (reference: find() +/- 50;
    # start clamps at 1, so the window LENGTH is end - start, not len+100 —
    # a filename within the first 50 chars must not pull extra right context)
    def ctx_ok(fn):
        pos = F.position(fn, html)
        start = F.greatest(pos - 50, F.lit(1))
        window = F.lower(
            F.substring(html, start, pos + F.length(fn) + 50 - start)
        )
        k = F.lit(False)
        for kw in DOWNLOAD_KEYWORDS:
            k = k | window.contains(kw)
        return (pos > 0) & k

    kept = F.filter(fnames, lambda fn: ctx_ok(fn) & ~_fname_cert(fn))
    return ordered_distinct(
        F.transform(
            kept,
            lambda fn: normalize_format(F.lower(F.element_at(F.split(fn, r"\."), -1))),
        )
    )


def cdn_direct_link(page_html: Column) -> Column:
    """P13 (download_detector.py:259-267, 425-433): FIRST full CDN doc URL
    in the page source (the reference's re.search semantics), '' if none."""
    return F.regexp_extract(F.coalesce(page_html, F.lit("")), CDN_URL_PATTERN, 0)


# ---------------------------------------- strategy 0: user-supplied selector


def selector_to_regex(selector: str) -> str:
    """Translate a CSS selector into a page-source regex (strategy 0,
    download_detector.py:286-306 + config download_selector knob).

    The engine matches STORED page source, not a live DOM, so ancestor
    combinators are honored only down to the final simple selector — the
    reference's deep user selector ends in `... > span` and in practice
    targets that final element. Supported shape: `tag.class1.class2`
    (classes matched as exact whitespace-delimited tokens, any order).

    Unsupported simple-selector syntax (ids, attribute selectors,
    pseudo-classes) raises ValueError LOUDLY — silently compiling a
    never-matching pattern would let an operator believe strategy 0 is
    active while it detects nothing."""
    last = _re.split(r"[>\s]+", selector.strip())[-1]
    if not _re.fullmatch(r"[A-Za-z][\w-]*(\.[\w-]+)*|(\.[\w-]+)+", last):
        raise ValueError(
            f"download_selector: unsupported simple selector {last!r} — "
            "only `tag`, `.class`, or `tag.class1.class2` forms are "
            "honored against stored page source"
        )
    parts = last.split(".")
    tag = _re.escape(parts[0]) if parts[0] else r"\w+"
    classes = [c for c in parts[1:] if c]
    lookaheads = "".join(
        rf'(?=[^>]*class="(?:[^"]* )?{_re.escape(c)}(?: [^"]*)?")'
        for c in classes
    )
    return rf"<{tag}\b{lookaheads}[^>]*>"


# ------------------------------------------------- P16: network-log strategy

CDN_HOST_MARK = "cdn.weolbu.example.com"  # fixture stand-in for cdn.weolbu.com
# the reference's in-loop gate (download_detector.py:340, IGNORECASE —
# applied to the lowercased URL here)
NETLOG_DOC_GATE = r"\.(pdf|pptx?|docx?|hwp|xlsx?)"
# extract_file_extension keyword table IN DICT ORDER (download_detector.py:
# 64-70, 201-206): the first keyword found anywhere in the lowercased URL
# wins, already normalized. The URL-pattern fallback (py:208-214) can never
# fire for gated URLs — the gate guarantees a doc-ext substring exists.
NETLOG_EXT_KEYWORDS = [
    ("pdf", "pdf"),
    ("pptx", "pptx"), ("ppt", "pptx"), ("powerpoint", "pptx"),
    ("프레젠테이션", "pptx"),
    ("docx", "docx"), ("doc", "docx"), ("word", "docx"), ("워드", "docx"),
    ("xlsx", "xlsx"), ("xls", "xlsx"), ("excel", "xlsx"), ("엑셀", "xlsx"),
    ("hwp", "hwp"), ("한글", "hwp"),
]

_NETLOG_ENTRY_SCHEMA = "array<struct<message:string>>"
_NETLOG_MSG_SCHEMA = (
    "struct<message:struct<method:string,"
    "params:struct<request:struct<url:string>>>>"
)


def netlog_ext(url: Column) -> Column:
    """extract_file_extension (download_detector.py:191-216) for netlog
    URLs: first keyword hit in dict order, pre-normalized."""
    low = F.lower(url)
    expr: Column = F.lit("")
    for kw, fmt in reversed(NETLOG_EXT_KEYWORDS):
        expr = F.when(low.contains(kw), F.lit(fmt)).otherwise(expr)
    return expr


def netlog_cdn_urls(netlog_json: Column) -> Column:
    """P16 (download_detector.py:333-349): CDN doc request URLs from a
    performance log, in log order. Two nested from_json calls undo the CDP
    double encoding; method / CDN-host / doc-ext / certificate filters are
    all JVM HOFs — the log body never leaves the row."""
    entries = F.from_json(
        F.coalesce(netlog_json, F.lit("[]")), _NETLOG_ENTRY_SCHEMA
    )
    msgs = F.transform(
        entries,
        lambda e: F.from_json(e["message"], _NETLOG_MSG_SCHEMA)["message"],
    )
    urls = F.transform(
        F.filter(
            msgs,
            lambda m: m["method"] == F.lit("Network.requestWillBeSent"),
        ),
        lambda m: m["params"]["request"]["url"],
    )
    return F.filter(
        urls,
        lambda u: u.isNotNull()
        & u.contains(CDN_HOST_MARK)
        & F.lower(u).rlike(NETLOG_DOC_GATE)
        & ~_fname_cert(u),
    )


def detect_downloads_array(
    content: Column,
    content_anchors: Column,
    page_html: Column | None = None,
    netlog_json: Column | None = None,
    user_selector_pattern: str | None = None,
) -> Column:
    """P11-P19 + A3/A4 as pure array expressions: returns
    struct(has_download, file_formats, file_sources, _download_summary).
    Same semantics as detect_downloads but zero shuffles.

    With `page_html`, the full strategy union runs (download_detector.py
    271-433): anchors + content refs + DOM affordances (P14/P17) +
    proximity-window page-source scan (P15) + CDN direct link (P13, added
    to file_sources only when a proximity match fired and the URL isn't
    already present — the reference's in-loop re.search semantics).

    `netlog_json` adds P16 (download_detector.py:333-349): CDN doc request
    URLs from the performance log merge into file_sources/file_formats, but
    only when the generic download-button affordance fired (the reference
    runs the netlog scan inside its `if download_buttons:` branch).

    `user_selector_pattern` adds strategy 0 (download_detector.py:286-306):
    a pre-compiled selector regex (ops.selector_to_regex) matched against
    the page source sets has_download alone — the user element carries no
    href, so it contributes no links or formats."""
    anchors = F.coalesce(
        content_anchors,
        F.array().cast("array<struct<href:string,text:string>>"),
    )

    def blob(a):
        return F.lower(F.concat_ws(" ", a["href"], a["text"]))

    def is_cert(a):
        c = F.lit(False)
        for p in CERT_PATTERNS:
            c = c | blob(a).contains(p.lower())
        return c

    def ext_of(a):
        last = F.substring_index(
            F.element_at(F.split(a["href"], "/"), -1), "?", 1
        )
        return F.when(
            last.contains("."), F.lower(F.element_at(F.split(last, r"\."), -1))
        ).otherwise(F.lit(""))

    def has_kw(a):
        k = F.lit(False)
        for kw in DOWNLOAD_KEYWORDS:
            k = k | F.lower(a["text"]).contains(kw) | F.lower(a["href"]).contains(kw)
        return k

    excluded = F.array(*[F.lit(e) for e in EXCLUDED_EXTS])
    docs = F.array(*[F.lit(e) for e in DOC_EXTS])

    def detected(a):
        return (
            a["href"].isNotNull()
            & ~is_cert(a)
            & ~F.array_contains(excluded, ext_of(a))
            & (F.array_contains(docs, ext_of(a)) | has_kw(a))
        )

    def is_doc(a):
        return (
            a["href"].isNotNull()
            & ~is_cert(a)
            & ~F.array_contains(excluded, ext_of(a))
            & F.array_contains(docs, ext_of(a))
        )

    anchor_formats = ordered_distinct(
        F.transform(F.filter(anchors, is_doc), lambda a: normalize_format(ext_of(a)))
    )
    file_sources = ordered_distinct(
        F.transform(F.filter(anchors, detected), lambda a: a["href"])
    )
    refs = F.regexp_extract_all(
        F.coalesce(content, F.lit("")), F.lit(FILE_REF_PATTERN), 1
    )
    ref_formats = F.array_distinct(
        F.transform(
            refs, lambda fn: normalize_format(F.lower(F.element_at(F.split(fn, r"\."), -1)))
        )
    )
    anchor_has = F.exists(anchors, detected)
    empty_str_arr = F.array().cast("array<string>")
    net_fmts = empty_str_arr
    if page_html is not None:
        dom_has = dom_affordance_flag(page_html)
        prox = proximity_formats(page_html)
        cdn = cdn_direct_link(page_html)
        # CDN direct link joins file_sources only when a proximity match
        # fired, the URL isn't a certificate, and it isn't already present
        file_sources = F.when(
            (F.size(prox) > 0)
            & (cdn != "")
            & ~_fname_cert(cdn)
            & ~F.array_contains(file_sources, cdn),
            F.concat(file_sources, F.array(cdn)),
        ).otherwise(file_sources)
        if netlog_json is not None:
            # P16: netlog CDN hits merge only behind the button gate, and
            # only URLs not already collected (py:345 `not any(... == url)`)
            net_new = ordered_distinct(
                F.filter(
                    F.when(dom_has, netlog_cdn_urls(netlog_json)).otherwise(
                        empty_str_arr
                    ),
                    lambda u: ~F.array_contains(file_sources, u),
                )
            )
            file_sources = F.concat(file_sources, net_new)
            net_fmts = F.transform(net_new, netlog_ext)
    else:
        dom_has = F.lit(False)
        prox = empty_str_arr
    sel_has = (
        F.coalesce(page_html, F.lit("")).rlike(user_selector_pattern)
        if (user_selector_pattern and page_html is not None)
        else F.lit(False)
    )
    has = (
        anchor_has | (F.size(ref_formats) > 0) | dom_has | (F.size(prox) > 0)
        | sel_has
    )
    formats = F.array_distinct(
        F.concat(anchor_formats, ref_formats, prox, net_fmts)
    )
    return F.struct(
        has.alias("has_download"),
        formats.alias("file_formats"),
        file_sources.alias("file_sources"),
        download_summary(has, formats, F.size(file_sources)).alias(
            "_download_summary"
        ),
    )


# --------------------------------------------------------------- P7: body


def content_fallback(body_text: Column) -> Column:
    """P7 (crawler.py:375-394): drop short/UI lines, start keeping once a
    line exceeds 30 chars — a stateful scan expressed with the `aggregate`
    higher-order function (no UDF)."""
    ui = ["로그인", "회원가입", "메뉴", "검색", "홈", "마이페이지"]
    lines = F.filter(
        F.transform(F.split(body_text, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) >= 5,
    )
    lines = F.filter(lines, lambda x: ~x.isin(ui))
    # stateful: emit lines only after the first line >30 chars
    acc0 = F.struct(
        F.lit(False).alias("started"), F.array().cast("array<string>").alias("kept")
    )
    agg = F.aggregate(
        lines,
        acc0,
        lambda acc, x: F.struct(
            (acc["started"] | (F.length(x) > 30)).alias("started"),
            F.when(
                acc["started"] | (F.length(x) > 30),
                F.concat(acc["kept"], F.array(x)),
            )
            .otherwise(acc["kept"])
            .alias("kept"),
        ),
    )
    return F.array_join(agg["kept"], "\n")
