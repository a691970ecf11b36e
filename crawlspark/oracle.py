"""Sequential oracle — pure-Python restatement of the reference crawl loop.

Re-states the live control flow of the reference crawler
(src/crawler/crawler.py:650-726 page loop, 225-326 per-post processing,
518-601 ordered image emission, src/storage/storage.py:33-95 dedup sink)
over the synthetic site from crawlspark/fixtures.py, producing the golden
outputs the Spark engine must match byte-for-byte (BASELINE.json north
rule: "matching the reference's crawl ordering and URL-seen set under the
same seed list + politeness budget"):

- ``crawl_order``  : total visit order (seq, url, page, pos_in_page)
- ``seen``         : final URL-seen set
- ``records``      : JSONL-shaped post records (storage.py:67-82 field order)
- ``images``       : graft-input-table rows (image_id, bytes, w, h, fmt,
                     caption, phash) in (page, pos_in_page, img_idx) order
- ``stats``        : the reference's counter dict (crawler.py:652-658, 718)
- ``virtual_seconds``: politeness accounting — the wall-clock the reference
  would have spent under its hardcoded delays (3s page load crawler.py:141,
  3s post nav crawler.py:331, 1s inter-page crawler.py:688) and the global
  token budget of 5 requests / 10 s (src/config.py:75-77).  The engine
  reproduces this number from the same accounting rules (deterministic —
  tokens, not sleeps).

This module intentionally avoids any Spark; it is the independent check.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from crawlspark import codec
from crawlspark.fixtures import (
    Site,
    image_fmt_of,
    image_payload,
    render_listing_html,
    render_netlog_json,
    render_post_html,
)

# NOTE on seen semantics: the live reference declares `visited_urls`
# (crawler.py:82) but never consults it before `_process_post`; cross-page
# duplicate suppression actually happens at the storage sink (storage.py:44-53,
# keyed by post_id) and in the legacy listing path
# (legacy/crawler_legacy.py:258-268).  The final record set is identical either
# way.  The engine's north rule mandates a frontier URL-seen filter, so oracle
# and engine both use *seen-before-visit* (global first-occurrence): a URL is
# visited at its first listing occurrence only.

# politeness constants (reference values; see BASELINE.md)
WAIT_PAGE_LOAD = 3.0  # crawler.py:141
WAIT_POST_NAV = 3.0  # crawler.py:331
WAIT_BETWEEN_PAGES = 1.0  # crawler.py:688
RATE_LIMIT_REQUESTS = 5  # config.py:75
RATE_LIMIT_PERIOD = 10.0  # config.py:76
MAX_FETCH_ATTEMPTS = 3  # config.py:87 (max_retries)
RETRY_DELAY = 5.0  # config.py:88 + error backoff crawler.py:696

CERT_PATTERNS = ["원격평생교육원", "certificate", "인증서", "증명서", "수료증"]
DOC_EXTS = ["pdf", "pptx", "ppt", "docx", "doc", "hwp", "xlsx", "xls"]
EXCLUDED_EXTS = {"jpg", "jpeg", "png", "gif", "svg"}
FORMAT_NORM = {"ppt": "pptx", "doc": "docx", "xls": "xlsx"}
DOWNLOAD_KEYWORDS = ["다운로드", "download", "첨부파일"]
FILE_REF_RE = re.compile(r"([가-힣\w\-\[\]\(\)]+\.(pdf|pptx?|docx?|hwp|xlsx?|xls))")
# P14/P17 DOM affordances + P13 CDN direct link (mirrors crawlspark.ops)
DOM_AFFORDANCE_RE = re.compile(
    r"<(?:span|button|div)[^>]*>[^<]*(?:다운로드|download|첨부파일)"
)
CDN_URL_RE = re.compile(
    r"https?://cdn\.weolbu\.example\.com/(?:[A-Za-z0-9_\-]+/)?"
    r"[가-힣A-Za-z0-9_\-\[\]\(\)]+\.(?:pdf|pptx?|docx?|hwp|xlsx?|xls)"
)
# P16 netlog strategy (download_detector.py:333-349): CDN host marker,
# doc-extension gate, and the extract_file_extension keyword table in dict
# order (py:64-70) — the first keyword found in the lowercased URL wins
CDN_HOST_MARK = "cdn.weolbu.example.com"
NETLOG_DOC_RE = re.compile(r"\.(pdf|pptx?|docx?|hwp|xlsx?)")
NETLOG_EXT_KEYWORDS = [
    ("pdf", "pdf"),
    ("pptx", "pptx"), ("ppt", "pptx"), ("powerpoint", "pptx"),
    ("프레젠테이션", "pptx"),
    ("docx", "docx"), ("doc", "docx"), ("word", "docx"), ("워드", "docx"),
    ("xlsx", "xlsx"), ("xls", "xlsx"), ("excel", "xlsx"), ("엑셀", "xlsx"),
    ("hwp", "hwp"), ("한글", "hwp"),
]


def _selector_re(selector: str) -> "re.Pattern[str]":
    """Strategy-0 user selector (download_detector.py:286-306) as a
    page-source regex: final simple selector `tag.c1.c2`, classes as exact
    whitespace tokens in any order. Independent restatement of the engine's
    ops.selector_to_regex semantics (incl. rejecting unsupported syntax)."""
    last = re.split(r"[>\s]+", selector.strip())[-1]
    if not re.fullmatch(r"[A-Za-z][\w-]*(\.[\w-]+)*|(\.[\w-]+)+", last):
        raise ValueError(f"unsupported simple selector {last!r}")
    parts = last.split(".")
    tag = re.escape(parts[0]) if parts[0] else r"\w+"
    looks = "".join(
        rf'(?=[^>]*class="(?:[^"]* )?{re.escape(c)}(?: [^"]*)?")'
        for c in parts[1:]
        if c
    )
    return re.compile(rf"<{tag}\b{looks}[^>]*>")


def _netlog_request_urls(netlog_json: str) -> list[str]:
    """requestWillBeSent CDN doc URLs in log order, cert-filtered
    (download_detector.py:333-344) — undoes the CDP double encoding."""
    import json

    out: list[str] = []
    for entry in json.loads(netlog_json):
        msg = json.loads(entry.get("message", "{}")).get("message", {})
        if msg.get("method") != "Network.requestWillBeSent":
            continue
        u = msg.get("params", {}).get("request", {}).get("url", "")
        if (
            CDN_HOST_MARK in u
            and NETLOG_DOC_RE.search(u.lower())
            and not any(p.lower() in u.lower() for p in CERT_PATTERNS)
        ):
            out.append(u)
    return out


def _netlog_ext(url: str) -> str:
    """extract_file_extension keyword scan (download_detector.py:191-216)."""
    low = url.lower()
    for kw, fmt in NETLOG_EXT_KEYWORDS:
        if kw in low:
            return fmt
    return ""


@dataclass
class TokenBucket:
    """Deterministic virtual-time politeness accounting (5 req / 10 s)."""

    times: list[float] = field(default_factory=list)
    now: float = 0.0

    def advance(self, seconds: float) -> None:
        self.now += seconds

    def request(self) -> float:
        window = [t for t in self.times[-RATE_LIMIT_REQUESTS:]]
        if len(window) >= RATE_LIMIT_REQUESTS:
            earliest = self.times[-RATE_LIMIT_REQUESTS]
            self.now = max(self.now, earliest + RATE_LIMIT_PERIOD)
        self.times.append(self.now)
        return self.now


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, str, int, int]]
    seen: set[str]
    records: list[dict]
    images: list[dict]
    stats: dict
    virtual_seconds: float
    errors: list[dict] = field(default_factory=list)
    files: list[dict] = field(default_factory=list)


def _extract_links(base_url: str, html: str) -> list[tuple[str, str]]:
    """Anchor extract + regex filter + per-page first-occurrence dedup
    (crawler.py:165-186)."""
    out: list[tuple[str, str]] = []
    seen_page: set[str] = set()
    pat = re.compile(rf"^{re.escape(base_url)}/community/\d+$")
    for m in re.finditer(r'<a href="([^"]*)">([^<]*)</a>', html):
        href, title = m.group(1), m.group(2).strip()
        if not pat.match(href) or not title or href in seen_page:
            continue
        seen_page.add(href)
        out.append((title, href))
    return out


def _sidebar(html: str) -> str:
    m = re.search(r'<aside class="sidebar">(.*?)</aside>', html, re.S)
    return m.group(1) if m else ""


def _post_count(sidebar_text: str) -> int | None:
    m = re.search(r"게시글\s*([\d,]+)", sidebar_text)
    if not m:
        return None
    m2 = re.search(r"\d+", m.group(1).replace(",", ""))
    return int(m2.group()) if m2 else None


def _title(html: str) -> str:
    m = re.search(r'<h1 class="post-title">(.*?)</h1>', html, re.S)
    if m and m.group(1).strip():
        return m.group(1).strip()
    m = re.search(r"<title>(.*?)</title>", html, re.S)
    return re.sub(r" : 월급쟁이부자들$", "", m.group(1)).strip() if m else ""


def _content(html: str) -> str:
    m = re.search(r'<div class="post-content">(.*?)</div>', html, re.S)
    if not m:
        return ""
    text = re.sub(r"<img [^>]*>", "", m.group(1))
    text = re.sub(r"<a [^>]*>[^<]*</a>", "", text)
    text = text.replace("<br>", "\n")
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    return "\n".join(lines)


def _meta(html: str) -> tuple[str, str]:
    am = re.search(r'<span class="author">(.*?)</span>', html)
    dm = re.search(r'<span class="date" title="(\d{4}-\d{2}-\d{2})"', html)
    return (am.group(1).strip() if am else "", dm.group(1) if dm else "")


def _image_urls(base_url: str, html: str) -> list[str]:
    """DOM-ordered img srcs, drop data:/svg, absolutize, ordered dedup
    (crawler.py:521-557)."""
    m = re.search(r'<div class="post-content">(.*?)</div>', html, re.S)
    scope = m.group(1) if m else html
    out: list[str] = []
    for sm in re.finditer(r'<img src="([^"]*)"', scope):
        src = sm.group(1)
        if src.startswith("data:") or src.endswith(".svg"):
            continue
        absu = src if src.startswith("http") else base_url + src
        if absu not in out:
            out.append(absu)
    return out


def _detect_downloads(
    html: str,
    content: str,
    netlog_json: str | None = None,
    selector_re: "re.Pattern[str] | None" = None,
) -> tuple[bool, list[str], list[str]]:
    """Anchor + content-reference + keyword detection with certificate filter
    and format normalization (download_detector.py:64-79, 170-267, 271-469),
    plus P16 netlog merge (py:333-349, button-gated) and the strategy-0 user
    selector (py:286-306, has_download only).

    Returns (has_download, formats, link_urls)."""
    formats: list[str] = []
    links: list[str] = []
    has = False
    m = re.search(r'<div class="post-content">(.*?)</div>', html, re.S)
    scope = m.group(1) if m else html
    for am in re.finditer(r'<a href="([^"]*)">([^<]*)</a>', scope):
        href, text = am.group(1), am.group(2)
        blob = (href + " " + text).lower()
        if any(p.lower() in blob for p in CERT_PATTERNS):
            continue  # certificate decoy (download_detector.py:73-79)
        last = href.rsplit("/", 1)[-1].split("?")[0]
        ext = last.rsplit(".", 1)[-1].lower() if "." in last else ""
        if ext in EXCLUDED_EXTS:
            continue  # excluded image types (config.py:83-85)
        if ext in DOC_EXTS:
            has = True
            norm = FORMAT_NORM.get(ext, ext)
            if norm not in formats:
                formats.append(norm)
            if href not in links:
                links.append(href)
        elif any(k in text.lower() or k in href.lower() for k in DOWNLOAD_KEYWORDS):
            has = True  # keyword-only anchor, format unknown
            if href not in links:
                links.append(href)
    # content file-reference scan (download_detector.py:218-256)
    for fm in FILE_REF_RE.finditer(content):
        has = True
        ext = fm.group(2).lower()
        norm = FORMAT_NORM.get(ext, ext)
        if norm not in formats:
            formats.append(norm)
    # P14/P17 DOM affordances (download_detector.py:271-320, 94-168):
    # span/button/div whose leading text carries a download keyword
    if DOM_AFFORDANCE_RE.search(html.lower()):
        has = True
    # P15 proximity window over the RAW page source
    # (download_detector.py:392-433): filename match counts only with a
    # download keyword within +/-50 chars of its FIRST occurrence
    prox_hit = False
    for fm in FILE_REF_RE.finditer(html):
        fname = fm.group(1)
        if any(p.lower() in fname.lower() for p in CERT_PATTERNS):
            continue
        pos = html.find(fname)
        ctx = html[max(0, pos - 50): pos + len(fname) + 50].lower()
        if not any(k in ctx for k in DOWNLOAD_KEYWORDS):
            continue
        has = True
        prox_hit = True
        ext = fm.group(2).lower()
        norm = FORMAT_NORM.get(ext, ext)
        if norm not in formats:
            formats.append(norm)
    # P13 CDN direct link (download_detector.py:259-267, 425-433): FIRST
    # full CDN doc URL in the page source, gated on a proximity match
    if prox_hit:
        cm = CDN_URL_RE.search(html)
        if cm:
            cdn = cm.group(0)
            if (
                not any(p.lower() in cdn.lower() for p in CERT_PATTERNS)
                and cdn not in links
            ):
                links.append(cdn)
    # P16 netlog merge (download_detector.py:333-349): only when the generic
    # download-button affordance fired (the reference's `if download_buttons:`)
    if netlog_json and DOM_AFFORDANCE_RE.search(html.lower()):
        for u in _netlog_request_urls(netlog_json):
            if u in links:
                continue
            links.append(u)
            f = _netlog_ext(u)
            if f and f not in formats:
                formats.append(f)
    # strategy 0: user-supplied selector — has_download only, no links/formats
    if selector_re is not None and selector_re.search(html):
        has = True
    return has, formats, links


def _download_summary(has: bool, formats: list[str], n_links: int) -> str:
    """Three-case summary text (src/models/models.py:228-255)."""
    if has:
        if formats:
            fstr = ", ".join(formats)
            if n_links > 0:
                return f"[다운로드 파일: {fstr}, {n_links}개 파일] "
            return f"[다운로드 파일: {fstr}] "
        if n_links > 0:
            return f"[다운로드 가능: {n_links}개 파일] "
        return "[다운로드 감지됨] "
    return "[다운로드 없음] "


def _robots_allowed(url: str, rules) -> bool:
    """Longest-prefix-wins robots check (RFC 9309 §2.2.2) over the site's
    (path_prefix, allow) rules — mirrors crawlspark.robots.filter_allowed.
    No rules / no match => allowed."""
    if not rules:
        return True
    after = url.split("://", 1)[-1]
    path = "/" + after.split("/", 1)[1] if "/" in after else "/"
    matching = [(len(p), allow) for p, allow in rules if path.startswith(p)]
    if not matching:
        return True
    return sorted(matching)[-1][1]  # longest prefix; allow=True wins ties


def run_oracle(
    site: Site,
    max_pages: int | None = None,
    image_size: int = 32,
    download_selector: str = "",
) -> OracleResult:
    spec = site.spec
    selector_re = _selector_re(download_selector) if download_selector else None
    visited: set[str] = set()
    crawl_order: list[tuple[int, str, int, int]] = []
    records: dict[str, dict] = {}
    images: list[dict] = []
    stats = {
        "pages_processed": 0,
        "posts_processed": 0,
        "posts_skipped": 0,
        "posts_with_downloads": 0,
        "files_processed": 0,
        "errors": 0,
    }
    bucket = TokenBucket()
    errors: list[dict] = []
    files: list[dict] = []
    seq = 0

    pages = spec.pages if max_pages is None else min(spec.pages, max_pages)
    for page in range(1, pages + 1):
        bucket.request()  # listing fetch
        bucket.advance(WAIT_PAGE_LOAD)
        html = render_listing_html(site, page)
        links = _extract_links(spec.base_url, html)
        pos_visit = 0
        for _title_txt, url in links:
            if not _robots_allowed(url, site.spec.robots_rules):
                continue  # disallowed: never visited NOR marked seen
            if url in visited:
                continue  # global seen set (crawler.py:82)
            visited.add(url)
            crawl_order.append((seq, url, page, pos_visit))
            seq += 1
            pos_visit += 1

            post_id = url.rsplit("/", 1)[-1]
            truth = site.posts[post_id]
            # retry path (config.py:87-89): each failed attempt consumes a
            # request token + 5 s backoff (crawler.py:696)
            n_fail = min(truth.fail_attempts, MAX_FETCH_ATTEMPTS)
            for _ in range(n_fail):
                bucket.request()  # failed fetch attempt
                bucket.advance(RETRY_DELAY)
            if truth.fail_attempts >= MAX_FETCH_ATTEMPTS:
                errors.append(
                    {
                        "url": url,
                        "post_id": post_id,
                        "page": page,
                        "pos_in_page": pos_visit - 1,
                        "error": f"fetch failed after {MAX_FETCH_ATTEMPTS} attempts",
                        "attempts": MAX_FETCH_ATTEMPTS,
                    }
                )
                stats["errors"] += 1
                continue  # visited but never served (S12 error sink)
            bucket.request()  # post fetch (successful attempt)
            bucket.advance(WAIT_POST_NAV)
            phtml = render_post_html(site, truth)

            side = _sidebar(phtml)
            is_vip = ("크리에이터" in side) or ("에이스" in side)
            count = _post_count(side)
            if (not is_vip) and (count is not None) and (count < 100):
                stats["posts_skipped"] += 1
                continue  # skip rule crawler.py:272 — visited but not processed

            title = _title(phtml)
            content = _content(phtml)
            author, date = _meta(phtml)
            img_urls = _image_urls(spec.base_url, phtml)
            for i, iurl in enumerate(img_urls):
                bucket.request()  # image fetch
                fmt = image_fmt_of(iurl)
                data = image_payload(iurl, image_size, image_size)
                pixels = codec.decode_image(data, fmt)
                images.append(
                    {
                        "image_id": f"{post_id}_{i + 1}",
                        "post_id": post_id,
                        "url": iurl,
                        "img_idx": i + 1,
                        "page": page,
                        "pos_in_page": pos_visit - 1,
                        "bytes": data,
                        "w": image_size,
                        "h": image_size,
                        "fmt": fmt,
                        "caption": title,
                        "phash": codec.phash64(pixels),
                        # OCR stand-in (legacy:322-330 analog)
                        "ocr_text": codec.fake_ocr(pixels),
                    }
                )
                stats["files_processed"] += 1

            netlog_json = (
                render_netlog_json(truth) if truth.netlog_entries else None
            )
            has_dl, formats, link_urls = _detect_downloads(
                phtml, content, netlog_json, selector_re
            )
            if has_dl:
                stats["posts_with_downloads"] += 1
            # S6 attachment payload fetch (crawler.py:467-501 download +
            # legacy:743-777 parse_file dispatch): links with a recognized
            # doc extension fetch their payload; keyword-only anchors have
            # nothing the parser handles. NOT token-bucket requests — the
            # reference downloads via CDP click, not session.get.
            for fidx, link in enumerate(link_urls):
                fname = link.rsplit("/", 1)[-1].split("?")[0]
                ext = fname.rsplit(".", 1)[-1].lower() if "." in fname else ""
                norm = FORMAT_NORM.get(ext, ext)
                if norm not in codec.DOC_MAGIC:
                    continue
                payload = codec.encode_doc(link, norm)
                files.append(
                    {
                        "file_id": f"{post_id}#{fidx}",
                        "post_id": post_id,
                        "url": link,
                        "filename": fname,
                        "fmt": norm,
                        "size": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "content": codec.decode_doc(payload, norm),
                        "page": page,
                        "pos_in_page": pos_visit - 1,
                    }
                )
            records[post_id] = {
                "url": url,
                "meta": {"title": title, "author": author, "date": date},
                "body": content,
                "parsed_content": content,
                "file_sources": link_urls,
                "crawl_timestamp": f"wave-{page}",  # deterministic (see SURVEY §7.3)
                "post_id": post_id,
                "_download_summary": _download_summary(has_dl, formats, len(link_urls)),
                "has_download": has_dl,
                "file_formats": formats,
            }
            stats["posts_processed"] += 1
        stats["pages_processed"] += 1
        bucket.advance(WAIT_BETWEEN_PAGES)

    ordered_records = [records[k] for k in sorted(records)]  # storage.py:53,65
    return OracleResult(
        crawl_order=crawl_order,
        seen=visited,
        records=ordered_records,
        images=images,
        stats=stats,
        virtual_seconds=bucket.now,
        errors=errors,
        files=files,
    )
