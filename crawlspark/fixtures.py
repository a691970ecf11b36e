"""Seeded synthetic-site generator (no network, no external data).

Produces the deterministic fixture universe both the sequential oracle
(crawlspark/oracle.py) and the Spark engine consume:

- ``listing_pages``: page -> ordered anchors (title, href), incl. noise
  anchors that must be filtered (reference regex ^{base}/community/\\d+$,
  src/crawler/crawler.py:177), empty titles (crawler.py:179) and
  cross-page duplicate URLs (seen-set dedup, crawler.py:82,169).
- ``posts``: ground truth per post — is_vip / nullable post_count with
  boundary values {99,100,101} exercising the skip rule crawler.py:272,
  ordered image lists with data:-URI / .svg decoys (crawler.py:537),
  relative+absolute+duplicate srcs, attachment anchor zoo
  (tests/test_download_detector.py:38-56 shapes), UI-noise content lines
  (crawler.py:375-394).
- ``page_store``: one row per fetchable URL (listing/post/image) with
  synthetic HTML bodies / deterministic image payloads. This table replaces
  the network: the engine's fetch stage joins the frontier against it.

Everything derives from (seed, page, pos) via random.Random so any slice is
reproducible; scale knobs (pages, posts/page) let tests use 3x10 and bench
hash-expand to millions.
"""

from __future__ import annotations

import random
import re
from dataclasses import dataclass, field

from crawlspark import codec

BASE_URL = "https://weolbu.example.com"
CDN_HOST = "cdn.weolbu.example.com"
IMG_HOSTS = [CDN_HOST, "img1.example.com", "img2.example.com", "img3.example.com"]
# one deliberately hot host for the skew scenario: CDN gets the big share
IMG_HOST_WEIGHTS = [0.55, 0.25, 0.15, 0.05]

UI_NOISE_LINES = ["로그인", "회원가입", "메뉴", "검색", "홈", "마이페이지"]

# Strategy-0 fixture element (download_detector.py:286-306): its text ("자료실
# 이용권") carries NO download keyword, references no filename, and is not an
# anchor — only a user-supplied selector matching the span's classes finds it.
CUSTOM_BADGE_HTML = '<span class="vip-extra asset-badge">자료실 이용권</span>'
# canonical selector for tests/docs: ancestor combinators are honored only to
# the final simple selector (the engine matches stored source, not a live DOM)
CUSTOM_BADGE_SELECTOR = "section > ul > li span.vip-extra.asset-badge"

# netlog request-URL doc gate — mirror of the reference's in-loop regex
# (download_detector.py:340 `\.(pdf|pptx?|docx?|hwp|xlsx?)` IGNORECASE)
_NETLOG_DOC_RE = re.compile(r"\.(pdf|pptx?|docx?|hwp|xlsx?)", re.I)
_NETLOG_CERT = ("원격평생교육원", "certificate", "인증서", "증명서", "수료증")
_FMT_NORM = {"ppt": "pptx", "doc": "docx", "xls": "xlsx"}


_DL_KEYWORDS = ("다운로드", "download", "첨부파일")


def affordance_fires(dom_affordance: str | None, notice_lines: list[str]) -> bool:
    """Truth-level mirror of the DOM-affordance regex over the rendered page
    (the P16 netlog gate): the dedicated span/button/div element, or any
    notice <div> whose text carries a download keyword — prox-positive and
    CDN-note lines both do."""
    if dom_affordance is not None:
        return True
    return any(k in ln.lower() for ln in notice_lines for k in _DL_KEYWORDS)


def netlog_doc_fmt(url: str) -> str | None:
    """Normalized doc format a netlog request URL would contribute, or None
    if the reference's netlog scan would skip it (non-CDN, non-doc, or
    certificate — download_detector.py:338-349)."""
    if CDN_HOST not in url:
        return None
    low = url.lower()
    if not _NETLOG_DOC_RE.search(low):
        return None
    if any(p.lower() in low for p in _NETLOG_CERT):
        return None
    last = low.rsplit("/", 1)[-1].split("?")[0]
    ext = last.rsplit(".", 1)[-1] if "." in last else ""
    return _FMT_NORM.get(ext, ext)

WORDS = (
    "서울 아파트 전세 매매 분양 청약 금리 대출 투자 상승 하락 규제 정책 "
    "단지 평형 호가 실거래 임대 갭투자 재건축 리모델링 학군 역세권"
).split()

ATTACH_CASES = [
    # (href_tmpl, text, expected_detected, expected_format)
    ("https://{cdn}/files/report_{pid}.pdf", "주간 보고서 다운로드", True, "pdf"),
    ("https://{cdn}/files/deck_{pid}.pptx", "강의자료", True, "pptx"),
    ("/files/doc_{pid}.docx", "문서 다운로드", True, "docx"),
    ("/files/sheet_{pid}.xlsx", "엑셀 자료", True, "xlsx"),
    ("/files/han_{pid}.hwp", "한글 파일", True, "hwp"),
    ("/files/photo_{pid}.jpg", "사진", False, None),  # excluded type
    (
        "https://{cdn}/files/certificate_{pid}.pdf",
        "원격평생교육원 수료 증명서",
        False,
        None,
    ),  # certificate decoy, download_detector.py:73-79 (cert-named file)
    ("javascript:void(0)", "첨부파일 다운로드", True, None),  # keyword-only anchor
]


@dataclass
class SiteSpec:
    pages: int = 3
    posts_per_page: int = 10
    seed: int = 42
    base_url: str = BASE_URL
    max_images: int = 4
    dup_rate: float = 0.15  # fraction of listing slots that repeat an earlier URL
    noise_anchors: int = 2
    empty_title_rate: float = 0.1
    # retry/error knobs (reference: 3 retries / 5 s delay, src/config.py:87-89)
    dead_rate: float = 0.0  # posts whose fetch never succeeds -> error record
    flaky_rate: float = 0.0  # posts that fail 1-2 attempts, then succeed
    # fraction of pages whose REST listing API is unavailable -> the 'auto'
    # listing source falls back to rendering (S3, legacy:313-319)
    api_missing_rate: float = 0.0
    # robots.txt served by the site: (path_prefix, allow) rules under
    # User-agent: * — empty tuple = no robots.txt row in the page store
    robots_rules: tuple = ()
    # P16: fraction of posts that emit a performance-log row (kind='netlog',
    # download_detector.py:333-349 shape); CDN doc requests in it merge into
    # detection only when generic download buttons fired
    netlog_rate: float = 0.0
    # Strategy-0 user selector (download_detector.py:286-306): fraction of
    # posts carrying CUSTOM_BADGE_HTML — an element NO built-in strategy
    # matches, detectable only via a configured download_selector
    custom_badge_rate: float = 0.0


@dataclass
class PostTruth:
    post_id: str
    url: str
    page: int
    pos_in_page: int
    title: str
    author: str
    created_at: str
    is_vip: bool
    post_count: int | None
    content_lines: list[str]
    image_srcs: list[str]  # raw srcs as they appear in HTML (incl. decoys)
    expected_image_urls: list[str]  # absolutized, decoys dropped, ordered dedup
    attach_cases: list[tuple[str, str, bool, str | None]]
    expected_skipped: bool = False
    expected_formats: list[str] = field(default_factory=list)
    # fetch attempts that fail before the body is served; >= MAX_FETCH_ATTEMPTS
    # (crawlspark.politeness) means the post is permanently dead
    fail_attempts: int = 0
    # page-source-only affordances (P13/P14/P15/P17): a DOM download element
    # (span/button/div), bare-filename notice lines (with/without a download
    # keyword in the +/-50 window), and a CDN direct URL in plain text
    dom_affordance: str | None = None
    notice_lines: list[str] = field(default_factory=list)
    cdn_note_url: str | None = None
    # P16 performance-log entries as (method, request_url) in log order;
    # rendered into a kind='netlog' page-store row when non-empty
    netlog_entries: list[tuple[str, str]] = field(default_factory=list)
    # strategy-0 element only a user-configured selector detects
    custom_badge: str | None = None


@dataclass
class Site:
    spec: SiteSpec
    listing: list[list[tuple[str, str]]]  # per page: ordered (title, href)
    posts: dict[str, PostTruth]  # post_id -> truth (first occurrence)
    page_order: list[list[str]]  # per page: hrefs in listing order (post links only)


def _rng(spec: SiteSpec, *parts) -> random.Random:
    # NB: not tuple.__hash__ — str hashes are salted per-process (PYTHONHASHSEED)
    import hashlib

    key = repr((spec.seed, *parts)).encode()
    return random.Random(
        int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")
    )


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _make_post(spec: SiteSpec, page: int, pos: int, pid: int) -> PostTruth:
    rng = _rng(spec, "post", pid)
    post_id = str(pid)
    url = f"{spec.base_url}/community/{post_id}"
    title = f"{_sentence(rng, 3)} {post_id}"
    author = f"user{rng.randrange(100)}"
    created_at = f"2024-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d}"
    is_vip = rng.random() < 0.3
    # nullable with boundary values around 100 (skip rule crawler.py:272)
    roll = rng.random()
    if roll < 0.15:
        post_count: int | None = None
    elif roll < 0.35:
        post_count = rng.choice([99, 100, 101])
    else:
        post_count = rng.randrange(0, 500)

    # content: long lines + short droppables + UI noise (crawler.py:375-394)
    content_lines = []
    for _ in range(rng.randrange(2, 5)):
        content_lines.append(_sentence(rng, rng.randrange(8, 15)))
    # mention a file to exercise P12 content-reference scan on some posts
    if rng.random() < 0.4:
        content_lines.append(f"자료는 월부_강의노트_{post_id}.pdf 참고")

    # images: 0..max in DOM order with decoys and duplicates
    n_img = rng.randrange(0, spec.max_images + 1)
    srcs: list[str] = []
    expected: list[str] = []
    for i in range(n_img):
        fmt = rng.choice(codec.ALL_FMTS)
        host = rng.choices(IMG_HOSTS, weights=IMG_HOST_WEIGHTS, k=1)[0]
        # pin infer_ext edge semantics (crawler.py:576-580): some URLs carry
        # uppercase extensions (case must be preserved) or query strings
        # (stripped AFTER the last-dot split)
        ext = fmt.upper() if rng.random() < 0.15 else fmt
        query = f"?v={rng.randrange(1, 4)}" if rng.random() < 0.2 else ""
        if rng.random() < 0.5:
            src = f"https://{host}/img/p{post_id}_{i}.{ext}{query}"
            absolute = src
        else:
            src = f"/img/p{post_id}_{i}.{ext}{query}"
            absolute = f"{spec.base_url}{src}"
        srcs.append(src)
        if absolute not in expected:
            expected.append(absolute)
        if rng.random() < 0.2:  # duplicate src — ordered dedup must keep first
            srcs.append(src)
    if rng.random() < 0.3:  # decoys dropped at crawler.py:537
        srcs.insert(rng.randrange(0, len(srcs) + 1), "data:image/png;base64,AAAA")
    if rng.random() < 0.3:
        srcs.insert(rng.randrange(0, len(srcs) + 1), "/img/icon.svg")

    # attachments: sample 0-3 zoo cases
    n_att = rng.randrange(0, 4)
    cases = rng.sample(ATTACH_CASES, n_att) if n_att else []
    fmts: list[str] = []
    for _, _, det, f in cases:
        if det and f and f not in fmts:
            fmts.append(f)
    if any(line.endswith(".pdf 참고") for line in content_lines) and "pdf" not in fmts:
        fmts.append("pdf")

    skipped = (not is_vip) and (post_count is not None) and (post_count < 100)

    # page-source-only download affordances (download_detector.py:271-433):
    # exercised by P13/P14/P15/P17 — outside post-content so only the
    # page-source strategies can see them
    dom_affordance = None
    if rng.random() < 0.25:
        dom_affordance = rng.choice(
            [
                '<span class="text-sm font-semibold">다운로드</span>',
                '<button class="dl-btn">자료 다운로드</button>',
                '<div class="dl-row">첨부파일 받기</div>',
            ]
        )
    notice_lines: list[str] = []
    if rng.random() < 0.2:
        # negative proximity case FIRST, padded on both sides so no download
        # keyword can fall inside its +/-50 window
        pad_l = _sentence(rng, 14)
        pad_r = _sentence(rng, 14)
        notice_lines.append(f"{pad_l} 자료집_{post_id}.hwp {pad_r}")
    prox_positive = rng.random() < 0.2
    if prox_positive:
        notice_lines.append(f"다운로드 안내: 특강자료_{post_id}.pptx")
        if "pptx" not in fmts:
            fmts.append("pptx")
    cdn_note_url = None
    if rng.random() < 0.15:
        cdn_note_url = f"https://{CDN_HOST}/files/extra_{post_id}.pdf"
        notice_lines.append(f"{cdn_note_url} 다운로드 가능")
        if "pdf" not in fmts:
            fmts.append("pdf")

    # P16 netlog + strategy-0 badge — SEPARATE rng streams so pre-round-3
    # fixture draws (and every test pinned to them) are unchanged
    badge_rng = _rng(spec, "badge", pid)
    custom_badge = (
        CUSTOM_BADGE_HTML if badge_rng.random() < spec.custom_badge_rate else None
    )
    net_rng = _rng(spec, "netlog", pid)
    netlog_entries: list[tuple[str, str]] = []
    if net_rng.random() < spec.netlog_rate:
        fmt = net_rng.choice(["pdf", "pptx", "hwp", "xlsx", "docx"])
        good = f"https://{CDN_HOST}/net/pack_{post_id}.{fmt}"
        netlog_entries.append(("Network.requestWillBeSent", good))
        if net_rng.random() < 0.3:  # in-log duplicate — dedup must keep one
            netlog_entries.append(("Network.requestWillBeSent", good))
        if net_rng.random() < 0.3:  # certificate decoy — filtered
            netlog_entries.append((
                "Network.requestWillBeSent",
                f"https://{CDN_HOST}/net/certificate_{post_id}.pdf",
            ))
        if net_rng.random() < 0.4:  # non-CDN request — ignored
            netlog_entries.append((
                "Network.requestWillBeSent",
                f"https://analytics.example.com/beacon_{post_id}.js",
            ))
        if net_rng.random() < 0.4:  # CDN non-doc — doc gate rejects
            netlog_entries.append((
                "Network.requestWillBeSent",
                f"https://{CDN_HOST}/img/banner_{post_id}.png",
            ))
        if net_rng.random() < 0.3:  # other CDP method — ignored
            netlog_entries.append((
                "Network.responseReceived",
                f"https://{CDN_HOST}/net/resp_{post_id}.pdf",
            ))
        net_rng.shuffle(netlog_entries)
        # netlog hits only merge when generic download buttons fired
        # (download_detector.py:306-349) — truth mirrors that gate
        if affordance_fires(dom_affordance, notice_lines) and fmt not in fmts:
            fmts.append(fmt)

    # retry/error path: dead posts never serve; flaky posts fail 1-2 attempts
    roll2 = rng.random()
    if roll2 < spec.dead_rate:
        fail_attempts = 3  # == MAX_FETCH_ATTEMPTS -> exhausts retries
    elif roll2 < spec.dead_rate + spec.flaky_rate:
        fail_attempts = rng.randrange(1, 3)  # succeeds within retries
    else:
        fail_attempts = 0
    return PostTruth(
        post_id=post_id,
        url=url,
        page=page,
        pos_in_page=pos,
        title=title,
        author=author,
        created_at=created_at,
        is_vip=is_vip,
        post_count=post_count,
        content_lines=content_lines,
        image_srcs=srcs,
        expected_image_urls=expected,
        attach_cases=cases,
        expected_skipped=skipped,
        expected_formats=sorted(fmts),
        fail_attempts=fail_attempts,
        dom_affordance=dom_affordance,
        notice_lines=notice_lines,
        cdn_note_url=cdn_note_url,
        netlog_entries=netlog_entries,
        custom_badge=custom_badge,
    )


def build_site(spec: SiteSpec | None = None) -> Site:
    spec = spec or SiteSpec()
    listing: list[list[tuple[str, str]]] = []
    posts: dict[str, PostTruth] = {}
    page_order: list[list[str]] = []
    all_prior_urls: list[str] = []
    next_pid = 1000

    for page in range(1, spec.pages + 1):
        rng = _rng(spec, "page", page)
        anchors: list[tuple[str, str]] = []
        hrefs: list[str] = []
        for pos in range(spec.posts_per_page):
            if all_prior_urls and rng.random() < spec.dup_rate:
                # cross-page duplicate: same URL listed again later
                url = rng.choice(all_prior_urls)
                pid = url.rsplit("/", 1)[-1]
                title = posts[pid].title
            else:
                pid_num = next_pid
                next_pid += 1
                truth = _make_post(spec, page, pos, pid_num)
                posts[truth.post_id] = truth
                url = truth.url
                title = truth.title
            if rng.random() < spec.empty_title_rate:
                title = ""  # filtered at crawler.py:179
            anchors.append((title, url))
            hrefs.append(url)
            all_prior_urls.append(url)
        # noise anchors that must NOT match ^{base}/community/\d+$
        for j in range(spec.noise_anchors):
            pos = rng.randrange(0, len(anchors) + 1)
            anchors.insert(
                pos,
                rng.choice(
                    [
                        ("이벤트", f"{spec.base_url}/event/{page}{j}"),
                        ("공지", f"{spec.base_url}/community/notice"),
                        ("외부", "https://other.example.com/community/123"),
                    ]
                ),
            )
        listing.append(anchors)
        page_order.append(hrefs)
    return Site(spec=spec, listing=listing, posts=posts, page_order=page_order)


# ---------------------------------------------------------------- HTML render


def listing_url(spec: SiteSpec, page: int) -> str:
    return f"{spec.base_url}/community?tab=100143&subTab=5&page={page}"


def render_listing_html(site: Site, page: int) -> str:
    anchors = "\n".join(
        f'<a href="{href}">{title}</a>' for title, href in site.listing[page - 1]
    )
    return (
        f"<html><head><title>커뮤니티 {page}페이지 : 월급쟁이부자들</title></head>"
        f"<body><nav>{' '.join(UI_NOISE_LINES)}</nav>\n{anchors}\n</body></html>"
    )


def api_listing_url(spec: SiteSpec, page: int) -> str:
    """S2 REST listing endpoint (legacy/crawler_legacy.py:235-282)."""
    return (
        f"{spec.base_url}/api/v1/community/posts"
        f"?tab=100143&subTab=5&page={page}&size=30"
    )


def render_listing_api_json(site: Site, page: int) -> str:
    """JSON payload of the REST listing (legacy:235-282): ``content[]`` of
    ``{id, title}`` covering the same post slots as the rendered page in the
    same order — noise anchors are a render-only phenomenon; blanked titles
    stay blanked (both extractors drop them)."""
    import json

    pat = re.compile(rf"^{re.escape(site.spec.base_url)}/community/(\d+)$")
    content = []
    for title, href in site.listing[page - 1]:
        m = pat.match(href)
        if not m:
            continue  # noise anchor — never present in the API response
        content.append({"id": int(m.group(1)), "title": title})
    return json.dumps({"content": content, "page": page}, ensure_ascii=False)


def api_page_available(spec: SiteSpec, page: int) -> bool:
    """Deterministic per-page API availability (S3 fallback knob)."""
    if spec.api_missing_rate <= 0:
        return True
    return _rng(spec, "api_avail", page).random() >= spec.api_missing_rate


def render_post_html(site: Site, truth: PostTruth) -> str:
    spec = site.spec
    vip = " 크리에이터" if truth.is_vip else ""
    count = (
        f" 게시글 {truth.post_count:,}" if truth.post_count is not None else ""
    )
    imgs = "\n".join(f'<img src="{s}">' for s in truth.image_srcs)
    attach = "\n".join(
        f'<a href="{h.format(cdn=CDN_HOST, pid=truth.post_id)}">{t}</a>'
        for h, t, _, _ in truth.attach_cases
    )
    content = "<br>\n".join(truth.content_lines)
    notices = "\n".join(
        f'<div class="notice">{ln}</div>' for ln in truth.notice_lines
    )
    affordance = truth.dom_affordance or ""
    badge = truth.custom_badge or ""
    return (
        f"<html><head><title>{truth.title} : 월급쟁이부자들</title></head><body>\n"
        f"<nav>{' '.join(UI_NOISE_LINES)}</nav>\n"
        f'<aside class="sidebar">작성자 {truth.author}{vip}{count}</aside>\n'
        f'<h1 class="post-title">{truth.title}</h1>\n'
        f'<span class="author">{truth.author}</span>\n'
        f'<span class="date" title="{truth.created_at}">{truth.created_at}</span>\n'
        f'<div class="post-content">{content}\n{imgs}\n{attach}</div>\n'
        f"{notices}\n{affordance}\n"
        f'<section class="extras"><ul><li>{badge}</li></ul></section>\n'
        f"</body></html>"
    )


def image_fmt_of(url: str) -> str:
    """Extension inference mirroring crawler.py:576-580 exactly: last dot of
    the full final segment, THEN strip after '?', original case preserved."""
    last = url.rsplit("/", 1)[-1]
    if "." in last:
        possible = last.rsplit(".", 1)[-1].split("?")[0]
        if possible.lower() in {"png", "jpeg", "jpg", "gif", "webp"}:
            return possible
    return "jpg"


def image_payload(url: str, w: int = 32, h: int = 32) -> bytes:
    fmt = image_fmt_of(url)
    return codec.encode_image(codec.synth_pixels(url, w, h), fmt)


# normalized formats the file store serves (legacy parsers, legacy:743-777)
DOC_FMTS = {"pdf", "pptx", "docx", "xlsx", "hwp"}


def post_file_urls(truth: PostTruth) -> list[tuple[str, str]]:
    """(url, fmt) of fetchable attachments in anchor order — certificate
    decoys, excluded image types, and keyword-only (javascript:) anchors
    produce no payload, mirroring which links the reference's parse_file
    dispatch actually handles (legacy:795-801)."""
    out: list[tuple[str, str]] = []
    for href_tmpl, _text, det, fmt in truth.attach_cases:
        if det and fmt in DOC_FMTS:
            out.append((href_tmpl.format(cdn=CDN_HOST, pid=truth.post_id), fmt))
    if truth.cdn_note_url:  # P13 CDN direct link is fetchable too
        out.append((truth.cdn_note_url, "pdf"))
    if affordance_fires(truth.dom_affordance, truth.notice_lines):
        # P16: netlog CDN doc hits enter file_sources only behind the
        # download-button gate, so only then do they need a payload row
        for method, u in truth.netlog_entries:
            if method != "Network.requestWillBeSent":
                continue
            fmt = netlog_doc_fmt(u)
            if fmt in DOC_FMTS and all(u != eu for eu, _ in out):
                out.append((u, fmt))
    return out


def render_netlog_json(truth: PostTruth) -> str:
    """Chrome performance-log shape (download_detector.py:333-338): a JSON
    array of entries whose `message` field is itself a JSON STRING wrapping
    {"message": {"method": ..., "params": {"request": {"url": ...}}}} —
    the double encoding `json.loads(entry['message'])['message']` expects."""
    import json

    entries = [
        {
            "message": json.dumps(
                {
                    "message": {
                        "method": method,
                        "params": {"request": {"url": url}},
                    }
                },
                ensure_ascii=False,
            )
        }
        for method, url in truth.netlog_entries
    ]
    return json.dumps(entries, ensure_ascii=False)


def robots_txt_body(rules) -> str:
    """Render (path_prefix, allow) rules as a User-agent: * robots.txt."""
    lines = ["User-agent: *"]
    for path, allow in rules:
        lines.append(f"{'Allow' if allow else 'Disallow'}: {path}")
    return "\n".join(lines) + "\n"


def page_store_rows(site: Site, image_size: int = 32) -> list[dict]:
    """One row per fetchable URL — the engine's synthetic network."""
    rows: list[dict] = []
    if site.spec.robots_rules:
        rows.append(
            {
                "url": f"{site.spec.base_url}/robots.txt",
                "kind": "robots",
                "page": None,
                "body": robots_txt_body(site.spec.robots_rules),
                "payload": None,
                "fail_attempts": 0,
            }
        )
    for page in range(1, site.spec.pages + 1):
        rows.append(
            {
                "url": listing_url(site.spec, page),
                "kind": "listing",
                "page": page,
                "body": render_listing_html(site, page),
                "payload": None,
                "fail_attempts": 0,
            }
        )
        if api_page_available(site.spec, page):
            rows.append(
                {
                    "url": api_listing_url(site.spec, page),
                    "kind": "listing_api",
                    "page": page,
                    "body": render_listing_api_json(site, page),
                    "payload": None,
                    "fail_attempts": 0,
                }
            )
    for truth in site.posts.values():
        rows.append(
            {
                "url": truth.url,
                "kind": "post",
                "page": None,
                "body": render_post_html(site, truth),
                "payload": None,
                "fail_attempts": truth.fail_attempts,
            }
        )
        for img_url in truth.expected_image_urls:
            rows.append(
                {
                    "url": img_url,
                    "kind": "image",
                    "page": None,
                    "body": None,
                    "payload": image_payload(img_url, image_size, image_size),
                    "fail_attempts": 0,
                }
            )
        for file_url, fmt in post_file_urls(truth):
            rows.append(
                {
                    "url": file_url,
                    "kind": "file",
                    "page": None,
                    "body": None,
                    "payload": codec.encode_doc(file_url, fmt),
                    "fail_attempts": 0,
                }
            )
        if truth.netlog_entries:
            rows.append(
                {
                    "url": truth.url,  # keyed (url, kind) next to the post row
                    "kind": "netlog",
                    "page": None,
                    "body": render_netlog_json(truth),
                    "payload": None,
                    "fail_attempts": 0,
                }
            )
    return rows
