"""Vectorized HTML parse — one Arrow-batched pandas UDF, struct out.

Replaces the reference's Selenium selector logic (crawler.py:341-420 title/
content/meta, 521-557 images, download_detector.py DOM strategies) with ONE
parse stage: HTML string -> PARSED_PAGE struct. Everything downstream is
pure DataFrame column expressions (see ops.py), so Catalyst can prune: if a
query only needs `title`, only `title` is computed downstream of the struct
(the parse itself is one pass per page, amortized across all consumers).

Implementation notes: pandas `.str.extract` / `.str.findall` run compiled
C regex per Arrow batch (no Python-level row loop in user code); this is the
sanctioned slow path for genuinely non-relational work (SURVEY §2.9
parse_udf).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from crawlspark.schema import PARSED_PAGE

_TITLE_RE = r'<h1 class="post-title">(.*?)</h1>'
_PAGE_TITLE_RE = r"<title>(.*?)</title>"
_SIDEBAR_RE = r'<aside class="sidebar">(.*?)</aside>'
_AUTHOR_RE = r'<span class="author">(.*?)</span>'
_DATE_RE = r'<span class="date" title="(\d{4}-\d{2}-\d{2})"'
_CONTENT_RE = re.compile(r'<div class="post-content">(.*?)</div>', re.S)
_IMG_RE = re.compile(r'<img src="([^"]*)"')
_ANCHOR_RE = re.compile(r'<a href="([^"]*)">([^<]*)</a>')
_TAG_RE = re.compile(r"<img [^>]*>|<a [^>]*>[^<]*</a>")


def _parse_batch(html: pd.Series) -> pd.DataFrame:
    h = html.fillna("")
    title = h.str.extract(_TITLE_RE, flags=re.S, expand=False).str.strip()
    page_title = h.str.extract(_PAGE_TITLE_RE, flags=re.S, expand=False)
    sidebar = h.str.extract(_SIDEBAR_RE, flags=re.S, expand=False)
    author = h.str.extract(_AUTHOR_RE, expand=False).str.strip()
    date = h.str.extract(_DATE_RE, expand=False)
    content_html = h.str.extract(_CONTENT_RE, expand=False).fillna("")

    def _content_text(c: str) -> str:
        text = _TAG_RE.sub("", c).replace("<br>", "\n")
        return "\n".join(ln.strip() for ln in text.split("\n") if ln.strip())

    content = content_html.map(_content_text)
    img_srcs = content_html.map(lambda c: _IMG_RE.findall(c))
    anchors = h.map(
        lambda s: [{"href": a, "text": t} for a, t in _ANCHOR_RE.findall(s)]
    )
    content_anchors = content_html.map(
        lambda c: [{"href": a, "text": t} for a, t in _ANCHOR_RE.findall(c)]
    )
    body_text = h.map(lambda s: re.sub(r"<[^>]+>", "\n", s))
    return pd.DataFrame(
        {
            "title": title,
            "page_title": page_title,
            "sidebar_text": sidebar,
            "author": author,
            "date": date,
            "content": content,
            "img_srcs": img_srcs,
            "anchors": anchors,
            "content_anchors": content_anchors,
            "body_text": body_text,
        }
    )


@F.pandas_udf(PARSED_PAGE)
def parse_html(html: pd.Series) -> pd.DataFrame:
    return _parse_batch(html)


def coalesced_title(parsed: Column) -> Column:
    """Title coalesce over selectors with page-<title> fallback minus the
    ' : 월급쟁이부자들' suffix (crawler.py:341-357)."""
    fallback = F.trim(
        F.regexp_replace(parsed["page_title"], " : 월급쟁이부자들$", "")
    )
    return F.coalesce(F.nullif(parsed["title"], F.lit("")), fallback)
