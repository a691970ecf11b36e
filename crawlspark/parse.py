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

from crawlspark.schema import PARSED_PAGE, PARSED_POST

_TITLE_RE = r'<h1 class="post-title">(.*?)</h1>'
_PAGE_TITLE_RE = r"<title>(.*?)</title>"
_SIDEBAR_RE = r'<aside class="sidebar">(.*?)</aside>'
_AUTHOR_RE = r'<span class="author">(.*?)</span>'
_DATE_RE = r'<span class="date" title="(\d{4}-\d{2}-\d{2})"'
_CONTENT_RE = re.compile(r'<div class="post-content">(.*?)</div>', re.S)
_IMG_RE = re.compile(r'<img src="([^"]*)"')
_ANCHOR_RE = re.compile(r'<a href="([^"]*)">([^<]*)</a>')
_TAG_RE = re.compile(r"<img [^>]*>|<a [^>]*>[^<]*</a>")


def _anchor_dicts(found: list) -> list:
    return [{"href": a, "text": t} for a, t in found]


def _parse_post_batch(html: pd.Series) -> pd.DataFrame:
    """Slim per-post parse: everything vectorized pandas .str ops except the
    findall list materialization."""
    h = html.fillna("")
    content_html = h.str.extract(_CONTENT_RE, expand=False).fillna("")
    # tag-strip + <br> -> newline + per-line strip/drop-empty, vectorized:
    # collapse whitespace around newlines, squeeze repeats, trim ends
    content = (
        content_html.str.replace(_TAG_RE, "", regex=True)
        .str.replace("<br>", "\n", regex=False)
        .str.replace(r"[ \t]*\n[ \t]*", "\n", regex=True)
        .str.replace(r"\n+", "\n", regex=True)
        .str.strip()
    )
    return pd.DataFrame(
        {
            "title": h.str.extract(_TITLE_RE, flags=re.S, expand=False).str.strip(),
            "page_title": h.str.extract(_PAGE_TITLE_RE, flags=re.S, expand=False),
            "sidebar_text": h.str.extract(_SIDEBAR_RE, flags=re.S, expand=False),
            "author": h.str.extract(_AUTHOR_RE, expand=False).str.strip(),
            "date": h.str.extract(_DATE_RE, expand=False),
            "content": content,
            "img_srcs": content_html.str.findall(_IMG_RE),
            "content_anchors": content_html.str.findall(_ANCHOR_RE).map(
                _anchor_dicts
            ),
        }
    )


def _parse_batch(html: pd.Series) -> pd.DataFrame:
    h = html.fillna("")
    out = _parse_post_batch(html)
    out["anchors"] = h.str.findall(_ANCHOR_RE).map(_anchor_dicts)
    out["body_text"] = h.str.replace(r"<[^>]+>", "\n", regex=True)
    return out[
        [
            "title", "page_title", "sidebar_text", "author", "date", "content",
            "img_srcs", "anchors", "content_anchors", "body_text",
        ]
    ]


def _trace_rows(trace_dir: str, kind: str, n: int) -> None:
    """Executor-side execution trace (test instrumentation): one tiny file
    per Arrow batch recording how many rows the parse actually processed.
    Summing the files gives the TOTAL parse row count across the job — the
    way tests prove the listing parse lineage is evaluated exactly once per
    wave (driver.py caches the pre-bloom frame; a regression re-runs the
    parse per union branch and the trace sum jumps to ~3x the page count)."""
    import os
    import uuid

    path = os.path.join(trace_dir, f"{kind}-{os.getpid()}-{uuid.uuid4().hex}")
    with open(path, "w") as f:
        f.write(str(n))


def _build_udfs(trace_dir: str | None):
    """(Re)build the two parse UDFs. `trace_dir` is captured in the UDF
    closure (not an env var) so it reaches Python workers regardless of when
    the SparkSession was created.

    CRITICAL: marked nondeterministic (they are in fact deterministic) to
    stop CollapseProject from substituting the UDF call into every
    downstream field reference — otherwise a pipeline touching N parsed
    fields runs the parse N times (measured 9-50x slowdown at high
    parallelism). The only optimization this forfeits is pushing filters
    below the parse, which is never wanted: filters on parsed fields
    require the parse."""

    @F.pandas_udf(PARSED_PAGE)
    def _parse_html_udf(html: pd.Series) -> pd.DataFrame:
        if trace_dir:
            _trace_rows(trace_dir, "page", len(html))
        return _parse_batch(html)

    @F.pandas_udf(PARSED_POST)
    def _parse_post_udf(html: pd.Series) -> pd.DataFrame:
        if trace_dir:
            _trace_rows(trace_dir, "post", len(html))
        return _parse_post_batch(html)

    return (
        _parse_html_udf.asNondeterministic(),
        _parse_post_udf.asNondeterministic(),
    )


_page_udf, _post_udf = _build_udfs(None)


def parse_html(html: Column) -> Column:
    return _page_udf(html)


def parse_post_html(html: Column) -> Column:
    return _post_udf(html)


def set_parse_trace(trace_dir: str | None) -> None:
    """Enable (a directory path) or disable (None) parse execution tracing.
    Affects plans built AFTER the call; the trace dir must exist."""
    global _page_udf, _post_udf
    _page_udf, _post_udf = _build_udfs(trace_dir)


def coalesced_title(parsed: Column) -> Column:
    """Title coalesce over selectors with page-<title> fallback minus the
    ' : 월급쟁이부자들' suffix (crawler.py:341-357)."""
    fallback = F.trim(
        F.regexp_replace(parsed["page_title"], " : 월급쟁이부자들$", "")
    )
    return F.coalesce(F.nullif(parsed["title"], F.lit("")), fallback)
