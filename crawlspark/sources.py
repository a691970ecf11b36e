"""Listing sources — the reference's three listing scan paths behind one
link-extraction contract.

- S1 render scan: paginated HTML listing pages (crawler.py:124-149), parsed
  to anchors by crawlspark.parse and extracted by ops.extract_links.
- S2 REST API scan (legacy/crawler_legacy.py:235-282, the preferred path):
  ``GET /api/v1/community/posts?tab&subTab&page&size=30`` returns JSON
  ``content[]`` of ``{id, title}`` → ``(title, {base}/community/{id})``.
  Pure JSON-scalar pipeline: ``from_json`` + ``posexplode`` — no HTML parse.
- S3 fallback dispatch (legacy/crawler_legacy.py:313-319): API first, render
  for pages the API cannot serve ("REST API → 실패 시 Headless 렌더링").

Both extractors emit the same schema (page, link_pos, url, link_title) with
identical filter/dedup semantics (non-empty title, ^{base}/community/\\d+$,
per-page first-occurrence), so every downstream operator is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

API_CONTENT_SCHEMA = "struct<content: array<struct<id: long, title: string>>>"


def render_listing_url(base_url: str, page_col):
    return F.concat(
        F.lit(f"{base_url}/community?tab=100143&subTab=5&page="),
        page_col.cast("string"),
    )


def api_listing_url(base_url: str, page: int) -> str:
    return (
        f"{base_url}/api/v1/community/posts"
        f"?tab=100143&subTab=5&page={page}&size=30"
    )


def extract_links_api(api_listings: DataFrame, base_url: str) -> DataFrame:
    """S2 link extraction from the JSON listing payload. Input:
    (page:int, body:string JSON). Output matches ops.extract_links:
    (page, link_pos, url, link_title).

    The API only returns post entries (no noise anchors), but the same
    non-empty-title filter and per-page first-occurrence dedup apply
    (legacy/crawler_legacy.py:258-268)."""
    pat = f"^{base_url}/community/[0-9]+$".replace(".", r"\.")
    a = (
        api_listings.withColumn(
            "parsed", F.from_json(F.col("body"), API_CONTENT_SCHEMA)
        )
        .select(
            "page", F.posexplode(F.col("parsed.content")).alias("pos", "entry")
        )
        .select(
            "page",
            "pos",
            F.concat(
                F.lit(f"{base_url}/community/"),
                F.col("entry.id").cast("string"),
            ).alias("url"),
            F.trim(F.coalesce(F.col("entry.title"), F.lit(""))).alias(
                "link_title"
            ),
        )
    )
    a = a.filter(F.col("url").rlike(pat) & (F.col("link_title") != ""))
    w = Window.partitionBy("page", "url").orderBy("pos")
    a = a.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    w2 = Window.partitionBy("page").orderBy("pos")
    return a.withColumn("link_pos", F.row_number().over(w2) - 1).drop("pos")
