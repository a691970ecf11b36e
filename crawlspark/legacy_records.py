"""Legacy v5 typed-record stream — the `type`-tagged record shape of
`legacy/crawler_legacy.py` re-expressed as one DataFrame view over the
engine's committed tables.

The legacy pipeline emits, per post, a stream of dicts discriminated by a
`type` field (src/models/models.py:120,131,156,181,194;
legacy/crawler_legacy.py:341-400):

    post_info | download_info | text_content | image |
    pdf_extract | pptx_extract | docx_extract | hwp_extract |
    xlsx_extract | error

This module reconstructs that stream relationally from `posts`, `images`
and `errors` — projections and one posexplode, no extra state.

File-parser stubs: the reference's parse_pdf/pptx/docx/hwp
(legacy/crawler_legacy.py:333-400) extract text from downloaded binaries.
The document libraries are not in this container, so the extract content is
a DETERMINISTIC STUB string ``[<fmt> extract of <filename>]`` — the
Spark-side plumbing (per-link explode, format inference incl. the legacy
default-to-pptx heuristic for formatless download buttons, legacy:518,598,
681, record typing/ordering) is real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark.catalog import Catalog

# normalized doc formats the legacy parsers handle (legacy:743-777)
_DOC_EXTS = ["pdf", "pptx", "docx", "hwp", "xlsx"]

_TYPE_RANK = {
    "post_info": 0,
    "download_info": 1,
    "text_content": 2,
    "image": 3,
    **{f"{fmt}_extract": 4 for fmt in _DOC_EXTS},
    "error": 5,
}


def _base(df: DataFrame, rec_type, src, title, content, has_download,
          file_formats, idx) -> DataFrame:
    return df.select(
        "post_id",
        rec_type.alias("type"),
        src.alias("src"),
        title.alias("title"),
        content.alias("content"),
        has_download.alias("has_download"),
        file_formats.alias("file_formats"),
        idx.alias("idx"),
        "page",
        "pos_in_page",
    )


def to_legacy_records(spark: SparkSession, cat: Catalog) -> DataFrame:
    """Typed record stream in legacy emission order:
    (page, pos_in_page, type_rank, idx) — post_info first, then
    download_info, text_content, ordered images, per-link extract stubs,
    and error records for posts that exhausted retries."""
    posts = cat.read(spark, "posts")
    images = cat.read(spark, "images")
    errors = cat.read(spark, "errors")

    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")
    empty_fmts = F.lit(None).cast("array<string>")

    recs = _base(
        posts, F.lit("post_info"), F.col("url"), F.col("meta.title"),
        F.col("_download_summary"), F.col("has_download"),
        F.col("file_formats"), null_i,
    )
    recs = recs.unionByName(
        _base(
            posts.filter("has_download"), F.lit("download_info"), F.col("url"),
            F.col("meta.title"), null_s, F.lit(True), F.col("file_formats"),
            null_i,
        )
    )
    recs = recs.unionByName(
        _base(
            posts, F.lit("text_content"), F.col("url"), F.col("meta.title"),
            F.col("parsed_content"), F.col("has_download"), empty_fmts, null_i,
        )
    )
    if images is not None:
        # content = OCR text (legacy image records carry ocr_text,
        # src/models/models.py:34,47-49)
        recs = recs.unionByName(
            _base(
                images, F.lit("image"), F.col("url"), F.col("caption"),
                F.col("ocr_text"), F.lit(False), empty_fmts, F.col("img_idx"),
            )
        )

    # per-link file-extract stubs (legacy:333-400): one record per download
    # link; format from the URL extension, else the legacy default-to-pptx
    # heuristic (a download button with no detectable format, legacy:518)
    links = posts.select(
        "post_id", "page", "pos_in_page", F.col("meta.title").alias("title"),
        F.posexplode("file_sources").alias("idx", "link_url"),
    )
    ext = F.lower(
        F.regexp_extract(F.col("link_url"), r"\.([A-Za-z0-9]+)(?:[?#]|$)", 1)
    )
    norm = (
        F.when(ext == "ppt", "pptx")
        .when(ext == "doc", "docx")
        .when(ext == "xls", "xlsx")
        .otherwise(ext)
    )
    fmt = F.when(norm.isin(_DOC_EXTS), norm).otherwise(F.lit("pptx"))
    fname = F.element_at(F.split(F.col("link_url"), "/"), -1)
    stub = F.format_string("[%s extract of %s]", fmt, fname)
    # real extracted content where the files table fetched the payload
    # (S6, driver files stage) — the stub remains only for links with no
    # fetchable payload (keyword-only anchors), exactly the links the
    # reference's parse_file dispatch skips (legacy:795-801)
    files = cat.read(spark, "files")
    extract = links.withColumn("fmt", fmt)
    if files is not None:
        extract = extract.join(
            files.select(
                "post_id",
                F.col("url").alias("link_url"),
                F.col("content").alias("__file_text"),
            ),
            ["post_id", "link_url"],
            "left",
        )
    else:
        extract = extract.withColumn("__file_text", F.lit(None).cast("string"))
    recs = recs.unionByName(
        extract.select(
            "post_id",
            F.concat("fmt", F.lit("_extract")).alias("type"),
            F.col("link_url").alias("src"),
            "title",
            F.coalesce(F.col("__file_text"), stub).alias("content"),
            F.lit(True).alias("has_download"),
            F.array("fmt").alias("file_formats"),
            F.col("idx").cast("int").alias("idx"),
            "page",
            "pos_in_page",
        )
    )

    if errors is not None:
        recs = recs.unionByName(
            _base(
                errors, F.lit("error"), F.col("url"), null_s, F.col("error"),
                F.lit(False), empty_fmts, null_i,
            )
        )

    rank = F.coalesce(
        *[
            F.when(F.col("type") == t, F.lit(r))
            for t, r in _TYPE_RANK.items()
        ]
    )
    return recs.withColumn("type_rank", rank).orderBy(
        "page", "pos_in_page", "type_rank", F.coalesce("idx", F.lit(0))
    )
