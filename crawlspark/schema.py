"""Fixed schemas for all engine state tables (FIXTURES.md §7, BASELINE hint).

The graft input table `images` is exactly the BASELINE.json input_hint:
(image_id:string, bytes:binary, w:int, h:int, fmt:string, caption:string,
phash:long).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGE_STORE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        # number of fetch attempts that fail before this URL serves its body
        # (0 = healthy; >= MAX_FETCH_ATTEMPTS = permanently dead). Drives the
        # deterministic retry/error path (reference: 3 retries / 5 s delay,
        # src/config.py:87-89; error backoff crawler.py:696).
        T.StructField("fail_attempts", T.IntegerType(), True),
    ]
)

POLITENESS = T.StructType(
    [
        T.StructField("scope", T.StringType(), False),  # host#salt
        T.StructField("host", T.StringType(), True),
        T.StructField("salt", T.IntegerType(), True),
        T.StructField("period", T.DoubleType(), False),  # per-scope window
        T.StructField("n_requests", T.LongType(), False),
        T.StructField("finish_at", T.DoubleType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

ERRORS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("post_id", T.StringType(), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("pos_in_page", T.IntegerType(), True),
        T.StructField("error", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("host_bucket", T.IntegerType(), True),
        T.StructField("salt", T.IntegerType(), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("state", T.StringType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("child_url", T.StringType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("pos", T.IntegerType(), True),
    ]
)

CHECKPOINTS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("frontier_offset", T.LongType(), False),
        T.StructField("seen_shard_version", T.IntegerType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("parsed", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("committed_at", T.StringType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("pages_processed", T.LongType(), False),
        T.StructField("posts_processed", T.LongType(), False),
        T.StructField("posts_skipped", T.LongType(), False),
        T.StructField("posts_with_downloads", T.LongType(), False),
        T.StructField("files_processed", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("virtual_seconds", T.DoubleType(), False),
    ]
)

# graft input table (BASELINE.json input_hint) + provenance/order columns
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        # OCR stand-in text per image (legacy OCR stage analog)
        T.StructField("ocr_text", T.StringType(), True),
        # provenance / deterministic-order columns
        T.StructField("post_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("img_idx", T.IntegerType(), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("pos_in_page", T.IntegerType(), True),
    ]
)

# JSONL-record shape (reference storage.py:67-82 field order)
POST_RECORD = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("title", T.StringType(), True),
                    T.StructField("author", T.StringType(), True),
                    T.StructField("date", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("body", T.StringType(), True),
        T.StructField("parsed_content", T.StringType(), True),
        T.StructField("file_sources", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_timestamp", T.StringType(), True),
        T.StructField("post_id", T.StringType(), False),
        T.StructField("_download_summary", T.StringType(), True),
        T.StructField("has_download", T.BooleanType(), True),
        T.StructField("file_formats", T.ArrayType(T.StringType()), True),
    ]
)

# slim post-page parse output: no `anchors` (listing-only) and no
# `body_text` (P7 fallback only) — both are page-sized and dominate Arrow
# transfer if emitted for every post
PARSED_POST = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("page_title", T.StringType(), True),
        T.StructField("sidebar_text", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("img_srcs", T.ArrayType(T.StringType()), True),
        T.StructField(
            "content_anchors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("href", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

PARSED_PAGE = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("page_title", T.StringType(), True),
        T.StructField("sidebar_text", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("img_srcs", T.ArrayType(T.StringType()), True),
        T.StructField(
            "anchors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("href", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "content_anchors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("href", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("body_text", T.StringType(), True),
    ]
)
