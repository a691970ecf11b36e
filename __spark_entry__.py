"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The registry lives in crawlspark.contract (crawl-operator analogs from
SURVEY.md §2 + headline analytical queries) and crawlspark.pipeline_ops
(training-data ops: dedup exact/MinHash-LSH/SimHash/n-gram-Jaccard,
similarity search, text analysis, multimodal binary plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawlspark import contract  # noqa: E402
from crawlspark import pipeline_ops  # noqa: E402,F401  (registers into contract)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: shipping-priority join
    chain (selective dim filter -> broadcast joins -> agg -> top-k)."""
    return contract.Q["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + pipeline ops."""
    return dict(contract.Q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query (full coverage — every entry
    has an oracle)."""
    return dict(contract.SQL)
