"""Benchmark harness — prints ONE JSON line per the driver contract.

Runs the headline contract queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the crawl-engine
fetch+parse throughput workload (bench/workload.py).

Output: {"metric": ..., "value": <total suite seconds>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "crawl": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "w1_image_index_enumeration",
    "w5_topk_per_group",
    "a2_merge_records_by_id",
    "st1_sessionize",
    "p1_first_occurrence_dedup",
    "j1_anti_join_dedup",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_bucket",
    "text_quality_score",
]

CRAWL_BENCH_POSTS = int(os.environ.get("CRAWLSPARK_BENCH_POSTS", "500000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    from crawlspark.contract import Q
    from crawlspark import pipeline_ops  # noqa: F401 (registers)
    from crawlspark.session import get_spark

    spark = get_spark("crawlspark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM/session so per-query times measure the queries
    spark.range(1000).selectExpr("sum(id)").collect()

    queries: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = Q[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)

    from pyspark.sql import functions as F

    from bench.workload import fetch_parse_pipeline, run_fetch_parse_bench, synth_posts

    # warm the Python UDF workers + Arrow path (one tiny parse job) so the
    # timed run measures pipeline throughput, not 32 worker cold-starts;
    # best-of-2 because the sandbox host is shared (see BENCH/BASELINE.md)
    fetch_parse_pipeline(synth_posts(spark, 2000)).agg(F.sum("posts")).collect()
    crawl = run_fetch_parse_bench(spark, CRAWL_BENCH_POSTS)
    second = run_fetch_parse_bench(spark, CRAWL_BENCH_POSTS)
    if second["seconds"] < crawl["seconds"]:
        crawl = second
    total += crawl["seconds"]
    print(f"# crawl fetch+parse: {crawl}", file=sys.stderr)

    out = {
        "metric": "headline suite seconds (sf parquet) + crawl fetch+parse throughput",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl": crawl,
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
