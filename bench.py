"""Benchmark harness — prints ONE JSON line per the driver contract.

Runs the headline contract queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the crawl-engine
fetch+parse throughput workload (bench/workload.py).

Noise control (BENCH/BASELINE.md methodology, judge r2 #8): the process
pins itself to exactly its core budget via taskset (a pandas-UDF slot
occupies a JVM task thread AND a Python worker, so an unpinned local[N]
borrows ~2N cores), and every query runs CRAWLSPARK_BENCH_RUNS times
(default 3) with the best run counting — the shared host swings single-shot
times by ~1.5x. The JSON carries n_runs, per-query run lists, and a
relative-spread variance field so round-over-round numbers are comparable.

Output: ONE compact JSON line on stdout (printed last, short enough to
survive the driver's tail capture — judge r3 #7):
  {"metric": ..., "value": <total suite seconds>, "unit": "sec",
   "queries": {name: best sec}, "sf": ..., "crawl": {...}, "n_runs": N}
The verbose per-run lists + variance go to BENCH/runs_latest.json instead
of the stdout line (r3's BENCH_r03.json had parsed:null because the long
line got its head clipped).
"""

from __future__ import annotations

import json
import os
import shutil
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
    # image axis (round 5): phash band-LSH near-dup + caption dedup —
    # round-over-round suite-seconds comparisons should subtract these
    # two keys when comparing against BENCH_r04 and earlier
    "img_phash_neardup",
    "img_caption_quality_dedup",
]

CRAWL_BENCH_POSTS = int(os.environ.get("CRAWLSPARK_BENCH_POSTS", "500000"))
IMAGE_BENCH_IMAGES = int(os.environ.get("CRAWLSPARK_BENCH_IMAGES", "1000000"))
N_RUNS = int(os.environ.get("CRAWLSPARK_BENCH_RUNS", "3"))


def _self_pin(cpus: int) -> None:
    """Re-exec under taskset pinned to exactly `cpus` cores (idempotent).
    Cores come from the process's OWN affinity mask — a cgroup/cpuset
    sandbox may not contain CPUs 0..N-1 at all."""
    if os.environ.get("CRAWLSPARK_BENCH_PINNED"):
        return
    os.environ["CRAWLSPARK_BENCH_PINNED"] = "1"
    try:
        allowed = sorted(os.sched_getaffinity(0))
    except AttributeError:
        return
    if len(allowed) <= cpus or shutil.which("taskset") is None:
        return
    cores = ",".join(str(c) for c in allowed[:cpus])
    os.execvp(
        "taskset", ["taskset", "-c", cores, sys.executable, *sys.argv]
    )


def _is_pinned(cpus: int) -> bool:
    """True iff the process actually runs within its core budget."""
    try:
        return len(os.sched_getaffinity(0)) <= cpus
    except AttributeError:
        return False


def _rel_spread(runs: list[float]) -> float:
    best = min(runs)
    return round((max(runs) - best) / best, 3) if best > 0 else 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _self_pin(cpus)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    from crawlspark.contract import Q
    from crawlspark import pipeline_ops  # noqa: F401 (registers)
    from crawlspark.session import get_spark

    spark = get_spark("crawlspark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM/session so per-query times measure the queries
    spark.range(1000).selectExpr("sum(id)").collect()

    queries: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        fn = Q[name]
        runs: list[float] = []
        n = -1
        for _ in range(N_RUNS):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        best = min(runs)
        queries[name] = best
        query_runs[name] = runs
        total += best
        print(
            f"# {name}: best {best:.2f}s of {runs} rows={n}", file=sys.stderr
        )

    from pyspark.sql import functions as F

    from bench.workload import fetch_parse_pipeline, run_fetch_parse_bench, synth_posts

    # warm the Python UDF workers + Arrow path (one tiny parse job) so the
    # timed run measures pipeline throughput, not 32 worker cold-starts
    fetch_parse_pipeline(synth_posts(spark, 2000)).agg(F.sum("posts")).collect()
    crawl_runs = [run_fetch_parse_bench(spark, CRAWL_BENCH_POSTS) for _ in range(N_RUNS)]
    crawl = min(crawl_runs, key=lambda c: c["seconds"])
    crawl["runs_posts_per_s"] = [c["posts_per_sec"] for c in crawl_runs]
    crawl["n_runs"] = N_RUNS
    total += crawl["seconds"]
    print(f"# crawl fetch+parse: {crawl}", file=sys.stderr)

    from bench.workload import run_image_dedup_bench

    # round-5 image axis: the engine's content-level near-dup pass
    # (band-LSH pair gen -> connected components -> keeper election).
    # Warm once at small n so the timed runs measure the pass, not the
    # CC loop's first-job codegen.
    run_image_dedup_bench(spark, 20000)
    img_runs = [
        run_image_dedup_bench(spark, IMAGE_BENCH_IMAGES) for _ in range(N_RUNS)
    ]
    img = min(img_runs, key=lambda c: c["seconds"])
    total += img["seconds"]
    print(f"# image dedup pass: {img}", file=sys.stderr)

    detail = {
        "query_runs": query_runs,
        "crawl_runs": crawl_runs,
        "image_dedup_runs": img_runs,
        "variance": {
            "per_query_rel_spread": {
                name: _rel_spread(runs) for name, runs in query_runs.items()
            },
            "crawl_rel_spread": _rel_spread(
                [c["seconds"] for c in crawl_runs]
            ),
            "image_dedup_rel_spread": _rel_spread(
                [c["seconds"] for c in img_runs]
            ),
        },
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "runs_latest.json"
    )
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as e:  # read-only checkout: detail is best-effort
        print(f"# could not write {detail_path}: {e}", file=sys.stderr)
        detail_path = None

    out = {
        "metric": "headline suite sec + crawl + image-dedup throughput",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl": {
            "n_posts": crawl.get("n_posts"),
            "seconds": crawl.get("seconds"),
            "posts_per_sec": crawl.get("posts_per_sec"),
        },
        "image_dedup": {
            "n_images": img.get("n_images"),
            "seconds": img.get("seconds"),
            "images_per_sec": img.get("images_per_sec"),
        },
        "n_runs": N_RUNS,
        "cpus": cpus,
        "pinned": _is_pinned(cpus),
        "detail": detail_path,
    }
    spark.stop()
    # the contract line prints LAST, after all stderr chatter and the
    # session teardown, so a tail capture always contains it whole; compact
    # separators + no spread fields keep it under the tail budget (all
    # per-run lists and variance live in BENCH/runs_latest.json)
    print(json.dumps(out, separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
