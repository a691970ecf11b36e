"""Round-6 auxiliary benchmark: every contract query, timed + plan-shaped.

NOT the driver bench (bench.py is frozen); this sweep backs the
per-operator checklist in OPTIMIZATION_r06.md: for each queries() entry,
best-of-N `.count()` seconds at $SPARK_GRAFT_SF_DIR plus plan-shape
counters (Exchange nodes, Python eval nodes, join operators) from
`.explain("formatted")`.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
Writes BENCH/r06/allqueries_<sfname>.json and prints a markdown table.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = int(os.environ.get("CRAWLSPARK_BENCH_RUNS", "2"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from crawlspark.contract import Q
    from crawlspark import pipeline_ops  # noqa: F401
    from crawlspark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    rows = {}
    for name, fn in Q.items():
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        runs = []
        n = -1
        for _ in range(N_RUNS):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        shape = {
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "py_eval": len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"FlatMapGroupsInPandas|PythonMapInArrow",
                    plan,
                )
            ),
            "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
            "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "sorts": len(re.findall(r"\(\d+\) Sort\b", plan)),
        }
        rows[name] = {"best": min(runs), "runs": runs, "rows": n, **shape}
        print(
            f"# {name}: best {min(runs):.2f}s rows={n} "
            f"exch={shape['exchanges']} py={shape['py_eval']} "
            f"smj={shape['smj']} bhj={shape['bhj']}",
            file=sys.stderr,
            flush=True,
        )
    spark.sparkContext.setJobDescription(None)

    sfname = os.path.basename(sf_dir.rstrip("/"))
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "r06")
    os.makedirs(outdir, exist_ok=True)
    out_path = os.path.join(outdir, f"allqueries_{sfname}.json")
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_runs": N_RUNS, "queries": rows}, f, indent=1)

    print("| query | best s | exch | pyEval | SMJ | BHJ | cart | sorts |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["best"]):
        print(
            f"| {name} | {r['best']:.2f} | {r['exchanges']} | {r['py_eval']} "
            f"| {r['smj']} | {r['bhj']} | {r['cartesian']} | {r['sorts']} |"
        )
    print(f"total best-sum: {sum(r['best'] for r in rows.values()):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
