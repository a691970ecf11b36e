"""Scaling-efficiency evidence: same job at two parallelism levels.

The north rule requires >=0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in the sandbox, so per the task brief we
run the SAME fetch+parse workload on the SAME input at two parallelism
levels in separate processes and report throughput at both plus
efficiency = (rate_4N / rate_N) / 4.

Core choice: pandas-UDF stages use a JVM task thread AND a Python worker
per slot, so local[32] on this 32-core box oversubscribes 2x while
local[8] gets free headroom — that pair measures the box, not the
engine. Default is therefore local[4] vs local[16] (32 runnable threads
at peak = the core count); override with argv if the host differs.

Writes BENCH/BASELINE.md. Usage:
  python scripts/bench_scaling.py [n_posts] [n_cores] [n4_cores] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from crawlspark.session import get_spark
from bench.workload import run_fetch_parse_bench, synth_posts, fetch_parse_pipeline
import pyspark.sql.functions as F

spark = get_spark("scaling-bench", master="local[{cores}]",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
# warmup: JVM + python workers + codegen, small slice of the same pipeline
fetch_parse_pipeline(synth_posts(spark, 2000)).agg(F.sum("posts")).collect()
res = run_fetch_parse_bench(spark, {n})
print("RESULT:" + json.dumps(res))
spark.stop()
"""


def run_at(cores: int, n: int, reps: int = 2) -> dict:
    """Run the workload in a subprocess PINNED to exactly `cores` CPUs.

    Pinning (taskset) makes 'N cores' mean N cores: a pandas-UDF slot
    occupies a JVM task thread AND a Python worker, so an unpinned
    local[N] borrows ~2N host cores — small-N configs get free extra CPU
    and the measured 'efficiency' is biased low. With equal per-config
    thread-to-core footprints the comparison is the cluster question:
    same job, 4x the silicon."""
    best = None
    cpu_list = ",".join(str(c) for c in range(cores))
    for _ in range(reps):
        code = CHILD.format(repo=REPO, cores=cores, parts=2 * cores, n=n)
        p = subprocess.run(
            ["taskset", "-c", cpu_list, sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        res = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT:"):
                res = json.loads(line[7:])
        if res is None:
            raise RuntimeError(f"no result from local[{cores}]: {p.stderr[-2000:]}")
        if best is None or res["seconds"] < best["seconds"]:
            best = res
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240000
    c1 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    c4 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    r1 = run_at(c1, n, reps)
    print(f"local[{c1}] : {r1}")
    r4 = run_at(c4, n, reps)
    print(f"local[{c4}]: {r4}")
    eff = (r4["posts_per_sec"] / r1["posts_per_sec"]) / (c4 / c1)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling evidence ({date.today().isoformat()})

Same fetch+parse workload (bench/workload.py: hash-expanded synthetic
frontier of {n:,} post pages -> parse UDF -> skip filter -> image extract
-> download detect -> per-page agg), same input, two parallelism levels,
separate processes, warmed-up sessions, best of {reps}.

Methodology: each config runs in a subprocess PINNED (taskset) to exactly
its core budget, because a pandas-UDF slot occupies a JVM task thread AND
a Python worker — an unpinned local[N] borrows ~2N host cores, giving
small-N configs free extra CPU and biasing measured efficiency low. With
pinning, 'N cores vs 4N cores' is the actual cluster question: same job,
4x the silicon. Host: {os.cpu_count()} cores, shared (noisy neighbors —
hence best-of-reps).

| config | seconds | posts/sec | pages |
|---|---|---|---|
| local[{c1}]  (N)  | {r1["seconds"]} | {r1["posts_per_sec"]} | {r1["pages"]} |
| local[{c4}] (4N) | {r4["seconds"]} | {r4["posts_per_sec"]} | {r4["pages"]} |

**Scaling efficiency (N -> 4N) = (rate_4N / rate_N) / 4 =
{eff:.3f}** (target >= 0.8, BASELINE.json north rule).

Reference implied throughput: ~0.17-0.25 posts/s (sequential, politeness
sleeps — BASELINE.md). Engine at local[{c4}]: {r4["posts_per_sec"]} posts/s
fetched+parsed ({r4["posts_per_sec"] / 0.25:,.0f}x the reference ceiling),
with politeness tracked as deterministic virtual-time accounting rather
than wall-clock sleeps.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"\nefficiency: {eff:.3f}  -> BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
