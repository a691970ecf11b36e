"""Dump .explain('formatted') for named contract queries to files.

Usage: python scripts/dump_plan.py <outdir> <suffix> <query> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from contextlib import redirect_stdout

    from crawlspark.contract import Q
    from crawlspark import pipeline_ops  # noqa: F401
    from crawlspark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plan", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f, redirect_stdout(f):
            df.explain("formatted")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
