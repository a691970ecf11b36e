"""Round-6 experiment 2: break down the minhash signatures stage cost."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawlspark.contract import _t
from crawlspark import pipeline_ops as P
from crawlspark.session import get_spark


def noop(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("exp-minhash2", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    d = _t(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")
    sh = d.select("doc_id", F.explode(P._shingles_spark(words)).alias("sh"))

    noop(sh, "B1 explode only")
    noop(sh.select("doc_id", F.md5(F.concat(F.lit("0:"), F.col("sh"))).alias("m")), "B2 explode + 1 md5")
    noop(
        sh.select(
            "doc_id",
            *[F.md5(F.concat(F.lit(f"{s}:"), F.col("sh"))).alias(f"m{s}") for s in range(8)],
        ),
        "B3 explode + 8 md5",
    )
    noop(
        sh.groupBy("doc_id").agg(
            *[F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh")))).alias(f"sig{s}") for s in range(8)]
        ),
        "B4 full signatures",
    )

    # alternative shingle construction: transform over indices with concat_ws of slice
    n = F.size(words)
    sh2_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
    )
    sh2 = d.select("doc_id", F.explode(sh2_arr).alias("sh"))
    noop(sh2, "S2 explode slice-shingles")

    # split once in a prior projection so zip_with shifts don't re-split?
    wdf = d.select("doc_id", words.alias("w"))
    sh3 = wdf.select("doc_id", F.explode(P._shingles_spark(F.col("w"))).alias("sh"))
    noop(sh3, "S3 pre-projected words explode")

    spark.stop()


if __name__ == "__main__":
    main()
