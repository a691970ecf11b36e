"""Round-6 experiment: where does image_cluster_members spend its time?"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawlspark import imagededup as I
from crawlspark import pipeline_ops as P
from crawlspark.session import get_spark
from bench.workload import synth_images


def noop(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)


def timed(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)
    return r


def main():
    n = int(os.environ.get("N_IMAGES", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("exp-imgdedup", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism))

    # warm
    t0 = time.time()
    I.image_cluster_members(synth_images(spark, 20000)).agg(F.count("*")).collect()
    print(f"warm 20k: {time.time()-t0:.2f}s", flush=True)

    imgs = synth_images(spark, n)
    base = imgs.select("image_id", "phash", *I._ORDER_COLS).filter(
        F.col("phash").isNotNull()
    )
    ph_counts = base.groupBy("phash").agg(F.count("*").alias("n_same"))
    noop(ph_counts, "S1 ph_counts")

    pairs = P.phash_neardup_pairs(
        ph_counts.select("phash"), id_col="phash", phash_col="phash"
    ).select(F.col("img_a").alias("ph_a"), F.col("img_b").alias("ph_b"))
    noop(pairs, "S2 pairs (incl ph_counts)")

    comp = timed("S3 CC components (actioned inside)", lambda: I._phash_components(pairs, ph_counts))
    noop(comp, "S3b comp noop (post-loop lineage)")

    members = I._members_from_components(base, I._phash_components(pairs, ph_counts))
    t0 = time.time()
    r = members.agg(F.count("*").alias("c"), F.countDistinct("cluster").alias("k")).collect()[0]
    print(f"S4 full members agg: {time.time()-t0:.2f}s rows={r['c']} clusters={r['k']}", flush=True)

    spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.stop()


if __name__ == "__main__":
    main()
