"""Round-6 experiment: where does dedup_minhash_lsh_pairs spend its time,
and does a row-local HOF minhash beat the explode+groupBy form?

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/exp_minhash.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawlspark.contract import Q, _t
from crawlspark import pipeline_ops as P
from crawlspark.session import get_spark


def noop(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("exp-minhash", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    d = _t(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")

    stats = d.select(F.count("*").alias("n"), F.avg(F.size(words)).alias("w")).collect()[0]
    print(f"docs={stats['n']} avg_words={stats['w']:.1f}")

    # stage A: shingle build only (no explode)
    sh_arr = d.select("doc_id", P._shingles_spark(words).alias("sh"))
    noop(sh_arr, "A shingle arrays only")

    # stage B: current signatures (explode + groupBy + 8x min(md5))
    noop(P.dedup_minhash_signatures(spark, sf_dir), "B signatures current")

    # stage C: row-local HOF signatures: array_min(transform(shingles, md5))
    def sigs_hof(dd):
        sh = P._shingles_spark(F.split("text", r"\s+"))
        base = dd.select("doc_id", sh.alias("__sh")).filter(F.size("__sh") > 0)
        aggs = [
            F.array_min(
                F.transform("__sh", lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)))
            ).alias(f"sig{i}")
            for i in range(P.MINHASH_SEEDS)
        ]
        return base.select("doc_id", *aggs)

    noop(sigs_hof(d), "C signatures HOF row-local")

    # stage C2: HOF but distinct shingles first
    def sigs_hof2(dd):
        sh = F.array_distinct(P._shingles_spark(F.split("text", r"\s+")))
        base = dd.select("doc_id", sh.alias("__sh")).filter(F.size("__sh") > 0)
        aggs = [
            F.array_min(
                F.transform("__sh", lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)))
            ).alias(f"sig{i}")
            for i in range(P.MINHASH_SEEDS)
        ]
        return base.select("doc_id", *aggs)

    noop(sigs_hof2(d), "C2 signatures HOF distinct-shingles")

    # stage C3: single transform producing min over all 8 via one pass?
    # skip; first compare equality of C vs B
    cur = P.dedup_minhash_signatures(spark, sf_dir)
    alt = sigs_hof2(d)
    diff = cur.exceptAll(alt).count() + alt.exceptAll(cur).count()
    print(f"signatures diff rows (must be 0): {diff}")

    # stage D: full current pairs
    noop(Q["dedup_minhash_lsh_pairs"](spark, sf_dir), "D pairs current")

    # stage E: pairs on top of HOF signatures
    def pairs_from(sigs):
        bands = sigs.select(
            "doc_id",
            *[
                F.md5(F.concat(F.col(f"sig{2*b}"), F.col(f"sig{2*b+1}"))).alias(f"band{b}")
                for b in range(P.LSH_BANDS)
            ],
        )
        expl = bands.select(
            "doc_id",
            F.posexplode(F.array(*[F.col(f"band{b}") for b in range(P.LSH_BANDS)])).alias(
                "band_id", "bucket"
            ),
        )
        grouped = (
            expl.groupBy("band_id", "bucket")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        return (
            grouped.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS doc_a, y AS doc_b))))"
                    )
                ).alias("p")
            ).select("p.doc_a", "p.doc_b").distinct()
        )

    noop(pairs_from(sigs_hof2(d)), "E pairs HOF")

    pc = Q["dedup_minhash_lsh_pairs"](spark, sf_dir)
    pa = pairs_from(sigs_hof2(d))
    diff2 = pc.exceptAll(pa).count() + pa.exceptAll(pc).count()
    print(f"pairs diff rows (must be 0): {diff2}")

    spark.stop()


if __name__ == "__main__":
    main()
