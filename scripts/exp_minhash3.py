"""Round-6 experiment 3: shingle-dictionary minhash signatures."""
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


def sigs_dict(d):
    words = F.split("text", r"\s+")
    wdf = d.select("doc_id", words.alias("__w"))
    sh = wdf.select(
        "doc_id", F.explode(P._shingles_spark(F.col("__w"))).alias("sh")
    )
    dict_ = sh.select("sh").distinct().select(
        "sh",
        *[
            F.md5(F.concat(F.lit(f"{s}:"), F.col("sh"))).alias(f"__m{s}")
            for s in range(P.MINHASH_SEEDS)
        ],
    )
    joined = sh.join(dict_, "sh")
    return joined.groupBy("doc_id").agg(
        *[F.min(f"__m{s}").alias(f"sig{s}") for s in range(P.MINHASH_SEEDS)]
    )


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


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("exp-minhash3", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    d = _t(spark, sf_dir, "documents")
    noop(sigs_dict(d), "DICT signatures (run1)")
    noop(sigs_dict(d), "DICT signatures (run2)")
    noop(pairs_from(sigs_dict(d)), "DICT pairs (run1)")
    noop(pairs_from(sigs_dict(d)), "DICT pairs (run2)")

    cur = P.dedup_minhash_signatures(spark, sf_dir)
    alt = sigs_dict(d)
    diff = cur.exceptAll(alt).count() + alt.exceptAll(cur).count()
    print(f"signatures diff rows (must be 0): {diff}")

    from crawlspark.contract import Q
    pc = Q["dedup_minhash_lsh_pairs"](spark, sf_dir)
    pa = pairs_from(sigs_dict(d))
    diff2 = pc.exceptAll(pa).count() + pa.exceptAll(pc).count()
    print(f"pairs diff rows (must be 0): {diff2}")
    spark.stop()


if __name__ == "__main__":
    main()
