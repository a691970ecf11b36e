"""Round-6 experiment 4: Arrow-stage minhash with per-task shingle memo."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawlspark.contract import _t, Q
from crawlspark import pipeline_ops as P
from crawlspark.session import get_spark

SIG_SCHEMA = "doc_id long, " + ", ".join(
    f"sig{s} string" for s in range(P.MINHASH_SEEDS)
)


def sigs_arrow(d):
    import hashlib

    import pandas as pd

    seeds = list(range(P.MINHASH_SEEDS))
    prefixes = [f"{s}:".encode() for s in seeds]

    wdf = d.select("doc_id", F.split("text", r"\s+").alias("__w"))
    shdf = wdf.select(
        "doc_id", P._shingles_spark(F.col("__w")).alias("__sh")
    )

    def pipe(batches):
        memo: dict = {}

        def hashes(sh):
            h = memo.get(sh)
            if h is None:
                b = sh.encode("utf-8")
                h = tuple(
                    hashlib.md5(p + b).hexdigest() for p in prefixes
                )
                memo[sh] = h
            return h

        for pdf in batches:
            out_ids = []
            out_sigs = []
            for did, arr in zip(pdf["doc_id"], pdf["__sh"]):
                if arr is None or len(arr) == 0:
                    continue
                hs = [hashes(sh) for sh in arr]
                out_ids.append(did)
                out_sigs.append(tuple(min(col) for col in zip(*hs)))
            cols = {"doc_id": out_ids}
            for s in seeds:
                cols[f"sig{s}"] = [t[s] for t in out_sigs]
            yield pd.DataFrame(cols)

    return shdf.mapInPandas(pipe, schema=SIG_SCHEMA)


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


def noop(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("exp-minhash4", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = _t(spark, sf_dir, "documents")
    # warm python workers
    noop(sigs_arrow(d.limit(2000)), "warmup")

    noop(sigs_arrow(d), "ARROW signatures (run1)")
    noop(sigs_arrow(d), "ARROW signatures (run2)")
    noop(pairs_from(sigs_arrow(d)), "ARROW pairs (run1)")
    noop(pairs_from(sigs_arrow(d)), "ARROW pairs (run2)")

    cur = P.dedup_minhash_signatures(spark, sf_dir)
    alt = sigs_arrow(d)
    diff = cur.exceptAll(alt).count() + alt.exceptAll(cur).count()
    print(f"signatures diff rows (must be 0): {diff}")
    pc = Q["dedup_minhash_lsh_pairs"](spark, sf_dir)
    pa = pairs_from(sigs_arrow(d))
    diff2 = pc.exceptAll(pa).count() + pa.exceptAll(pc).count()
    print(f"pairs diff rows (must be 0): {diff2}")
    spark.stop()


if __name__ == "__main__":
    main()
