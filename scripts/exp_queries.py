"""Round-6 experiment: optimized variants of mid-tier headline queries.

Each variant must be result-identical to the registered query (exceptAll
both ways == 0) — verified here at the experiment sf before promotion.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawlspark.contract import Q, _t
from crawlspark.session import get_spark

ANN_QUERIES = 5
ANN_TOPK = 5


def q3_new(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter("c_mktsegment = 'BUILDING'")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o_f = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
        "left_semi",
    ).select("o_orderkey", "o_orderdate")
    j = li.join(F.broadcast(o_f), li.l_orderkey == o_f.o_orderkey)
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def q5_new(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c2 = c.join(
        F.broadcast(n_asia), c.c_nationkey == n_asia.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    o2 = o.join(F.broadcast(c2), o.o_custkey == c2.c_custkey).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    j = li.join(F.broadcast(o2), li.l_orderkey == o2.o_orderkey).join(
        F.broadcast(s),
        (li.l_suppkey == s.s_suppkey)
        & (F.col("c_nationkey") == s.s_nationkey),
    )
    return j.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def ann_new(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    q = e.filter(F.col("vec_id") < ANN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("cn"),
    )
    j = F.broadcast(q).join(c, F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(cos, 6).desc(), F.col("neighbor_id")
    )
    return (
        j.select("query_id", "neighbor_id", F.row_number().over(w).alias("rk"))
        .filter(f"rk <= {ANN_TOPK}")
    )


def w5_new(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    item = F.struct(
        (-F.col("l_extendedprice")).alias("np"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
    )
    top3 = (
        li.groupBy("l_orderkey")
        .agg(
            F.slice(F.sort_array(F.collect_list(item)), 1, 3).alias("top")
        )
        .select(
            "l_orderkey",
            F.posexplode("top").alias("p", "t"),
        )
        .select(
            "l_orderkey",
            F.col("t.pk").alias("l_partkey"),
            (F.col("p") + 1).alias("rk"),
        )
    )
    return top3


def p1_new(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(
            F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
        ).alias("__f")
    )
    return first.select(
        "o_custkey",
        F.col("__f.o_orderkey").alias("first_orderkey"),
        F.date_format("__f.o_orderdate", "yyyy-MM-dd").alias("first_orderdate"),
    )


def j1_new(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    seen = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return c.join(F.broadcast(seen), "c_custkey", "left_anti").select(
        "c_custkey", "c_name"
    )


def dedup_exact_new(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    both = d.select(
        F.explode(
            F.when(
                F.col("doc_id") % 20 == 0,
                F.array(F.col("doc_id"), F.col("doc_id") + 1000000),
            ).otherwise(F.array(F.col("doc_id")))
        ).alias("doc_id"),
        F.md5("text").alias("content_hash"),
    )
    return (
        both.groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_dups"))
        .filter("n_dups > 1")
    )


VARIANTS = {
    "q3_shipping_priority": q3_new,
    "q5_region_revenue": q5_new,
    "ann_cosine_topk": ann_new,
    "w5_topk_per_group": w5_new,
    "p1_first_occurrence_dedup": p1_new,
    "j1_anti_join_dedup": j1_new,
    "dedup_exact": dedup_exact_new,
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    check = os.environ.get("CHECK", "1") == "1"
    spark = get_spark("exp-queries", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for name, fn in VARIANTS.items():
        for label, f in (("cur", Q[name]), ("new", fn)):
            runs = []
            for _ in range(3):
                t0 = time.time()
                n = f(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 2))
            print(f"{name} {label}: best {min(runs):.2f} of {runs} rows={n}", flush=True)
        if check:
            a, b = Q[name](spark, sf_dir), fn(spark, sf_dir)
            diff = a.exceptAll(b).count() + b.exceptAll(a).count()
            schema_ok = [f.name for f in a.schema] == [f.name for f in b.schema]
            print(f"{name}: diff={diff} schema_ok={schema_ok}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
