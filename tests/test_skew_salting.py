"""Hot-host skew splitting (SURVEY §4.2.2, BASELINE north rule: 'salted
host-hash partitioning with explicit skew splitting of hot domains').

A frontier where one host dominates must not pile into one partition:
salting fans the hot host across k sub-keys while cold hosts keep one.
Deterministic structural check — no timing."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.canonical import host_bucket, host_of, salt_for

HOT = "cdn.weolbu.example.com"
K = 4
N_PARTS = 16


def _frontier(spark, n=4000, hot_share=0.9):
    n_hot = int(n * hot_share)
    rows = [(f"https://{HOT}/img/p{i}.png",) for i in range(n_hot)] + [
        (f"https://img{i % 7}.example.com/img/p{i}.png",)
        for i in range(n - n_hot)
    ]
    return spark.createDataFrame(rows, "url string")


def _max_partition_rows(df):
    counts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    return max(r["count"] for r in counts)


def test_salting_splits_hot_host(spark):
    df = _frontier(spark).withColumn("host", host_of(F.col("url")))
    df = df.withColumn("host_bucket", host_bucket(F.col("host"), 32))

    unsalted = df.repartition(N_PARTS, F.col("host_bucket"))
    salted = df.withColumn(
        "salt", salt_for(F.col("url"), F.col("host"), [HOT], K)
    ).repartition(N_PARTS, F.col("host_bucket"), F.col("salt"))

    m_un = _max_partition_rows(unsalted)
    m_sa = _max_partition_rows(salted)
    # without salt the hot host (90% of rows) lands in ONE partition;
    # with k=4 salts its biggest shard is ~1/4 of that
    assert m_un >= 0.9 * 4000
    assert m_sa <= m_un / 2  # conservative: hash collisions may co-locate salts
    # cold hosts keep salt 0 — one politeness scope each
    salts = (
        salted.filter(F.col("host") != HOT)
        .select("salt")
        .distinct()
        .collect()
    )
    assert {r["salt"] for r in salts} == {0}
    # the hot host fans out to exactly k salts
    hot_salts = (
        salted.filter(F.col("host") == HOT).select("salt").distinct().collect()
    )
    assert {r["salt"] for r in hot_salts} == set(range(K))
