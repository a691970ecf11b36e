"""Scalable crawl-engine bench workload — hash-expanded synthetic frontier.

Builds post HTML *inside Spark* (format_string over spark.range — no
driver-side generation, no Python until the parse UDF), then runs the
engine's fetch->parse->filter->extract->detect pipeline. This is the
"10^10-URL synthetic frontier" scale path from SURVEY §7.1 step 10 sized
to the sandbox: the row count is a knob, the plan shape is the real one.

Measured quantity: pages fetched+parsed per second (BASELINE.json metric).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark import ops
from crawlspark.parse import coalesced_title, parse_post_html

BASE_URL = "https://weolbu.example.com"


def synth_posts(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """n synthetic post pages with VIP/count/skip variety, image tags
    (incl. decoys), attachment anchors, and multi-host skew — all built
    with JVM string functions."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism * 2)
    pid = F.col("id") + 100000
    h = F.xxhash64(pid.cast("string"))
    host = F.element_at(
        F.array(
            F.lit("cdn.weolbu.example.com"),  # hot host (~50%)
            F.lit("cdn.weolbu.example.com"),
            F.lit("img1.example.com"),
            F.lit("img2.example.com"),
        ),
        (F.pmod(h, F.lit(4)) + 1).cast("int"),
    )
    vip = F.pmod(h, F.lit(10)) < 3
    has_count = F.pmod(h, F.lit(7)) != 0
    count = F.pmod(h, F.lit(500))
    sidebar = F.concat(
        F.lit("작성자 user"),
        F.pmod(h, F.lit(100)).cast("string"),
        F.when(vip, F.lit(" 크리에이터")).otherwise(F.lit("")),
        F.when(
            has_count, F.concat(F.lit(" 게시글 "), count.cast("string"))
        ).otherwise(F.lit("")),
    )
    title = F.concat(F.lit("아파트 투자 분석 "), pid.cast("string"))
    img1 = F.concat(
        F.lit("https://"), host, F.lit("/img/p"), pid.cast("string"), F.lit("_0.png")
    )
    img2 = F.concat(F.lit("/img/p"), pid.cast("string"), F.lit("_1.jpg"))
    attach = F.when(
        F.pmod(h, F.lit(3)) == 0,
        F.concat(
            F.lit('<a href="https://cdn.weolbu.example.com/files/r'),
            pid.cast("string"),
            F.lit('.pdf">보고서 다운로드</a>'),
        ),
    ).otherwise(F.lit(""))
    content = F.concat(
        F.lit("서울 아파트 전세 매매 분양 청약 금리 대출 투자 상승 하락 규제 정책 분석 리포트 "),
        pid.cast("string"),
        F.lit("<br>\n단지 평형 호가 실거래 임대 갭투자 재건축 리모델링 학군 역세권 상세 내용"),
    )
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit(" : 월급쟁이부자들</title></head><body>\n<nav>로그인 회원가입 메뉴</nav>\n"),
        F.lit('<aside class="sidebar">'), sidebar, F.lit("</aside>\n"),
        F.lit('<h1 class="post-title">'), title, F.lit("</h1>\n"),
        F.lit('<span class="author">user'), F.pmod(h, F.lit(100)).cast("string"),
        F.lit('</span>\n<span class="date" title="2024-03-15">2024-03-15</span>\n'),
        F.lit('<div class="post-content">'), content,
        F.lit('\n<img src="'), img1, F.lit('">\n<img src="'), img2,
        F.lit('">\n<img src="/img/icon.svg">\n'), attach, F.lit("</div>\n</body></html>"),
    )
    return df.select(
        pid.cast("string").alias("post_id"),
        F.concat(F.lit(f"{BASE_URL}/community/"), pid.cast("string")).alias("url"),
        (pid / 30).cast("int").alias("page"),
        F.pmod(pid, F.lit(30)).cast("int").alias("pos_in_page"),
        html.alias("body"),
    )


def fetch_parse_pipeline(posts_html: DataFrame) -> DataFrame:
    """The engine's per-post pipeline: parse UDF -> skip filter -> image
    extraction -> download detection -> per-page aggregation.

    ONE narrow stage end-to-end: per-post image dedup and download
    detection are per-row array expressions (ops.image_urls_array /
    ops.detect_downloads_array) — no explode, no window, no cache, and
    the only shuffle is the final small groupBy(page). This is the shape
    that survives a 100x scale-up: shuffled bytes are proportional to
    page count, not post/image count."""
    posts = posts_html.withColumn("parsed", parse_post_html(F.col("body"))).drop("body")
    posts = posts.withColumn(
        "is_vip", ops.vip_flag(F.col("parsed.sidebar_text"))
    ).withColumn("post_count", ops.post_count(F.col("parsed.sidebar_text")))
    kept = posts.filter(ops.keep_predicate(F.col("is_vip"), F.col("post_count")))
    per_post = kept.select(
        "post_id",
        "page",
        coalesced_title(F.col("parsed")).alias("title"),
        F.size(
            ops.image_urls_array(F.col("parsed.img_srcs"), BASE_URL)
        ).alias("n_images"),
        ops.detect_downloads_array(
            F.col("parsed.content"), F.col("parsed.content_anchors")
        )["has_download"].alias("has_download"),
    )
    return per_post.groupBy("page").agg(
        F.count("*").alias("posts"),
        F.sum("n_images").alias("images"),
        F.sum(F.when(F.col("has_download"), 1).otherwise(0)).alias("downloads"),
    )


def run_fetch_parse_bench(spark: SparkSession, n_posts: int) -> dict:
    spark.catalog.clearCache()
    # 8 tasks per core: small-enough tasks keep the JVM thread and the
    # Python UDF worker of each slot overlapped (measured ~1.7x over
    # 2/core at 8 cores) without scheduling overhead dominating
    parts = spark.sparkContext.defaultParallelism * 8
    t0 = time.time()
    out = fetch_parse_pipeline(synth_posts(spark, n_posts, parts)).agg(
        F.sum("posts").alias("posts"),
        F.sum("images").alias("images"),
        F.sum("downloads").alias("downloads"),
        F.count("*").alias("pages"),
    ).collect()[0]
    dt = time.time() - t0
    return {
        "n_posts": n_posts,
        "pages": int(out["pages"]),
        "posts_kept": int(out["posts"]),
        "images": int(out["images"]),
        "downloads": int(out["downloads"]),
        "seconds": round(dt, 2),
        "posts_per_sec": round(n_posts / dt, 1),
        "rate": round(n_posts / dt, 1),
    }


def synth_images(
    spark: SparkSession, n: int, partitions: int | None = None,
    viral_every: int = 0,
) -> DataFrame:
    """n images-table-shaped rows (image_id, phash, page, pos_in_page,
    img_idx) built closed-form with JVM functions — the scalar projection
    the near-dup pass reads (bytes never enter the plan). Every 10th image
    is a planted near-dup of its predecessor (phash XOR 3 = hamming 2), so
    the LSH/CC/keeper stages all do real work at a realistic dup rate.
    viral_every=k additionally gives every k-th image ONE shared constant
    phash — the blank-thumbnail/logo degeneracy that makes per-image LSH
    quadratic (n/k copies -> (n/k)^2/2 pairs); the distinct-phash edge set
    must stay flat under it (BENCH/SKEW.md)."""
    df = spark.range(
        0, n, 1, partitions or spark.sparkContext.defaultParallelism * 4
    )
    iid = F.col("id")
    is_dup = (F.pmod(iid, F.lit(10)) == 0) & (iid > 0)
    src = F.when(is_dup, iid - 1).otherwise(iid)
    phash = F.xxhash64(src.cast("string")).bitwiseXOR(
        F.when(is_dup, F.lit(3)).otherwise(F.lit(0))
    )
    if viral_every:
        phash = F.when(
            F.pmod(iid, F.lit(viral_every)) == 2,
            F.lit(-6148914691236517206),  # 0xAAAA...: the shared "blank"
        ).otherwise(phash)
    return df.select(
        F.concat(F.lit("img"), iid.cast("string")).alias("image_id"),
        phash.alias("phash"),
        (iid / 100).cast("int").alias("page"),
        F.pmod(iid, F.lit(100)).cast("int").alias("pos_in_page"),
        F.lit(0).alias("img_idx"),
    )


def run_image_dedup_bench(
    spark: SparkSession, n_images: int, viral_every: int = 0
) -> dict:
    """Images near-dup pass throughput: band-LSH pair generation ->
    connected components -> crawl-order keeper election, over a synthetic
    images projection with a 10% planted dup rate (plus an optional viral
    shared phash every `viral_every` images). Measured quantity:
    images/sec through the full cluster+keeper computation."""
    from crawlspark.imagededup import image_cluster_members

    spark.catalog.clearCache()
    # the CC loop shuffles tiny (id, label) frames ~8 times; at the session
    # default of 2x cores the per-round task-scheduling overhead dominates
    # (measured 26.7s -> 19.5s at local[32] by moving 64 -> 32 partitions),
    # so pin shuffle partitions to cores for this pass and restore after
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        t0 = time.time()
        members = image_cluster_members(
            synth_images(spark, n_images, viral_every=viral_every)
        )
        agg = members.agg(
            F.count("*").alias("clustered"),
            F.countDistinct("cluster").alias("clusters"),
        ).collect()[0]
        dt = time.time() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return {
        "n_images": n_images,
        "clustered": int(agg["clustered"]),
        "clusters": int(agg["clusters"]),
        "seconds": round(dt, 2),
        "images_per_sec": round(n_images / dt, 1),
        "rate": round(n_images / dt, 1),
    }
