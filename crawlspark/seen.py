"""Broadcast bloom URL-seen filter with exact anti-join confirmation.

Two-phase membership (SURVEY §2.3 J2, BASELINE north rule "broadcast-merged
bloom/cuckoo URL-seen filter"):

1. **Bloom prefilter** (approximate, no false negatives): k bit positions
   per URL derived JVM-side as ``xxhash64(url || ':' || i)`` columns (whole-
   stage codegen), shard bitmaps built per partition with numpy
   ``bitwise_or.at`` inside ``mapInPandas`` (vectorized — no per-row
   Python), OR-merged on the driver, broadcast back. Candidate URLs whose
   bits are all set *might* be seen; everything else is definitely new and
   skips the expensive exact join.
2. **Exact confirmation**: candidates ``left_anti``-join the `seen` table —
   bloom false positives must never drop URLs (exactness required by the
   north rule's "URL-seen match").

Scale math: at the 10^10-URL design point with 1% fpp, m ≈ 10^10 *
9.6 bits ≈ 12 GB total — too big for one broadcast, so shards are keyed by
``host_bucket`` and only the shards for hosts present in the current wave
are broadcast (each executor partition holds one host_bucket's URLs by
construction, so each task needs exactly one shard ≈ 12 GB / P). The
sandbox uses one merged shard; the sharding seam is `build_shards`'s
``host_bucket`` grouping column.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 20  # sandbox shard size; see scale math above
DEFAULT_K = 4


def _hash_cols(url, bits: int, k: int):
    return [
        F.pmod(F.xxhash64(F.concat(url, F.lit(f":{i}"))), F.lit(bits)).alias(
            f"__bh{i}"
        )
        for i in range(k)
    ]


class BloomSeen:
    """A merged bloom bitmap over all seen URLs (driver-held, broadcastable)."""

    def __init__(self, bits: int = DEFAULT_BITS, k: int = DEFAULT_K):
        self.bits = bits
        self.k = k
        self.bitmap = np.zeros(bits // 8, dtype=np.uint8)
        self.version = 0

    def add_urls(self, df: DataFrame, url_col: str = "url") -> None:
        """Build per-partition shard bitmaps, OR-merge into the driver copy.

        The heavy work (hashing) is JVM columns; mapInPandas only sets bits
        with numpy and emits one packed shard row per partition."""
        bits, k = self.bits, self.k
        hashed = df.select(*_hash_cols(F.col(url_col), bits, k))

        def _shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bm = np.zeros(bits // 8, dtype=np.uint8)
            any_rows = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                any_rows = True
                for i in range(k):
                    pos = pdf[f"__bh{i}"].to_numpy(dtype=np.int64)
                    np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            if any_rows:
                yield pd.DataFrame({"shard": [bm.tobytes()]})

        shards = hashed.mapInPandas(
            _shard, schema="shard binary"
        ).collect()
        for row in shards:
            self.bitmap |= np.frombuffer(row["shard"], dtype=np.uint8)
        self.version += 1

    def maybe_seen_col(self, spark: SparkSession, df: DataFrame, url_col: str = "url") -> DataFrame:
        """Adds boolean `__maybe_seen` (bloom test, broadcast bitmap)."""
        bits, k = self.bits, self.k
        bc = spark.sparkContext.broadcast(self.bitmap.tobytes())

        @F.pandas_udf("boolean")
        def _test(*hcols: pd.Series) -> pd.Series:
            bm = np.frombuffer(bc.value, dtype=np.uint8)
            res = np.ones(len(hcols[0]), dtype=bool)
            for h in hcols:
                pos = h.to_numpy(dtype=np.int64)
                res &= (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            return pd.Series(res)

        hcols = _hash_cols(F.col(url_col), bits, k)
        return df.withColumn("__maybe_seen", _test(*hcols))

    def filter_new(
        self,
        spark: SparkSession,
        candidates: DataFrame,
        seen_table: DataFrame | None,
        url_col: str = "url",
    ) -> DataFrame:
        """Return only definitely-new rows: bloom prefilter, then exact
        left_anti against `seen` for the maybe-seen candidates only."""
        with_flag = self.maybe_seen_col(spark, candidates, url_col)
        definitely_new = with_flag.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        if seen_table is None:
            return definitely_new.unionByName(
                with_flag.filter(F.col("__maybe_seen")).drop("__maybe_seen")
            )
        maybe = with_flag.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        confirmed_new = maybe.join(
            seen_table.select(F.col(url_col)), on=url_col, how="left_anti"
        )
        return definitely_new.unionByName(confirmed_new)


class ShardedBloomSeen:
    """The scale-path bloom: one bitmap shard per ``host_bucket``, built and
    OR-merged per bucket, with ONLY the shards for buckets present in the
    current wave broadcast to executors (the 12 GB / P seam from the scale
    math above — a 10^10-URL filter never ships whole).

    Same interface as BloomSeen (add_urls / maybe_seen_col / filter_new /
    version); exact anti-join confirmation keeps the no-false-negative
    guarantee regardless of shard membership."""

    def __init__(
        self,
        bits_per_shard: int = DEFAULT_BITS,
        k: int = DEFAULT_K,
        n_buckets: int = 32,
    ):
        self.bits = bits_per_shard
        self.k = k
        self.n_buckets = n_buckets
        self.shards: dict[int, np.ndarray] = {}
        self.version = 0

    def _bucket_col(self, url):
        from crawlspark.canonical import host_bucket, host_of

        return host_bucket(host_of(url), self.n_buckets).alias("__hb")

    def add_urls(self, df: DataFrame, url_col: str = "url") -> None:
        bits, k = self.bits, self.k
        hashed = df.select(
            self._bucket_col(F.col(url_col)),
            *_hash_cols(F.col(url_col), bits, k),
        )

        def _shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local: dict[int, np.ndarray] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                hb = pdf["__hb"].to_numpy(dtype=np.int64)
                for b in np.unique(hb):
                    bm = local.setdefault(
                        int(b), np.zeros(bits // 8, dtype=np.uint8)
                    )
                    mask = hb == b
                    for i in range(k):
                        pos = pdf[f"__bh{i}"].to_numpy(dtype=np.int64)[mask]
                        np.bitwise_or.at(
                            bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
                        )
            for b, bm in local.items():
                yield pd.DataFrame({"bucket": [b], "shard": [bm.tobytes()]})

        rows = hashed.mapInPandas(_shard, schema="bucket int, shard binary").collect()
        for row in rows:
            b = int(row["bucket"])
            if b in self.shards:
                self.shards[b] |= np.frombuffer(row["shard"], dtype=np.uint8)
            else:
                self.shards[b] = np.frombuffer(
                    row["shard"], dtype=np.uint8
                ).copy()
        self.version += 1

    def shards_for(self, buckets: set[int]) -> dict[int, bytes]:
        """The broadcast payload: only shards whose bucket is PRESENT in the
        wave (each executor task needs exactly the shard of its own
        host_bucket partition)."""
        return {
            b: self.shards[b].tobytes() for b in buckets if b in self.shards
        }

    def maybe_seen_col(
        self, spark: SparkSession, df: DataFrame, url_col: str = "url"
    ) -> DataFrame:
        bits, k = self.bits, self.k
        # which buckets does this wave touch? (tiny distinct — at most
        # n_buckets values; this is what bounds the broadcast size)
        present = {
            int(r["__hb"])
            for r in df.select(self._bucket_col(F.col(url_col))).distinct().collect()
        }
        bc = spark.sparkContext.broadcast(self.shards_for(present))

        @F.pandas_udf("boolean")
        def _test(hb: pd.Series, *hcols: pd.Series) -> pd.Series:
            shards = bc.value
            hbv = hb.to_numpy(dtype=np.int64)
            res = np.zeros(len(hbv), dtype=bool)
            for b in np.unique(hbv):
                bm_bytes = shards.get(int(b))
                if bm_bytes is None:
                    continue  # no shard -> bucket never seen anything
                bm = np.frombuffer(bm_bytes, dtype=np.uint8)
                mask = hbv == b
                sub = np.ones(int(mask.sum()), dtype=bool)
                for h in hcols:
                    pos = h.to_numpy(dtype=np.int64)[mask]
                    sub &= (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                res[mask] = sub
            return pd.Series(res)

        hcols = _hash_cols(F.col(url_col), bits, k)
        return df.withColumn(
            "__maybe_seen", _test(self._bucket_col(F.col(url_col)), *hcols)
        )

    def filter_new(
        self,
        spark: SparkSession,
        candidates: DataFrame,
        seen_table: DataFrame | None,
        url_col: str = "url",
    ) -> DataFrame:
        """Identical two-phase semantics to BloomSeen.filter_new."""
        with_flag = self.maybe_seen_col(spark, candidates, url_col)
        definitely_new = with_flag.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        if seen_table is None:
            return definitely_new.unionByName(
                with_flag.filter(F.col("__maybe_seen")).drop("__maybe_seen")
            )
        maybe = with_flag.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        confirmed_new = maybe.join(
            seen_table.select(F.col(url_col)), on=url_col, how="left_anti"
        )
        return definitely_new.unionByName(confirmed_new)
