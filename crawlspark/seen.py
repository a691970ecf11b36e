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
