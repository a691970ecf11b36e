"""Structured Streaming wrapper over the wave engine (SURVEY §2.8).

The reference's unbounded ``while True`` page loop (src/crawler/
crawler.py:668-696) maps onto an unbounded stream of frontier bands:
``readStream`` over a directory of frontier files, each micro-batch running
one wave of the exact batch pipeline via ``foreachBatch`` — same Catalyst
plan, same snapshot-catalog commits, same politeness accounting.

Exactly-once: the wave id is ``batch_id + 1`` (stable across foreachBatch
retries) and committed waves are skipped, so a replayed micro-batch is a
no-op; ``merge_new`` keeps row-level commits idempotent on top of that.
Late or duplicate frontier rows need no watermark — the URL-seen table
never expires (reference semantics: duplicates are always dropped,
crawler.py:82, storage.py:44-53), which is the degenerate-but-exact form
of streaming dedup state.

The catalog under ``workdir`` must be owned by one stream (the wave ids
are the stream's batch ids); batch `crawl()` and `stream_crawl()` runs
over the same workdir would collide on wave numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crawlspark.catalog import Catalog
from crawlspark.driver import _BucketState, _run_image_dedup, _run_wave
from crawlspark.fetcher import PageStoreResolver
from crawlspark.seen import ShardedBloomSeen

# frontier stream rows carry just the page cursor; the wave builds its
# listing URLs (render or API) from it
FRONTIER_STREAM_SCHEMA = "page int"

# Bloom state carried ACROSS micro-batches, keyed by workdir: rebuilt from
# the seen table only when absent (fresh process / stream restart), then
# updated incrementally by each wave's own add_urls — O(wave delta) per
# batch instead of O(|seen|) re-hashing every micro-batch (which is
# quadratic total work over a long stream). Safe under foreachBatch
# replay: a failed batch may leave extra URLs in the bloom, but the bloom
# is a PREFILTER — membership is always confirmed by the exact anti-join
# (seen.py filter_new), so stale positives only cost a probe, never drop
# a URL. `rebuilds` is instrumentation for tests/bench.
_STREAM_BLOOMS: dict[str, ShardedBloomSeen] = {}
_BLOOM_REBUILDS: dict[str, int] = {}


def stream_crawl(
    spark: SparkSession,
    stream_dir: str,
    page_store: DataFrame,
    base_url: str,
    workdir: str,
    stream_checkpoint: str,
    run_id: str = "stream",
    listing_source: str = "render",
    image_keep_bytes: bool = True,
    vacuum_keep_last: int = 8,
    image_dedup_every_waves: int = 0,
) -> None:
    """Consume all currently-available frontier files (Trigger.AvailableNow),
    one wave per micro-batch, then stop. Restart with the same
    ``stream_checkpoint`` to pick up newly arrived files — batch ids (and so
    wave ids) continue where they left off. Retention rides each
    micro-batch's commits exactly like the batch driver
    (vacuum_keep_last; 0 = keep full history), and so does the incremental
    image near-dup pass (image_dedup_every_waves; 0 = off) — the pass
    reads its own processed-version state, so a foreachBatch retry or a
    restart never reprocesses committed images."""
    page_store = page_store.cache()
    resolver = PageStoreResolver(page_store)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        wave = batch_id + 1
        cat = Catalog(workdir, vacuum_keep_last=vacuum_keep_last)
        done = {
            e["wave"]
            for e in cat.log("checkpoints")
            if "wave" in e and e.get("chunk") is None
        }
        if wave in done:
            return  # foreachBatch retry of a committed wave — no-op
        pages = sorted({r["page"] for r in batch_df.select("page").collect()})
        if not pages:
            return
        # cross-wave bloom: rebuild from the seen table ONCE per process
        # (restart path), then carry it across micro-batches — each wave's
        # _run_wave adds only its own delta URLs
        bloom = _STREAM_BLOOMS.get(workdir)
        if bloom is None:
            bloom = ShardedBloomSeen()
            seen_df = cat.read(spark, "seen")
            if seen_df is not None:
                bloom.add_urls(seen_df)
            _STREAM_BLOOMS[workdir] = bloom
            _BLOOM_REBUILDS[workdir] = _BLOOM_REBUILDS.get(workdir, 0) + 1
        bucket = _BucketState()
        mlog = cat.log("metrics")
        if mlog:
            last = mlog[-1]
            bucket = _BucketState(
                last.get("bucket_times"), last.get("bucket_now", 0.0)
            )
        _run_wave(
            spark, cat, bloom, resolver, base_url, run_id, wave, pages,
            image_keep_bytes, bucket, None, [], listing_source,
        )
        if image_dedup_every_waves > 0 and wave % image_dedup_every_waves == 0:
            _run_image_dedup(spark, workdir, vacuum_keep_last)

    q = (
        spark.readStream.schema(FRONTIER_STREAM_SCHEMA)
        .parquet(stream_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def reset_stream_bloom(workdir: str | None = None) -> None:
    """Evict the cached cross-batch bloom for `workdir` (or all of them).
    Call after dropping/recreating a workdir's catalog in a long-lived
    process — the cache is keyed by path and would otherwise serve a bloom
    seeded from the previous incarnation's seen set (correct but wasteful:
    staleness is in the false-positive direction) and hold its bitmaps for
    the process lifetime."""
    if workdir is None:
        _STREAM_BLOOMS.clear()
        _BLOOM_REBUILDS.clear()
    else:
        _STREAM_BLOOMS.pop(workdir, None)
        _BLOOM_REBUILDS.pop(workdir, None)


# --------------------------------------------------------------------------
# Custom stateful operator (SURVEY §2.8 / graft brief: "custom stateful
# operators via applyInPandasWithState"): streaming sessionization with a
# 30-minute inactivity gap — the streaming twin of the batch st1_sessionize
# contract query. Per-user state (open session start/last/n) lives in the
# state store and survives micro-batches and restarts via the stream
# checkpoint; a session is EMITTED when a later event arrives more than
# `gap_s` after it (append mode — only closed sessions are output).
# At scale: state is per-user-key and partitioned by the groupBy hash —
# no global state, no driver state.

SESSION_GAP_S = 1800
_SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(
    events: DataFrame, gap_s: int = SESSION_GAP_S, flush_idle: bool = False
) -> DataFrame:
    """events: streaming DataFrame (user_id long, ts long epoch-seconds) ->
    closed sessions (user_id, session_start, session_end, n_events).

    flush_idle=False (default): a session is emitted only when a LATER
    event of the same user arrives past the gap — a user who goes silent
    forever leaves an open session in the state store.

    flush_idle=True: additionally registers an event-time timeout at
    (last + gap_s); once the stream's WATERMARK passes it, the idle open
    session is emitted and its state removed (GroupStateTimeout.
    EventTimeTimeout) — state size stays bounded by ACTIVE users instead
    of all users ever seen, which is what a long-lived stream needs. The
    helper derives the required watermark column from `ts` itself."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    cols = ["user_id", "session_start", "session_end", "n_events"]

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if flush_idle and state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n)], columns=cols)
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["ts"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for t in ts:
            if last is not None and t - last > gap_s:
                closed.append((user_id, start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        if flush_idle:
            # timeout must sit strictly past the current watermark
            state.setTimeoutTimestamp(
                max((last + gap_s) * 1000, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(closed, columns=cols)

    src = events
    timeout = GroupStateTimeout.NoTimeout
    if flush_idle:
        src = events.withColumn(
            "event_time", F.timestamp_seconds("ts")
        ).withWatermark("event_time", "0 seconds")
        timeout = GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
