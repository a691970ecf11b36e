"""Per-host politeness — deterministic virtual-time token accounting.

The reference throttles with wall-clock sleeps (3 s page load crawler.py:141,
3 s post nav crawler.py:331, 1 s inter-page crawler.py:688) plus a global
token budget of 5 requests / 10 s (src/config.py:75-77). The engine keeps the
*accounting* but not the sleeping: given the structurally-ordered request
sequence, the schedule each request would start at is

    t_i = max(t_{i-1} + sleep_before_i,  t_{i-B} + P)        (B=5, P=10 s)

an inherently sequential recurrence (each wait can shift later sleeps).
`schedule()` applies it per budget scope (per host, or per (host, salt)
when a hot host is salt-split and the budget divided by the salt fan-out
k — SURVEY §7.3 skew note). Scopes parallelize across partitions via
applyInPandas; within a scope the O(n) loop is the metrics path only —
image/post bytes never flow through it.

This yields the exact same virtual_seconds as the reference's sequential
sleeps, deterministic, and is the quantity reported in the metrics table
("same politeness budget" — BASELINE.json north rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RATE_LIMIT_REQUESTS = 5
RATE_LIMIT_PERIOD = 10.0
# retry policy (reference src/config.py:87-89: 3 retries, 5 s delay; error
# backoff crawler.py:696) — a post URL gets MAX_FETCH_ATTEMPTS attempts, each
# failed attempt costs one request token + RETRY_DELAY virtual seconds
MAX_FETCH_ATTEMPTS = 3
RETRY_DELAY = 5.0


def schedule_numpy(
    sleep_before: np.ndarray,
    burst: int = RATE_LIMIT_REQUESTS,
    period: float = RATE_LIMIT_PERIOD,
    init_times: list[float] | None = None,
    init_now: float = 0.0,
) -> np.ndarray:
    """Token-bucket schedule for one ordered request sequence.

    Exact recurrence: t_i = t_{i-1} + a_i for i < burst, else
    max(t_{i-1} + a_i, t_{i-burst} + period). Sequential by nature (a wait
    on request i shifts every later request).

    `init_times`/`init_now` carry bucket state across waves: the last
    `burst` request times of the previous wave and its final virtual now
    (the rate window can span a wave boundary)."""
    n = len(sleep_before)
    t = np.empty(n, dtype=np.float64)
    hist = list(init_times or [])[-burst:]
    prev = init_now
    for i in range(n):
        cand = prev + sleep_before[i]
        k = i - burst
        if k >= 0:
            wait = t[k] + period
        elif len(hist) + i >= burst:
            wait = hist[k] + period  # k negative: index from history tail
        else:
            wait = cand
        if wait > cand:
            cand = wait
        t[i] = cand
        prev = cand
    return t


_SCHED_SCHEMA = T.StructType(
    [
        T.StructField("scope", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("start_at", T.DoubleType()),
    ]
)


def schedule(requests: DataFrame) -> DataFrame:
    """Per-scope schedule. Input columns: scope:string (host or host#salt),
    seq:long (structural order within scope), sleep_before:double, and
    optionally period:double — the per-scope rate window (a hot host split
    into k salts gets period*k per salt, i.e. the host budget divided by k).
    Output: (scope, seq, start_at). Grouped-map pandas UDF — each scope's
    sequence is independent, so scopes parallelize across partitions."""

    has_period = "period" in requests.columns

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        period = (
            float(pdf["period"].iloc[0]) if has_period else RATE_LIMIT_PERIOD
        )
        t = schedule_numpy(
            pdf["sleep_before"].to_numpy(dtype=np.float64), period=period
        )
        return pd.DataFrame(
            {"scope": pdf["scope"].to_numpy(), "seq": pdf["seq"].to_numpy(), "start_at": t}
        )

    cols = ["scope", "seq", "sleep_before"] + (["period"] if has_period else [])
    return requests.select(*cols).groupBy("scope").applyInPandas(
        _one, schema=_SCHED_SCHEMA
    )


def virtual_seconds(
    requests: DataFrame, trailing_sleep: float = 0.0
) -> float:
    """Total virtual time = latest request start + its trailing sleeps.

    `requests` needs (scope, seq, sleep_before, sleep_after). Matches the
    oracle's TokenBucket.now at end of run when given the same sequence."""
    sched = schedule(requests.select("scope", "seq", "sleep_before"))
    j = sched.join(requests.select("scope", "seq", "sleep_after"), ["scope", "seq"])
    row = j.agg(
        F.max(F.col("start_at") + F.col("sleep_after")).alias("t")
    ).collect()[0]
    return float(row["t"] or 0.0) + trailing_sleep
