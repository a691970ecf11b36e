"""Robots.txt cache + frontier filtering (engine addition).

The reference has NO robots handling (politeness is sleeps + a UA string,
src/config.py:58) — this module is the north-rule addition ("per-host
politeness token buckets + robots caching", BASELINE.json), design-free of
reference semantics.

Model: a `robots` table `(host, rule, allow, fetched_wave)` with one row
per path-prefix rule, longest-prefix-wins per host (the core of the de
facto robots.txt standard — RFC 9309 §2.2.2). Unknown host => allowed.
The frontier filter is a broadcast join + window, all JVM-side:

    candidates ⋈ broadcast(rules) on host
      -> keep rules whose prefix matches the url path
      -> longest match wins -> filter allow

At 10^10-URL scale the rules table is small (rules per host are few);
broadcast is the right strategy and the filter never shuffles the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.canonical import host_of

ROBOTS_SCHEMA = "host string, rule string, allow boolean, fetched_wave int"


def parse_robots_txt(host: str, body: str, wave: int = 0) -> list[tuple]:
    """Minimal robots.txt parse for the synthetic store: User-agent: * groups,
    Allow/Disallow path prefixes. Returns rows for ROBOTS_SCHEMA."""
    rows: list[tuple] = []
    active = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*"
        elif active and key in ("allow", "disallow") and val:
            rows.append((host, val, key == "allow", wave))
    return rows


def filter_allowed(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop candidate URLs disallowed by the robots rules for their host.
    `candidates` needs a `url` column; unknown hosts pass."""
    if robots is None:
        return candidates
    cand = candidates.withColumn("__host", host_of(F.col("url")))
    # path = everything after scheme://host
    path = F.regexp_replace(
        F.regexp_replace(F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"^[^/]*",
        "",
    )
    cand = cand.withColumn("__path", F.when(path == "", "/").otherwise(path))
    # One row per host carrying ALL its rules as an array: the longest-match
    # resolution then happens row-locally via HOFs, so the frontier is never
    # shuffled (the old per-url window shuffled everything AND collapsed
    # duplicate URL occurrences within a wave to one arbitrary row).
    # Struct field order (len, allow, rule) makes array_max pick the longest
    # matching rule, allow=true winning exact (len, rule) ties.
    rules = robots.groupBy(F.col("host").alias("__host")).agg(
        F.collect_list(
            F.struct(
                F.length("rule").alias("len"),
                F.col("allow").alias("allow"),
                F.col("rule").alias("rule"),
            )
        ).alias("__rules")
    )
    j = cand.join(F.broadcast(rules), "__host", "left")
    best = F.array_max(F.expr("filter(__rules, r -> startswith(__path, r.rule))"))
    # no rules for host / no matching rule => allowed
    allowed = j.filter(F.coalesce(best["allow"], F.lit(True)))
    return allowed.drop("__host", "__path", "__rules")
