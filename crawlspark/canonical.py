"""URL canonicalization + salted host-hash partitioning — all JVM-side.

The reference only absolutizes URLs (crawler.py:231-233, 538, 554); the
engine's north rule adds full canonicalization because the canonical form is
the partitioning key input ("partitioned priority frontier keyed by
canonicalized host-hash", BASELINE.json).

Everything here is built-in Spark SQL functions (whole-stage codegen; no
Python in the path):

- absolutize   : relative -> base_url + path (crawler.py:232)
- canonicalize : strip fragment, lowercase scheme+host, drop default port,
                 sort query params (stable total order)
- host/bucket  : lower(parse_url(url,'HOST')), xxhash64 -> pmod bucket
- salt         : hot-host skew splitting — extra pmod(xxhash64(url), k)
                 sub-key so one hot host spreads over k partitions while
                 politeness budget is divided per salt (SURVEY §4.2.2)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def absolutize(url: Column, base_url: str) -> Column:
    """crawler.py:232/538: prefix base_url unless already absolute."""
    return F.when(url.startswith("http"), url).otherwise(F.concat(F.lit(base_url), url))


def canonicalize(url: Column) -> Column:
    """Deterministic canonical URL: no fragment, lowercase scheme+host,
    no default ports, query params sorted."""
    nofrag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    # drop default ports
    port = F.when(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    # path+query = rest minus the host[:port] prefix
    pathq = rest.substr(F.length(hostport) + 1, F.length(rest))
    path = F.substring_index(pathq, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        pathq.contains("?"),
        F.array_join(
            F.array_sort(F.split(F.substring_index(pathq, "?", -1), "&")), "&"
        ),
    ).otherwise(F.lit(""))
    hp = F.when(port == "", host).otherwise(F.concat(host, F.lit(":"), port))
    return F.concat(
        scheme,
        F.lit("://"),
        hp,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def host_of(url: Column) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def host_bucket(host: Column, num_buckets: int) -> Column:
    """Partitioning key: xxhash64(host) -> [0, num_buckets)."""
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


def salt_for(url: Column, host: Column, hot_hosts: list[str], k: int) -> Column:
    """Skew splitting: URLs of hot hosts get k sub-salts (politeness budget
    is divided by k for those hosts — see politeness.py)."""
    if not hot_hosts or k <= 1:
        return F.lit(0)
    return F.when(
        host.isin(hot_hosts), F.pmod(F.xxhash64(url), F.lit(k)).cast("int")
    ).otherwise(F.lit(0))
