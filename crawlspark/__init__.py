"""crawlspark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch, Spark-first re-expression of the crawl semantics of the
reference crawler (daisybum/realEstateCrawler, read-only at /root/reference):
partitioned priority frontier, broadcast bloom URL-seen filter with exact
anti-join confirmation, per-host politeness token accounting, deterministic
visit ordering, per-partition checkpoint/lineage/metrics, resumable.

Everything is DataFrame/SQL + vectorized pandas/Arrow UDFs; no per-row
Python in hot paths; no RDDs. State lives in snapshot-versioned
parquet-backed tables (Iceberg-style atomic pointer commits — the sandbox
has no Iceberg runtime jar; table layouts are Iceberg-ready).
"""

__version__ = "0.1.0"
