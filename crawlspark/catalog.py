"""Snapshot-versioned parquet tables with delta-file manifest commits.

The design target is Iceberg (`MERGE INTO`, snapshot isolation, fast
appendFiles, partition pruning); this sandbox has no Iceberg runtime jar,
so tables are laid out Iceberg-style on plain parquet:

    <root>/<table>/data/f{n}-{token}/part-*.parquet   # immutable delta dirs
    <root>/<table>/snapshots/v{n}-{token}.json        # manifest: data dirs
    <root>/<table>/_current            # one line: relative manifest path
    <root>/<table>/_log/v{n}.json      # commit metadata (wave, counters)

A snapshot is a MANIFEST (the list of data directories it comprises), not
a materialized copy: `append` writes ONLY the incoming delta as a new data
dir and commits a manifest of previous-dirs + delta — O(delta) bytes per
wave, exactly Iceberg's appendFiles, instead of the quadratic
write-amplification of rewriting the whole table each wave. `commit`
(full replace) writes one data dir and a one-entry manifest. Either way
the commit point is an atomic rename of a temp pointer file over
``_current`` (POSIX rename atomicity — the same last-writer-wins pointer
swap Iceberg's catalog does). Readers resolve pointer -> manifest -> union
of per-dir scans, so half-written data is never visible and a killed run
resumes from the last committed snapshot.

Scale notes for the 100 TB framing:
- `merge_new` anti-joins the incoming batch against the KEY COLUMN ONLY of
  the existing table (column pruning reaches every delta scan), so a merge
  shuffles the key column of the batch, never rewrites history.
- Readers see a Union of parquet scans (one per delta dir); predicate
  pushdown and column pruning apply to each branch independently. The
  manifest grows by one entry per wave — `compact()` folds the table back
  to a single data dir when the union gets wide (the Iceberg analog is a
  rewrite-data-files compaction), without changing visible contents.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def _has_parquet(d: str) -> bool:
    for root, _dirs, files in os.walk(d):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


class Catalog:
    def __init__(self, root: str, compact_threshold: int = 16):
        self.root = root
        self.compact_threshold = compact_threshold
        os.makedirs(root, exist_ok=True)

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    # ---------------------------------------------------------- manifests

    def _current_manifest_rel(self, table: str) -> str | None:
        ptr = os.path.join(self._tdir(table), "_current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            rel = f.read().strip()
        return rel or None

    def manifest(self, table: str, version: int | None = None) -> dict | None:
        """A snapshot manifest: {version, data_dirs: [rel...], schema}.
        version=None -> the current snapshot; an explicit version reads that
        historical snapshot (time travel — old manifests and data dirs are
        immutable and never vacuumed in this sandbox)."""
        if version is None:
            rel = self._current_manifest_rel(table)
            if rel is None:
                return None
        else:
            sdir = os.path.join(self._tdir(table), "snapshots")
            if not os.path.isdir(sdir):
                return None
            match = [n for n in os.listdir(sdir) if n.startswith(f"v{version}-")]
            if not match:
                return None
            rel = os.path.join("snapshots", match[0])
        with open(os.path.join(self._tdir(table), rel)) as f:
            return json.load(f)

    def data_dirs(self, table: str) -> list[str]:
        """Absolute paths of the data directories in the current snapshot."""
        m = self.manifest(table)
        if m is None:
            return []
        return [os.path.join(self._tdir(table), d) for d in m["data_dirs"]]

    def current_snapshot(self, table: str) -> str | None:
        """The most recent data directory of the current snapshot (where the
        latest delta's files — and its partition_by layout — live)."""
        dirs = self.data_dirs(table)
        return dirs[-1] if dirs else None

    def exists(self, table: str) -> bool:
        return self._current_manifest_rel(table) is not None

    def version(self, table: str) -> int:
        rel = self._current_manifest_rel(table)
        if rel is None:
            return 0
        return int(os.path.basename(rel).split("-")[0][1:])

    def read(
        self, spark: SparkSession, table: str, version: int | None = None
    ) -> DataFrame | None:
        """Read the table at the current snapshot, or at an explicit
        historical `version` (time travel)."""
        m = self.manifest(table, version)
        if m is None:
            return None
        dirs = [os.path.join(self._tdir(table), d) for d in m["data_dirs"]]
        # an empty delta written with partitionBy leaves no part files —
        # skip such dirs (the manifest's stored schema covers the all-empty
        # case, so an errors table with zero errors still reads cleanly)
        readable = [d for d in dirs if _has_parquet(d)]
        if not readable:
            from pyspark.sql import types as T

            return spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(m["schema"]))
            )
        # one scan per delta dir (each dir is its own partition-discovery
        # root), unioned; Catalyst pushes filters/pruning into each branch
        return reduce(
            DataFrame.unionByName, (spark.read.parquet(d) for d in readable)
        )

    # ------------------------------------------------------------ commits

    def _write_delta(
        self,
        df: DataFrame,
        table: str,
        n: int,
        token: str,
        partition_by: list[str] | None,
    ) -> str:
        rel = os.path.join("data", f"f{n}-{token}")
        dest = os.path.join(self._tdir(table), rel)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(dest)
        return rel

    def _commit_manifest(
        self,
        table: str,
        n: int,
        token: str,
        data_dirs_rel: list[str],
        meta: dict | None,
        schema_json: str,
    ) -> None:
        tdir = self._tdir(table)
        os.makedirs(os.path.join(tdir, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(tdir, "_log"), exist_ok=True)
        man_rel = os.path.join("snapshots", f"v{n}-{token}.json")
        with open(os.path.join(tdir, man_rel), "w") as f:
            json.dump(
                {"version": n, "data_dirs": data_dirs_rel,
                 "schema": schema_json},
                f,
            )
        with open(os.path.join(tdir, "_log", f"v{n}.json"), "w") as f:
            json.dump({"version": n, "snapshot": man_rel, **(meta or {})}, f)
        tmp = os.path.join(tdir, f"_current.tmp.{token}")
        with open(tmp, "w") as f:
            f.write(man_rel)
        os.replace(tmp, os.path.join(tdir, "_current"))  # atomic pointer swap

    def commit(
        self,
        df: DataFrame,
        table: str,
        meta: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> str:
        """Full-replace commit: df becomes the table's entire next snapshot."""
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        n = self.version(table) + 1
        token = uuid.uuid4().hex[:8]
        rel = self._write_delta(df, table, n, token, partition_by)
        self._commit_manifest(table, n, token, [rel], meta, df.schema.json())
        return os.path.join(tdir, rel)

    def append(
        self,
        spark: SparkSession,
        df: DataFrame,
        table: str,
        meta: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> str:
        """Append = write ONLY the delta as a new data dir, commit a manifest
        of previous-dirs + delta (Iceberg appendFiles; O(delta) bytes).

        Wave-idempotent: if ``meta['wave']`` is already recorded in this
        table's commit log (by a VISIBLE snapshot — orphan log entries past
        the current pointer don't count), the append is a no-op. A run
        killed mid-wave (after some table commits, before the checkpoint
        marker) replays the wave without duplicating rows in append-only
        tables — the Iceberg analog is committing all wave writes in one
        multi-table transaction.
        """
        wave = (meta or {}).get("wave")
        if wave is not None:
            cur_ver = self.version(table)
            for e in self.log(table):
                if e.get("wave") == wave and e.get("version", 0) <= cur_ver:
                    return self.current_snapshot(table)  # replay: no-op
        m = self.manifest(table)
        prev = m["data_dirs"] if m else []
        n = self.version(table) + 1
        token = uuid.uuid4().hex[:8]
        rel = self._write_delta(df, table, n, token, partition_by)
        self._commit_manifest(
            table, n, token, prev + [rel], meta, df.schema.json()
        )
        # auto-compaction: a snapshot that is a union of many delta dirs
        # costs one scan branch per dir on every read — fold it back to one
        # dir once it gets wide (Iceberg's rewrite-data-files maintenance).
        # Amortized write volume: table_size / threshold per append, vs the
        # pre-delta design's table_size per append. The compaction commit
        # carries no wave key, so wave-idempotent replay is unaffected.
        if len(prev) + 1 >= self.compact_threshold:
            self.compact(spark, table, partition_by)
        return os.path.join(self._tdir(table), rel)

    def merge_new(
        self,
        spark: SparkSession,
        batch: DataFrame,
        table: str,
        key: str,
        meta: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> str:
        """MERGE ... WHEN NOT MATCHED THEN INSERT (reference storage.py:44-53
        dedup-append semantics): only keys not already present are appended.
        The anti-join probes the key column only (pruned scan per delta)."""
        cur = self.read(spark, table)
        if cur is not None:
            batch = batch.join(cur.select(key), on=key, how="left_anti")
        return self.append(spark, batch, table, meta, partition_by)

    def compact(
        self,
        spark: SparkSession,
        table: str,
        partition_by: list[str] | None = None,
    ) -> str | None:
        """Fold all delta dirs into one data dir (rewrite-data-files
        compaction). Visible contents unchanged; old dirs stay on disk for
        snapshot-time readers (vacuum = future work, like Iceberg's)."""
        cur = self.read(spark, table)
        if cur is None:
            return None
        return self.commit(cur, table, {"compaction": True}, partition_by)

    def drop(self, table: str) -> None:
        tdir = self._tdir(table)
        if os.path.exists(tdir):
            shutil.rmtree(tdir)

    def log(self, table: str) -> list[dict]:
        ldir = os.path.join(self._tdir(table), "_log")
        if not os.path.isdir(ldir):
            return []
        out = []
        for name in sorted(os.listdir(ldir), key=lambda s: int(s[1:-5])):
            with open(os.path.join(ldir, name)) as f:
                out.append(json.load(f))
        return out
