"""Self-check mirroring the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its oracle_sql()
in DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (rows sorted, columns sorted by
name, values stringified with float rounding).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.4f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_val(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from crawlspark.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"warn  {name}: no oracle SQL (rows-only) rows={len(srows)}")
            continue
        try:
            res = con.execute(sqls[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            # show a sample diff
            so = sorted(
                "\x1f".join(
                    norm_val(r[i])
                    for i in sorted(range(len(scols)), key=lambda i: scols[i])
                )
                for r in srows
            )
            do = sorted(
                "\x1f".join(
                    norm_val(r[i])
                    for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                )
                for r in drows
            )
            for a, b in list(zip(so, do))[:200]:
                if a != b:
                    print(f"      spark : {a[:160]}")
                    print(f"      duckdb: {b[:160]}")
                    break
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(srows)} ({dt:.1f}s)")
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
