"""Standalone driver-contract simulation (the verify surface).

Runs exactly what the grading driver runs: ``entry(spark)`` smoke, then
every ``queries()`` entry vs ``oracle_sql()`` on DuckDB at sf0.01 with
order-insensitive exact comparison. Usage:

    SPARK_GRAFT_CPUS=8 python3 tests/driver_sim.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, list):
        return tuple(round(float(x), 10) if isinstance(x, float) else x for x in v)
    return v


def main() -> int:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .getOrCreate()
    )
    print("entry rows:", e.entry(spark).count())
    qs, osql = e.queries(), e.oracle_sql()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad, rows_only = [], []
    for name, fn in qs.items():
        sdf = fn(spark, sf)
        scols = sorted(sdf.columns)
        if name not in osql:
            rows_only.append((name, sdf.count()))
            continue
        cur = con.execute(osql[name])
        orows = cur.fetchall()
        ocolnames = [d[0] for d in cur.description]
        ocols = sorted(ocolnames)
        idx_s = [sdf.columns.index(c) for c in scols]
        idx_o = [ocolnames.index(c) for c in ocols]
        sp = sorted((tuple(canon(r[i]) for i in idx_s) for r in (tuple(x) for x in sdf.collect())), key=repr)
        op = sorted((tuple(canon(r[i]) for i in idx_o) for r in orows), key=repr)
        if not (scols == ocols and sp == op):
            bad.append(name)
            print(f"  MISMATCH {name}: cols {scols == ocols} rows {len(sp)}/{len(op)}")
    print("queries:", len(qs), "| oracle-matched:", len(osql) - len(bad), "| rows-only:", rows_only)
    print("MISMATCH:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
