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
from tests.oracle_harness import TABLE_NAMES, compare_rows  # noqa: E402


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
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad, rows_only = [], []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        sdf = fn(spark, sf)
        if name not in osql:
            rows_only.append((name, sdf.count()))
            continue
        try:
            compare_rows(sdf, con.execute(osql[name]), name)
        except Exception as exc:  # mismatch or oracle error — keep going
            bad.append(name)
            print(f"  MISMATCH {exc}")
    print("queries:", len(qs), "| oracle-matched:", len(osql) - len(bad), "| rows-only:", rows_only)
    print("MISMATCH:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
