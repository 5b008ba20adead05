"""Local re-implementation of the driver's DuckDB-oracle differential check
(SURVEY.md §5.1): run a queries() entry on Spark and its oracle_sql() on
DuckDB over the same parquet, then compare row count, column names, and
order-insensitive values.

The comparison is TYPE-SENSITIVE on purpose: every cell is canonicalized
to a (type-tag, canonical-repr) tuple, so `1 != 1.0`, `-0.0 != 0.0`, and
`Decimal != float` — strictly at least as strict as the driver's
value-hash (round 1 lesson: DuckDB sign() returning INTEGER vs Spark's
DOUBLE passed a `==` compare locally and failed the driver's hash gate).
"""

from __future__ import annotations

import datetime
import decimal

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        # tolerate partial fixtures (the relational-only sf100 dir omits
        # events/documents/embeddings by design); queries against an
        # unregistered view fail loudly with "table not found", which is
        # the right error for a fixture that genuinely lacks the table
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v):
    """Canonical (type-tag, value) form for one cell — typed, hashable,
    exact. Distinguishes int/float/Decimal/bool and ±0.0."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        # repr distinguishes -0.0/0.0 and nan; equal floats ⇒ equal reprs
        return ("float", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, bytearray):
        return ("bytes", bytes(v))
    if isinstance(v, bytes):
        return ("bytes", v)
    if isinstance(v, (list, tuple)):
        return ("array", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, canon(x)) for k, x in v.items())))
    return (type(v).__name__, v)


def compare_rows(spark_df, cur, name: str) -> int:
    """Order-insensitive typed comparison of a Spark DataFrame against an
    executed DuckDB cursor (columns matched by sorted name, like the
    driver). Returns the (matching) row count, so callers never re-execute
    the query just to record it — at sf10 that second execution ran with
    the compare's collected rows still pinned on the heap and OOM'd a
    broadcast build that succeeds in a clean session (SCALE.md lesson 27).

    The oracle side is materialized through Arrow, NOT fetchall():
    fetchall() flattens DuckDB HUGEINT/DECIMAL to Python int, which hid
    the round-2 rel_q12 driver failure (uncast SUM(CASE...) → HUGEINT →
    arrow decimal128 ≠ Spark BIGINT under the driver's type-sensitive
    hash). Arrow's to_pylist() keeps those as decimal.Decimal, so local
    parity implies driver parity."""
    otable = cur.arrow()
    ocolnames = list(otable.column_names)
    orows = [tuple(d.values()) for d in otable.to_pylist()]
    scols, ocols = sorted(spark_df.columns), sorted(ocolnames)
    assert scols == ocols, f"{name}: column mismatch spark={scols} oracle={ocols}"
    idx_s = [spark_df.columns.index(c) for c in scols]
    idx_o = [ocolnames.index(c) for c in ocols]
    sp = sorted((tuple(canon(r[i]) for i in idx_s) for r in spark_df.collect()), key=repr)
    op = sorted((tuple(canon(r[i]) for i in idx_o) for r in orows), key=repr)
    assert len(sp) == len(op), f"{name}: row count spark={len(sp)} oracle={len(op)}"
    for i, (a, b) in enumerate(zip(sp, op)):
        if a != b:
            raise AssertionError(
                f"{name}: first differing row {i} (of {len(sp)}, sorted):\n"
                f"  spark : {a}\n  oracle: {b}\n  cols  : {scols}"
            )
    return len(sp)


def run_parity(spark, sf_dir: str, name: str) -> None:
    """Run one registered query against its oracle and assert parity."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    if name not in ORACLE_SQL:
        # rows-only check, mirroring the driver's weaker path
        assert sdf.count() >= 0
        return
    con = duckdb_conn(sf_dir)
    try:
        compare_rows(sdf, con.execute(ORACLE_SQL[name]), name)
    finally:
        con.close()
