"""Local re-implementation of the driver's DuckDB-oracle differential check
(SURVEY.md §5.1): run a queries() entry on Spark and its oracle_sql() on
DuckDB over the same parquet, then compare row count, column names, and
order-insensitive values. Stricter than the driver on purpose — exact
equality for every cell (our aggregates are built to be bit-deterministic
via decimal-sum / explicit ordering), so any drift shows up here first.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

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
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            # bytearray vs bytes, lists/arrays → canonical hashable forms
            def canon(v):
                if isinstance(v, bytearray):
                    return bytes(v)
                if isinstance(v, (list, np.ndarray)):
                    return repr([float(x) if isinstance(x, (float, np.floating)) else x for x in v])
                return v

            df[c] = s.map(canon)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str, float_ulps: bool = True) -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(oracle_df)
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count spark={len(got)} oracle={len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(e):
            ga, ea = g.to_numpy(), e.to_numpy()
            both_nan = np.isnan(ga) & np.isnan(ea)
            exact = (ga == ea) | both_nan
            if not exact.all():
                bad = np.flatnonzero(~exact)
                diffs = [abs(ga[i] - ea[i]) for i in bad[:5]]
                raise AssertionError(
                    f"{name}.{c}: {len(bad)} float mismatches, sample abs diffs {diffs}; "
                    f"rows {bad[:5].tolist()} spark={ga[bad[:3]]} oracle={ea[bad[:3]]}"
                )
        else:
            eq = (g == e) | (g.isna() & e.isna())
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())
                raise AssertionError(
                    f"{name}.{c}: {len(bad)} mismatches, e.g. row {bad[0]}: "
                    f"spark={g.iloc[bad[0]]!r} oracle={e.iloc[bad[0]]!r}"
                )


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
        odf = con.execute(ORACLE_SQL[name]).fetchdf()
    finally:
        con.close()
    compare(sdf, odf, name)
