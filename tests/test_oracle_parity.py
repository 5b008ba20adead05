"""Differential tests: every registered query vs its DuckDB oracle at
sf0.01 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

from .conftest import SF_CORRECT
from .oracle_harness import run_parity


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    run_parity(spark, SF_CORRECT, name)


def test_harness_catches_duckdb_hugeint_widening(spark):
    """Regression for the round-2 rel_q12 driver failure: an oracle with
    an uncast SUM(CASE...) comes back from DuckDB as HUGEINT (arrow
    decimal128) while Spark returns BIGINT. The local harness must fail
    on that type mismatch even when the values are identical — fetchall()
    used to flatten HUGEINT to int and hide it."""
    import duckdb

    from .oracle_harness import compare_rows

    sdf = spark.range(3).selectExpr("sum(if(id > 0, 1, 0)) AS n")  # BIGINT 2
    con = duckdb.connect()
    try:
        cur = con.execute(
            "SELECT SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS n FROM (VALUES (0), (1), (2)) t(x)"
        )
        with pytest.raises(AssertionError):
            compare_rows(sdf, cur, "hugeint_regression")
        # and the cast form must pass
        cur = con.execute(
            "SELECT CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n "
            "FROM (VALUES (0), (1), (2)) t(x)"
        )
        compare_rows(sdf, cur, "hugeint_regression_cast")
    finally:
        con.close()
