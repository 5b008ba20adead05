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
