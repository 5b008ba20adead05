"""Storage-layout scale proofs: bucketed co-located joins (shuffle-free
fact-fact join) and partition pruning on date-partitioned layouts — the
two at-rest techniques that matter most at 100 TB.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.explain import formatted_plan
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

from .conftest import SF_SMOKE

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    """Both fact tables bucketed by the join key → SortMergeJoin with
    ZERO Exchange: the co-location a 100 TB orders⋈lineitem join needs."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directory persists — clear both before writing
    import shutil

    for tbl in ["li_bucketed", "o_bucketed"]:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join("spark-warehouse", tbl), ignore_errors=True)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
    joined = (
        spark.table("o_bucketed")
        .join(spark.table("li_bucketed"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    plan = formatted_plan(joined)
    join_section = plan.split("HashAggregate")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the join itself must not shuffle either side (bucket co-location);
    # the only allowed Exchange would be AFTER the join for the agg — and
    # grouping by the bucket key makes even that unnecessary
    assert "Exchange" not in plan, plan
    # sanity: result matches the unbucketed join
    expected = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))


def test_partition_pruning(spark):
    """Date-partitioned layout: a month-filtered query must read only
    that month's partition directories."""
    path = os.path.join(SCRATCH, "orders_by_month")
    o = load_table(spark, SF_SMOKE, "orders")
    o.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM")).write.mode(
        "overwrite"
    ).partitionBy("order_month").parquet(path)

    df = spark.read.parquet(path).where(F.col("order_month") == "1997-03")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "1997-03" in plan
    # pruned scan must touch exactly one partition directory
    import re

    m = re.search(r"(?:number of partitions|partition count)[^\d]*(\d+)", plan, re.I)
    if m:
        assert int(m.group(1)) == 1, plan
    got = df.count()
    expected = o.where(F.date_format("o_orderdate", "yyyy-MM") == "1997-03").count()
    assert got == expected > 0
