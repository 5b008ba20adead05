"""Plan-shape assertions: the 100 TB posture is only real if the plans
show it. These tests pin the properties the instructions call out —
filter/column pushdown to the parquet scan, broadcast joins for dims,
partial aggregation before the shuffle, TakeOrderedAndProject for
top-K — so a regression in plan quality fails CI, not just the bench."""

from __future__ import annotations

import re

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

from .conftest import SF_CORRECT


def plan_of(spark, name: str, execute: bool = False) -> str:
    df = QUERIES[name](spark, SF_CORRECT)
    if execute:  # AQE final plans (incl. codegen spans) exist only post-run
        df.collect()  # executes THIS DataFrame's queryExecution (count() would plan a new one)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_wordcount_plan(spark):
    plan = plan_of(spark, "wc_top_k")
    assert "TakeOrderedAndProject" in plan  # top-K as bounded heaps, not global sort
    assert plan.count("HashAggregate") >= 2  # partial (map-side) + final
    assert "ReadSchema: struct<text:string>" in plan  # column pruning to 1 col


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "rel_q1_pricing_summary", execute=True)
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", plan)
    assert "l_orderkey" not in plan.split("ReadSchema:")[1].splitlines()[0]  # unused col pruned
    assert "[codegen id :" in plan  # whole-stage codegen spans present


def test_q3_broadcasts_dimension(spark):
    plan = plan_of(spark, "rel_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan  # customer side broadcast
    assert re.search(r"PushedFilters: \[.*EqualTo\(c_mktsegment,BUILDING", plan)


def test_q5_broadcasts_all_dims_one_shuffle_join(spark):
    plan = plan_of(spark, "rel_q5_region_revenue")
    # four broadcast joins (customer, supplier, nation⋈region, asia_nations)
    assert plan.count("BroadcastHashJoin") >= 3
    # at most one shuffle-based join (orders↔lineitem)
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_semi_anti_plans(spark):
    assert "LeftSemi" in plan_of(spark, "rel_join_semi")
    assert "LeftAnti" in plan_of(spark, "rel_join_anti")


def test_projection_reaches_scan(spark):
    plan = plan_of(spark, "rel_project_filter")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_retailprice" in read_schema and "p_brand" not in read_schema
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(p_size,30\)", plan)


def test_no_python_udf_in_text_ops(spark):
    # text analysis must stay JVM-side (no BatchEvalPython / ArrowEvalPython)
    for name in ["text_token_stats", "text_quality", "text_lang_id", "text_fingerprint"]:
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, f"{name} fell off the codegen path"


def test_ann_bruteforce_broadcasts_queries(spark):
    plan = plan_of(spark, "ann_topk_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
