"""Count unique Exchange vs BroadcastExchange node ids per headline
query at the test's SF (sf0.01), to re-pin HEADLINE_PLAN_CEILINGS with
the split counting VERDICT r13 item 1 asks for.

Usage: python tools/r14_count_exchanges.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_IMPL, HEADLINE  # noqa: E402


def _unique_nodes(plan: str, kind: str) -> int:
    return len(set(re.findall(rf"\b{kind}\b[^\n(]*\((\d+)\)", plan)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

    spark = get_session("r14-count-exchanges", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in HEADLINE:
        fn = BENCH_IMPL[name] if name in BENCH_IMPL else QUERIES[name]
        df = fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        out[name] = {
            "exchange": _unique_nodes(plan, "Exchange"),
            "broadcast_exchange": _unique_nodes(plan, "BroadcastExchange"),
            "bnlj": _unique_nodes(plan, "BroadcastNestedLoopJoin"),
            "cartesian": _unique_nodes(plan, "CartesianProduct"),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
