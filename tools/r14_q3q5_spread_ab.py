"""Round-14: does rel_q1's spread win (r13, 0.68x) transfer to q3/q5?

Their probe chains run at the orders/lineitem scan width (1-3 splits of
a 2.7/11 MB file at sf0.1) because every dimension side broadcasts —
the only Exchange in either plan is the final aggregate. Variants
spread the STREAM side (round-robin; the final group keys have 5-10
distinct values so keyed spreading would collapse parallelism).

Value parity asserted; order-alternated interleaved reps.

Usage: SPARK_GRAFT_BENCH_REPS=6 python tools/r14_q3q5_spread_ab.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "6"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.relational_q import (
        rel_q3_shipping_priority,
        rel_q5_region_revenue,
        rev_col,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.exact import dsum
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r14-q3q5-spread-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def _t(*names):
        return [load_table(spark, sf_dir, t) for t in names]

    def q3_spread():
        li, o, c = _t("lineitem", "orders", "customer")
        building = c.where(F.col("c_mktsegment") == "BUILDING")
        joined = (
            spread(o.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
            .join(building, F.col("o_custkey") == building.c_custkey)
            .join(
                li.where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        return (
            joined.groupBy("l_orderkey", "o_orderdate")
            .agg(dsum(rev_col(), 6, alias="revenue"))
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10)
            .select("l_orderkey", "revenue", "o_orderdate")
        )

    def q5_spread():
        li, o, c, s, n, r = _t("lineitem", "orders", "customer", "supplier", "nation", "region")
        asia_nations = (
            n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
            .select("n_nationkey", "n_name")
        )
        joined = (
            spread(o.where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")))
            .join(c, F.col("o_custkey") == c.c_custkey)
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        )
        return joined.groupBy("n_name").agg(dsum(rev_col(), 6, alias="revenue"))

    variants = {
        "q3_asis": lambda: rel_q3_shipping_priority(spark, sf_dir),
        "q3_spread": q3_spread,
        "q5_asis": lambda: rel_q5_region_revenue(spark, sf_dir),
        "q5_spread": q5_spread,
    }
    parity = {
        "q3": sorted(map(tuple, variants["q3_asis"]().collect()))
        == sorted(map(tuple, variants["q3_spread"]().collect())),
        "q5": sorted(map(tuple, variants["q5_asis"]().collect()))
        == sorted(map(tuple, variants["q5_spread"]().collect())),
    }
    samples = {k: [] for k in variants}
    for rep in range(reps_n):
        keys = list(variants) if rep % 2 == 0 else list(reversed(list(variants)))
        for k in keys:
            spark.sparkContext.setJobDescription(f"r14 {k}")
            t0 = time.perf_counter()
            variants[k]().write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "parity": parity,
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps_n,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
