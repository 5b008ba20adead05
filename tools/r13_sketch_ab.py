"""Round-13: rel_sketch_suite lineitem-branch spread A/B. The hll
(countDistinct partial), quantile (exact `percentile` ObjectHashAgg +
GK sketch) and rank-check branches all aggregate the ~600k-row lineitem
scan at its ~3-split parallelism. Does spreading the scan first pay,
as it did for rel_q1's decimal partials?
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
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r13-sketch-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def li():
        return load_table(spark, sf_dir, "lineitem")

    def hll(df):
        return df.agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )

    def quant(df):
        accuracy = 10000
        qstats = df.agg(
            F.expr("percentile(l_quantity, 0.5)").alias("med"),
            F.expr(f"approx_percentile(l_quantity, 0.5, {accuracy})").alias("apx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        return df.join(F.broadcast(qstats)).agg(
            F.sum((F.col("l_quantity") < F.col("apx")).cast("long")).alias("rank_lo"),
            F.sum((F.col("l_quantity") <= F.col("apx")).cast("long")).alias("rank_hi"),
            F.first("med").alias("med"),
            F.first("n_rows").alias("n_rows"),
        )

    variants = {
        "hll_asis": lambda: hll(li()),
        "hll_spread": lambda: hll(spread(li())),
        "quant_asis": lambda: quant(li()),
        "quant_spread": lambda: quant(spread(li())),
    }
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"sketch-ab {k}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
