"""One-off bisect harness for the round-6 perf investigation
(VERDICT r5 items 1-2): time ann_topk_bruteforce / rel_sketch_suite
variants uncontended at sf0.1, interleaved sweeps, report min+median.

Usage: python tools/bisect_bench.py [variant ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("BISECT_REPS", "5"))


def ann_current(spark, sf_dir):
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.similarity_q import ann_topk_bruteforce
    return ann_topk_bruteforce(spark, sf_dir)


def ann_spread_rr(spark, sf_dir):
    """r3 shape: round-robin spread instead of by=[vec_id]."""
    import custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.similarity as S
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.similarity_q import QUERY_PRED, TOP_K
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))
    # inline brute_force_topk but with round-robin spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.vector import dot, norm2

    def normalized(df, out_id, out_vec):
        n = norm2("embedding")
        return df.select(
            F.col("vec_id").alias(out_id),
            F.when(n == 0, F.transform(F.col("embedding"), lambda x: F.lit(0.0)))
            .otherwise(F.transform(F.col("embedding"), lambda x: x.cast("double") / n))
            .alias(out_vec),
        )

    q = normalized(queries, "query_id", "q_vec")
    c = normalized(spread(emb), "neighbor_id", "c_vec")
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot("q_vec", "c_vec").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def ann_nospread(spark, sf_dir):
    import custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.similarity as S
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.similarity_q import QUERY_PRED, TOP_K
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.vector import dot, norm2
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))

    def normalized(df, out_id, out_vec):
        n = norm2("embedding")
        return df.select(
            F.col("vec_id").alias(out_id),
            F.when(n == 0, F.transform(F.col("embedding"), lambda x: F.lit(0.0)))
            .otherwise(F.transform(F.col("embedding"), lambda x: x.cast("double") / n))
            .alias(out_vec),
        )

    q = normalized(queries, "query_id", "q_vec")
    c = normalized(emb, "neighbor_id", "c_vec")
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot("q_vec", "c_vec").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def sketch_current(spark, sf_dir):
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES
    return QUERIES["rel_sketch_suite"](spark, sf_dir)


VARIANTS = {
    "ann_current": ann_current,
    "ann_spread_rr": ann_spread_rr,
    "ann_nospread": ann_nospread,
    "sketch_current": sketch_current,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("bisect", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    samples = {n: [] for n in names}
    for _ in range(REPS):
        for n in names:
            t0 = time.perf_counter()
            df = VARIANTS[n](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples[n].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for n in names:
        ts = samples[n]
        print(f"{n:24s} min={min(ts):.3f} med={statistics.median(ts):.3f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
