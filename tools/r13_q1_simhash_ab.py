"""Round-13: (a) rel_q1 scan-parallelism A/B — the 11 MB lineitem file
yields ~3 splits, so the 9-decimal-aggregate partial stage runs ~3-wide
on a 32-core box; does spreading first pay? (b) simhash hash-cost A/B —
per-occurrence poly fold vs per-distinct-(doc,tok) fold (weighted votes)
vs per-vocab-token fold joined back (broadcast dictionary). All variants
are vote-arithmetic-identical (integer sums).
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
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.exact import (
        charge_col, davg, dsum, rev_col,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.hashing import (
        SIMHASH_BITS, poly_hash_token,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.dedup import simhash
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.text import tokens_col
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r13-q1-simhash", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def q1(df):
        return (
            df.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                dsum("l_quantity", alias="sum_qty"),
                dsum("l_extendedprice", alias="sum_base_price"),
                dsum(rev_col(), 6, alias="sum_disc_price"),
                dsum(charge_col(), 6, alias="sum_charge"),
                davg("l_quantity", alias="avg_qty"),
                davg("l_extendedprice", alias="avg_price"),
                davg("l_discount", alias="avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    def li():
        return load_table(spark, sf_dir, "lineitem")

    def q1_asis():
        return q1(li())

    def q1_spread():
        return q1(spread(li()))

    def docs():
        return load_table(spark, sf_dir, "documents")

    def sim_occurrence():
        return simhash(docs())

    def _assemble(per_doc):
        bit = F.lit(0).cast("long")
        for b in range(SIMHASH_BITS):
            bit = bit + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return per_doc.select(F.col("doc_id"), bit.alias("simhash"))

    def sim_distinct_pair():
        toks = spread(docs(), by=["doc_id"]).select(
            F.col("doc_id"), F.explode(tokens_col("text")).alias("tok")
        )
        cnts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
        cnts = cnts.withColumn("_h", poly_hash_token("tok"))
        h, cnt = F.col("_h"), F.col("cnt")
        votes = [
            F.sum((F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1) * cnt).alias(f"_v{b}")
            for b in range(SIMHASH_BITS)
        ]
        return _assemble(cnts.groupBy("doc_id").agg(*votes))

    def sim_vocab_dict():
        toks = spread(docs(), by=["doc_id"]).select(
            F.col("doc_id"), F.explode(tokens_col("text")).alias("tok")
        )
        cnts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
        vocab = cnts.select("tok").distinct().withColumn("_h", poly_hash_token("tok"))
        joined = cnts.join(F.broadcast(vocab), "tok")
        h, cnt = F.col("_h"), F.col("cnt")
        votes = [
            F.sum((F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1) * cnt).alias(f"_v{b}")
            for b in range(SIMHASH_BITS)
        ]
        return _assemble(joined.groupBy("doc_id").agg(*votes))

    variants = {
        "q1_asis": q1_asis,
        "q1_spread": q1_spread,
        "sim_occurrence": sim_occurrence,
        "sim_distinct_pair": sim_distinct_pair,
        "sim_vocab_dict": sim_vocab_dict,
    }
    # value parity for the simhash variants
    mism1 = (
        sim_occurrence().alias("a")
        .join(sim_distinct_pair().alias("b"), "doc_id")
        .where("a.simhash <> b.simhash")
        .count()
    )
    mism2 = (
        sim_occurrence().alias("a")
        .join(sim_vocab_dict().alias("b"), "doc_id")
        .where("a.simhash <> b.simhash")
        .count()
    )
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab {k}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "simhash_mismatch_distinct": mism1,
                "simhash_mismatch_vocab": mism2,
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
