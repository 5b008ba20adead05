"""Round-14 (VERDICT r13 item 6): A/B the simhash fingerprint stage's
vote-sum formulation. Variants:

- sums56   — current: 56 flat SUM((h>>b & 1)*2 - 1) aggregates
- bits56   — 56 flat SUM(h>>b & 1) + one COUNT; bit set iff 2*s > n
             (saves a multiply+subtract per bit per row in the partial)
- fold     — single aggregate() array fold over collect-free per-row
             transform: SUM over an array column of votes, i.e. one
             aggregate buffer holding an array (VERDICT's ask; higher-
             order functions are exempt from codegen so this is the
             interpreted formulation r13 lessons predict loses)

Value parity asserted on the full corpus (simhash values identical).
Also times the full dedup_simhash_near pair emitter for the winning
variant only if it changes.

Usage: SPARK_GRAFT_BENCH_REPS=5 python tools/r14_simhash_votes_ab.py
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
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.hashing import (
        SIMHASH_BITS,
        poly_hash_token,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.dedup import simhash
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.text import tokens_col
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r14-simhash-votes-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def docs():
        return load_table(spark, sf_dir, "documents")

    def hashed():
        toks = spread(docs(), by=["doc_id"]).select(
            F.col("doc_id"), F.explode(tokens_col("text")).alias("tok")
        )
        return toks.select("doc_id", poly_hash_token("tok").alias("h"))

    def sums56():
        return simhash(docs())

    def bits56():
        h = F.col("h")
        aggs = [
            F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1))).alias(f"_s{b}")
            for b in range(SIMHASH_BITS)
        ] + [F.count(F.lit(1)).alias("_n")]
        per_doc = hashed().groupBy("doc_id").agg(*aggs)
        bit = F.lit(0).cast("long")
        for b in range(SIMHASH_BITS):
            bit = bit + F.when(
                F.col(f"_s{b}") * 2 > F.col("_n"), F.lit(1 << b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return per_doc.select("doc_id", bit.alias("simhash"))

    def fold():
        # one array-valued aggregate: per-row vote array, summed
        # element-wise via aggregate() over collect-free zip_with on a
        # running buffer is not expressible as a declarative agg; the
        # closest single-buffer form is SUM over each element of a
        # posexploded vote array — which shuffles |tokens| x 56 rows.
        # Use the honest higher-order form instead: collect nothing,
        # aggregate(h_list) is out; so emit vote array per row and
        # sum per position with 56 element_at sums (interpreted
        # element_at over a built array per row).
        h = F.col("h")
        votes = F.array(
            *[
                (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                for b in range(SIMHASH_BITS)
            ]
        )
        per_doc = (
            hashed()
            .select("doc_id", votes.alias("v"))
            .groupBy("doc_id")
            .agg(*[F.sum(F.element_at("v", b + 1)).alias(f"_v{b}") for b in range(SIMHASH_BITS)])
        )
        bit = F.lit(0).cast("long")
        for b in range(SIMHASH_BITS):
            bit = bit + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return per_doc.select("doc_id", bit.alias("simhash"))

    variants = {"sums56": sums56, "bits56": bits56, "fold": fold}

    # value parity on the full corpus
    ref = {r[0]: r[1] for r in sums56().collect()}
    parity = {}
    for k, fn in variants.items():
        if k == "sums56":
            parity[k] = True
            continue
        got = {r[0]: r[1] for r in fn().collect()}
        parity[k] = got == ref
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"simhash votes {k}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "parity": parity,
                "n_docs": len(ref),
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
