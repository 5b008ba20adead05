"""Round-14 (VERDICT r13 item 5): A/B the pipeline's cluster_size stage.

Current: F.count().over(Window.partitionBy('comp')) over the FULL
survivor label frame, then filter to representatives (doc_id == comp) —
a comp-keyed shuffle of every survivor row plus a per-partition sort
(WindowExec), computing sizes on rows that are then thrown away.

Variant: groupBy('comp').count() (map-side partials, no sort) joined to
the PRE-FILTERED representative rows — strictly fewer shuffled bytes
and no sort at any scale.

Both formulations produce identical rows (asserted). Interleaved,
order-alternated per rep.

Usage: SPARK_GRAFT_BENCH_REPS=6 python tools/r14_cluster_size_ab.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _pipeline(docs, cluster_size_via: str):
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import sampling as S
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import text as T
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.dedup_q import JACCARD_T
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.pipeline_q import (
        MAX_PUNCT_RATIO,
        MIN_STOPWORD_RATIO,
        MIN_TOKENS,
        SHINGLE_DF_CAP,
    )

    text = F.col("text")
    feats = T.quality_features(text)
    gated = spread(docs, by=["doc_id"])
    qual = gated.where(
        (feats["n_tokens"] >= MIN_TOKENS)
        & (feats["stopword_ratio"] >= MIN_STOPWORD_RATIO)
        & (feats["punct_ratio"] <= MAX_PUNCT_RATIO)
    ).select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        T.lang_id(text).alias("lang_pred"),
        feats["n_tokens"].alias("n_tokens"),
        feats["n_chars"].alias("n_chars"),
        T.fingerprint(T.normalized_text(text)).alias("fp_normalized"),
    )
    exact_survivors = qual.groupBy("fp_normalized").agg(F.min("doc_id").alias("doc_id"))
    surv_docs = docs.join(exact_survivors.select("doc_id"), "doc_id", "left_semi")
    edges = D.jaccard_pairs(surv_docs, JACCARD_T, max_shingle_df=SHINGLE_DF_CAP).select(
        "doc_a", "doc_b"
    )
    comps = D.connected_components(
        surv_docs.select("doc_id"), edges, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    if cluster_size_via == "window":
        sized = comps.withColumn(
            "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("comp"))
        )
        reps = sized.where(F.col("doc_id") == F.col("comp"))
    else:
        sizes = comps.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
        reps = comps.where(F.col("doc_id") == F.col("comp")).join(sizes, "comp")
    return (
        reps.join(qual, "doc_id")
        .withColumn("sample_bucket", S.hash_bucket("doc_id", 10))
        .select(
            "doc_id", "lang_label", "lang_pred", "n_tokens", "n_chars",
            "cluster_size", "sample_bucket",
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "6"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r14-cluster-size-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def docs():
        return load_table(spark, sf_dir, "documents")

    # row parity
    w = sorted(tuple(r) for r in _pipeline(docs(), "window").collect())
    g = sorted(tuple(r) for r in _pipeline(docs(), "groupby").collect())
    parity = w == g
    spark.catalog.clearCache()

    samples = {"window": [], "groupby": []}
    for rep in range(reps_n):
        order = ["window", "groupby"] if rep % 2 == 0 else ["groupby", "window"]
        for k in order:
            spark.sparkContext.setJobDescription(f"cluster_size {k}")
            t0 = time.perf_counter()
            _pipeline(docs(), k).write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "rows_equal": parity,
                "n_rows": len(w),
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps_n,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
