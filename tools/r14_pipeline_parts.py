"""Round-14 (VERDICT r13 item 5): sub-profile pipeline_corpus_curation's
remaining floor — decompose the jaccard edge stage (doc_shingles,
eager_stats materialization, df-cap freq join, self-join + pair agg)
and re-test the unexplained pipeline_full vs pipeline_jaccard_forced
gap with a directly alternating A/B.

Usage: SPARK_GRAFT_BENCH_REPS=5 python tools/r14_pipeline_parts.py
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
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.caching import eager_stats
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.dedup import SHINGLE_INDEX_BOUND
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.dedup_q import JACCARD_T
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.pipeline_q import (
        SHINGLE_DF_CAP,
        curate,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r14-pipeline-parts", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def docs():
        return load_table(spark, sf_dir, "documents")

    def shingles_only():
        return D.doc_shingles(docs())

    def shingles_eager():
        ds = eager_stats(D.doc_shingles(docs()), SHINGLE_INDEX_BOUND)
        return ds

    def edges_capped():
        return D.jaccard_pairs(docs(), JACCARD_T, max_shingle_df=SHINGLE_DF_CAP)

    def edges_uncapped():
        return D.jaccard_pairs(docs(), JACCARD_T)

    def pipeline_auto():
        return curate(docs())

    def pipeline_forced():
        return curate(docs(), edge_method="jaccard")

    variants = {
        "shingles_only": shingles_only,
        "shingles_eager": shingles_eager,
        "edges_capped": edges_capped,
        "edges_uncapped": edges_uncapped,
        "pipeline_auto": pipeline_auto,
        "pipeline_forced": pipeline_forced,
    }
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"r14 parts {k}")
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
