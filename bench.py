"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS] and
prints ONE JSON line.

Queries execute into the noop sink — full computation, no driver-side
collection — so timings measure the engine, not result serialization.
The set spans every subsystem: word-count parity, TPC-H-shaped joins
and aggregation, windows, dedup (exact-Jaccard index join + SimHash +
MinHash LSH), vector search, text analysis, and a streaming drain.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "wc_top_k",
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_region_revenue",
    "win_running_sum",
    "dedup_jaccard_pairs",
    "dedup_simhash_near",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_doc_profile",  # superset of round-1's text_quality (adds lang-id, fingerprints, simhash)
    "stream_window_suite",  # superset of round-1's stream_tumbling_counts (adds sliding)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

    spark = get_session("spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/session (tiny action, not a headline query)
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators persist() intermediates (signatures, shingle sets) for
        # intra-query reuse; drop them between queries so one query's
        # cache can't squeeze the next one's executor memory
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
