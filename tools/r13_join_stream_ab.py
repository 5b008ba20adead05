"""Round-13 batch 2 A/Bs:
 - q3/q5 under preferSortMergeJoin=false (+ AQE local-map SHJ threshold)
   vs the default SMJ posture (guide 3.1: shuffled-hash beats sort-merge
   when the per-partition build side fits) — conf flipped per rep in one
   session, interleaved.
 - stream_window_suite floor: both drains vs tumbling-only (how much of
   the suite is the second concurrent query?).
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
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming import (
        events_stream, run_available_now, tumbling_counts,
    )

    spark = get_session("r13-join-stream", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def set_shj(on: bool) -> None:
        spark.conf.set("spark.sql.join.preferSortMergeJoin", str(not on).lower())
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024) if on else "0",
        )

    def timed(fn):
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {}
    for q in ("rel_q3_shipping_priority", "rel_q5_region_revenue", "rel_q18_large_orders"):
        variants[f"{q}:smj"] = (q, False)
        variants[f"{q}:shj"] = (q, True)

    samples: dict[str, list[float]] = {k: [] for k in variants}
    samples["stream_suite"] = []
    samples["stream_single"] = []
    for _ in range(reps):
        for k, (q, shj) in variants.items():
            set_shj(shj)
            spark.sparkContext.setJobDescription(k)
            samples[k].append(timed(lambda: QUERIES[q](spark, sf_dir)))
            spark.catalog.clearCache()
        set_shj(False)
        spark.sparkContext.setJobDescription("stream_suite")
        samples["stream_suite"].append(timed(lambda: QUERIES["stream_window_suite"](spark, sf_dir)))
        spark.sparkContext.setJobDescription("stream_single")
        samples["stream_single"].append(
            timed(lambda: run_available_now(tumbling_counts(events_stream(spark, sf_dir)), "complete"))
        )
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
