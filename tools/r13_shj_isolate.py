"""Round-13: isolate the SHJ win — default vs AQE-threshold-only
(runtime conversion, per-partition-size-guarded, scale-safe) vs
static-flag-only vs both. Also capture which joins actually convert."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "7"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

    spark = get_session("r13-shj-isolate", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    MODES = {
        "default": ("true", "0"),
        "aqe_only": ("true", str(64 * 1024 * 1024)),
        "static_only": ("false", "0"),
        "both": ("false", str(64 * 1024 * 1024)),
    }

    def set_mode(mode: str) -> None:
        prefer, thresh = MODES[mode]
        spark.conf.set("spark.sql.join.preferSortMergeJoin", prefer)
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", thresh)

    queries = ["rel_q3_shipping_priority", "rel_q5_region_revenue", "rel_q18_large_orders"]
    samples: dict[str, list[float]] = {f"{q}:{m}": [] for q in queries for m in MODES}
    for _ in range(reps):
        for q in queries:
            for m in MODES:
                set_mode(m)
                spark.sparkContext.setJobDescription(f"{q}:{m}")
                t0 = time.perf_counter()
                QUERIES[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples[f"{q}:{m}"].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    set_mode("default")
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
