"""Round-14 (VERDICT r13 item 3): A/B the stream_window_suite drain at
several shuffle/state-store widths. Streaming disables AQE, so
spark.sql.shuffle.partitions at query start IS the state-store partition
count — the suite pays 2 x (query start + state-store init) at that
width every drain. Interleaved sweeps (width-major inside each rep), min
+ median reported, row parity asserted across widths.

Usage: SPARK_GRAFT_BENCH_REPS=5 python tools/r14_stream_width_ab.py [width ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    widths = [int(w) for w in sys.argv[1:]] or [4, 8, 16, 32]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.streaming_q import (
        stream_window_suite,
    )

    spark = get_session("r14-stream-width-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    base = spark.conf.get("spark.sql.shuffle.partitions")

    def run(width: int):
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        try:
            spark.sparkContext.setJobDescription(f"stream suite width={width}")
            t0 = time.perf_counter()
            df = stream_window_suite(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            return dt, df
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base)
            spark.catalog.clearCache()

    # row-parity check once per width (outside the timed sweeps)
    parity = {}
    for w in widths:
        _, df = run(w)
        parity[w] = sorted(tuple(r) for r in df.collect())
    keys = list(parity)
    rows_equal = all(parity[k] == parity[keys[0]] for k in keys)

    samples: dict[int, list[float]] = {w: [] for w in widths}
    for _ in range(reps):
        for w in widths:
            dt, _ = run(w)
            samples[w].append(dt)
    print(
        json.dumps(
            {
                "rows_equal_across_widths": rows_equal,
                "n_rows": len(parity[keys[0]]),
                "min": {w: round(min(v), 3) for w, v in samples.items()},
                "median": {w: round(statistics.median(v), 3) for w, v in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
