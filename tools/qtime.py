"""Time a subset of bench entries in isolation (same methodology as
bench.py: noop sink, interleaved sweeps, min + median reported).

Usage: SPARK_GRAFT_BENCH_REPS=5 python tools/qtime.py name [name ...]
Optional env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_IMPL  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: qtime.py name [name ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

    spark = get_session("spark-graft-qtime", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # JVM warm-up

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            fn = BENCH_IMPL.get(name, QUERIES.get(name))
            if fn is None:
                raise SystemExit(f"unknown query {name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "min": {n: round(min(ts), 3) for n, ts in samples.items()},
                "median": {n: round(statistics.median(ts), 3) for n, ts in samples.items()},
                "all": {n: [round(t, 3) for t in ts] for n, ts in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
