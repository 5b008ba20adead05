"""Scale-proof runner: execute EVERY registered query at an arbitrary
sf_dir, (a) timing the engine (noop sink — no driver collection), and
(b) comparing against the DuckDB oracle under a wall-clock budget, so
the 50-query correctness gate and the scaling measurement both run at
10x data (VERDICT r3 item 1).

Oracle budget: some oracles are intentionally naive (all-pairs SimHash,
brute-force ANN) — correct at the driver's sf0.01 gate, quadratic at
sf1. A DuckDB interrupt after --oracle-budget seconds downgrades those
to a rows-only record (status=oracle_timeout) instead of hanging the
run; the Spark side still executes and is timed.

Usage:
  python tools/scale_run.py --sf-dir .scratch/sf1 --out SCALE_SF1.json
  python tools/scale_run.py --sf-dir /root/testdata/sf0.1 --out SCALE_SF01.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def session_hygiene(spark):
    """Reclaim cross-query session state between heavy queries.

    Spark's ContextCleaner frees dead broadcast/shuffle/cache blocks only
    when the DRIVER JVM garbage-collects the corresponding driver-side
    objects — and a mostly-allocating 8 GB heap can go many minutes
    between full GCs, so block debris from queries 1..k-1 stays pinned
    while query k runs. Measured failure mode (round 6): the 7-query sf10
    sequence with oracle comparisons interleaved OOM'd on the LAST query
    (`dedup_cosine_corpus`, java heap in a Cast), yet the same query is
    clean in a fresh session — accumulation, not the operator. Python-side
    `gc.collect()` first so DataFrame/Broadcast wrappers caught in
    reference cycles actually release their JVM handles, then a JVM
    System.gc() so ContextCleaner processes the newly dead references
    before the next query allocates."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001 — local-mode hygiene
    except Exception:  # pragma: no cover — connect-mode session has no _jvm
        pass


#: sf_dirs already read at least once by THIS process — the lesson-42
#: (SCALE.md) page-cache discipline: on this box the virtual disk's
#: first-touch throughput swings 2-5x between minutes, so any rep that
#: first reads a dir is labeled, and decade ratios should be computed
#: from warm (or min-of-N) numbers plus byte/spill counters, never a
#: lone first-touch wall sample.
_TOUCHED_DIRS: set[str] = set()


def touch_state(sf_dir: str) -> str:
    """'first_touch' the first time THIS process times a read of
    ``sf_dir``, 'warm' after — the per-rep cold/warm annotation every
    scale record carries (VERDICT r12 item 6). 'first_touch' means the
    page-cache state is UNKNOWN (cold unless something else read the
    dir), not provably cold."""
    d = os.path.abspath(sf_dir)
    if d in _TOUCHED_DIRS:
        return "warm"
    _TOUCHED_DIRS.add(d)
    return "first_touch"


def warm_touch(sf_dir: str) -> float:
    """Sequentially byte-read every parquet file under ``sf_dir`` into
    the page cache (and mark the dir touched), so subsequent timing reps
    measure compute rather than virtual-disk weather. Returns the
    seconds spent. Opt-in (--warm-touch): at sf100 this reads tens of
    GB, and some records WANT the cold number (documented per record)."""
    t0 = time.perf_counter()
    for root, _dirs, files in os.walk(os.path.abspath(sf_dir)):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass
    _TOUCHED_DIRS.add(os.path.abspath(sf_dir))
    return round(time.perf_counter() - t0, 2)


def run_one(spark, con, name, fn, oracle, sf_dir, budget):
    from tests.oracle_harness import compare_rows

    rec = {
        "status": None, "spark_sec": None, "oracle_sec": None, "rows": None,
        "err": None, "touch_state": touch_state(sf_dir),
    }
    t0 = time.perf_counter()
    try:
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        rec["spark_sec"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    except Exception as exc:  # noqa: BLE001 — record and continue
        rec["status"], rec["err"] = "spark_error", f"{type(exc).__name__}: {exc}"[:500]
        return rec
    if oracle is None:
        rec["status"] = "rows_only_by_design"
        rec["rows"] = fn(spark, sf_dir).count()
        return rec
    if budget <= 0:
        # timing-only mode (--oracle-budget 0): Spark wall + output rows,
        # no oracle comparison. For SFs where compare_rows' driver-side
        # materialization is itself the bottleneck (sf10 simhash emits
        # ~200M pair rows); correctness is gated at sf0.01/sf0.1/sf1.
        rec["status"] = "timing_only"
        rec["rows"] = fn(spark, sf_dir).count()
        return rec
    t1 = time.perf_counter()
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        cur = con.execute(oracle)
        sdf = fn(spark, sf_dir)
        # row count comes from the compare itself: a THIRD query
        # execution here ran with the compare's collected rows still
        # pinned and OOM'd broadcast builds at sf10 (SCALE.md lesson 27)
        rec["rows"] = compare_rows(sdf, cur, name)
        rec["status"] = "hash_exact"
    except duckdb.InterruptException:
        rec["status"] = "oracle_timeout"
        rec["rows"] = fn(spark, sf_dir).count()
    except AssertionError as exc:
        rec["status"], rec["err"] = "MISMATCH", str(exc)[:800]
    except Exception as exc:  # noqa: BLE001
        rec["status"], rec["err"] = "error", f"{type(exc).__name__}: {exc}"[:500]
    finally:
        timer.cancel()
    rec["oracle_sec"] = round(time.perf_counter() - t1, 3)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--oracle-budget", type=float, default=180.0)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument(
        "--warm-touch", action="store_true",
        help="byte-read the sf_dir parquet into the page cache before timing "
             "(lesson 42: first-touch wall clocks on this box are disk weather)",
    )
    a = ap.parse_args()
    sf_dir = os.path.abspath(a.sf_dir)

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES
    from tests.oracle_harness import duckdb_conn

    spark = get_session("scale-run")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    warm_sec = warm_touch(sf_dir) if a.warm_touch else None
    if warm_sec is not None:
        print(f"warm-touch pass over {sf_dir}: {warm_sec}s", flush=True)
    con = duckdb_conn(sf_dir)

    # bench-only workloads (no registry/oracle row): the Zipf skew pair
    # and the corpus-scale cosine near-dup — measured rows-only here so
    # their scaling ratios land in the SCALE_* records too
    import bench

    extra = {k: v for k, v in bench.BENCH_IMPL.items() if k not in QUERIES}
    names = a.only.split(",") if a.only else list(QUERIES) + sorted(extra)
    results = {}
    for name in names:
        fn = QUERIES[name] if name in QUERIES else extra[name]
        rec = run_one(spark, con, name, fn, ORACLE_SQL.get(name), sf_dir, a.oracle_budget)
        session_hygiene(spark)
        results[name] = rec
        print(
            f"{name:34s} {rec['status']:22s} spark={rec['spark_sec']}s "
            f"oracle={rec['oracle_sec']}s rows={rec['rows']} {rec['err'] or ''}",
            flush=True,
        )
    ok = sum(
        1
        for r in results.values()
        if r["status"] in ("hash_exact", "rows_only_by_design", "timing_only")
    )
    summary = {
        "sf_dir": sf_dir,
        "warm_touch_sec": warm_sec,
        "oracle_budget_sec": a.oracle_budget,
        "n_queries": len(results),
        "n_hash_exact": sum(1 for r in results.values() if r["status"] == "hash_exact"),
        "n_oracle_timeout": sum(1 for r in results.values() if r["status"] == "oracle_timeout"),
        "n_fail": sum(
            1 for r in results.values() if r["status"] in ("MISMATCH", "error", "spark_error")
        ),
        "spark_total_sec": round(sum(r["spark_sec"] or 0 for r in results.values()), 3),
        "queries": results,
    }
    with open(a.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{ok + summary['n_oracle_timeout']}/{len(results)} ran; "
          f"{summary['n_hash_exact']} hash-exact, {summary['n_oracle_timeout']} oracle-timeout, "
          f"{summary['n_fail']} FAILED; spark total {summary['spark_total_sec']}s -> {a.out}")


if __name__ == "__main__":
    main()
