"""Window family at sf100 (VERDICT r11 item 5).

Windows are the classic spill-heavy operator — one Exchange(partition
key) + full sort per window family — and stopped at sf10 sampled
(SCALE_R7_SF10_RELATIONAL.json). With the round-11 pre-AQE width fix
(initialPartitionNum = max(256, 8x width)), this records at 600M-row
scale (orders 150M for win_running_sum, events 100M for
win_lag_frames):

- full-dir timing, min of N reps (noop sink — row production without
  driver materialization), sf10 vs sf100 decade ratios;
- per-query SHUFFLE + SPILL totals from the Spark UI REST API
  (memory/disk bytes spilled are the exact counters the r11 fix was
  about — a sub-linear wall time with exploding spill would still be a
  red flag);
- sampled hash-exact via the orderkey-consistent 1-in-10 dir
  (tools/relational_sample_dir.py) — the window partition keys
  (o_custkey / user_id) see a thinner but identically-distributed
  partition population, and BOTH engines read the same slice, so the
  row-for-row compare is exact.

Usage: python tools/windows_scale.py --sf100 .scratch/sf100_rel \
           --sf10 .scratch/sf10 --out SCALE_R12_SF100_WINDOWS.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["win_running_sum", "win_lag_frames"]


def _stage_totals(spark) -> dict:
    """Cumulative completed-stage counters from the UI REST API."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return {}
    keys = ("memoryBytesSpilled", "diskBytesSpilled", "shuffleReadBytes", "shuffleWriteBytes")
    return {k: sum(s.get(k, 0) for s in stages) for k in keys}


def timing_phase(spark, sf_dir: str, reps: int, names: list[str] | None = None) -> dict:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES as REG
    from tools.scale_run import session_hygiene, touch_state

    out = {}
    for name in names or QUERIES:
        secs, spills, states = [], [], []
        for _ in range(reps):
            states.append(touch_state(sf_dir))  # lesson 42: label cold reps
            before = _stage_totals(spark)
            t0 = time.perf_counter()
            REG[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
            after = _stage_totals(spark)
            if before and after:
                spills.append({k: after[k] - before[k] for k in after})
            session_hygiene(spark)
        rec = {"secs": secs, "rep_touch_state": states, "min_sec": min(secs)}
        if spills:
            # spill/shuffle of the min-time rep (same index)
            rec["per_rep_metrics"] = spills
            best = spills[secs.index(min(secs))]
            rec.update({f"{k}_best_rep": v for k, v in best.items()})
        out[name] = rec
        print(name, sf_dir, json.dumps(rec["secs"]), flush=True)
    return out


def sampled_phase(spark, sf100: str, budget: float) -> dict:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES as REG
    from tests.oracle_harness import duckdb_conn
    from tools.relational_sample_dir import make_relational_sampled_dir
    from tools.scale_run import run_one, session_hygiene

    sampled = make_relational_sampled_dir(os.path.abspath(sf100), 10)
    con = duckdb_conn(sampled)
    out = {"sampled_dir": sampled}
    for name in QUERIES:
        rec = run_one(spark, con, name, REG[name], ORACLE_SQL.get(name), sampled, budget)
        session_hygiene(spark)
        out[name] = rec
        print(name, "sampled:", rec["status"], rec["rows"], flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf100", default=".scratch/sf100_rel")
    ap.add_argument("--sf10", default=".scratch/sf10")
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--oracle-budget", type=float, default=1800.0)
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("windows-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    rec = {"queries": QUERIES, "reps": a.reps}
    rec["sf10"] = timing_phase(spark, os.path.abspath(a.sf10), a.reps)
    rec["sf100"] = timing_phase(spark, os.path.abspath(a.sf100), a.reps)
    rec["decade"] = {
        q: round(rec["sf100"][q]["min_sec"] / rec["sf10"][q]["min_sec"], 2) for q in QUERIES
    }
    rec["sampled_mod10"] = sampled_phase(spark, a.sf100, a.oracle_budget)
    with open(a.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
