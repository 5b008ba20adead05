"""Winnowing substring dedup at scale (round 13 — the kind='winnow'
branch landed this round; every other dedup family already carries
decade evidence).

- timing: the winnow frame alone (fingerprints -> shared-doc summary,
  the round-13 operator) AND the full ``dedup_exact_suite`` (which now
  contains it) at sf1 (50k docs), sf10 (500k) and sf100 (5M docs) —
  min-of-N with per-rep page-cache labels (SCALE.md lessons 42/43) and
  UI stage counters, giving the exact-dedup family its fourth-decade
  row alongside joins/windows/media/pipeline.
- correctness: full oracle at sf1 (50k docs is inside DuckDB's budget),
  lesson-29 sampled oracle at sf10 (doc_id % 20) and sf100
  (doc_id % 100) — both through the driver's own compare, hash-exact.

Usage: SPARK_GRAFT_DRIVER_MEM=96g python tools/winnow_scale.py \
    --out SCALE_R13_WINNOW.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def winnow_only(spark, sf_dir: str):
    """The round-13 frame in isolation: fingerprints + shared-doc
    summary (single-pass window formulation, exactly as the suite
    wires it)."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    docs = spread(load_table(spark, sf_dir, "documents"), by=["doc_id"])
    return D.winnow_shared_docs(D.winnow_fingerprints(docs))


def timing_phase(spark, sf_dir: str, reps: int) -> dict:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES as REG
    from tools.scale_run import session_hygiene, touch_state
    from tools.windows_scale import _stage_totals

    out = {}
    for name, fn in (
        ("winnow_only", winnow_only),
        ("dedup_exact_suite", REG["dedup_exact_suite"]),
    ):
        secs, spills, states = [], [], []
        for _ in range(reps):
            states.append(touch_state(sf_dir))
            before = _stage_totals(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
            after = _stage_totals(spark)
            if before and after:
                spills.append({k: after[k] - before[k] for k in after})
            spark.catalog.clearCache()
            session_hygiene(spark)
        rec = {"secs": secs, "rep_touch_state": states, "min_sec": min(secs)}
        if spills:
            rec["per_rep_metrics"] = spills
            best = spills[secs.index(min(secs))]
            rec.update({f"{k}_best_rep": v for k, v in best.items()})
        out[name] = rec
        print(name, sf_dir, json.dumps(rec["secs"]), flush=True)
    return out


def oracle_phase(spark, sf_dir: str, k: int | None, budget: float) -> dict:
    """Full oracle when k is None, else the lesson-29 mod-k sample."""
    import duckdb

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES as REG
    from tools.scale_run import run_one, session_hygiene

    if k is None:
        target_dir, target = sf_dir, os.path.join(sf_dir, "documents.parquet")
    else:
        target_dir = os.path.join(sf_dir, f"_sampled_mod{k}")
        os.makedirs(target_dir, exist_ok=True)
        target = os.path.join(target_dir, "documents.parquet")
        if not os.path.exists(target):
            duckdb.connect().execute(
                f"COPY (SELECT * FROM '{sf_dir}/documents.parquet' WHERE doc_id % {k} = 0) "
                f"TO '{target}' (FORMAT PARQUET)"
            )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{target}'")
    name = "dedup_exact_suite"
    rec = run_one(spark, con, name, REG[name], ORACLE_SQL.get(name), target_dir, budget)
    session_hygiene(spark)
    print(name, f"oracle(mod={k}):", rec["status"], rec["rows"], flush=True)
    return {"sample_mod": k, "dir": target_dir, name: rec}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default=".scratch/sf1")
    ap.add_argument("--sf10", default=".scratch/sf10")
    ap.add_argument("--sf100", default=".scratch/sf100_docs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--oracle-budget", type=float, default=900.0)
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("winnow-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    sf1, sf10, sf100 = (os.path.abspath(p) for p in (a.sf1, a.sf10, a.sf100))

    rec = {"reps": a.reps}
    rec["sf1"] = timing_phase(spark, sf1, a.reps)
    rec["sf10"] = timing_phase(spark, sf10, a.reps)
    rec["sf100"] = timing_phase(spark, sf100, a.reps)
    rec["decade_ratio"] = {
        q: {
            "sf10_over_sf1": round(rec["sf10"][q]["min_sec"] / rec["sf1"][q]["min_sec"], 2),
            "sf100_over_sf10": round(rec["sf100"][q]["min_sec"] / rec["sf10"][q]["min_sec"], 2),
        }
        for q in ("winnow_only", "dedup_exact_suite")
    }
    print("decade ratios:", json.dumps(rec["decade_ratio"]), flush=True)
    rec["sf1_oracle_full"] = oracle_phase(spark, sf1, None, a.oracle_budget)
    rec["sf10_sampled"] = oracle_phase(spark, sf10, 20, a.oracle_budget)
    rec["sf100_sampled"] = oracle_phase(spark, sf100, 100, a.oracle_budget)
    with open(a.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
