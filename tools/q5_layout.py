"""Root-cause rel_q5's 5.46x decade ratio (VERDICT r11 item 6).

Post-r11-fix, rel_q5 held the highest join-heavy decade ratio (5.46x
vs q3's 2.7x / q18's 2.98x / join suite's 4.32x). Two suspects named
by the r11 record:

1. **page-cache eviction on the 11 GB single-file lineitem** — the
   record noted 2-5x first-touch noise between back-to-back heavy
   queries; a single 11 GB file also serializes footer/rowgroup reads
   more than a multi-file layout would.
2. **the 6-table join's second fact-side exchange** — q5 re-shuffles
   the lineitem x orders SMJ output for the supplier join condition
   (l_suppkey = s_suppkey AND c_nationkey = s_nationkey), which q3
   doesn't have.

Method: min-of-N on BOTH layouts in one session — the as-is single-file
dir and a relaid multi-file dir (same rows, Spark-written in ~128 MB
files) — for q5 and q3 (control), with per-rep shuffle/spill counters
from the UI REST API and the physical plan's exchange census per
layout. If multi-file warm ~= single-file warm, the extra ratio is
I/O-shape/first-touch noise and the floor gets pinned as a SCALE.md
lesson; if multi-file wins materially, the layout is the fix.

Usage: python tools/q5_layout.py --sf100 .scratch/sf100_rel \
           --out SCALE_R12_Q5_LAYOUT.json [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["rel_q5_region_revenue", "rel_q3_shipping_priority"]


def make_multi_dir(spark, sf100: str) -> str:
    """Relaid dir: lineitem re-written by Spark into ~128 MB files (a
    DIRECTORY parquet, the layout a real ingest produces), every other
    table symlinked."""
    out = os.path.abspath(os.path.join(sf100, os.pardir, "sf100_rel_multi"))
    os.makedirs(out, exist_ok=True)
    target = os.path.join(out, "lineitem.parquet")
    if not os.path.exists(os.path.join(target, "_SUCCESS")):
        t0 = time.perf_counter()
        (
            spark.read.parquet(os.path.join(sf100, "lineitem.parquet"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 7_000_000)  # ~128 MB at ~18 B/row
            .parquet(target)
        )
        print(f"relaid lineitem in {time.perf_counter() - t0:.0f}s "
              f"({len(os.listdir(target))} files)", flush=True)
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "events"):
        src, link = os.path.join(sf100, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(link):
            os.symlink(src, link)
    return out


def run_layout(spark, sf_dir: str, reps: int) -> dict:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES as REG
    from tools.scale_run import session_hygiene
    from tools.windows_scale import _stage_totals

    out = {}
    for name in QUERIES:
        secs, metrics = [], []
        for _ in range(reps):
            before = _stage_totals(spark)
            t0 = time.perf_counter()
            REG[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
            after = _stage_totals(spark)
            if before and after:
                metrics.append({k: after[k] - before[k] for k in after})
            session_hygiene(spark)
        rec = {"secs": secs, "min_sec": min(secs)}
        if metrics:
            best = metrics[secs.index(min(secs))]
            rec.update({f"{k}_best_rep": v for k, v in best.items()})
        out[name] = rec
        print(name, sf_dir, json.dumps(secs), flush=True)
    return out


def exchange_census(spark, sf_dir: str) -> dict:
    """Count Exchange / SortMergeJoin / BroadcastHashJoin nodes in q5's
    final AQE plan on this dir — the 'second fact exchange' suspect is
    a plan property, countable."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES as REG

    df = REG["rel_q5_region_revenue"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf100", default=".scratch/sf100_rel")
    ap.add_argument("--sf10", default=".scratch/sf10")
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("q5-layout")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    sf100 = os.path.abspath(a.sf100)
    multi = make_multi_dir(spark, sf100)
    rec = {"reps": a.reps}
    rec["sf10"] = run_layout(spark, os.path.abspath(a.sf10), a.reps)
    rec["single_file"] = run_layout(spark, sf100, a.reps)
    rec["multi_file"] = run_layout(spark, multi, a.reps)
    rec["plan_census_single"] = exchange_census(spark, sf100)
    rec["plan_census_multi"] = exchange_census(spark, multi)
    rec["decade_vs_sf10"] = {
        q: {
            "single": round(rec["single_file"][q]["min_sec"] / rec["sf10"][q]["min_sec"], 2),
            "multi": round(rec["multi_file"][q]["min_sec"] / rec["sf10"][q]["min_sec"], 2),
        }
        for q in QUERIES
    }
    with open(a.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
