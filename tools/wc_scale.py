"""Word-count family at the third and fourth decade (round 13 — VERDICT
r12 item 4).

The reference's own query (O1-O9: tokenize -> count -> top-K, plus the
O6+O7 partitioned sorted layout) had scale evidence only to sf1; joins,
windows, media and the pipeline all carry sf100 records. This tool
gives the flagship family the same treatment:

- timing: `wc_suite` (O3+O6+O9 top-K, both branches) and
  `wc_partitioned_layout` (full salted aggregate + range layout) at
  sf10 (500k docs) and sf100 (5M docs), min-of-N with per-rep
  page-cache labels (SCALE.md lesson 43) and UI stage counters.
- correctness: the lesson-29 sampled-oracle pattern — both engines run
  the REGISTRY query + oracle on a `doc_id % k = 0` sample of the same
  corpus, hash-exact via the driver's own compare. The registry top-K
  is already deterministic under count ties (ORDER BY cnt DESC, word
  ASC both sides), so the hash is stable at any SF — the sf1 full run's
  rows-only `wc_top_k` row was the BENCH variant, not the registry.

Usage: python tools/wc_scale.py --out SCALE_R13_SF100_WC.json
(big-SF runs want SPARK_GRAFT_DRIVER_MEM=96g)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["wc_suite", "wc_partitioned_layout"]


def sampled_phase(spark, sf_dir: str, k: int, budget: float) -> dict:
    import duckdb

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES as REG
    from tools.scale_run import run_one, session_hygiene

    out_dir = os.path.join(sf_dir, f"_sampled_mod{k}")
    os.makedirs(out_dir, exist_ok=True)
    target = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(target):
        duckdb.connect().execute(
            f"COPY (SELECT * FROM '{sf_dir}/documents.parquet' WHERE doc_id % {k} = 0) "
            f"TO '{target}' (FORMAT PARQUET)"
        )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{target}'")
    out = {"sample_mod": k, "sampled_dir": out_dir}
    for name in QUERIES:
        rec = run_one(spark, con, name, REG[name], ORACLE_SQL.get(name), out_dir, budget)
        session_hygiene(spark)
        out[name] = rec
        print(name, "sampled:", rec["status"], rec["rows"], flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default=".scratch/sf10")
    ap.add_argument("--sf100", default=".scratch/sf100_docs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--oracle-budget", type=float, default=900.0)
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from tools.windows_scale import timing_phase

    spark = get_session("wc-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    sf10, sf100 = os.path.abspath(a.sf10), os.path.abspath(a.sf100)

    rec = {"queries": QUERIES, "reps": a.reps}
    rec["sf10"] = timing_phase(spark, sf10, a.reps, names=QUERIES)
    rec["sf100"] = timing_phase(spark, sf100, a.reps, names=QUERIES)
    rec["decade_ratio"] = {
        q: round(rec["sf100"][q]["min_sec"] / rec["sf10"][q]["min_sec"], 2)
        for q in QUERIES
    }
    print("decade ratios:", json.dumps(rec["decade_ratio"]), flush=True)
    # hash-exact sampled oracle at BOTH SFs (mod chosen to reuse the
    # sampled dirs earlier rounds staged: sf10 mod 20 -> 25k docs,
    # sf100 mod 100 -> 50k docs)
    rec["sf10_sampled"] = sampled_phase(spark, sf10, 20, a.oracle_budget)
    rec["sf100_sampled"] = sampled_phase(spark, sf100, 100, a.oracle_budget)
    with open(a.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
