"""Close the text family's fourth-decade oracle gap (round 13 — VERDICT
r12 item 1).

SCALE_R12_SF100_TEXT.json left exactly one fourth-decade row unverified:
`text_doc_profile` — Spark finished 5M rows in 671 s but the FULL DuckDB
re-derivation blew its 1500 s budget (1525 s). This applies the
lesson-29 sampled-oracle pattern already used by windows/pipeline/mm:
both engines run the registry query + oracle over a `doc_id % k = 0`
sample of the same 5M-doc corpus (mod 100 -> 50k docs, well inside any
oracle budget), hash-exact via the driver's own compare; the full-corpus
Spark side re-runs in timing-only mode so the record stays
self-contained (the sampled hash plus the full-scale wall + row count).

Usage: SPARK_GRAFT_DRIVER_MEM=96g python tools/text_scale.py --out SCALE_R13_SF100_TEXT.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["text_doc_profile", "text_vocab_suite", "text_tfidf_top_terms"]


def main() -> None:
    import duckdb

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf100", default=".scratch/sf100_docs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--oracle-budget", type=float, default=900.0)
    ap.add_argument("--skip-full", action="store_true",
                    help="sampled-oracle phase only (full timing exists in SCALE_R12)")
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES as REG
    from tools.scale_run import run_one, session_hygiene

    spark = get_session("text-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    sf100 = os.path.abspath(a.sf100)
    rec = {"sf_dir": sf100, "sample_mod": a.k}

    # sampled hash-exact phase: both engines on the mod-k sample
    out_dir = os.path.join(sf100, f"_sampled_mod{a.k}")
    os.makedirs(out_dir, exist_ok=True)
    target = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(target):
        duckdb.connect().execute(
            f"COPY (SELECT * FROM '{sf100}/documents.parquet' WHERE doc_id % {a.k} = 0) "
            f"TO '{target}' (FORMAT PARQUET)"
        )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{target}'")
    rec["sampled"] = {}
    for name in QUERIES:
        r = run_one(spark, con, name, REG[name], ORACLE_SQL.get(name), out_dir, a.oracle_budget)
        session_hygiene(spark)
        rec["sampled"][name] = r
        print(name, "sampled:", r["status"], r["rows"], flush=True)

    # full-corpus Spark timing (no oracle): keeps the record self-contained
    if not a.skip_full:
        r = run_one(spark, con, "text_doc_profile", REG["text_doc_profile"],
                    ORACLE_SQL.get("text_doc_profile"), sf100, 0)
        rec["full_timing"] = {"text_doc_profile": r}
        print("full timing:", json.dumps(r), flush=True)

    rec["note"] = (
        "Sampled-oracle closure of the one unverified fourth-decade row "
        "(SCALE_R12_SF100_TEXT.json: full DuckDB oracle 1525s > 1500s budget "
        "while Spark took 671s over 5M docs). Pattern: lesson 29 sample_mod "
        "re-derivation, as used by the windows/pipeline/mm sf100 records."
    )
    with open(a.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
