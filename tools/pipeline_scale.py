"""Curation pipeline end-to-end at sf100 (VERDICT r11 item 4).

The cost-aware edge route's crossover is pinned at both ends by unit
tests, and the sf100 COMPONENTS A/B exists (SCALE_R9_SF100.json:
minhash 342 s vs jaccard 749 s at 5M docs), but the full
gate -> exact-dedup -> near-dup CC -> survivor -> sample composition
(`pipeline_corpus_curation`) had never run end-to-end at the scale
where `edge_method='auto'` actually flips to MinHash. This records:

- the AUTO DECISION at sf10 (500k docs -> jaccard side) and sf100
  (5M docs -> minhash side), with the measured statistic each saw;
- end-to-end pipeline wall at both scales (noop sink) + the decade
  ratio and survivor-count linearity (replica construction makes
  survivors scale ~10x if the dedup stages behave);
- a sampled registry+oracle run (1-in-k doc slice at sf100
  characteristics; the oracle is the recursive-CTE re-derivation, so
  the sample keeps it tractable — the lesson-29 pattern).

Fixture: documents-only 10x replica of sf10 docs via the seeded
q{i}-suffix transform of tools/sf100_dedup.py (dup structure
replicates within replicas, never across — survivor counts scale
linearly by construction).

Usage: python tools/pipeline_scale.py --sf10 .scratch/sf10 \
           --out-dir .scratch/sf100_docs --out SCALE_R12_SF100_PIPELINE.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_docs(spark, src: str, out: str) -> None:
    from tools.make_scale import _write_single_file
    from tools.sf100_dedup import K, _doc_replica

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    marker = os.path.join(out, "_DOCS_OK")
    if os.path.exists(marker):
        return
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, src, "documents")
    stride = docs.count()
    full = _doc_replica(docs, 0, stride)
    for i in range(1, K):
        full = full.unionByName(_doc_replica(docs, i, stride))
    t0 = time.perf_counter()
    _write_single_file(full, out, "documents")
    open(marker, "w").close()
    print(f"documents x {K} -> {out} in {time.perf_counter() - t0:.0f}s", flush=True)


def decision_at(spark, sf_dir: str) -> dict:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.pipeline_q import choose_edge_method
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    method = choose_edge_method(docs)
    return {"choice": method, "n_docs": docs.count(),
            "decision_sec": round(time.perf_counter() - t0, 2)}


def run_pipeline(spark, sf_dir: str) -> dict:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.pipeline_q import curated_corpus
    from tools.scale_run import session_hygiene, touch_state

    state = touch_state(sf_dir)  # lesson 42: label cold reps
    t0 = time.perf_counter()
    survivors = curated_corpus(spark, sf_dir).count()
    sec = round(time.perf_counter() - t0, 2)
    session_hygiene(spark)
    return {"survivors": survivors, "sec": sec, "touch_state": state}


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
    name = "pipeline_corpus_curation"
    rec = run_one(spark, con, name, REG[name], ORACLE_SQL.get(name), out_dir, budget)
    session_hygiene(spark)
    rec["sample_mod"] = k
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default=".scratch/sf10")
    ap.add_argument("--out-dir", default=".scratch/sf100_docs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--oracle-budget", type=float, default=1800.0)
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("pipeline-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    sf10, sf100 = os.path.abspath(a.sf10), os.path.abspath(a.out_dir)
    ensure_docs(spark, sf10, sf100)
    rec = {"sf10_dir": sf10, "sf100_dir": sf100}
    rec["decision_sf10"] = decision_at(spark, sf10)
    rec["decision_sf100"] = decision_at(spark, sf100)
    print(json.dumps({k: rec[k] for k in ("decision_sf10", "decision_sf100")}), flush=True)
    rec["pipeline_sf10"] = run_pipeline(spark, sf10)
    print("sf10:", json.dumps(rec["pipeline_sf10"]), flush=True)
    rec["pipeline_sf100"] = run_pipeline(spark, sf100)
    print("sf100:", json.dumps(rec["pipeline_sf100"]), flush=True)
    rec["decade_ratio"] = round(rec["pipeline_sf100"]["sec"] / rec["pipeline_sf10"]["sec"], 2)
    rec["survivor_ratio"] = round(
        rec["pipeline_sf100"]["survivors"] / max(rec["pipeline_sf10"]["survivors"], 1), 3
    )
    rec["sampled_oracle"] = sampled_phase(spark, sf100, a.k, a.oracle_budget)
    print("sampled:", json.dumps(rec["sampled_oracle"]), flush=True)
    with open(a.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
