"""Re-measure stored-IVF recall at the small-N operating points under
the round-13 floor-aware default probe count (VERDICT r12 item 5).

SCALE_R12_ANN_CROSSOVER.json measured the quarter-of-centroids operating
point at recall 0.645 (2k vectors — UNDER the registry's 0.65 floor)
and 0.710 (20k — thin). `ivf_nprobe_for` now raises the probe count at
small N until >= IVF_MIN_PROBED_VECTORS expected vectors are swept;
this tool records recall and probe geometry at the same points, old
default vs new default, so the fix is a measured delta, not a claim.

Usage: python tools/ann_floor.py --out SCALE_R13_ANN_FLOOR.json
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP_K = 10


def measure(spark, sf_dir: str, query_mod: int) -> dict:
    from pyspark.sql import functions as F

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from tools.scale_run import session_hygiene

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.where(F.expr(f"vec_id % {query_mod} = 0"))
    rec = {"sf_dir": sf_dir, "n_vectors": n, "n_queries": queries.count()}

    exact = {}
    for r in S.brute_force_topk(queries, emb, TOP_K).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    k = S.ivf_k_for(n)
    path = os.path.join(".scratch", "ann_floor_idx")
    shutil.rmtree(path, ignore_errors=True)
    c = S.ivf_centroids_np(emb, k=k)
    S.write_ivf_index(emb, c, path)
    old_nprobe = max(10, k // 4)
    new_nprobe = S.ivf_nprobe_for(k, n)
    rec.update({"k_centroids": k, "old_nprobe": old_nprobe, "new_nprobe": new_nprobe})

    for label, nprobe in (("old_quarter", old_nprobe), ("floor_aware", new_nprobe)):
        t0 = time.perf_counter()
        got = {}
        for r in S.ivf_topk_stored(spark, queries, path, c, TOP_K, nprobe=nprobe).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
        rec[label] = {
            "nprobe": nprobe,
            "probe_fraction": round(nprobe / k, 4),
            "recall": round(sum(recalls) / len(recalls), 4),
            "probe_sec": round(time.perf_counter() - t0, 3),
        }
        print(sf_dir, label, json.dumps(rec[label]), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    session_hygiene(spark)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dirs", nargs="*", default=[
        "/root/testdata/sf0.1:50", ".scratch/sf1:50", ".scratch/sf10:500",
    ], help="sf_dir:query_mod pairs (2k, 20k, 200k vectors)")
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("ann-floor")
    spark.sparkContext.setLogLevel("ERROR")
    points = []
    for spec in a.dirs:
        sf_dir, mod = spec.rsplit(":", 1)
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"skip {sf_dir}: no embeddings", flush=True)
            continue
        points.append(measure(spark, sf_dir, int(mod)))
    out = {
        "points": points,
        "top_k": TOP_K,
        "recall_floor": 0.65,
        "note": (
            "floor_aware = ivf_nprobe_for(k, n): max(quarter, ceil("
            "IVF_MIN_PROBED_VECTORS / avg_bucket)) capped at k — binds only "
            "under ~25k vectors, where the round-12 crossover measured the "
            "quarter point under the 0.65 floor; the auto gate routes these "
            "sizes to the live route anyway, so this guards DIRECT "
            "ivf_topk_stored callers."
        ),
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
