"""Pin the live-vs-stored IVF crossover (VERDICT r11 item 1).

The registry's `ann_topk_ivf` must choose between two measured routes:

- **live**: in-plan Lloyd training at k=16 + in-plan bucket assignment
  (`ivf_centroids` + `ivf_topk`) — zero storage, but training cost and
  assignment cost are both linear in the corpus (18.5x/decade measured
  in SCALE_R11_ANN.json).
- **stored**: sampled driver-side k-means at sqrt(N) centroids, ONE
  write-time assignment pass, partition-pruned probes
  (`ivf_centroids_np` + `write_ivf_index` + `ivf_topk_stored`) —
  8.5x/decade, but pays a fixed train+write overhead.

This tool measures BOTH routes end-to-end cold (train + [write] +
probe) at several corpus sizes so the crossover constant
`similarity.IVF_AUTO_CROSSOVER_VECTORS` is a measured number, not a
guess — the same discipline as EDGE_AUTO_CROSSOVER_POSTINGS and the
skew/state seams (plans/cost.py).

Known points going in (SCALE_R11_ANN.json):
  200k: live 72.8 s vs stored-cold 45.2 s  -> stored
  2M:   live 1067 s vs stored-cold 268 s   -> stored
  2k (registry sf0.1): live is ~1 s; stored pays a multi-second
  parquet write+read roundtrip -> live

Usage: python tools/ann_crossover.py --out SCALE_R12_ANN_CROSSOVER.json
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

    exact = S.brute_force_topk(queries, emb, TOP_K).select("query_id", "neighbor_id").cache()
    n_exact = exact.count()

    # LIVE route, cold: in-plan training + in-plan assignment probe
    t0 = time.perf_counter()
    c16 = S.ivf_centroids(emb)
    live = S.ivf_topk(queries, emb, c16, TOP_K, nprobe=10).select("query_id", "neighbor_id")
    hits = live.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    rec["live_total_sec"] = round(time.perf_counter() - t0, 3)
    rec["live_recall"] = round(hits / n_exact, 4)
    session_hygiene(spark)

    # STORED route, cold: sampled training + write-time assignment +
    # pruned probe (the one-shot cost the auto decision compares)
    k = S.ivf_k_for(n)
    nprobe = max(10, k // 4)
    path = os.path.join(".scratch", "ann_crossover_idx")
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    c = S.ivf_centroids_np(emb, k=k)
    S.write_ivf_index(emb, c, path)
    stored = S.ivf_topk_stored(spark, queries, path, c, TOP_K, nprobe=nprobe)
    hits = stored.select("query_id", "neighbor_id").join(
        exact, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    rec["stored_cold_total_sec"] = round(time.perf_counter() - t0, 3)
    rec["stored_recall"] = round(hits / n_exact, 4)
    rec["stored_k"], rec["stored_nprobe"] = k, nprobe

    # warm probe (index already on disk) — the amortized cost context
    t0 = time.perf_counter()
    S.ivf_topk_stored(spark, queries, path, c, TOP_K, nprobe=nprobe).count()
    rec["stored_warm_probe_sec"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(path, ignore_errors=True)
    exact.unpersist()
    session_hygiene(spark)
    rec["winner_cold"] = "stored" if rec["stored_cold_total_sec"] < rec["live_total_sec"] else "live"
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dirs", nargs="*", default=[
        "/root/testdata/sf0.1:50", ".scratch/sf1:50", ".scratch/sf10:500",
    ], help="sf_dir:query_mod pairs")
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("ann-crossover")
    points = []
    for spec in a.dirs:
        sf_dir, mod = spec.rsplit(":", 1)
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"skip {sf_dir}: no embeddings", flush=True)
            continue
        rec = measure(spark, sf_dir, int(mod))
        print(json.dumps(rec), flush=True)
        points.append(rec)
    out = {"points": points, "top_k": TOP_K}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
