"""ANN top-k decade evidence (VERDICT r10 item 4): run the IVF and LSH
approximate top-k routes against the exact brute-force reference at
sf10 (200k vectors) and sf100 (2M vectors), recording measured RECALL
(not just the registry's boolean floor), per-stage wall time, and the
centroid-training cost separately — the cost curve a 100 TB vector
corpus cares about.

Query set: vec_id % query-mod == 0 (same shape as the registry's
QUERY_PRED, widened so the brute-force reference stays tractable as the
corpus grows — the exact reference is O(queries x corpus); recall is a
per-query statistic, so ~400 queries estimate it within ~2 points at
the 0.7/0.8 floors).

sf100 fixture: embeddings replicated 10x from sf10 with the seeded
random ORTHOGONAL transform of tools/sf100_dedup.py (within-replica
geometry preserved exactly; cross-replica cosines concentrate at
~N(0, 1/64), so true neighbors stay within replicas and the decade is
"10x more vectors of the same kind").

Usage:
  python tools/ann_scale.py --sf10 .scratch/sf10 \
      --sf100-out .scratch/sf100_emb --out SCALE_R11_ANN.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Recall floors pinned by tests/test_dedup_similarity.py at registry
#: scale — the decade evidence must clear the SAME bars.
LSH_FLOOR, IVF_FLOOR = 0.7, 0.8
TOP_K = 10


def build_sf100_embeddings(spark, src: str, out: str) -> None:
    """Embeddings-only sf100 fixture (the documents side of
    tools/sf100_dedup.make_sf100 is an expensive regexp pass these
    workloads never read)."""
    from tools.make_scale import _write_single_file
    from tools.sf100_dedup import K, _emb_replica

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    marker = os.path.join(out, "_EMB_OK")
    if os.path.exists(marker):
        return
    os.makedirs(out, exist_ok=True)
    emb = load_table(spark, src, "embeddings")
    stride = emb.count()
    full = _emb_replica(emb, 0, stride)
    for i in range(1, K):
        full = full.unionByName(_emb_replica(emb, i, stride))
    _write_single_file(full, out, "embeddings")
    open(marker, "w").close()
    print(f"embeddings x {K} -> {out}", flush=True)


def run_ann(spark, sf_dir: str, query_mod: int) -> dict:
    from pyspark.sql import functions as F

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from tools.scale_run import session_hygiene

    emb = load_table(spark, sf_dir, "embeddings")
    n_vectors = emb.count()
    queries = emb.where(F.expr(f"vec_id % {query_mod} = 0"))
    n_queries = queries.count()
    rec = {"sf_dir": sf_dir, "n_vectors": n_vectors, "query_mod": query_mod,
           "n_queries": n_queries, "k": TOP_K}

    t0 = time.perf_counter()
    exact = S.brute_force_topk(queries, emb, TOP_K).select("query_id", "neighbor_id")
    exact.cache()
    n_exact = exact.count()
    rec["brute_force_sec"] = round(time.perf_counter() - t0, 3)
    rec["n_exact_pairs"] = n_exact

    t0 = time.perf_counter()
    centroids = S.ivf_centroids(emb)
    rec["ivf_centroid_train_sec"] = round(time.perf_counter() - t0, 3)
    rec["ivf_n_centroids"] = int(len(centroids))

    def recall(approx_df) -> float:
        hits = approx_df.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
        return hits / n_exact

    t0 = time.perf_counter()
    ivf = S.ivf_topk(queries, emb, centroids, TOP_K, nprobe=10).select("query_id", "neighbor_id")
    rec["ivf_recall"] = round(recall(ivf), 4)
    rec["ivf_sec"] = round(time.perf_counter() - t0, 3)
    session_hygiene(spark)

    t0 = time.perf_counter()
    lsh = S.lsh_topk(queries, emb, TOP_K).select("query_id", "neighbor_id")
    rec["lsh_recall"] = round(recall(lsh), 4)
    rec["lsh_sec"] = round(time.perf_counter() - t0, 3)
    session_hygiene(spark)

    rec.update(run_stored_phase(spark, sf_dir, emb, queries, exact, n_exact, n_vectors))
    exact.unpersist()
    session_hygiene(spark)
    rec["ivf_floor"], rec["lsh_floor"] = IVF_FLOOR, LSH_FLOOR
    rec["ivf_ok"] = rec["ivf_recall"] >= IVF_FLOOR
    rec["lsh_ok"] = rec["lsh_recall"] >= LSH_FLOOR
    rec["ivf_stored_ok"] = rec["ivf_stored_recall"] >= IVF_FLOOR
    return rec


def run_stored_phase(spark, sf_dir, emb, queries, exact, n_exact, n_vectors) -> dict:
    """The SCALE route: √N-scaled centroid count, sampled driver-side
    k-means, write-time numpy assignment, partition-pruned stored
    probes — query cost ~ (nprobe/k) · corpus, so the decade ratio of
    ivf_stored_sec is the one that must stay sub-linear.

    Operating point nprobe = k/4: this fixture's embeddings are UNIFORM
    on the sphere (within-label cosine ≈ random ≈ 0 — see the
    structure_probe section), and on unstructured data any partition
    index has recall ≈ probe fraction (measured: 0.48/0.65/0.83/0.96 at
    1/16, 1/8, 1/4, 1/2 of k=512) — so the floor-clearing fraction is
    1/4. On clustered data the same route prunes for real: the
    structure probe pins recall ≥ 0.9 at a 3% probe fraction."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S

    rec = {}
    k_scaled = S.ivf_k_for(n_vectors)
    nprobe = max(10, k_scaled // 4)
    rec["ivf_scaled_k"], rec["ivf_scaled_nprobe"] = k_scaled, nprobe
    t0 = time.perf_counter()
    c_scaled = S.ivf_centroids_np(emb, k=k_scaled)
    rec["ivf_scaled_train_sec"] = round(time.perf_counter() - t0, 3)
    index_path = os.path.join(sf_dir, "_ivf_index_scaled")
    t0 = time.perf_counter()
    S.write_ivf_index(emb, c_scaled, index_path)
    rec["ivf_index_write_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    stored = S.ivf_topk_stored(
        spark, queries, index_path, c_scaled, TOP_K, nprobe=nprobe
    ).select("query_id", "neighbor_id")
    hits = stored.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    rec["ivf_stored_recall"] = round(hits / n_exact, 4)
    rec["ivf_stored_sec"] = round(time.perf_counter() - t0, 3)
    return rec


def rerun_stored_into(spark, base: dict, sf_dir: str, query_mod: int) -> dict:
    """--merge-into path: recompute ONLY the stored phase (+ its exact
    reference, which recall needs) and overwrite those fields in the
    existing record."""
    from pyspark.sql import functions as F

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from tools.scale_run import session_hygiene

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(f"vec_id % {query_mod} = 0"))
    exact = S.brute_force_topk(queries, emb, TOP_K).select("query_id", "neighbor_id").cache()
    n_exact = exact.count()
    base.update(run_stored_phase(spark, sf_dir, emb, queries, exact, n_exact, base["n_vectors"]))
    base["ivf_stored_ok"] = base["ivf_stored_recall"] >= IVF_FLOOR
    exact.unpersist()
    session_hygiene(spark)
    return base


def structure_probe(spark) -> dict:
    """Counter-evidence for the unstructured-fixture recall ceiling: a
    200k-vector corpus PLANTED with 512 Gaussian clusters (spread 0.15
    around unit-norm centers — the shape real embedding corpora have),
    indexed with the same √N-scaled stored route at a 3% probe
    fraction. On this corpus IVF prunes for real: recall ≫ probe
    fraction, where the uniform fixture pins recall ≈ fraction."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S

    n, dim, n_clusters, spread = 200_000, 64, 512, 0.15
    rng = np.random.default_rng(77)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # per-row deterministic: cluster = id % n_clusters, noise
            # seeded per ROW from vec_id so the planted corpus is
            # identical under any partitioning / batch layout (ADVICE r11)
            c = centers[ids % n_clusters]
            noise = np.stack([
                np.random.default_rng(1 + int(i)).standard_normal(dim)
                for i in ids
            ]) * spread
            v = c + noise
            yield pd.DataFrame({"vec_id": ids, "embedding": list((v).astype("float32"))})

    emb = (
        spark.range(n).repartition(32).mapInPandas(gen, "vec_id long, embedding array<float>")
    )
    emb = emb.cache(); emb.count()
    queries = emb.where(F.expr("vec_id % 500 = 0"))
    exact = S.brute_force_topk(queries, emb, TOP_K).select("query_id", "neighbor_id").cache()
    n_exact = exact.count()
    k = S.ivf_k_for(n)  # 512 — matches the planted cluster count's scale
    c = S.ivf_centroids_np(emb, k=k)
    path = "/tmp/_ann_structure_probe_index"
    S.write_ivf_index(emb, c, path)
    nprobe = max(10, k // 32)  # 3% probe fraction
    st = S.ivf_topk_stored(spark, queries, path, c, TOP_K, nprobe=nprobe).select(
        "query_id", "neighbor_id"
    )
    hits = st.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    exact.unpersist(); emb.unpersist()
    return {
        "n_vectors": n, "n_planted_clusters": n_clusters, "spread": spread,
        "k": k, "nprobe": nprobe, "probe_fraction": round(nprobe / k, 4),
        "recall": round(hits / n_exact, 4),
        "recall_floor": 0.9, "ok": hits / n_exact >= 0.9,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default=".scratch/sf10")
    ap.add_argument("--sf100-out", default=".scratch/sf100_emb")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf10-query-mod", type=int, default=500)   # 400 queries
    ap.add_argument("--sf100-query-mod", type=int, default=5000)  # 400 queries
    ap.add_argument("--merge-into", default=None,
                    help="existing record: keep its inline-phase fields, re-run "
                         "only the stored phase + structure probe")
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("ann-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    sf10 = os.path.abspath(a.sf10)
    sf100 = os.path.abspath(a.sf100_out)
    build_sf100_embeddings(spark, sf10, sf100)

    results = {}
    if a.merge_into:
        results = json.load(open(a.merge_into))
        for name, (sf_dir, mod) in {
            "sf10": (sf10, a.sf10_query_mod),
            "sf100": (sf100, a.sf100_query_mod),
        }.items():
            results[name] = rerun_stored_into(spark, results[name], sf_dir, mod)
            print(name, json.dumps(results[name]), flush=True)
    else:
        for name, (sf_dir, mod) in {
            "sf10": (sf10, a.sf10_query_mod),
            "sf100": (sf100, a.sf100_query_mod),
        }.items():
            results[name] = run_ann(spark, sf_dir, mod)
            print(name, json.dumps(results[name]), flush=True)
    results["structure_probe"] = structure_probe(spark)
    print("structure_probe", json.dumps(results["structure_probe"]), flush=True)

    r10, r100 = results["sf10"], results["sf100"]
    results["decade"] = {
        "n_vectors_ratio": r100["n_vectors"] / r10["n_vectors"],
        "ivf_sec_ratio": round(r100["ivf_sec"] / r10["ivf_sec"], 2),
        "lsh_sec_ratio": round(r100["lsh_sec"] / r10["lsh_sec"], 2),
        "brute_force_sec_ratio": round(r100["brute_force_sec"] / r10["brute_force_sec"], 2),
        "centroid_train_sec_ratio": round(
            r100["ivf_centroid_train_sec"] / r10["ivf_centroid_train_sec"], 2
        ),
        "ivf_stored_sec_ratio": round(r100["ivf_stored_sec"] / r10["ivf_stored_sec"], 2),
        "ivf_scaled_train_sec_ratio": round(
            r100["ivf_scaled_train_sec"] / r10["ivf_scaled_train_sec"], 2
        ),
        "all_floors_met": all(
            r[f] for r in (r10, r100) for f in ("ivf_ok", "lsh_ok", "ivf_stored_ok")
        ) and results["structure_probe"]["ok"],
    }
    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)
    print("->", a.out, json.dumps(results["decade"]))


if __name__ == "__main__":
    main()
