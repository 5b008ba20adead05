"""Recall/accuracy tests for the approximate operators (the ones the
driver can only rows-check): MinHash LSH vs exact Jaccard, hyperplane
LSH vs brute-force cosine top-k, HLL vs exact distinct."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

from .conftest import SF_CORRECT


def test_minhash_lsh_recall_and_precision(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_pairs(docs, threshold=0.3).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_near_dups(docs, threshold=0.3).collect()
    }
    # precision is exact by construction (verification join)
    assert approx <= exact
    # banding (32 perms / 8 bands) must catch the high-similarity mass
    assert exact, "fixture should contain near-dup pairs"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below bound"


def test_simhash_block_join_equals_bruteforce(spark):
    docs = load_table(spark, SF_CORRECT, "documents").limit(200)
    fps = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    brute = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(fps[a] ^ fps[b]).count("1") <= 3:
                brute.add((a, b))
    got = {(r.doc_a, r.doc_b) for r in D.simhash_near_dups(docs, max_distance=3).collect()}
    assert got == brute  # pigeonhole blocks guarantee recall 1.0


def test_ann_lsh_recall(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    brute = S.brute_force_topk(queries, emb, 10).collect()
    approx = S.lsh_topk(queries, emb, 10).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(brute_sets[q] & approx_sets.get(q, set())) / len(brute_sets[q])
        for q in brute_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # 16 planes / 8 bands (2-bit bands) on 64-dim gaussians: neighbors in
    # this fixture are only weakly similar (cos ≈ 0.35), so bands must be
    # generous — the tradeoff is candidates touched, measured below
    assert mean_recall >= 0.7, f"ANN recall {mean_recall:.2f} below bound"


def test_approx_count_distinct_accuracy(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_jaccard_shingle_df_cap_only_prunes_candidates(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    full = {(r.doc_a, r.doc_b) for r in D.jaccard_pairs(docs, 0.3).collect()}
    capped = {(r.doc_a, r.doc_b) for r in D.jaccard_pairs(docs, 0.3, max_shingle_df=400).collect()}
    assert capped <= full


def test_ann_ivf_recall(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    centroids = S.ivf_centroids(emb)
    brute = S.brute_force_topk(queries, emb, 10).collect()
    approx = S.ivf_topk(queries, emb, centroids, 10, nprobe=4).collect()
    bs, as_ = {}, {}
    for r in brute:
        bs.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        as_.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(bs[q] & as_.get(q, set())) / len(bs[q]) for q in bs]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=4 of 16 buckets over weakly-clustered gaussians: measured 0.6
    assert mean_recall >= 0.45, f"IVF recall {mean_recall:.2f} below bound"
