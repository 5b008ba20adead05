"""Third-decade scale evidence (VERDICT r7 item 2): sf100 for the two
cheapest shuffle-heavy dedup entries — the exact-dedup fingerprint
shuffle (`dedup_exact_suite`) and the banded-LSH cosine self-join
(`dedup_cosine_corpus`'s bench workload) — with a sampled hash-exact
check on each, pinning both through THREE orders of magnitude
(sf0.1 -> sf1 -> sf10 -> sf100).

Fixture: documents + embeddings only (the two tables these workloads
read), scaled 10x from the sf10 fixture (itself 100x from the driver's
sf0.1). Replica semantics follow tools/make_scale.py with one deliberate
difference: embeddings replicas get a SEEDED RANDOM ORTHOGONAL transform
instead of another rotation. Rotations form a group — composing the
sf100 pass's rot_i with sf10's rot_a gives rot_{a+i}, and two different
(a, i) pairs with equal sums would make two replica groups IDENTICAL
vector sets (massive spurious cross-replica cosine-1.0 pairs). A random
orthogonal Q_i preserves within-replica norms/angles exactly while
cross-replica cosines concentrate at ~N(0, 1/64) — P(|cos| >= 0.9) is
~1e-23 per pair, zero expected over the corpus.

Documents replicas suffix every non-stopword token with ``q{i}`` (the
sf10 pass used ``rep{a}``; the pair (rep-suffix, q-suffix) is unique per
replica chain, so shingle/fingerprint/raw-text dup structure replicates
within replicas and never across — counts scale linearly, the meaning of
"10x more documents of the same kind").

Timings for BOTH workloads are re-measured at sf10 in the same session,
so the decade ratio compares like against like (host drift excluded).

Usage: python tools/sf100_dedup.py --src .scratch/sf10 \
           --out-dir .scratch/sf100 --out SCALE_R8_SF100.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

EMB_DIM = 64
K = 10  # replicas: sf10 -> sf100
SEED = 20260815


def _ortho(i: int) -> np.ndarray:
    """Seeded random orthogonal 64x64 matrix for replica i (i=0 -> identity)."""
    if i == 0:
        return np.eye(EMB_DIM)
    rng = np.random.default_rng(SEED + i)
    q, r = np.linalg.qr(rng.standard_normal((EMB_DIM, EMB_DIM)))
    return q * np.sign(np.diag(r))  # sign-fix for a uniquely determined Q


def _emb_replica(emb: DataFrame, i: int, stride: int) -> DataFrame:
    if i == 0:
        return emb
    Q = _ortho(i)

    def xform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = (M @ Q.T).astype(np.float32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"] + i * stride,
                    "embedding": list(out),
                    "label": pdf["label"],
                }
            )

    return emb.mapInPandas(xform, "vec_id long, embedding array<float>, label int")


def _doc_replica(docs: DataFrame, i: int, stride: int) -> DataFrame:
    if i == 0:
        return docs
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.text import STOPWORDS

    text = F.regexp_replace("text", "[^ \n]+", f"$0q{i}")
    stop_alt = "|".join(STOPWORDS)
    text = F.regexp_replace(text, f"(^|[ \n])({stop_alt})q{i}(?=[ \n]|$)", "$1$2")
    return (
        docs.withColumn("doc_id", F.col("doc_id") + i * stride)
        .withColumn("text", text)
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def make_sf100(spark, src: str, out: str) -> None:
    from tools.make_scale import _write_single_file

    marker = os.path.join(out, "_SCALED_OK")
    if os.path.exists(marker):
        return
    os.makedirs(out, exist_ok=True)
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    docs = load_table(spark, src, "documents")
    emb = load_table(spark, src, "embeddings")
    d_stride, e_stride = docs.count(), emb.count()
    full_docs = _doc_replica(docs, 0, d_stride)
    for i in range(1, K):
        full_docs = full_docs.unionByName(_doc_replica(docs, i, d_stride))
    _write_single_file(full_docs, out, "documents")
    print("documents x", K, flush=True)
    full_emb = _emb_replica(emb, 0, e_stride)
    for i in range(1, K):
        full_emb = full_emb.unionByName(_emb_replica(emb, i, e_stride))
    _write_single_file(full_emb, out, "embeddings")
    print("embeddings x", K, flush=True)
    open(marker, "w").close()


def timed(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 3), n


def run_workloads(spark, sf_dir: str) -> dict:
    """Time the two workloads exactly as the bench/registry runs them."""
    import bench
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES
    from tools.scale_run import session_hygiene

    out = {}
    sec, n = timed(lambda: QUERIES["dedup_exact_suite"](spark, sf_dir).count())
    out["dedup_exact_suite"] = {"sec": sec, "rows": n}
    print(sf_dir, "dedup_exact_suite", out["dedup_exact_suite"], flush=True)
    session_hygiene(spark)
    sec, n = timed(lambda: bench.BENCH_IMPL["dedup_cosine_corpus"](spark, sf_dir).count())
    out["dedup_cosine_corpus"] = {"sec": sec, "rows": n}
    print(sf_dir, "dedup_cosine_corpus", out["dedup_cosine_corpus"], flush=True)
    session_hygiene(spark)
    return out


def sampled_checks(spark, sf_dir: str, doc_k: int, vec_k: int) -> dict:
    """Hash-exact sampled oracles at sf100 (method of
    tools/sf10_sampled_checks.py, self-contained here because the sf100
    dir carries only documents+embeddings — no symlinked full-table dir)."""
    import duckdb

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.similarity import cosine_near_dup_pairs
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.vector import cosine_sql
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from tests.oracle_harness import compare_rows
    from tools.sf10_sampled_checks import make_planted_cosine_slice
    from tools.scale_run import session_hygiene

    results = {}

    # exact dedup: registry query + registry oracle on a 1-in-doc_k slice
    t0 = time.perf_counter()
    sliced_dir = os.path.join(sf_dir, f"_sampled_mod{doc_k}")
    os.makedirs(sliced_dir, exist_ok=True)
    target = os.path.join(sliced_dir, "documents.parquet")
    if not os.path.exists(target):
        duckdb.connect().execute(
            f"COPY (SELECT * FROM '{sf_dir}/documents.parquet' WHERE doc_id % {doc_k} = 0) "
            f"TO '{target}' (FORMAT PARQUET)"
        )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{target}'")
    rec = {"sample_mod": doc_k}
    try:
        sdf = QUERIES["dedup_exact_suite"](spark, sliced_dir)
        compare_rows(sdf, con.execute(ORACLE_SQL["dedup_exact_suite"]), "dedup_exact_suite[sf100 sampled]")
        rec["status"], rec["rows"] = "hash_exact", sdf.count()
    except AssertionError as exc:
        rec["status"], rec["err"] = "MISMATCH", str(exc)[:800]
    except Exception as exc:  # noqa: BLE001
        rec["status"], rec["err"] = "error", f"{type(exc).__name__}: {exc}"[:500]
    rec["sec"] = round(time.perf_counter() - t0, 3)
    results["dedup_exact_suite_sampled"] = rec
    print("dedup_exact_suite_sampled", rec, flush=True)
    session_hygiene(spark)

    # banded cosine: planted-dup slice vs DuckDB brute force, geometry
    # pinned from the FULL sf100 corpus count (the timing run's plan shape)
    t0 = time.perf_counter()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    slice_path, n_planted = make_planted_cosine_slice(sf_dir, vec_k)
    rec = {"sample_mod": vec_k, "n_vecs_full": n_vecs, "n_planted_pairs": n_planted}
    try:
        sliced = spark.read.parquet(slice_path)
        cdf = cosine_near_dup_pairs(sliced, threshold=0.9, corpus_size=n_vecs)
        oracle = f"""
        WITH s AS (SELECT * FROM '{slice_path}')
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
        FROM s a JOIN s b ON a.vec_id < b.vec_id
        WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.9
        """
        compare_rows(cdf, con.execute(oracle), "dedup_cosine_corpus[sf100 sampled]")
        rec["status"], rec["rows"] = "hash_exact", cdf.count()
    except AssertionError as exc:
        rec["status"], rec["err"] = "MISMATCH", str(exc)[:800]
    except Exception as exc:  # noqa: BLE001
        rec["status"], rec["err"] = "error", f"{type(exc).__name__}: {exc}"[:500]
    rec["sec"] = round(time.perf_counter() - t0, 3)
    results["dedup_cosine_corpus_sampled"] = rec
    print("dedup_cosine_corpus_sampled", rec, flush=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".scratch/sf10")
    ap.add_argument("--out-dir", default=".scratch/sf100")
    ap.add_argument("--out", required=True)
    ap.add_argument("--doc-k", type=int, default=200)
    ap.add_argument("--vec-k", type=int, default=500)
    a = ap.parse_args()
    src, out_dir = os.path.abspath(a.src), os.path.abspath(a.out_dir)

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("sf100-dedup", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    make_sf100(spark, src, out_dir)
    gen_sec = round(time.perf_counter() - t0, 3)

    record = {
        "src": src,
        "out_dir": out_dir,
        "replicas": K,
        "fixture_gen_sec": gen_sec,
        "fixture_bytes": {
            t: os.path.getsize(os.path.join(out_dir, f"{t}.parquet"))
            for t in ("documents", "embeddings")
        },
        "sf10": run_workloads(spark, src),
        "sf100": run_workloads(spark, out_dir),
        "sf100_sampled": sampled_checks(spark, out_dir, a.doc_k, a.vec_k),
    }
    for w in ("dedup_exact_suite", "dedup_cosine_corpus"):
        r10, r100 = record["sf10"][w]["sec"], record["sf100"][w]["sec"]
        record[f"{w}_decade_ratio"] = round(r100 / r10, 2) if r10 else None
    with open(a.out, "w") as f:
        json.dump(record, f, indent=1)
    print("->", a.out)


if __name__ == "__main__":
    main()
