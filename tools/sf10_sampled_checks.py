"""Sampled large-SF oracle checks for pair-explosive operators (VERDICT
r5 item 5: the 100x decade was timing-only in round 5; this gives the
largest measured scale a correctness signal without materializing the
full 22M-pair result through the driver. VERDICT r6 item 1 added the
banded cosine self-join — previously the only headline entry with no
oracle at any SF).

Method: restrict the corpus to a deterministic 1-in-K id sample and run
BOTH the Spark operator and the DuckDB brute-force oracle on that
subset. The sample preserves the fixture's replica structure (ids are
replica-shifted, so id % K samples uniformly within every replica),
exercising the operator at the target SF's data characteristics —
vocabulary, fingerprint clustering, text lengths, embedding geometry —
while keeping the oracle's quadratic pair scan feasible. Operators with
corpus-size-adaptive geometry (SimHash blocks, cosine LSH bands) pin
the FULL corpus's geometry on the slice, so the checked plan shape is
the one the timing runs used.

Usage: python tools/sf10_sampled_checks.py --sf-dir .scratch/sf10 \
           --out SCALE_R7_SF10_sampled.json [--k 20] [--vec-k 50]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

#: Registry queries checked on the sampled dir (registry fn + registry
#: oracle, both unchanged — the sample dir makes `documents` smaller,
#: nothing else). These are the ones whose ORACLE is the sf10 bottleneck
#: (per-char fingerprint folds / recursive CTE over 500k docs).
SAMPLED_REGISTRY = [
    "dedup_exact_suite",
    "dedup_components",
    # the curation oracle is a recursive CTE whose cost tracks |documents|²
    # in the worst case (sf1: 317 s); the 1-in-K sample keeps it tractable
    # while the Spark side still exercises the full gate->dedup->cluster->
    # sample chain at sf10's data characteristics
    "pipeline_corpus_curation",
]


def make_sampled_dir(sf_dir: str, k: int) -> str:
    """A parquet dir where documents is the doc_id % k == 0 slice and
    every other table is a symlink to the full-scale file, so registry
    loaders and the DuckDB view harness work unchanged."""
    import duckdb

    out = os.path.join(sf_dir, f"_sampled_mod{k}")
    os.makedirs(out, exist_ok=True)
    target = os.path.join(out, "documents.parquet")
    if not os.path.exists(target):
        duckdb.connect().execute(
            f"COPY (SELECT * FROM '{sf_dir}/documents.parquet' WHERE doc_id % {k} = 0) "
            f"TO '{target}' (FORMAT PARQUET)"
        )
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), link)
    return out


def make_planted_cosine_slice(sf_dir: str, vec_k: int) -> tuple[str, int]:
    """Write (and cache) the planted-dup cosine slice: the vec_id % vec_k
    embedding slice plus, for every 10th slice vector v, one near-dup
    v + eps*|v|*n_hat at a seeded eps in [0.10, 0.25] (cosine ~0.995 down
    to ~0.97). Copies get ids above the full corpus range. Returns
    (parquet path, number of planted pairs). Stored as float32 exactly
    as both engines will read it — the plant arithmetic happens once in
    numpy, never per-engine."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           ".scratch", "cosine_sampled")
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(out_dir, f"{name}_mod{vec_k}.parquet")
    con = duckdb.connect()
    if not os.path.exists(path):
        tbl = con.execute(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
            f"WHERE vec_id % {vec_k} = 0 ORDER BY vec_id"
        ).fetch_arrow_table()
        max_id = con.execute(
            f"SELECT max(vec_id) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        ids = tbl["vec_id"].to_pylist()
        embs = [np.asarray(e, dtype=np.float32) for e in tbl["embedding"].to_pylist()]
        rng = np.random.default_rng(20260815)
        new_ids, new_embs = list(ids), [e.tolist() for e in embs]
        for j in range(0, len(ids), 10):
            v = embs[j].astype(np.float64)
            noise = rng.standard_normal(v.shape)
            noise -= noise @ v / (v @ v) * v  # orthogonalize: cosine set by eps alone
            eps = 0.10 + 0.15 * rng.random()
            w = v + eps * np.linalg.norm(v) * noise / np.linalg.norm(noise)
            new_ids.append(int(max_id) + 1 + ids[j])
            new_embs.append(np.asarray(w, dtype=np.float32).tolist())
        out = pa.table(
            {"vec_id": pa.array(new_ids, pa.int64()),
             "embedding": pa.array(new_embs, pa.list_(pa.float32()))}
        )
        pq.write_table(out, path)
    n_planted = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0] - con.execute(
        f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet' WHERE vec_id % {vec_k} = 0"
    ).fetchone()[0]
    return path, int(n_planted)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=20, help="keep ids with doc_id % k == 0")
    ap.add_argument(
        "--vec-k", type=int, default=50,
        help="embedding slice modulus for the banded-cosine sampled check "
        "(size it so slice^2 brute force stays oracle-feasible)",
    )
    a = ap.parse_args()
    sf_dir = os.path.abspath(a.sf_dir)

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from tests.oracle_harness import compare_rows, duckdb_conn

    spark = get_session("sf10-sampled")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
    results: dict[str, dict] = {}

    # --- simhash_near_dups on the sampled corpus, vs DuckDB brute force.
    # The sample still crosses the auto-geometry count gate (its scan is
    # the full >16 MB documents file), so the sharded B is what runs —
    # pin n_blocks to the geometry the FULL corpus picks, making this a
    # check of the exact plan shape the timing run used.
    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_blocks = D.simhash_block_geometry(n_docs)
    sampled = docs.where(F.col("doc_id") % a.k == 0)
    sdf = D.simhash_near_dups(sampled, max_distance=3, n_blocks=n_blocks)
    oracle = f"""
    WITH s AS ({D.simhash_sql(table=f"(SELECT * FROM documents WHERE doc_id % {a.k} = 0)")})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """
    rec = {"sample_mod": a.k, "n_blocks": n_blocks, "n_docs_full": n_docs}
    try:
        cur = con.execute(oracle)
        compare_rows(sdf, cur, "dedup_simhash_near[sampled]")
        rec["status"] = "hash_exact"
        rec["rows"] = sdf.count()
    except AssertionError as exc:
        rec["status"], rec["err"] = "MISMATCH", str(exc)[:800]
    except Exception as exc:  # noqa: BLE001
        rec["status"], rec["err"] = "error", f"{type(exc).__name__}: {exc}"[:500]
    rec["sec"] = round(time.perf_counter() - t0, 3)
    results["dedup_simhash_near_sampled"] = rec
    print("dedup_simhash_near_sampled", rec, flush=True)
    from tools.scale_run import session_hygiene

    session_hygiene(spark)

    # --- banded cosine self-join (the dedup_cosine_corpus bench workload)
    # on a planted-dup-augmented vec_id % vec_k slice, vs DuckDB brute
    # force over the same stored slice. The synthetic corpus contains NO
    # >=0.9 pairs at any SF (measured: rows=0 at sf0.1/sf1/sf10), so a
    # bare slice would only prove zero false positives; the plants give
    # recall something real to miss. Band geometry is pinned from the
    # FULL corpus count, so this checks the exact plan shape the timing
    # run used. Plants are near-dups at cosine ~0.97-0.995 — far enough
    # above the 0.9 threshold that the S-curve miss probability is
    # <1e-4 per pair at the capped 48-band geometry, and deterministic
    # either way (seeded hyperplanes + stored vectors: a miss would be a
    # stable MISMATCH, not a flake). Both engines read the SAME parquet
    # file, so float inputs are bit-identical.
    t0 = time.perf_counter()
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    slice_path, n_planted = make_planted_cosine_slice(sf_dir, a.vec_k)
    rec = {"sample_mod": a.vec_k, "n_vecs_full": n_vecs, "n_planted_pairs": n_planted}
    try:
        from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.vector import cosine_sql
        from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.similarity import cosine_near_dup_pairs

        sliced = spark.read.parquet(slice_path)
        cdf = cosine_near_dup_pairs(sliced, threshold=0.9, corpus_size=n_vecs)
        cosine_oracle = f"""
        WITH s AS (SELECT * FROM '{slice_path}')
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
        FROM s a JOIN s b ON a.vec_id < b.vec_id
        WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.9
        """
        compare_rows(cdf, con.execute(cosine_oracle), "dedup_cosine_corpus[sampled]")
        rec["status"] = "hash_exact"
        rec["rows"] = cdf.count()
    except AssertionError as exc:
        rec["status"], rec["err"] = "MISMATCH", str(exc)[:800]
    except Exception as exc:  # noqa: BLE001
        rec["status"], rec["err"] = "error", f"{type(exc).__name__}: {exc}"[:500]
    rec["sec"] = round(time.perf_counter() - t0, 3)
    results["dedup_cosine_corpus_sampled"] = rec
    print("dedup_cosine_corpus_sampled", rec, flush=True)
    session_hygiene(spark)

    # --- registry queries whose ORACLES are the sf10 bottleneck: run
    # query + oracle unchanged against the sampled dir.
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES

    sampled_dir = make_sampled_dir(sf_dir, a.k)
    scon = duckdb_conn(sampled_dir)
    for name in SAMPLED_REGISTRY:
        t0 = time.perf_counter()
        rec = {"sample_mod": a.k}
        try:
            sdf = QUERIES[name](spark, sampled_dir)
            compare_rows(sdf, scon.execute(ORACLE_SQL[name]), f"{name}[sampled]")
            rec["status"] = "hash_exact"
            rec["rows"] = sdf.count()
        except AssertionError as exc:
            rec["status"], rec["err"] = "MISMATCH", str(exc)[:800]
        except Exception as exc:  # noqa: BLE001
            rec["status"], rec["err"] = "error", f"{type(exc).__name__}: {exc}"[:500]
        rec["sec"] = round(time.perf_counter() - t0, 3)
        results[f"{name}_sampled"] = rec
        print(f"{name}_sampled", rec, flush=True)
        session_hygiene(spark)

    with open(a.out, "w") as f:
        json.dump({"sf_dir": sf_dir, "checks": results}, f, indent=1)
    print("->", a.out)


if __name__ == "__main__":
    main()
