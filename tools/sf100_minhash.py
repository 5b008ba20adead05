"""Third-decade scale evidence for the shingle-inverted-index family
(VERDICT r8 item 3): the MinHash-LSH edge operator — the shared core of
jaccard near-dup, components, and the curation pipeline's at-scale edge
route — timed operator-only at sf10 AND sf100 in one session (like vs
like, host drift excluded), next to the exact inverted-index route so
the record carries the measured crossover, plus sampled hash-exact
checks of the registry `dedup_minhash_lsh` and `dedup_jaccard_pairs`
entries on an sf100 document slice (the method of tools/sf100_dedup.py:
correctness proven AT the third-decade data, not assumed from below).

The sf100 fixture is the one tools/sf100_dedup.py builds (marker-gated,
reused as-is): replica tokens carry a per-replica ``q{i}`` suffix, so
shingle/dup structure replicates within replicas and never across.

Usage: python tools/sf100_minhash.py --sf10 .scratch/sf10 \
           --sf100 .scratch/sf100 --out SCALE_R9_SF100.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def time_edges(spark, sf_dir: str) -> dict:
    """Operator-only timings for BOTH edge routes on the raw documents
    table — the exact shape the pipeline's auto route chooses between."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.dedup_q import JACCARD_T
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.pipeline_q import SHINGLE_DF_CAP
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from tools.scale_run import session_hygiene

    docs = load_table(spark, sf_dir, "documents")
    out = {}
    for name, fn in (
        ("minhash_edges", lambda: D.minhash_near_dups(docs, JACCARD_T).count()),
        (
            "jaccard_edges",
            lambda: D.jaccard_pairs(docs, JACCARD_T, max_shingle_df=SHINGLE_DF_CAP).count(),
        ),
    ):
        t0 = time.perf_counter()
        n = fn()
        out[name] = {"sec": round(time.perf_counter() - t0, 3), "pairs": n}
        print(sf_dir, name, out[name], flush=True)
        session_hygiene(spark)
    return out


def sampled_checks(spark, sf_dir: str, doc_k: int) -> dict:
    """Registry query + registry oracle, hash-exact, on a CONTIGUOUS
    1/doc_k id-block of the sf100 documents table, taken from the LAST
    replica (highest ids — the text that only exists at sf100, token
    suffix q9). Contiguous, not mod-k: near-dup pairs need BOTH ends to
    survive the slice, and a mod-k slice keeps a pair with probability
    ~1/k² — the first attempt came back hash-exact on an EMPTY pair set
    (vacuous). A contiguous block from one replica preserves the
    replica-local dup structure at full density, so the shingle-index
    join has real pairs to find AND to get wrong."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import ORACLE_SQL, QUERIES
    from tests.oracle_harness import compare_rows
    from tools.scale_run import session_hygiene

    lo, hi = duckdb.connect().execute(
        f"SELECT min(doc_id), max(doc_id) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    n = hi - lo + 1
    blk_lo = lo + n - n // doc_k  # the last 1/doc_k ids = tail of replica 9
    sliced_dir = os.path.join(sf_dir, f"_sampled_block{doc_k}")
    os.makedirs(sliced_dir, exist_ok=True)
    target = os.path.join(sliced_dir, "documents.parquet")
    if not os.path.exists(target):
        duckdb.connect().execute(
            f"COPY (SELECT * FROM '{sf_dir}/documents.parquet' WHERE doc_id >= {blk_lo}) "
            f"TO '{target}' (FORMAT PARQUET)"
        )
    results = {}
    for entry in ("dedup_minhash_lsh", "dedup_jaccard_pairs"):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{target}'")
        t0 = time.perf_counter()
        rec = {"sample_block": f"doc_id >= {blk_lo} (last 1/{doc_k} of replica 9)"}
        try:
            sdf = QUERIES[entry](spark, sliced_dir)
            compare_rows(sdf, con.execute(ORACLE_SQL[entry]), f"{entry}[sf100 sampled]")
            rec["status"], rec["rows"] = "hash_exact", sdf.count()
        except AssertionError as exc:
            rec["status"], rec["err"] = "MISMATCH", str(exc)[:800]
        except Exception as exc:  # noqa: BLE001
            rec["status"], rec["err"] = "error", f"{type(exc).__name__}: {exc}"[:500]
        rec["sec"] = round(time.perf_counter() - t0, 3)
        results[f"{entry}_sampled"] = rec
        print(f"{entry}_sampled", rec, flush=True)
        session_hygiene(spark)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf10", default=".scratch/sf10")
    ap.add_argument("--sf100", default=".scratch/sf100")
    ap.add_argument("--out", required=True)
    ap.add_argument("--doc-k", type=int, default=200)
    ap.add_argument(
        "--sampled-only",
        action="store_true",
        help="re-run only the sampled checks and merge into an existing --out JSON",
    )
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("sf100-minhash", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if a.sampled_only:
        with open(a.out) as f:
            record = json.load(f)
        record["sf100_sampled"] = sampled_checks(spark, os.path.abspath(a.sf100), a.doc_k)
        with open(a.out, "w") as f:
            json.dump(record, f, indent=1)
        print("->", a.out)
        return

    record = {
        "sf10_dir": os.path.abspath(a.sf10),
        "sf100_dir": os.path.abspath(a.sf100),
        "sf10": time_edges(spark, os.path.abspath(a.sf10)),
        "sf100": time_edges(spark, os.path.abspath(a.sf100)),
        "sf100_sampled": sampled_checks(spark, os.path.abspath(a.sf100), a.doc_k),
    }
    for w in ("minhash_edges", "jaccard_edges"):
        r10, r100 = record["sf10"][w]["sec"], record["sf100"][w]["sec"]
        record[f"{w}_decade_ratio"] = round(r100 / r10, 2) if r10 else None
    # pair-count ratio vs the CAPPED exact route (the pipeline's shape);
    # both routes can lose pairs the other keeps (cap vs band misses),
    # so this is a parity observable, not a recall bound
    for sf in ("sf10", "sf100"):
        record[f"pairs_vs_capped_exact_{sf}"] = round(
            record[sf]["minhash_edges"]["pairs"]
            / max(record[sf]["jaccard_edges"]["pairs"], 1),
            6,
        )
    with open(a.out, "w") as f:
        json.dump(record, f, indent=1)
    print("->", a.out)


if __name__ == "__main__":
    main()
