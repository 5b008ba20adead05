"""Round-13 experiment: interpreted Catalyst HOF polynomial-hash folds
vs an Arrow pandas_udf numpy kernel, value-identical by construction.

Measures three shapes at the bench SF (noop sink, interleaved):
  tokfold   — explode tokens -> poly_hash_token (interpreted fold/occurrence)
  tokkernel — explode tokens -> numpy kernel hash/occurrence
  docfold   — per-doc fingerprint (poly_hash_chars fold, mod 1e9+7)
  dockernel — per-doc fingerprint via numpy kernel
Also asserts kernel values == fold values on the full corpus.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.hashing import (
    POLY_BASE,
    POLY_MOD,
    POLY_MOD_56,
    poly_hash_chars,
    poly_hash_token,
)


def _poly_batch(texts: pd.Series, mod: int) -> pd.Series:
    """Vectorized polynomial hash over all rows of a batch: flatten every
    string's code points into one array, per-position term =
    (code * B^(len-1-pos)) % mod, segmented sum via reduceat."""
    vals = texts.tolist()
    n = len(vals)
    out = np.zeros(n, dtype=object)
    lens = np.fromiter((0 if v is None else len(v) for v in vals), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return pd.Series([None if v is None else 0 for v in vals], dtype=object)
    flat = np.frombuffer("".join(v for v in vals if v).encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    # power table up to max length, built by doubling (log2 numpy ops)
    max_len = int(lens.max())
    pw = np.array([1], dtype=np.int64)
    while pw.size < max_len:
        ext = (pw * pow(POLY_BASE, int(pw.size), mod)) % mod
        pw = np.concatenate([pw, ext])
    pw = pw[:max_len]
    ends = np.cumsum(lens)
    starts = ends - lens
    nz = lens > 0
    # exponent at flat position t of token i = (e_i - 1 - t) relative: len_i-1 .. 0
    exp = np.repeat(lens[nz] - 1, lens[nz]) - (np.arange(total) - np.repeat(starts[nz], lens[nz]))
    terms = (flat * pw[exp]) % mod
    seg_starts = starts[nz]
    sums = np.add.reduceat(terms, seg_starts) % mod if seg_starts.size else np.array([], dtype=np.int64)
    res = np.zeros(n, dtype=np.int64)
    res[nz] = sums
    return pd.Series([None if v is None else int(r) for v, r in zip(vals, res)], dtype=object)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.text import tokens_col
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r13-hash-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    tok_kernel = F.pandas_udf(lambda s: _poly_batch(s, POLY_MOD_56), "long")
    doc_kernel = F.pandas_udf(lambda s: _poly_batch(s, POLY_MOD), "long")

    docs = spread(load_table(spark, sf_dir, "documents"), by=["doc_id"])
    toks = docs.select(F.col("doc_id"), F.explode(tokens_col("text")).alias("tok"))

    variants = {
        "tokfold": lambda: toks.select("doc_id", poly_hash_token("tok").alias("h")),
        "tokkernel": lambda: toks.select("doc_id", tok_kernel("tok").alias("h")),
        "docfold": lambda: docs.select("doc_id", poly_hash_chars("text").alias("fp")),
        "dockernel": lambda: docs.select("doc_id", doc_kernel("text").alias("fp")),
    }
    # value parity first (cheap at bench SF)
    mism_tok = (
        toks.select(poly_hash_token("tok").alias("a"), tok_kernel("tok").alias("b"))
        .where("a <> b OR (a IS NULL) <> (b IS NULL)")
        .count()
    )
    mism_doc = (
        docs.select(poly_hash_chars("text").alias("a"), doc_kernel("text").alias("b"))
        .where("a <> b OR (a IS NULL) <> (b IS NULL)")
        .count()
    )
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"hash-ab {k}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "mismatch_tok": mism_tok,
                "mismatch_doc": mism_doc,
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
