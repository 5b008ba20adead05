"""Scale-up fixture generator: replicate an sf_dir K-fold with key-shifted
replicas, preserving every FK relationship, so correctness oracles and the
bench can run at 10x (sf1) or beyond without touching the read-only driver
fixtures.

Replica design (replica i of K, i=0 is the identity copy):

- region/nation: shared dimensions — copied once, NOT replicated (they are
  fixed-cardinality in TPC-H; customers/suppliers reference them).
- customer/supplier/part: primary key shifted by i*stride (stride = table
  row count — keys are 0-based dense); names suffixed "-r{i}" so distinct
  counts scale like the table.
- orders: o_orderkey and o_custkey shifted with their tables' strides —
  each replica's orders reference that replica's customers.
- lineitem: l_orderkey/l_partkey/l_suppkey shifted likewise.
- events: event_id shifted; user_id kept, ts jittered by +i µs (the
  same user population generates K-fold denser traffic — the realistic
  way an event stream scales — while keeping (user_id, ts) unique so
  order-sensitive operators stay deterministic).
- documents: doc_id shifted; every token suffixed "rep{i}" (regexp on the
  tokenizer's exact delimiter set) EXCEPT quality-gate stopwords, so each
  replica is its own corpus: vocabulary grows K-fold, near-dup structure
  replicates within replicas and never across them — near-dup pair counts
  scale LINEARLY, which is what "10x more documents of the same kind"
  means. Stopwords stay shared so per-doc quality features
  (stopword_ratio) survive replication and the curation pipeline's gate
  passes replicas at the same rate as originals; only an all-stopword
  3-gram can shingle-match across replicas (negligible Jaccard mass).
  n_chars recomputed.
- embeddings: vec_id shifted; vectors rotated by i positions (norm- and
  distance-structure-preserving within a replica, dissimilar across
  replicas); label kept.

Each table lands as a single parquet FILE (<out>/<table>.parquet), the
exact layout the engine's loaders and the streaming stager expect.

Usage: python tools/make_scale.py [--src /root/testdata/sf0.1] [--k 10] \
           [--out .scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: key column -> stride source table (strides = row counts of the source).
STRIDES = {
    "customer": 15000,
    "supplier": 1000,
    "part": 20000,
    "orders": 150000,
    "lineitem": 600000,
    "events": 100000,
    "documents": 5000,
    "embeddings": 2000,
}


def _suffix(col: str, i: int):
    return F.concat(F.col(col), F.lit(f"-r{i}"))


def _replica(table: str, df: DataFrame, i: int, strides: dict[str, int]) -> DataFrame:
    if i == 0:
        return df
    C, S, P, O = strides["customer"], strides["supplier"], strides["part"], strides["orders"]
    if table == "customer":
        return df.withColumn("c_custkey", F.col("c_custkey") + i * C).withColumn(
            "c_name", _suffix("c_name", i)
        )
    if table == "supplier":
        return df.withColumn("s_suppkey", F.col("s_suppkey") + i * S).withColumn(
            "s_name", _suffix("s_name", i)
        )
    if table == "part":
        return df.withColumn("p_partkey", F.col("p_partkey") + i * P).withColumn(
            "p_name", _suffix("p_name", i)
        )
    if table == "orders":
        return df.withColumn("o_orderkey", F.col("o_orderkey") + i * O).withColumn(
            "o_custkey", F.col("o_custkey") + i * C
        )
    if table == "lineitem":
        return (
            df.withColumn("l_orderkey", F.col("l_orderkey") + i * O)
            .withColumn("l_partkey", F.col("l_partkey") + i * P)
            .withColumn("l_suppkey", F.col("l_suppkey") + i * S)
        )
    if table == "events":
        # +i microseconds: keeps per-replica traffic density (the same
        # user population K-fold denser) while making every (user_id, ts)
        # unique, so order-sensitive operators (as-of join tie-break,
        # session-window assembly) stay deterministic at any K
        jittered = F.timestamp_micros(F.unix_micros(F.col("ts").cast("timestamp_ltz")) + i)
        return df.withColumn("event_id", F.col("event_id") + i * strides["events"]).withColumn(
            "ts", jittered
        )
    if table == "documents":
        # Suffix every token (delimiters are the tokenizer's exact set),
        # then UNDO the suffix on quality-gate stopwords: a replica whose
        # "the" became "the_r17" has stopword_ratio 0 and the curation
        # pipeline's quality gate drops the whole replica — the sf10 run
        # measured the post-gate stages at sf0.1 size no matter the SF.
        # Keeping stopwords shared cannot create cross-replica near-dups:
        # shingles are 3-token sequences, so only an all-stopword 3-gram
        # can match across replicas — vanishing intersection over a full
        # union, far below any Jaccard threshold in use.
        from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.text import STOPWORDS

        # The suffix must be ALPHANUMERIC: an earlier "_r{i}" form pushed
        # punct_ratio from 0.0 to ~0.115 (underscores are punctuation to
        # the quality features) and the gate's 0.10 cap silently dropped
        # every replica — the same class of feature-destruction as the
        # stopword case above.
        text = F.regexp_replace("text", "[^ \n]+", f"$0rep{i}")
        stop_alt = "|".join(STOPWORDS)
        text = F.regexp_replace(
            text, f"(^|[ \n])({stop_alt})rep{i}(?=[ \n]|$)", "$1$2"
        )
        return (
            df.withColumn("doc_id", F.col("doc_id") + i * strides["documents"])
            .withColumn("text", text)
            .withColumn("n_chars", F.length("text").cast("long"))
        )
    if table == "embeddings":
        # rotation by i % dim, sign-flipped on the second cycle: both are
        # norm/angle-structure-preserving within a replica, and the 2*dim
        # distinct transforms keep replicas pairwise dissimilar up to
        # k = 128 (slice(i+1, dim-i) would go out of bounds past i = dim)
        dim = 64
        assert i < 2 * dim, f"embeddings replica transform supports k <= {2 * dim}"
        rot = i % dim
        rotated = F.concat(F.slice("embedding", rot + 1, dim - rot), F.slice("embedding", 1, rot))
        if i >= dim:
            rotated = F.transform(rotated, lambda x: -x)
        return df.withColumn("vec_id", F.col("vec_id") + i * strides["embeddings"]).withColumn(
            "embedding", rotated.cast("array<float>")
        )
    raise ValueError(table)


#: Target row-group size. The driver's fixtures are single-row-group files,
#: which caps Spark's EFFECTIVE scan parallelism at one task per table no
#: matter how many byte-range splits it plans (parquet can only split at
#: row-group boundaries, so every other split comes up empty — visible as
#: "(27 + 1) / 28" straggler stages). Production data at any real scale
#: arrives as many files / many row groups, so the scaled fixtures write
#: ~4 MB row groups to measure the engine's actual scaling rather than a
#: single-core artifact of the fixture layout.
ROW_GROUP_BYTES = 4 * 1024 * 1024


def _write_single_file(df: DataFrame, out_dir: str, table: str) -> None:
    tmp = os.path.join(out_dir, f"_tmp_{table}")
    df.coalesce(1).write.option("parquet.block.size", str(ROW_GROUP_BYTES)).mode(
        "overwrite"
    ).parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, part), os.path.join(out_dir, f"{table}.parquet"))
    shutil.rmtree(tmp)


def make_scale(src: str, out: str, k: int) -> None:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    # verify the hardcoded strides against the actual source (they must
    # equal the row counts for the shifted key spaces to stay disjoint)
    strides = dict(STRIDES)
    for t, stride in strides.items():
        n = load_table(spark, src, t).count()
        assert n == stride, f"{t}: stride {stride} != source rows {n} — regenerate STRIDES"
    for t in ("region", "nation"):
        _write_single_file(load_table(spark, src, t), out, t)
        print(t, "copied", flush=True)
    for t in strides:
        base = load_table(spark, src, t)
        # load_table normalizes events.ts (nanos -> timestamp); the copy
        # is written with normal Spark timestamps, which both engines
        # read identically
        parts = [_replica(t, base, i, strides) for i in range(k)]
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        _write_single_file(full, out, t)
        print(t, f"x{k}", flush=True)
    print("done ->", out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"))
    ap.add_argument("--k", type=int, default=10)
    a = ap.parse_args()
    make_scale(a.src, a.out, a.k)
