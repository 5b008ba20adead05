"""Round-13: decompose doc_profile and pipeline_corpus_curation stage
costs at the bench SF (noop sink, interleaved reps)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import text as T
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.text import (
        doc_profile,
        dup_ngram_frac,
        fingerprint,
        normalized_text,
        token_count_bpe,
        punct_count,
        tokens_col,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.pipeline_q import (
        choose_edge_method,
        curate,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.dedup_q import JACCARD_T
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.pipeline_q import (
        MIN_TOKENS, MIN_STOPWORD_RATIO, MAX_PUNCT_RATIO, SHINGLE_DF_CAP,
    )

    spark = get_session("r13-profile-parts", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def docs():
        return load_table(spark, sf_dir, "documents")

    def profile_full():
        return doc_profile(docs())

    def profile_scalars():
        df = spread(docs(), by=["doc_id"])
        text = F.col("text")
        return df.select(
            "doc_id",
            F.length(text).cast("long").alias("n_chars"),
            token_count_bpe(text).alias("n_bpe_tokens"),
            punct_count(text).alias("n_punct"),
            F.col("lang").alias("lang_label"),
            fingerprint(text).alias("fp"),
            fingerprint(normalized_text(text)).alias("fp_normalized"),
            dup_ngram_frac(text, 2).alias("dup_bigram_frac"),
            dup_ngram_frac(text, 3).alias("dup_trigram_frac"),
        )

    def profile_tokfeats():
        from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.hashing import (
            SIMHASH_BITS, poly_hash_token,
        )
        df = spread(docs(), by=["doc_id"])
        toks = df.select(F.col("doc_id"), F.explode(tokens_col("text")).alias("tok"))
        cnts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
        cnts = cnts.withColumn("_h", poly_hash_token("tok"))
        h, cnt = F.col("_h"), F.col("cnt")
        aggs = [F.sum(cnt).alias("n_tokens"), F.count(F.lit(1)).alias("n_distinct"),
                F.max(cnt).alias("_top_cnt")]
        aggs += [
            F.sum((F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1) * cnt).alias(f"_v{b}")
            for b in range(SIMHASH_BITS)
        ]
        return cnts.groupBy("doc_id").agg(*aggs)

    def gate_only():
        feats = T.quality_features(F.col("text"))
        gated = spread(docs(), by=["doc_id"])
        return gated.where(
            (feats["n_tokens"] >= MIN_TOKENS)
            & (feats["stopword_ratio"] >= MIN_STOPWORD_RATIO)
            & (feats["punct_ratio"] <= MAX_PUNCT_RATIO)
        ).select(
            "doc_id",
            F.col("lang").alias("lang_label"),
            T.lang_id(F.col("text")).alias("lang_pred"),
            feats["n_tokens"].alias("n_tokens"),
            feats["n_chars"].alias("n_chars"),
            T.fingerprint(T.normalized_text(F.col("text"))).alias("fp_normalized"),
        )

    def edges_only():
        surv = docs()  # upper bound: edge stage over the full corpus
        return D.jaccard_pairs(surv, JACCARD_T, max_shingle_df=SHINGLE_DF_CAP)

    def pipeline_full():
        return curate(docs())

    def pipeline_jaccard_forced():
        return curate(docs(), edge_method="jaccard")

    variants = {
        "profile_full": profile_full,
        "profile_scalars": profile_scalars,
        "profile_tokfeats": profile_tokfeats,
        "gate_only": gate_only,
        "edges_only": edges_only,
        "pipeline_full": pipeline_full,
        "pipeline_jaccard_forced": pipeline_jaccard_forced,
    }
    # one-off: cost of choose_edge_method decision jobs alone
    t0 = time.perf_counter()
    m = choose_edge_method(docs())
    decide_cost = round(time.perf_counter() - t0, 3)

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"parts {k}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "edge_decision_cost_s": decide_cost,
                "edge_decision": m,
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
