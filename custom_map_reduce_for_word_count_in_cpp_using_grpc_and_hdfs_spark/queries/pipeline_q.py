"""End-to-end corpus-curation pipeline — the composition a training-data
user actually runs at 100 TB: quality-score → exact dedup → near-dup
clustering → survivor pick.

Every stage reuses an operator that is already individually
oracle-checked (doc_profile, exact_dedup_groups, jaccard_pairs,
connected_components); this query proves the *composition* end-to-end
against one DuckDB oracle that re-derives the same pipeline with
recursive-CTE transitive closure for the clustering stage.

Scale shape: one profile pass (explode→groupBy, map-side partials), one
8-byte-key dedup shuffle, shingle-inverted-index candidate join (no
all-pairs), then O(cluster-diameter) hash-min label-propagation rounds.
No stage is quadratic in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import sampling as S
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import text as T
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.dedup_q import JACCARD_T
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

#: Quality gate (chosen against the synthetic corpus distribution:
#: n_tokens p05 ≈ 15, stopword_ratio median ≈ 0.06). Part of the query's
#: definition, shared verbatim with the oracle.
MIN_TOKENS = 20
MIN_STOPWORD_RATIO = 0.02
MAX_PUNCT_RATIO = 0.10

_TOKS = T.tokens_sql("text")

_PIPELINE_ORACLE = f"""
    WITH RECURSIVE
    prof AS (
        SELECT doc_id,
               lang AS lang_label,
               length(text)::BIGINT AS n_chars,
               len({_TOKS})::BIGINT AS n_tokens,
               {T.stopword_count_sql('text')} / len({_TOKS})::BIGINT AS stopword_ratio,
               {T.punct_count_sql('text')} / length(text)::BIGINT AS punct_ratio,
               {T.lang_id_sql('text')} AS lang_pred,
               {T.fingerprint_sql(T.normalized_text_sql('text'))} AS fp_normalized
        FROM documents
    ),
    qual AS (
        SELECT * FROM prof
        WHERE n_tokens >= {MIN_TOKENS}
          AND stopword_ratio >= {MIN_STOPWORD_RATIO}
          AND punct_ratio <= {MAX_PUNCT_RATIO}
    ),
    exact AS (SELECT min(doc_id) AS doc_id FROM qual GROUP BY fp_normalized),
    surv AS (SELECT d.doc_id, d.text FROM documents d JOIN exact USING (doc_id)),
    ds AS (
        SELECT DISTINCT doc_id, unnest({D.shingles_sql('text')}) AS shingle FROM surv
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
        FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE ni / (sa.n + sb.n - ni) >= {JACCARD_T}
    ),
    sym AS (
        SELECT doc_a AS u, doc_b AS v FROM jpairs
        UNION ALL
        SELECT doc_b, doc_a FROM jpairs
    ),
    reach AS (
        SELECT u, v FROM sym
        UNION
        SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    ),
    comp AS (
        SELECT s.doc_id, least(s.doc_id, coalesce(min(r.v), s.doc_id)) AS component
        FROM surv s LEFT JOIN reach r ON s.doc_id = r.u
        GROUP BY s.doc_id
    ),
    sized AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
    SELECT q.doc_id, q.lang_label, q.lang_pred, q.n_tokens, q.n_chars, s.cluster_size,
           {S.hash_bucket_sql('q.doc_id', 10)} AS sample_bucket
    FROM comp c
    JOIN sized s ON c.component = s.component
    JOIN qual q ON q.doc_id = c.doc_id
    WHERE c.doc_id = c.component
"""


def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline body, reusable by the partitioned-write test: returns
    one row per kept document with its profile features and the size of
    the near-dup cluster it survived."""
    docs = load_table(spark, sf_dir, "documents")
    prof = T.doc_profile(docs)
    qual = prof.where(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
    ).select("doc_id", "lang_label", "lang_pred", "n_tokens", "n_chars", "fp_normalized")
    # Exact dedup on the 8-byte normalized fingerprint; survivor = min id.
    exact_survivors = qual.groupBy("fp_normalized").agg(F.min("doc_id").alias("doc_id"))
    surv_docs = docs.join(exact_survivors.select("doc_id"), "doc_id", "left_semi")
    # Near-dup clustering over the exact-dedup survivors.
    edges = D.jaccard_pairs(surv_docs, JACCARD_T).select("doc_a", "doc_b")
    comps = D.connected_components(
        surv_docs.select("doc_id"), edges, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    sized = comps.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("comp"))
    )
    return (
        sized.where(F.col("doc_id") == F.col("comp"))
        .join(qual, "doc_id")
        # deterministic 10-bucket hash assignment: downstream "sample to
        # budget" keeps buckets < k — retry-stable and table-consistent
        # (operators/sampling.py)
        .withColumn("sample_bucket", S.hash_bucket("doc_id", 10))
        .select(
            "doc_id", "lang_label", "lang_pred", "n_tokens", "n_chars",
            "cluster_size", "sample_bucket",
        )
    )


@query("pipeline_corpus_curation", oracle=_PIPELINE_ORACLE)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation end-to-end: quality gate (token count, stopword
    ratio, punctuation ratio) → exact dedup on the normalized rolling-hash
    fingerprint → exact-Jaccard near-dup connected components → keep one
    survivor per cluster, reporting how many near-dups it absorbed —
    plus a deterministic hash-sample bucket per survivor (the
    reproducible "sample to token budget" stage). The
    curated corpus is written partitioned by language label in
    tests/test_pipeline.py (same layout discipline as
    wc_partitioned_layout)."""
    return curated_corpus(spark, sf_dir)
