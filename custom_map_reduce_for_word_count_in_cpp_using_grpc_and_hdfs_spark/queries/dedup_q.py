"""Dedup queries over ``documents`` / ``embeddings`` (operators/dedup.py).

Oracle status per operator:
- exact / normalized / fingerprint / jaccard / simhash → exact SQL oracle.
- simhash_near_dups → exact oracle too: the pigeonhole block join has
  guaranteed recall for d ≤ blocks-1, so Spark's candidate-join result
  *equals* the oracle's brute-force pair scan.
- minhash LSH → rows-only here; recall vs exact Jaccard asserted in
  tests/test_dedup_similarity.py (hash permutations are xxhash64, not portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import text as T
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.similarity import cosine_near_dup_pairs
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.vector import cosine_sql
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

JACCARD_T = 0.3
COSINE_T = 0.3


@query(
    "dedup_exact",
    oracle="""
    SELECT text, min(doc_id) AS survivor_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the full text, deterministic survivor."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_groups(docs, ["text"])


@query(
    "dedup_exact_normalized",
    oracle=f"""
    SELECT {T.normalized_text_sql('text')} AS norm_text,
           min(doc_id) AS survivor_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on whitespace/case-normalized text."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "norm_text", T.normalized_text("text")
    )
    return D.exact_dedup_groups(docs, ["norm_text"])


@query(
    "dedup_fingerprint",
    oracle=f"""
    SELECT {T.fingerprint_sql('text')} AS fp,
           min(doc_id) AS survivor_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on the 30-bit rolling-hash fingerprint — at scale the group
    key is 8 bytes instead of the document, shrinking the shuffle by the
    full text width."""
    docs = load_table(spark, sf_dir, "documents").withColumn("fp", T.fingerprint("text"))
    return D.exact_dedup_groups(docs, ["fp"])


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH ds AS (
        SELECT DISTINCT doc_id, unnest({D.shingles_sql('text')}) AS shingle FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
        FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, ni / (sa.n + sb.n - ni) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE ni / (sa.n + sb.n - ni) >= {JACCARD_T}
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via shingle-inverted-index
    join (no all-pairs stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, JACCARD_T)


@query("dedup_minhash_lsh")  # xxhash64 permutations → rows-only; recall tested
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + 8-band LSH candidates, verified with exact
    Jaccard ≥ threshold. Precision exact; recall measured in tests."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, threshold=JACCARD_T)


_SIMHASH_CTE = D.simhash_sql()


@query("dedup_simhash_fingerprints", oracle=_SIMHASH_CTE)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """56-bit SimHash per document (portable polynomial token hashes →
    bit-exact oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs)


@query(
    "dedup_simhash_near",
    oracle=f"""
    WITH s AS ({_SIMHASH_CTE})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups (hamming ≤ 3) via pigeonhole block equi-join —
    guaranteed-recall candidates, so identical to the oracle's brute
    force."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, max_distance=3)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_T}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ t, exact fold parity with the
    oracle (see functions/vector.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, COSINE_T)
