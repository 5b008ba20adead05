"""Similarity-search + multimodal queries (operators/similarity.py,
operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.vector import cosine_sql
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import multimodal as MM
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

#: Query set: every 50th vector (10 queries at sf0.01).
QUERY_PRED = "vec_id % 50 = 0"
TOP_K = 10


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.embedding')} DESC, c.vec_id ASC
               ) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.{QUERY_PRED}
    ) WHERE rank <= {TOP_K}
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for the query set — broadcast
    queries × streamed corpus, bounded-heap rank window."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))
    return S.brute_force_topk(queries, emb, TOP_K)


@query("ann_topk_lsh")  # approximate recall → rows-only; recall tested
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH candidates + exact rescoring; recall vs
    brute force asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))
    return S.lsh_topk(queries, emb, TOP_K)


@query(
    "mm_payload_meta",
    oracle="""
    SELECT doc_id, md5(text) AS payload_md5,  -- DuckDB md5 takes VARCHAR; same utf-8 bytes as the payload
           octet_length(encode(text))::BIGINT AS byte_len,
           'text' AS modality
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def mm_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row shape: binary payload + typed metadata struct.
    The comparison projects the payload as its md5 (computed over the
    BYTES on both engines) so the differential hash stays scalar while
    still proving byte-exact payload equality."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    with_payload = MM.attach_payload(docs)
    return with_payload.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.modality").alias("modality"),
    )


@query(
    "mm_fake_decode",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS byte_len,
           64 + octet_length(encode(text))::BIGINT % 193 AS width,
           64 + octet_length(encode(text))::BIGINT % 149 AS height,
           1 + octet_length(encode(text))::BIGINT % 7 AS n_frames
    FROM documents
    """,
)
def mm_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing with the deterministic stand-in codec
    — the Arrow batch path itself is what's under test (real codecs are
    stubbed; see operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.fake_decode_meta(MM.attach_payload(docs))


@query("ann_topk_ivf")  # k-means buckets are float-order-sensitive → rows-only; recall tested
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF variant: seeded k-means buckets (computable at write time →
    partition-pruned probes at scale), nprobe=4 of 16 buckets, exact
    rescoring. Recall vs brute force asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))
    centroids = S.ivf_centroids(emb)
    return S.ivf_topk(queries, emb, centroids, TOP_K, nprobe=4)
