"""Driver-facing word-count queries — the reference's entire query surface
(SURVEY.md §2.1) over the ``documents`` table.

DuckDB oracle note: the Spark side splits on the reference's exact
delimiter set ``[ \n]`` (slave.cc:103); DuckDB's ``regexp_split_to_array``
with the same RE2 pattern produces identical token streams, and both
sides drop empty tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import wordcount as wc
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

_TOKENS_SQL = """
    SELECT unnest(regexp_split_to_array(text, '[ \n]')) AS word
    FROM documents
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-count + top-100: the reference's one query (master.cc:470-480),
    ties kept (§2.5.1)."""
    docs = load_table(spark, sf_dir, "documents")
    return wc.word_count_top_k(docs, k=100)


@query(
    "wc_top_k",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_TOKENS_SQL}) WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word ASC
    LIMIT 100
    """,
)
def wc_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3+O6+O9: tokenize → count → deterministic top-K (ties kept)."""
    return flagship(spark, sf_dir)


@query(
    "wc_full_counts",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_TOKENS_SQL}) WHERE word <> ''
    GROUP BY word
    """,
)
def wc_full_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: the complete word → count aggregate (no limit)."""
    return wc.word_count(load_table(spark, sf_dir, "documents"))


@query(
    "wc_reference_parity",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_TOKENS_SQL})
    WHERE word <> '' AND substr(word, 1, 1) BETWEEN 'a' AND 'z'
    GROUP BY word
    ORDER BY cnt DESC, word ASC
    LIMIT 100
    """,
)
def wc_reference_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 parity mode: drop words whose first char is outside a..z, exactly
    as the reference's reduce key space does (master.cc:312-313,
    slave.cc:149-157)."""
    docs = load_table(spark, sf_dir, "documents")
    return wc.word_count_top_k(docs, k=100, reference_parity=True)


@query(
    "wc_partitioned_layout",
    oracle=f"""
    SELECT substr(word, 1, 1) AS initial, word, count(*) AS cnt
    FROM ({_TOKENS_SQL}) WHERE word <> ''
    GROUP BY word
    """,
)
def wc_partitioned_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7's user-visible output layout: counts keyed by initial letter,
    sorted by word within each initial partition (output-<c>.txt,
    slave.cc:174,219-226). Hash compare is order-insensitive, so the
    oracle checks content; sortedness is asserted in tests."""
    counts = wc.word_count(load_table(spark, sf_dir, "documents"))
    return wc.partitioned_sorted_counts(counts).select("initial", "word", "cnt")


@query(
    "wc_distinct_words",
    oracle=f"""
    SELECT count(DISTINCT word) AS distinct_words, count(*) AS total_tokens
    FROM ({_TOKENS_SQL}) WHERE word <> ''
    """,
)
def wc_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary size + token count (count conservation invariant §5.3)."""
    docs = load_table(spark, sf_dir, "documents")
    return wc.tokenize(docs).agg(
        F.countDistinct("word").alias("distinct_words"),
        F.count(F.lit(1)).alias("total_tokens"),
    )


@query(
    "wc_per_document",
    oracle="""
    SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
    FROM (
        SELECT doc_id, unnest(regexp_split_to_array(text, '[ \n]')) AS word
        FROM documents
    ) WHERE word <> ''
    GROUP BY doc_id
    """,
)
def wc_per_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics — the grouped variant of O6 (the
    reference cannot express it: its group key is hardwired to the word)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), wc.TOKEN_DELIMITERS)).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("word").alias("n_distinct"),
    )


@query(
    "wc_salted",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_TOKENS_SQL}) WHERE word <> ''
    GROUP BY word
    """,
)
def wc_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened word count (plans/skew.py): two-phase salted
    aggregation, provably identical to the plain groupBy — the Zipf-head
    variant for corpora where one word dominates a reducer."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.skew import salted_word_count

    docs = load_table(spark, sf_dir, "documents")
    return salted_word_count(wc.tokenize(docs))
