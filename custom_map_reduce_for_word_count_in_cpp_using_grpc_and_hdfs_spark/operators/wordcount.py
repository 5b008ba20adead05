"""Reference-parity word-count operators (SURVEY.md §2.1, O1-O9).

The reference's one query is: tokenize an HDFS text file on ``' '`` and
``'\n'`` (slave.cc:101-116), count words with a letter-range partitioned
reduce (slave.cc:149-210, master.cc:311-325), emit per-initial sorted
files (slave.cc:212-228), and print an interactive top-K
(master.cc:395-453). Everything here is declarative DataFrame code so
Catalyst plans it as FileScan → Generate → partial HashAggregate →
Exchange(hash word) → final HashAggregate → TakeOrderedAndProject — i.e.
map-side combine and heap-based top-K that the reference lacks (its
shuffle is O(M×R) full file re-reads with no combiner, slave.cc:176-210).

Intended-semantics fidelity (SURVEY.md §2.5): ties in top-K are KEPT
(the reference collides them, master.cc:431); chunk-boundary handling is
subsumed by line-aligned input splits (the reference's repair code is
buggy, slave.cc:76-134); non-a..z-initial words are kept by default with
a ``reference_parity=True`` mode reproducing the reference's silent drop
(slave.cc:196, master.cc:312-313).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The reference's exact token delimiter set: space and newline ONLY
#: (slave.cc:103). No lowercasing, no punctuation stripping.
TOKEN_DELIMITERS = "[ \n]"


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """O3: flatMap a text column into one row per word.

    Exact reference semantics: split on space/newline only, drop empty
    tokens (slave.cc:103 guards ``word != ""``), keep case and punctuation.
    """
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import spread

    word = F.explode(F.split(F.col(text_col), TOKEN_DELIMITERS)).alias(out_col)
    return spread(df).select(word).where(F.col(out_col) != "")


def key_range_filter(df: DataFrame, word_col: str = "word", low: str = "a", high: str = "z") -> DataFrame:
    """O5's predicate: keep words whose FIRST character is in [low, high].

    The reference applies this per reducer over ``a..z`` ranges
    (slave.cc:149-157 via master.cc:311-325); the union over all reducers
    is exactly first-char ∈ [a, z] — uppercase/digit/punctuation-initial
    words are silently dropped. Exposed standalone so reference_parity
    mode is one filter, not a bespoke pipeline.
    """
    initial = F.substring(F.col(word_col), 1, 1)
    return df.where((initial >= low) & (initial <= high))


def word_count(
    df: DataFrame,
    text_col: str = "text",
    *,
    reference_parity: bool = False,
) -> DataFrame:
    """O3+O5+O6: tokenize then GROUP BY word COUNT(*).

    Returns DataFrame[word: string, cnt: bigint]. Catalyst gives partial
    (map-side) aggregation before the hash shuffle — at 100 TB the shuffle
    carries one row per distinct word per input partition, not one row per
    token occurrence like the reference's materialized map files
    (slave.cc:105-106).
    """
    words = tokenize(df, text_col)
    if reference_parity:
        words = key_range_filter(words)
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def top_k(counts: DataFrame, k: int, count_col: str = "cnt", key_col: str = "word") -> DataFrame:
    """O9: global top-K by count, ties kept, deterministic order.

    ORDER BY cnt DESC, word ASC LIMIT k → planned as
    TakeOrderedAndProject: per-partition bounded heaps merged on the
    driver, no global sort. The reference instead re-reads every reducer
    file and loses tied words in a count-keyed map (master.cc:405-452).
    """
    return counts.orderBy(F.col(count_col).desc(), F.col(key_col).asc()).limit(k)


def word_count_top_k(df: DataFrame, k: int = 100, text_col: str = "text", **kw) -> DataFrame:
    """The reference's full query: word-count then top-K."""
    return top_k(word_count(df, text_col, **kw), k)


def with_initial(df: DataFrame, word_col: str = "word", out_col: str = "initial") -> Column | DataFrame:
    """First character of the word — the reference's reduce partition key
    (slave.cc:149-157)."""
    return df.withColumn(out_col, F.substring(F.col(word_col), 1, 1))


def partitioned_sorted_counts(counts: DataFrame) -> DataFrame:
    """O7's user-visible layout: counts keyed by first letter, words sorted
    within each letter partition (output-<letter>.txt, slave.cc:174,219-226).

    ``repartitionByRange`` + ``sortWithinPartitions`` reproduce the layout
    with one range shuffle; at scale each initial-letter range lands in
    one (or a few, for skewed letters) output files.
    """
    return (
        with_initial(counts)
        .repartitionByRange("initial")
        .sortWithinPartitions("word")
    )


def write_partitioned_sorted(counts: DataFrame, path: str, fmt: str = "parquet") -> None:
    """O7 sink: one directory per initial, rows sorted by word within files."""
    (
        partitioned_sorted_counts(counts)
        .write.mode("overwrite")
        .partitionBy("initial")
        .format(fmt)
        .save(path)
    )
