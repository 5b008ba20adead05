"""Golden + property tests for the reference-parity word-count surface
(SURVEY.md §5.2-§5.3, FIXTURES.md §1.2)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import wordcount as wc


def counts_of(spark, text: str) -> dict[str, int]:
    df = spark.createDataFrame([(text,)], "text string")
    return {r.word: r.cnt for r in wc.word_count(df).collect()}


def test_delimiters_space_newline_only(spark):
    # tabs and punctuation are NOT delimiters (slave.cc:103)
    got = counts_of(spark, "a b\nc\td e.f")
    assert got == {"a": 1, "b": 1, "c\td": 1, "e.f": 1}


def test_empty_tokens_suppressed(spark):
    got = counts_of(spark, "  a   b \n\n a  ")
    assert got == {"a": 2, "b": 1}


def test_case_sensitive(spark):
    got = counts_of(spark, "Apple apple APPLE apple")
    assert got == {"Apple": 1, "apple": 2, "APPLE": 1}


def test_punctuation_retained(spark):
    got = counts_of(spark, "end. end end.")
    assert got == {"end.": 2, "end": 1}


def test_reference_parity_drops_non_az_initial(spark):
    df = spark.createDataFrame([("apple Apple 42nd !bang zebra",)], "text string")
    got = {r.word for r in wc.word_count(df, reference_parity=True).collect()}
    # uppercase/digit/punct-initial words dropped (master.cc:312-313, slave.cc:149-157)
    assert got == {"apple", "zebra"}


def test_top_k_keeps_ties(spark):
    # the reference collides equal counts (master.cc:431); we keep both
    df = spark.createDataFrame([("x x y y z",)], "text string")
    top2 = wc.word_count_top_k(df, k=2).collect()
    assert [(r.word, r.cnt) for r in top2] == [("x", 2), ("y", 2)]


def test_partitioned_layout_sorted_within_initial(spark):
    df = spark.createDataFrame([("banana apple cherry avocado berry",)], "text string")
    out = wc.partitioned_sorted_counts(wc.word_count(df))
    # within each partition, words must be sorted (slave.cc:219-226 semantics)
    for part_rows in out.rdd.glom().collect():
        words = [r.word for r in part_rows]
        assert words == sorted(words)


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=" \nabAB.!0", min_size=0, max_size=80))
def test_count_conservation(spark, text):
    # Σ counts == number of non-empty tokens (SURVEY.md §5.3)
    expected = [t for t in text.replace("\n", " ").split(" ") if t]
    got = counts_of(spark, text)
    assert sum(got.values()) == len(expected)
    assert set(got) == set(expected)


@settings(max_examples=15, deadline=None)
@given(
    st.text(alphabet=" \nab", min_size=1, max_size=60),
    st.integers(min_value=1, max_value=59),
)
def test_chunk_boundary_invariance(spark, text, split_at):
    """Counts are invariant under any byte-split of the input — the
    property the reference's boundary-repair code intends but fails to
    guarantee (slave.cc:76-99,119-134; SURVEY.md §2.5.2-4). Our engine
    gets it from line-aligned splits; simulated here by splitting the
    corpus into two documents at a token boundary-respecting merge."""
    split_at = min(split_at, len(text))
    # a byte split mid-word would change token semantics; the reference's
    # *intent* is that chunk boundaries behave like this token-safe merge:
    whole = counts_of(spark, text)
    left, right = text[:split_at], text[split_at:]
    if left.endswith((" ", "\n")) or right.startswith((" ", "\n")) or not left or not right:
        # split at a delimiter → two independent documents must sum to the whole
        df = spark.createDataFrame([(left,), (right,)], "text string")
        split_counts = {r.word: r.cnt for r in wc.word_count(df).collect()}
        assert split_counts == whole
