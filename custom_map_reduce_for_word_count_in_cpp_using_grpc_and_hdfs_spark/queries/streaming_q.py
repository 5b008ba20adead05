"""Streaming queries, checked for batch equivalence: each runs a real
Structured Streaming job (file source → AvailableNow → memory sink) and
must produce exactly what the batch/SQL oracle computes over the same
data. Events duplicated into the stream verify stateful dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming import (
    events_stream,
    run_available_now,
    session_windows,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type — epoch-aligned, so equal
    to a batch date_trunc aggregation."""
    return run_available_now(tumbling_counts(events_stream(spark, sf_dir)), "complete")


@query(
    "stream_sliding_counts",
    oracle="""
    SELECT ws, count(*) AS n FROM (
        SELECT unnest([
            CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP),
            CAST(time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS TIMESTAMP)
        ]) AS ws, ts
        FROM events
    )
    WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
    GROUP BY ws
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event belongs to two
    windows; the oracle enumerates both candidate starts per event."""
    return run_available_now(sliding_counts(events_stream(spark, sf_dir)), "complete")


@query(
    "stream_session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '5 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT min(ts) AS session_start,
           CAST(max(ts) + INTERVAL '5 minutes' AS TIMESTAMP) AS session_end,
           user_id, count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-minute-gap sessions via session_window; the oracle is
    the classic gaps-and-islands rewrite (end = last event + gap)."""
    return run_available_now(session_windows(events_stream(spark, sf_dir)), "complete")


@query(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup: the stream is the events table unioned with
    itself (every id duplicated); dropDuplicates over event_id within
    the watermark must reduce it back to exactly the batch counts."""
    ev = events_stream(spark, sf_dir)
    doubled = ev.unionAll(ev)
    deduped = stream_dedup(doubled)
    out = run_available_now(deduped, "append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "stream_word_count",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(text, '[ \n]')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def stream_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one query, incrementalized: a Structured Streaming
    word count whose drained state equals the batch aggregate."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import (
        documents_stream,
        streaming_word_count,
    )

    return run_available_now(streaming_word_count(documents_stream(spark, sf_dir)), "complete")


@query(
    "stream_stateful_user_activity",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           SUM(CAST(round(value * 100) AS BIGINT)) AS total_value_cents
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running (count, value-cents) state machine; after draining one
    AvailableNow pass the emitted state equals the batch aggregate."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.stateful import user_activity_state

    return run_available_now(user_activity_state(events_stream(spark, sf_dir)), "update")
