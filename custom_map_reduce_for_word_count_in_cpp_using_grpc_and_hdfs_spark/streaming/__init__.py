from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import (
    events_stream,
    run_available_now,
    run_available_now_many,
    session_windows,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "run_available_now",
    "run_available_now_many",
    "session_windows",
    "sliding_counts",
    "stream_dedup",
    "tumbling_counts",
]
