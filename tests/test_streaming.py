"""Multi-batch streaming semantics: watermark-driven late-data dropping,
append-mode window emission, and dropDuplicatesWithinWatermark — the
behaviors a single AvailableNow batch can't exercise (FIXTURES.md §3.3).

The stream is two parquet files processed in order (maxFilesPerTrigger=1
+ mtime ordering), so the watermark advances between batches
deterministically.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import functions as F

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "late-data")


def _write_batches(spark, batches) -> str:
    """Write each batch as one parquet file with strictly increasing
    mtimes so the file source processes them in order."""
    root = os.path.join(SCRATCH, uuid.uuid4().hex[:8])
    os.makedirs(root, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, f"tmp_{i}"))
        part = [f for f in os.listdir(os.path.join(root, f"tmp_{i}")) if f.endswith(".parquet")][0]
        dst = os.path.join(root, f"batch_{i}.parquet")
        os.rename(os.path.join(root, f"tmp_{i}", part), dst)
        os.utime(dst, (time.time() + i * 10, time.time() + i * 10))
    return root


def _drain(df, mode: str):
    name = f"late_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    return df.sparkSession.table(name)


from datetime import datetime as dt  # noqa: E402


def _ts(h, m):
    return dt(2024, 3, 1, h, m)


def test_watermark_drops_late_rows_append_mode(spark):
    """Late-data guarantee: a row whose window state was already evicted
    (window end < watermark at eviction time) is dropped, not re-opened.

    Note Spark's actual boundary is state *eviction*, not arrival-time
    comparison — a late row arriving while its window state is still
    live IS aggregated. The sequence below forces eviction first:
    batch 0 sets watermark 11:20 past hour-10's end; batch 1 evicts and
    emits hour-10; batch 2's 10:05 row then has nowhere to go.
    """
    batches = [
        [(1, _ts(10, 0), 1, 1.0), (2, _ts(10, 10), 1, 1.0), (3, _ts(11, 30), 1, 1.0)],
        [(4, _ts(11, 40), 1, 1.0)],
        [(5, _ts(10, 5), 1, 1.0), (6, _ts(12, 40), 1, 1.0)],
    ]
    root = _write_batches(spark, batches)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    rows = sorted((r.ws.hour, r.n) for r in _drain(agg, "append").collect())
    # exactly one hour-10 emission with the on-time rows; the evicted-late
    # 10:05 row must not re-open the window (no second hour-10 row)
    assert rows == [(10, 2), (11, 2)], rows


def test_drop_duplicates_within_watermark(spark):
    batches = [
        [(1, _ts(10, 0), 1, 1.0), (2, _ts(10, 5), 1, 1.0)],
        [(1, _ts(10, 1), 1, 1.0), (3, _ts(10, 30), 1, 1.0)],  # id=1 again, within horizon
    ]
    root = _write_batches(spark, batches)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    out = _drain(deduped, "append")
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3], f"cross-batch duplicate must be dropped: {ids}"


def test_rate_source_seam_produces_events_schema(spark):
    """The events_source 'rate' kind (streaming/windows.py) must emit the
    exact events schema with deterministic values per sequence number, so
    any registered streaming query can run against it unchanged."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import events_source

    stream = events_source(
        spark,
        {"kind": "rate", "rows_per_batch": 100, "start_timestamp_ms": 1_700_000_000_000},
    )
    assert [f.name for f in stream.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    name = f"rate_{uuid.uuid4().hex[:10]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(once=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    rows = spark.table(name).collect()
    assert len(rows) == 100
    by_id = {r.event_id: r for r in rows}
    assert by_id[0].event_type == "click" and by_id[4].event_type == "error"
    assert by_id[7].user_id == 7 and by_id[13].value == 1.3


def test_checkpoint_recovery_exactly_once(spark):
    """Checkpointed restart semantics: a file-sink query stopped and
    restarted from the same checkpointLocation must process each input
    file exactly once — new files picked up, no reprocessing of committed
    offsets, idempotent when nothing new arrived."""
    root = os.path.join(SCRATCH, f"ckpt_src_{uuid.uuid4().hex[:8]}")
    os.makedirs(root, exist_ok=True)
    out = os.path.join(SCRATCH, f"ckpt_out_{uuid.uuid4().hex[:8]}")
    ckpt = os.path.join(SCRATCH, f"ckpt_loc_{uuid.uuid4().hex[:8]}")
    schema = "event_id long, ts timestamp, user_id long, value double"

    def add_file(i, rows):
        df = spark.createDataFrame(rows, schema)
        tmp = os.path.join(root, f"tmp_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp, part), os.path.join(root, f"batch_{i}.parquet"))

    def drain():
        q = (
            spark.readStream.schema(schema).parquet(root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()

    add_file(0, [(1, _ts(10, 0), 1, 1.0), (2, _ts(10, 5), 1, 2.0)])
    drain()
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2]

    add_file(1, [(3, _ts(10, 10), 2, 3.0)])
    drain()  # restart from checkpoint: only the new file is processed
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2, 3]

    drain()  # nothing new: restart must be a no-op, not a re-emit
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2, 3]
