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

import pytest

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


# --------------------------------------------------------------------------
# Kafka source kind: the JSON value decoder is the only kafka-specific
# logic; it is exercised broker-less on (a) a batch frame with the kafka
# wire schema and (b) a real streaming query over wire-shaped files.
# --------------------------------------------------------------------------

#: Kafka wire schema as the kafka source emits it (envelope + binary value).
_WIRE = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def _wire_rows(spark, events_df):
    """Wrap events rows as kafka records: value = JSON encoding of the row."""
    return events_df.select(
        F.lit(None).cast("binary").alias("key"),
        F.encode(
            F.to_json(F.struct("event_id", "ts", "user_id", "event_type", "value", "props")),
            "UTF-8",
        ).alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def test_kafka_decoder_roundtrip(spark):
    """decode_kafka_events(wire(e)) == e, field for field — the schema
    mapper is the entire kafka-specific surface, so this plus the
    streaming test below is the broker-less proof of the kafka kind."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import (
        KAFKA_EVENTS_SCHEMA,
        decode_kafka_events,
    )

    events = spark.createDataFrame(
        [
            (1, _ts(10, 0), 7, "click", 1.5, '{"seq": 1}'),
            (2, _ts(10, 5), 8, "view", 0.0, None),
            (3, _ts(23, 59), 7, "purchase", -2.25, '{"a": [1, 2]}'),
        ],
        KAFKA_EVENTS_SCHEMA,
    )
    decoded = decode_kafka_events(_wire_rows(spark, events))
    assert decoded.schema == events.schema
    assert sorted(map(tuple, decoded.collect())) == sorted(map(tuple, events.collect()))


def test_kafka_decoder_poison_pill(spark):
    """A malformed record value must become an all-NULL row (quarantine
    downstream), never a stream-killing exception."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import decode_kafka_events

    wire = spark.createDataFrame(
        [(None, b"{not json", "events", 0, 0, _ts(1, 0), 0)], _WIRE
    )
    rows = decode_kafka_events(wire).collect()
    assert len(rows) == 1 and rows[0]["event_id"] is None


def test_kafka_mapper_in_streaming_query(spark):
    """The kafka decode path inside an actual streaming query: stream
    wire-shaped records (binary JSON values) from files, decode, run the
    same tumbling-window agg every other source kind runs, and match the
    batch answer — proving query code is source-kind agnostic."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import (
        KAFKA_EVENTS_SCHEMA,
        decode_kafka_events,
        tumbling_counts,
    )

    events = spark.createDataFrame(
        [
            (i, _ts(9 + i % 3, (i * 7) % 60), i % 5, ["click", "view"][i % 2], i / 4.0, None)
            for i in range(40)
        ],
        KAFKA_EVENTS_SCHEMA,
    )
    root = os.path.join(SCRATCH, f"kafka_wire_{uuid.uuid4().hex[:8]}")
    _wire_rows(spark, events).write.mode("overwrite").parquet(root)

    wire_stream = spark.readStream.schema(_WIRE).parquet(root)
    got = _drain(tumbling_counts(decode_kafka_events(wire_stream)), "complete")
    want = tumbling_counts(events)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_processing_time_timeout_evicts_and_rearms(spark):
    """Bounded-state guarantee of user_activity_state_with_timeout, over
    real micro-batches: (1) an idle key's state is evicted and a
    tombstone emitted; (2) the key's later return starts a FRESH
    accumulator (no resurrected counts); (3) a key that keeps arriving
    accumulates across batches as before."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.stateful import (
        user_activity_state_with_timeout,
    )

    schema = "event_id long, ts timestamp, user_id long, value double"
    root = os.path.join(SCRATCH, f"timeout_src_{uuid.uuid4().hex[:8]}")
    os.makedirs(root, exist_ok=True)

    def add_file(i, rows):
        df = spark.createDataFrame(rows, schema)
        tmp = os.path.join(root, f"tmp_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp, part), os.path.join(root, f"batch_{i}.parquet"))

    add_file(0, [(1, _ts(10, 0), 1, 1.0), (2, _ts(10, 0), 2, 2.0)])

    stream = spark.readStream.schema(schema).parquet(root)
    name = f"timeout_{uuid.uuid4().hex[:10]}"
    # 10s idle timeout >> worst-case feed latency (file-write job +
    # source discovery + stateful-batch time measured at ~5s here): key 2
    # is fed again inside the horizon (stays live, accumulates), key 1
    # goes idle and must expire
    q = (
        user_activity_state_with_timeout(stream, timeout_ms=10000)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def wait_for(pred, desc, timeout_s=90):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            rows = [tuple(r) for r in spark.table(name).collect()]
            if pred(rows):
                return rows
            if q.exception() is not None:
                raise q.exception()
            time.sleep(0.5)
        raise TimeoutError(f"{desc}; sink so far: {sorted(rows)}")

    try:
        wait_for(lambda rs: (1, 1, 100, False) in rs and (2, 1, 200, False) in rs, "batch-1 rows")
        add_file(1, [(3, _ts(10, 5), 2, 3.0)])  # only user 2, well inside its horizon
        wait_for(
            lambda rs: (2, 2, 500, False) in rs,
            "user-2 accumulation across batches (not evicted while active)",
        )
        # user 1 has been idle since batch 1 → its 5s deadline expires and
        # the state store drops it, emitting the tombstone
        wait_for(lambda rs: (1, 1, 100, True) in rs, "user-1 eviction tombstone")
        add_file(2, [(4, _ts(10, 10), 1, 4.0)])  # user 1 returns after eviction
        rows = wait_for(lambda rs: (1, 1, 400, False) in rs, "user-1 re-registration")
        # fresh re-registration: count restarted at 1 with only the new
        # value — a resurrected accumulator would show (1, 2, 500, False)
        assert (1, 2, 500, False) not in rows
    finally:
        q.stop()
        q.awaitTermination(60)


@pytest.mark.kafka
@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"),
    reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker in sandbox)",
)
def test_kafka_live_source_smoke(spark):
    """Live-broker smoke: the kafka kind of events_source drains a real
    topic through the same tumbling-window query every other kind runs
    (README 'Integration smokes' recipe). Requires the spark-sql-kafka
    connector jar and an `events` topic carrying JSON event rows."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import (
        events_source,
        tumbling_counts,
    )

    stream = events_source(
        spark,
        {
            "kind": "kafka",
            "bootstrap_servers": os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"],
            "topic": os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "events"),
        },
    )
    out = _drain(tumbling_counts(stream), "complete")
    assert out.count() >= 0  # schema + plumbing; content depends on the live topic


def test_rocksdb_state_store_seam(spark):
    """VERDICT r7 item 5: the RocksDB state-store trade (measured 295 MB
    vs 1.8 GB on-heap at 20M dedup rows) is one session call away —
    session.use_state_store('rocksdb') — and the provider swap changes
    WHERE state lives, not WHAT the query emits: the watermark-dedup
    scenario reproduces the default provider's exact output, and the
    query's state-operator metrics prove RocksDB actually served it."""
    import json

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session import ROCKSDB_PROVIDER, use_state_store

    batches = [
        [(1, _ts(10, 0), 1, 1.0), (2, _ts(10, 5), 1, 1.0)],
        [(1, _ts(10, 1), 1, 1.0), (3, _ts(10, 30), 1, 1.0)],
    ]
    root = _write_batches(spark, batches)

    def run():
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(root)
        )
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
        name = f"rocks_{uuid.uuid4().hex[:10]}"
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()
        ids = sorted(r.event_id for r in spark.table(name).collect())
        return ids, json.loads(q.lastProgress.json) if q.lastProgress else {}

    baseline_ids, _ = run()
    use_state_store(spark, "rocksdb")
    try:
        assert spark.conf.get("spark.sql.streaming.stateStore.providerClass") == ROCKSDB_PROVIDER
        rocks_ids, progress = run()
    finally:
        use_state_store(spark, "hdfs")
    assert rocks_ids == baseline_ids == [1, 2, 3]
    metrics = (progress.get("stateOperators") or [{}])[0].get("customMetrics", {})
    assert any(k.startswith("rocksdb") for k in metrics), metrics


def test_streaming_media_ingest_decode_and_quarantine_rollup(spark, tmp_path):
    """The media pipeline composes with Structured Streaming end to end
    (round 9): binary payloads arriving as a STREAM flow through the
    same safe-mode decode (mapInPandas is a stateless map, legal in
    streaming plans) and the quarantine-rate rollup runs as a streaming
    aggregation — the shape a 100 TB continuous ingest actually runs.
    An AvailableNow drain must reproduce the batch path's rows exactly,
    including the planted failure classes."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import multimodal as MM

    ids = [(i,) for i in (0, 10, 20, 30, 40, 60, 70)]  # 0/30/60 planted bad
    docs = spark.createDataFrame(ids, "doc_id long")
    staged = str(tmp_path / "media")
    MM.render_quarantine_payloads(docs).coalesce(1).write.parquet(staged)

    batch_stats = MM.decode_image_stats(spark.read.parquet(staged), safe=True)
    batch_rows = {tuple(r) for r in batch_stats.collect()}
    batch_summary = {
        (r["status"], r["n_docs"]) for r in MM.quarantine_summary(batch_stats).collect()
    }

    stream = spark.readStream.schema(spark.read.parquet(staged).schema).parquet(staged)
    s_stats = MM.decode_image_stats(stream, safe=True)
    assert s_stats.isStreaming
    out = _drain(s_stats, "append")
    assert {tuple(r) for r in out.collect()} == batch_rows

    # the rollup as a streaming aggregation (complete mode: the running
    # per-status counts a live ingest dashboard reads)
    s_summary = MM.quarantine_summary(
        MM.decode_image_stats(
            spark.readStream.schema(spark.read.parquet(staged).schema).parquet(staged),
            safe=True,
        )
    )
    out2 = _drain(s_summary, "complete")
    assert {(r["status"], r["n_docs"]) for r in out2.collect()} == batch_summary


def test_job_checkpoint_dir_lifecycle(spark, tmp_path):
    """VERDICT r7 item 7: job_checkpoint_dir gives iterative operators a
    reliable checkpoint dir for the job's duration and removes it on
    exit — no unbounded checkpoint accumulation across jobs. Inside the
    context, materialize() takes the RELIABLE branch (the frame reports
    isCheckpointed); after exit the per-job directory is gone and the
    previous checkpoint dir (none) is restored."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session import job_checkpoint_dir

    base = str(tmp_path / "ckpt")
    vertices = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "src long, dst long")
    prev = spark.sparkContext.getCheckpointDir()
    with job_checkpoint_dir(spark, base) as job_dir:
        # Spark appends its own session UUID below the dir we set
        assert job_dir.rsplit("/", 1)[-1] in spark.sparkContext.getCheckpointDir()
        comps = {
            (r["id"], r["comp"])
            for r in D.connected_components(vertices, edges).collect()
        }
        assert comps == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 4), (5, 4)}
        # the reliable store was actually used: the job dir has content
        assert os.path.isdir(job_dir) and os.listdir(job_dir)
    assert not os.path.exists(job_dir)  # removed on exit
    assert spark.sparkContext.getCheckpointDir() == prev  # restored (None)


def test_checkpoint_dir_restore_fallback_is_loud(caplog):
    """ADVICE r8 + VERDICT r8 #6: unsetting the checkpoint dir rides the
    private Scala setter ``checkpointDir_$eq``; if a Spark version
    renames it, the failure must be LOUD (warning naming the consequence,
    False returned), never a crash at context exit or a silent pass."""
    import logging as _logging

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session import _restore_unset_checkpoint_dir

    class _NoSetterScalaCtx:  # a Spark whose internal was renamed away
        pass

    class _FakeJsc:
        def sc(self):
            return _NoSetterScalaCtx()

    class _FakeSc:
        _jsc = _FakeJsc()

    with caplog.at_level(_logging.WARNING, logger="custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session"):
        ok = _restore_unset_checkpoint_dir(_FakeSc(), jvm=None)
    assert ok is False
    assert any("checkpointDir_$eq" in r.getMessage() for r in caplog.records)
    assert any("setCheckpointDir" in r.getMessage() for r in caplog.records)


def _has_tws_protobuf() -> bool:
    """transformWithStateInPandas' state server needs a working protobuf
    install; this sandbox ships a broken namespace stub, so probe the
    actual import the driver worker performs."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_tws_protobuf(), reason="protobuf not installed (transformWithState v2 state server needs it)")
def test_transform_with_state_v2_matches_classic_api(spark):
    """Spark 4 arbitrary-state API v2 conformance: user_activity_state_v2
    (transformWithStateInPandas + StatefulProcessor, RocksDB provider)
    must emit exactly the classic applyInPandasWithState operator's
    final per-user state on the same bounded drain."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session import use_state_store
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.stateful import (
        user_activity_state,
        user_activity_state_v2,
    )

    batches = [
        [(1, _ts(10, 0), 1, 2.0), (2, _ts(10, 5), 1, 3.5), (3, _ts(10, 6), 2, 1.25)],
        [(4, _ts(10, 7), 1, 0.75), (5, _ts(10, 9), 3, 9.99)],
    ]
    root = _write_batches(spark, batches)

    def run(op):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(root)
        )
        name = f"tws_{uuid.uuid4().hex[:10]}"
        q = (
            op(stream).writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()
        # update mode re-emits per trigger: keep the final row per user
        rows = {}
        for r in spark.table(name).collect():
            rows[r["user_id"]] = (r["n_events"], r["total_value_cents"])
        return rows

    classic = run(user_activity_state)
    use_state_store(spark, "rocksdb")  # v2 requires the RocksDB provider
    try:
        v2 = run(user_activity_state_v2)
    finally:
        use_state_store(spark, "hdfs")
    assert v2 == classic == {1: (3, 625), 2: (1, 125), 3: (1, 999)}


def test_auto_state_store_pinned_at_both_measured_ends(spark, caplog):
    """VERDICT r9 item 2: the state-store provider choice is cost-aware.
    Both measured ends of SCALE_R9_SF100_STREAMING.json map correctly —
    20M dedup keys (on-heap measured 1.8 GB, fine) stays on the default
    on-heap provider; 100M keys (on-heap measured 26.3 GB — an OOM one
    decade later) flips to RocksDB. The conf is actually applied and the
    decision is logged with its evidence through the plans/cost seam."""
    import logging as _logging

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session import (
        HDFS_PROVIDER,
        ROCKSDB_PROVIDER,
        auto_state_store,
        use_state_store,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    logger = "custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session"
    try:
        with caplog.at_level(_logging.INFO, logger=logger):
            caplog.clear()
            assert auto_state_store(spark, expected_keys=20_000_000) == "hdfs"
            assert spark.conf.get(key) == HDFS_PROVIDER
            assert auto_state_store(spark, expected_keys=100_000_000) == "rocksdb"
            assert spark.conf.get(key) == ROCKSDB_PROVIDER
        msgs = [r.getMessage() for r in caplog.records
                if "estimated on-heap state bytes" in r.getMessage()]
        assert len(msgs) == 2 and "'hdfs'" in msgs[0] and "'rocksdb'" in msgs[1], msgs
        assert all("hinted keys" in m for m in msgs)
        # a caller-supplied heap budget moves the crossover
        assert auto_state_store(spark, 20_000_000, heap_budget_bytes=1024**3) == "rocksdb"
    finally:
        use_state_store(spark, "hdfs")


def test_auto_state_store_measured_path(spark, caplog):
    """Round 11 (VERDICT r10 item 2): auto_state_store MEASURES its
    key-cardinality statistic like the other two cost seams — one
    batch-side approx_count_distinct over the stream's source via
    source=/key_cols=. Both decision ends exercised on a real measured
    count (the heap budget scales the crossover around the same 1000-key
    source); the explicit hint still works and takes precedence over a
    supplied source; and missing both inputs fails loudly."""
    import logging as _logging

    import pytest as _pytest

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session import (
        ONHEAP_STATE_BYTES_PER_KEY,
        auto_state_store,
        measure_state_keys,
        use_state_store,
    )

    # 2000 rows, 1000 distinct user_ids (each twice): the state key of a
    # dedup/session query over this source
    src = spark.range(2000).selectExpr(
        "id % 1000 AS user_id", "id AS event_id", "CAST(id AS STRING) AS payload"
    )
    measured = measure_state_keys(src, "user_id")
    assert abs(measured - 1000) <= 50  # HLL ~2% relative error

    logger = "custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.session"
    try:
        with caplog.at_level(_logging.INFO, logger=logger):
            caplog.clear()
            # budget far above the ~263 KB estimate -> on-heap stays
            assert auto_state_store(spark, source=src, key_cols="user_id") == "hdfs"
            # budget below it -> RocksDB, same measured statistic
            assert auto_state_store(
                spark, source=src, key_cols="user_id",
                heap_budget_bytes=100 * ONHEAP_STATE_BYTES_PER_KEY,
            ) == "rocksdb"
        msgs = [r.getMessage() for r in caplog.records
                if "estimated on-heap state bytes" in r.getMessage()]
        assert len(msgs) == 2 and all("measured keys" in m for m in msgs), msgs

        # composite state key measures the struct, not one column
        assert abs(measure_state_keys(src, ["user_id", "event_id"]) - 2000) <= 100

        # explicit hint beats a supplied source (deliberate bound wins)
        with caplog.at_level(_logging.INFO, logger=logger):
            caplog.clear()
            assert auto_state_store(
                spark, expected_keys=100_000_000, source=src, key_cols="user_id"
            ) == "rocksdb"
        assert any("100000000 hinted keys" in r.getMessage() for r in caplog.records)

        with _pytest.raises(ValueError, match="expected_keys.*or source"):
            auto_state_store(spark)
        with _pytest.raises(ValueError, match="at least one state-key column"):
            measure_state_keys(src, [])
    finally:
        use_state_store(spark, "hdfs")


def test_streaming_mjpeg_video_ingest(spark, tmp_path):
    """Round 10: the COMPRESSED-video stage composes with Structured
    Streaming the same way the image stage does — MJPEG AVIs arriving
    as a stream flow through mjpeg_frame_check(safe=True) (a stateless
    mapInPandas, legal in streaming plans), and an AvailableNow drain
    reproduces the batch rows exactly, planted non-MJPEG container
    included."""
    from pyspark.sql import functions as F

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(i,) for i in (0, 10, 20, 30)], "doc_id long")
    rendered = MM.render_avi_payloads(docs).withColumn(
        "video",
        F.when(F.col("doc_id") == 20,
               F.udf(lambda b: bytes(b).replace(b"MJPG", b"H264"), "binary")("video")
        ).otherwise(F.col("video")),
    )
    staged = str(tmp_path / "avis")
    rendered.coalesce(1).write.parquet(staged)

    batch_rows = {tuple(r) for r in
                  MM.mjpeg_frame_check(spark.read.parquet(staged), safe=True).collect()}
    assert any(r for r in batch_rows if "quarantined:NotImplementedError" in r)

    stream = spark.readStream.schema(spark.read.parquet(staged).schema).parquet(staged)
    s = MM.mjpeg_frame_check(stream, safe=True)
    assert s.isStreaming
    out = _drain(s, "append")
    assert {tuple(r) for r in out.collect()} == batch_rows


def test_stream_shuffle_width_input_sized(tmp_path, monkeypatch):
    """The round-14 input-sized streaming width (VERDICT r13 item 3):
    ceil(source bytes / 64 MB) floored at 2, env-overridable, and None
    (leave the session width alone) when a source cannot be sized —
    the measured 3-decade optimum (sf0.1/sf1/sf10 A/B in
    tools/r14_stream_width_ab.py: width 2/2/4 vs 2-2.3x slower at the
    pinned 32)."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import (
        STREAM_WIDTH_FLOOR,
        STREAM_WIDTH_TARGET_BYTES,
        stream_shuffle_width,
    )

    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", raising=False)
    small = tmp_path / "events.parquet"
    small.write_bytes(b"x" * 1024)
    assert stream_shuffle_width(str(tmp_path), "events") == STREAM_WIDTH_FLOOR

    # sparse file: logical size drives the width, multiple tables sum
    big = tmp_path / "documents.parquet"
    with open(big, "wb") as fh:
        fh.truncate(3 * STREAM_WIDTH_TARGET_BYTES + 1)
    assert stream_shuffle_width(str(tmp_path), "documents") == 4
    assert stream_shuffle_width(str(tmp_path), "events", "documents") == 4

    # unsizeable source -> None (caller leaves the session width alone)
    assert stream_shuffle_width(str(tmp_path), "missing") is None

    # explicit cluster override beats the derivation
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "17")
    assert stream_shuffle_width(str(tmp_path), "events") == 17


def test_run_available_now_many_sets_and_restores_width(spark, tmp_path):
    """shuffle_width pins the state-store partition count for the drain
    (streaming reads spark.sql.shuffle.partitions at query start; AQE
    never coalesces it) and the session value is restored afterwards —
    including on failure."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.streaming.windows import (
        run_available_now_many,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, k long"
    ).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = stream.groupBy("k").count()

    before = spark.conf.get("spark.sql.shuffle.partitions")
    (out,) = run_available_now_many([(agg, "complete")], shuffle_width=3)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert {tuple(r) for r in out.collect()} == {(0, 10), (1, 10), (2, 10)}
    # the drained aggregation's shuffle ran at width 3: its physical
    # partitioning is visible in the state store dir only per query, so
    # assert via the restored conf + a forced-failure restore instead
    bad = stream.groupBy("k").count().where(F.expr("assert_true(k < 0)").isNull())
    with pytest.raises(Exception):
        run_available_now_many([(bad, "complete")], timeout_s=60, shuffle_width=5)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
