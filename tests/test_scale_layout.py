"""Storage-layout scale proofs: bucketed co-located joins (shuffle-free
fact-fact join) and partition pruning on date-partitioned layouts — the
two at-rest techniques that matter most at 100 TB.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.explain import formatted_plan
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

from .conftest import SF_SMOKE

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    """Both fact tables bucketed by the join key → SortMergeJoin with
    ZERO Exchange: the co-location a 100 TB orders⋈lineitem join needs."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directory persists — clear both before writing
    import shutil

    for tbl in ["li_bucketed", "o_bucketed"]:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join("spark-warehouse", tbl), ignore_errors=True)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
    joined = (
        spark.table("o_bucketed")
        .join(spark.table("li_bucketed"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    plan = formatted_plan(joined)
    join_section = plan.split("HashAggregate")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the join itself must not shuffle either side (bucket co-location);
    # the only allowed Exchange would be AFTER the join for the agg — and
    # grouping by the bucket key makes even that unnecessary
    assert "Exchange" not in plan, plan
    # sanity: result matches the unbucketed join
    expected = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))


def test_partition_pruning(spark):
    """Date-partitioned layout: a month-filtered query must read only
    that month's partition directories."""
    path = os.path.join(SCRATCH, "orders_by_month")
    o = load_table(spark, SF_SMOKE, "orders")
    o.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM")).write.mode(
        "overwrite"
    ).partitionBy("order_month").parquet(path)

    df = spark.read.parquet(path).where(F.col("order_month") == "1997-03")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "1997-03" in plan
    # pruned scan must touch exactly one partition directory
    import re

    m = re.search(r"(?:number of partitions|partition count)[^\d]*(\d+)", plan, re.I)
    if m:
        assert int(m.group(1)) == 1, plan
    got = df.count()
    expected = o.where(F.date_format("o_orderdate", "yyyy-MM") == "1997-03").count()
    assert got == expected > 0


def test_ivf_plan_size_independent_of_k(spark):
    """The IVF centroid set is DATA (one-row broadcast relation), not
    plan literals: the physical plan must not grow with k, and k=1024
    must execute without codegen fallback (a literal-per-centroid plan
    dies on 64 KB JVM method limits / analysis time long before that)."""
    import numpy as np

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    rng = np.random.default_rng(7)
    plans = {}
    for k in (16, 1024):
        centroids = rng.standard_normal((k, 64))
        plans[k] = formatted_plan(S.ivf_topk(queries, emb, centroids, k=5, nprobe=2))
    assert "Broadcast" in plans[1024]
    # plan text may differ by a few bytes (ids), but must not scale with k
    assert len(plans[1024]) < 2 * len(plans[16]), (len(plans[16]), len(plans[1024]))
    # and the k=1024 query actually runs end to end
    centroids = rng.standard_normal((1024, 64))
    out = S.ivf_topk(queries, emb, centroids, k=5, nprobe=8).collect()
    assert len(out) > 0


def test_ivf_stored_index_partition_pruned_probe(spark):
    """write_ivf_index assigns buckets at WRITE time; a probe against the
    stored layout must (a) carry a bucket partition filter — only nprobe
    directories are scanned — and (b) run NO bucket assignment over index
    rows at query time (no distance fold on the scan side), and (c)
    return exactly what the in-flight ivf_topk returns."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    centroids = S.ivf_centroids(emb, k=8, iters=2)
    path = os.path.join(SCRATCH, "ivf_index")
    S.write_ivf_index(emb, centroids, path)

    stored = S.ivf_topk_stored(spark, queries, path, centroids, k=5, nprobe=3)
    plan = formatted_plan(stored)
    scan_section = plan[plan.index("Scan parquet") :] if "Scan parquet" in plan else plan
    assert "PartitionFilters" in scan_section and "bucket" in scan_section, plan
    # round 5: the probe bucket set reaches the scan via DYNAMIC partition
    # pruning (executor-side broadcast result), not a driver-collected
    # isin list — pin the dynamicpruning expression on the index scan
    assert "dynamicpruning" in scan_section, plan
    # the index scan must not recompute assignments at query time:
    # nearest-bucket assignment is the array_min argmin (with_bucket),
    # which must be ABSENT from the stored-path plan (buckets come from
    # the partition column) and present in the in-flight plan
    assert "array_min" not in plan, plan

    inflight = S.ivf_topk(queries, emb, centroids, k=5, nprobe=3)
    assert "array_min" in formatted_plan(inflight)
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, inflight.collect()))


def test_ivf_scaled_k_and_numpy_assignment(spark):
    """Round 11 (ANN decade root cause): a FIXED centroid count makes
    IVF query cost track the corpus linearly (nprobe/16 probes 62% of
    any corpus), so k scales as √N via ivf_k_for, and write-time
    assignment at √N-scaled k runs through the Arrow matmul path
    (assign_buckets_np) instead of the O(k·dim)-per-row SQL fold. Pins:
    ivf_k_for's curve and clamps; numpy assignment ≡ with_bucket bucket
    for bucket; the sampled driver-side trainer (ivf_centroids_np)
    feeds a stored index whose probe answers match the SQL-assigned
    stored index exactly at the same centroids."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S

    assert S.ivf_k_for(1) == 16 and S.ivf_k_for(500) == 16  # floor
    assert S.ivf_k_for(50_000) == 256        # sqrt = 224 -> 2^8
    assert S.ivf_k_for(200_000) == 512       # sqrt = 447 -> 2^9
    assert S.ivf_k_for(2_000_000) == 1024    # sqrt = 1414 -> 2^10
    assert S.ivf_k_for(10**9) == 4096        # clamp
    import pytest as _pytest

    with _pytest.raises(ValueError):
        S.ivf_k_for(0)

    emb = load_table(spark, SF_SMOKE, "embeddings")
    centroids = S.ivf_centroids_np(emb, k=32, iters=3)
    assert centroids.shape == (32, 64)

    crel = S.centroid_relation(spark, centroids)
    sql_b = {r.vec_id: r.bucket for r in S.with_bucket(emb, crel).select("vec_id", "bucket").collect()}
    np_b = {r.vec_id: r.bucket for r in S.assign_buckets_np(emb, centroids).select("vec_id", "bucket").collect()}
    assert sql_b == np_b

    path_np = os.path.join(SCRATCH, "ivf_index_np")
    S.write_ivf_index(emb, centroids, path_np, method="numpy")
    path_sql = os.path.join(SCRATCH, "ivf_index_sql")
    S.write_ivf_index(emb, centroids, path_sql, method="sql")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    a = sorted(map(tuple, S.ivf_topk_stored(spark, queries, path_np, centroids, k=5, nprobe=6).collect()))
    b = sorted(map(tuple, S.ivf_topk_stored(spark, queries, path_sql, centroids, k=5, nprobe=6).collect()))
    assert a == b and a

    # 'auto' routes by centroid count across IVF_NUMPY_ASSIGN_MIN_K
    assert S.IVF_NUMPY_ASSIGN_MIN_K == 64
    with _pytest.raises(ValueError, match="method"):
        S.write_ivf_index(emb, centroids, path_np, method="bogus")


def test_minhash_store_candidates_scan_only(spark):
    """write_minhash_store materializes (doc_id, sig, bhs) at write time;
    candidate generation from the store must be scan → posexplode → join
    with ZERO text processing — no tokenize/shingle split, no minhash MIN
    aggregation, no band hashing — and must produce exactly the candidate
    set the in-flight path produces."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D

    docs = load_table(spark, SF_SMOKE, "documents")
    path = os.path.join(SCRATCH, "minhash_store")
    D.write_minhash_store(docs, path, num_perm=32, bands=8)

    stored_cands = D.lsh_candidate_pairs_stored(spark, path, bands=8)
    plan = formatted_plan(stored_cands)
    # signature computation starts with split(text...) and aggregates
    # per-permutation mins; band hashing is an xxhash64 over sig slots —
    # ALL of it must be absent from the stored-path plan
    assert "split(" not in plan, plan
    assert "xxhash64" not in plan, plan
    assert "partial_min" not in plan and "min(sig" not in plan, plan
    # equality with the in-flight candidate path
    inflight = D.lsh_candidate_pairs(D.minhash_signature(docs, 32), bands=8, num_perm=32)
    assert sorted(map(tuple, stored_cands.collect())) == sorted(map(tuple, inflight.collect()))


def test_single_row_group_layout_resilience(spark):
    """The driver's sf fixtures are SINGLE-row-group parquet files —
    parquet can only split at row-group boundaries, so the scan yields
    one populated task no matter how many byte-range splits are planned
    (SCALE.md lesson 12). The spread() guard exists precisely for this:
    the CPU-heavy headline operators must run within a modest factor of
    their wall time on a production many-row-group copy of the SAME
    rows. Bound is deliberately loose (3x + 2s grace) — this is a
    regression tripwire for 'operator serialized on one core', not a
    micro-benchmark; the round-4 regression this encodes was 5-10x."""
    import time

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.dedup import (
        jaccard_pairs,
        simhash_near_dups,
    )
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.text import doc_profile

    from .conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    single_dir = os.path.join(SCRATCH, "layout_single")
    relaid_dir = os.path.join(SCRATCH, "layout_relaid")
    # single row group: one file, default (huge) block size
    docs.coalesce(1).write.mode("overwrite").parquet(single_dir)
    # production-ish: many small row groups in one file
    docs.coalesce(1).write.option("parquet.block.size", str(64 * 1024)).mode(
        "overwrite"
    ).parquet(relaid_dir)

    def wall(sf_docs):
        t0 = time.perf_counter()
        doc_profile(sf_docs).write.format("noop").mode("overwrite").save()
        jaccard_pairs(sf_docs, 0.3).write.format("noop").mode("overwrite").save()
        simhash_near_dups(sf_docs).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return time.perf_counter() - t0

    relaid = spark.read.parquet(relaid_dir)
    single = spark.read.parquet(single_dir)
    wall(relaid)  # JVM/codegen warm-up rep, discarded
    t_relaid = min(wall(relaid), wall(relaid))
    t_single = min(wall(single), wall(single))
    assert t_single <= 3.0 * t_relaid + 2.0, (
        f"single-row-group layout {t_single:.2f}s vs re-laid {t_relaid:.2f}s — "
        "scan-parallelism guard regressed (plans/parallelism.spread)"
    )


def test_session_hygiene_reclaims_between_queries(spark):
    """tools/scale_run.session_hygiene must run cleanly mid-session and
    leave no persisted blocks behind — the round-6 sf10 sequence OOM'd
    on query 7 because ContextCleaner had no GC to ride between heavy
    queries (SCALE.md lesson 27). The assertable part locally: the
    helper executes against a live session, drops Python-side cycles,
    and the JVM storage status shows THIS test's cached RDD reclaimed.

    Scoped to the ids this test persists: under full-suite ordering the
    shared session can still hold localCheckpoint debris from EARLIER
    tests whose reclaim rides the asynchronous ContextCleaner thread, so
    a global ``size() == 0`` assert is order-dependent (the round-9
    suite-order flake). We snapshot the persistent-RDD id set before
    persisting, then require only that every id we ADDED drains — polling
    with a bounded timeout because the cleaner is async."""
    import sys
    import time as _time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.scale_run import session_hygiene

    jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001 — storage introspection

    def persistent_ids():
        it = jsc.getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    baseline = persistent_ids()
    docs = load_table(spark, SF_SMOKE, "documents")
    cached = docs.persist()
    cached.count()
    added = persistent_ids() - baseline
    assert added, "persist() should have registered at least one new RDD id"
    # a Python reference cycle holding a DataFrame — the shape gc.collect()
    # exists to break (refcounting alone never frees it)
    a: dict = {"df": cached}
    b = {"peer": a}
    a["peer"] = b
    del a, b, cached
    spark.catalog.clearCache()
    session_hygiene(spark)
    deadline = _time.monotonic() + 30.0
    leftover = persistent_ids() & added
    while leftover and _time.monotonic() < deadline:
        _time.sleep(0.25)
        session_hygiene(spark)
        leftover = persistent_ids() & added
    assert not leftover, (
        f"RDD ids persisted by this test not reclaimed after hygiene: {leftover}"
    )
