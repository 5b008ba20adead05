"""SparkSession construction with scale-oriented defaults.

The reference hand-schedules its cluster (master.cc:188-373); on Spark the
entire control plane is the driver/executor stack, so the only "engine
bootstrap" that remains is session configuration. Defaults here are chosen
for the 100 TB posture:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing);
- partial-aggregation pushdown and Parquet filter/column pushdown are
  Catalyst defaults — nothing to enable, but we keep vectorized reading on;
- Arrow execution for the (rare) Pandas-UDF paths;
- shuffle partition count sized by env so tests (local[32]) and a real
  cluster pick appropriate values without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configuration applied to every session the engine builds. Values are
#: strings because SparkConf is stringly typed.
ENGINE_CONF: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, demote to broadcast when a runtime stat allows it.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/supplier/customer/part at typical
    # ratios) should broadcast; 64 MB is a safe executor-memory fraction.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for every to/from-pandas boundary (Pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Vectorized parquet reader + predicate pushdown are defaults; pin them
    # so a misconfigured environment cannot silently disable them.
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Deterministic timestamp semantics against the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
}


def get_session(app_name: str = "spark-engine", *, extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Master and parallelism come from the environment so the same code runs
    on local[N] in tests and on a real cluster unchanged:

    - ``SPARK_GRAFT_CPUS``  — local core count (default 32).
    - ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` — shuffle width (default = cores
      locally; on a cluster leave unset and let AQE coalesce from a high
      initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    builder = builder.config("spark.sql.shuffle.partitions", shuffle)
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally built session.

    The driver contract hands us a session we did not build; everything in
    ENGINE_CONF that is runtime-mutable is applied here so query plans are
    consistent regardless of who constructed the session.
    """
    for key, value in ENGINE_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # static conf on a started session — keep going
            pass
    # A host-built session often carries the 200-partition default; size
    # the shuffle like get_session does (AQE coalesces upward mistakes,
    # but 200 tasks per tiny sf0.01 stage is pure scheduling overhead).
    shuffle = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    except Exception:
        pass
    return spark
