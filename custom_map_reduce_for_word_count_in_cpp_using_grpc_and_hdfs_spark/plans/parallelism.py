"""Scan-parallelism guard for CPU-heavy per-row stages.

A narrow scan of a few small files yields as many partitions as file
splits — possibly ONE. Every downstream token explode / hash / regex
stage then serializes on a single core no matter how many executors the
cluster has, because nothing before the first shuffle re-partitions.
Measured at sf0.1/local[32]: exact-Jaccard pairs 20.3 s → 1.8 s,
SimHash 7.0 s → 3.0 s, doc_profile 6.4 s → 3.6 s just by spreading the
5000-row single-file scan to 32 partitions first.

:func:`spread` is deliberately conditional: it repartitions ONLY when
the current partition count is below the session's shuffle parallelism.
At 100 TB the same scan arrives as thousands of file splits, the guard
is a no-op, and no shuffle is added — the cost appears exactly when it
pays (small inputs, where the shuffled bytes are trivially small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_parts`` (default: the session's
    ``spark.sql.shuffle.partitions``) iff it currently has fewer
    partitions. Streaming DataFrames pass through untouched — micro-batch
    sources size their own partitions and ``.rdd`` is undefined for them.
    """
    if df.isStreaming:
        return df
    if min_parts is None:
        min_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    if df.rdd.getNumPartitions() >= min_parts:
        return df
    return df.repartition(min_parts)
