"""Relational operator surface (SURVEY.md §2.3 absence audit).

The reference has no joins, no aggregates beyond COUNT, no windows, no
set ops (its one predicate is the hardwired first-letter range filter,
slave.cc:149-157). Here the surface is deliberately *thin*: every
operator is the built-in Catalyst node, and what the engine adds is the
scale discipline — broadcast the dimension side of star joins, keep
aggregates in partial/final hash form, express top-K as sort-limit so it
plans as TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim(df: DataFrame, name: str | None = None) -> DataFrame:
    """Mark a dimension table for broadcast join.

    At 100 TB the fact side never fits a shuffle comfortably but the
    dimensions stay MB-scale; an explicit hint makes the plan robust to
    missing/stale statistics (AQE can only demote to broadcast *after* a
    shuffle stage is planned).
    """
    return F.broadcast(df)


def star_join(fact: DataFrame, *dims: tuple[DataFrame, list[str] | str]) -> DataFrame:
    """Join a fact table against broadcast dimensions left-to-right.

    Only pass dimensions that are provably bounded at every deployment
    scale (nation/region-class, pre-aggregated candidate sets): the
    forced hint bypasses the size check, so a dim that grows with the
    facts belongs in a plain join where the planner + AQE decide
    (SCALE.md §2)."""
    out = fact
    for d, on in dims:
        out = out.join(F.broadcast(d), on=on)
    return out


def top_n(df: DataFrame, n: int, *order_cols) -> DataFrame:
    """Global deterministic top-N: ORDER BY ... LIMIT n.

    Callers must pass a total order (include a unique tiebreaker column)
    so results are stable across partitionings. Planned as
    TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    return df.orderBy(*order_cols).limit(n)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_val: str,
    out_col: str | None = None,
) -> DataFrame:
    """As-of join (latest right row with right.ts <= left.ts per key),
    implemented as union + running last_value — the scalable form.

    A naive range join is O(|L|·|R|) per key; sort-merge as-of engines
    special-case it. On Spark the idiomatic equivalent is: tag both
    sides, union, one window sorted by (ts, side) per key, carry the
    last non-null right value forward, keep left rows. One shuffle on
    the key, one sort — exactly the cost of a window function, no
    custom physical operator. Ties (equal ts) order the right row first,
    giving <= (inclusive) as-of semantics; equal-ts right rows tie-break
    by the value column for determinism.
    """
    from pyspark.sql import Window

    out_col = out_col or f"asof_{right_val}"
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_rv", F.lit(None).cast(right.schema[right_val].dataType))
    r_tagged = (
        right.select(key, ts, F.col(right_val).alias("_rv"))
        .withColumn("_side", F.lit(0))
    )
    cols = [key, ts, "_side", "_rv"]
    unioned = l_tagged.select(*cols, *[c for c in left.columns if c not in {key, ts}]).unionByName(
        r_tagged, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(out_col, F.last("_rv", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .drop("_side", "_rv")
    )


def interval_self_join(
    df: DataFrame,
    ts: str,
    id_col: str,
    max_gap_seconds: int,
    key: str | None = None,
) -> DataFrame:
    """All pairs (a, b) with |ts_a - ts_b| <= gap (and same ``key`` if
    given), id_a < id_b — via time-bucket candidate generation.

    The scalable range-join pattern: bucket timestamps by the gap width;
    any qualifying pair lands in the same or adjacent buckets, so
    candidates come from an equi-join of (bucket) × (bucket-1..bucket+1)
    — never a cross join — then the exact interval predicate filters.
    """
    gap_us = max_gap_seconds * 1_000_000
    # integer floor-div: a double division could round across a bucket
    # boundary and silently drop a candidate pair. The cast makes the
    # expression total over TIMESTAMP_NTZ parquet columns too (Spark 4.1
    # rejects unix_micros(ntz)); the engine pins the session timezone to
    # UTC, so ntz→ltz is a deterministic identity on the epoch scale.
    bucket = F.expr(f"unix_micros(cast({ts} as timestamp)) div {gap_us}")
    a = df.select(
        *( [F.col(key)] if key else [] ),
        F.col(id_col).alias("id_a"),
        F.col(ts).alias("ts_a"),
        bucket.alias("bk"),
    )
    b = df.select(
        *( [F.col(key)] if key else [] ),
        F.col(id_col).alias("id_b"),
        F.col(ts).alias("ts_b"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
    )
    on = ["bk", key] if key else ["bk"]
    return (
        a.join(b, on)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(
                    F.unix_micros(F.col("ts_a").cast("timestamp"))
                    - F.unix_micros(F.col("ts_b").cast("timestamp"))
                )
                <= gap_us
            )
        )
        .select(*( [key] if key else [] ), "id_a", "id_b", "ts_a", "ts_b")
        .distinct()
    )
