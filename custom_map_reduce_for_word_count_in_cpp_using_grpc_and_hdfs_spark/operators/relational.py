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

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources.registry import DIM_TABLES


def dim(df: DataFrame, name: str | None = None) -> DataFrame:
    """Mark a dimension table for broadcast join.

    At 100 TB the fact side never fits a shuffle comfortably but the
    dimensions stay MB-scale; an explicit hint makes the plan robust to
    missing/stale statistics (AQE can only demote to broadcast *after* a
    shuffle stage is planned).
    """
    return F.broadcast(df)


def star_join(fact: DataFrame, *dims: tuple[DataFrame, list[str] | str]) -> DataFrame:
    """Join a fact table against broadcast dimensions left-to-right."""
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
