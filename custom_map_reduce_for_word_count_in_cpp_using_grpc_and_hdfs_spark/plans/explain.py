"""Plan introspection helpers — the engine's own feedback loop.

The reference has no optimizer and no plan representation (SURVEY.md §3,
§4); on Spark the plan IS the product, so the engine ships utilities to
assert plan properties (pushdown reached the scan, dims broadcast,
codegen spans present) in tests and during development.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, execute: bool = False) -> str:
    """The formatted physical plan; ``execute=True`` runs the DataFrame
    first so AQE's final plan (with codegen annotations) is shown."""
    if execute:
        df.collect()
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema struct bodies for each scan (column-pruning check)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def plan_has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
