"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (no UDF): ``zip_with`` + ``aggregate`` stay inside codegen,
cost O(dim) per row, and fold strictly left-to-right, which makes results
reproducible and lets the DuckDB oracle (``list_reduce`` fold, same
order) agree bit-for-bit.

At 100 TB: these expressions vectorize fine, but the *algorithmic* lever
for similarity search is candidate pruning (LSH / IVF bucketing in
``operators.similarity``), not faster dot products.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns, accumulated in double,
    strictly left-to-right (matches a sequential fold oracle)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column | str) -> Column:
    """Euclidean norm, same fold discipline as :func:`dot`."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity = dot / (|a|·|b|); one division, deterministic."""
    return dot(a, b) / (norm2(a) * norm2(b))


# ---- DuckDB oracle renderings (same fold order as the Spark columns) ----

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)"
    )


def norm2_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm2_sql(a)} * {norm2_sql(b)}))"
