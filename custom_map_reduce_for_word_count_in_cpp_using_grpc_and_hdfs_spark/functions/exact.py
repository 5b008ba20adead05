"""Order-deterministic aggregation helpers.

Floating-point SUM is not associative, so a shuffled/partial aggregation
can legally return different last-bits run to run — which breaks any
exact differential check against an oracle (and makes production results
nondeterministic under AQE re-planning). The fix is standard: aggregate
in fixed-point. ``SUM(CAST(x AS DECIMAL(27,s)))`` is exact and therefore
order-insensitive; casting the final sum back to DOUBLE is deterministic.

The driver's star schema stores quantities as integers-in-double and
money/rates with ≤2 decimal digits, so scale 4 casts are value-exact
(no rounding at all); derived products use scale 8.

At 100 TB this is also the *right* plan shape: decimal sums stay inside
whole-stage codegen and partial aggregation, costing one widening cast
per row — no UDF, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Exact SUM of a double column via decimal, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(27,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Exact-sum AVG: decimal sum cast to double, divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(27,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_expr(sql_expr: str, scale: int = 4) -> str:
    """The oracle-side (ANSI/DuckDB) rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL(27,{scale}))) AS DOUBLE)"
