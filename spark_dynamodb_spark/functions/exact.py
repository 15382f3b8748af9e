"""Exact (engine-independent) aggregation of double columns.

Summing doubles is order-dependent; Spark's partial aggregation order
differs run-to-run and from DuckDB's, so ``SUM(double)`` cannot be
hash-compared across engines. Fix: round each input to a fixed decimal
scale FIRST (exact decimal arithmetic from there on), sum as decimal,
cast the total back to double. Both engines then produce bitwise-equal
results for any partitioning or ordering.

Per-row expressions (x * (1 - y) etc.) are IEEE-deterministic and need
no special handling — only the reduction order matters.

At 100 TB this costs nothing extra: decimal sums still combine
map-side (partial aggregation) and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 digits max precision; scale 6 is plenty for money-like fixture values.
_PREC = "decimal(28,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum of a double expression, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_PREC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Exact mean: exact decimal sum cast to double, divided by count.

    The final double division is a single IEEE op — identical in any
    engine — unlike native AVG whose accumulation order varies.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_PREC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
