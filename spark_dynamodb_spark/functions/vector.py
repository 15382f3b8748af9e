"""Vector math over ``array<float|double>`` columns — pure Catalyst.

Used by the similarity-search operators (SURVEY §2 C3). All of these
are higher-order functions (``zip_with``/``aggregate``) that run
JVM-side per row; no Python in the loop. For very wide vectors a
Pandas-UDF/numpy path can win on constant factors — see
``operators/similarity.py`` for the Arrow-batched variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
