"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``spark_dynamodb_spark`` — the registry collects every
implemented operator from SURVEY.md §2 as a named query with (where
SQL-expressible) a DuckDB oracle.
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
