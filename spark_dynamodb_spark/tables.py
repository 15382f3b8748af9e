"""Fixture table loading (TESTDATA.md / FIXTURES.md).

The driver provides deterministic parquet fixtures per scale factor:
``region nation customer supplier part orders lineitem events
documents embeddings``. These stand in for DynamoDB tables (the
reference's unit of data — SURVEY §1.1); the ``sources/`` package
additionally re-exports some of them as keyed document stores for the
"dynamo" DataSource round-trip tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark cannot read
    natively (PARQUET_TYPE_ILLEGAL); we read nanos as long
    (``nanosAsLong``) and truncate to microseconds — the DuckDB oracle
    mirrors this exactly with ``make_timestamp(epoch_ns(ts) // 1000)``
    (see EVENTS_TS_SQL).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


# DuckDB-side mirror of the events.ts nanosecond→microsecond truncation.
# The driver registers `events` as a raw view (TIMESTAMP_NS), so every
# oracle SQL that touches ts inlines this expression.
EVENTS_TS_SQL = "make_timestamp(epoch_ns(ts) // 1000)"


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql use)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
