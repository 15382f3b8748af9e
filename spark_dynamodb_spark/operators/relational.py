"""Scan / projection / filter operators — SURVEY.md §2 B1, B3, B4.

The reference connector's scan surface (SURVEY §2 A4, A6, A7): a
parallel segmented scan with projection pushdown and the translatable
predicate set pushed into the store. On parquet, Catalyst does the
same negotiation natively — tests/test_plans.py asserts PushedFilters
actually reach the scan.

Scale notes: predicate + projection pushdown is THE lever at 100 TB —
a scan that reads 2 of 11 columns and skips row groups via min/max
stats is the difference between reading 100 TB and reading 3 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table


@query(
    "b01_scan_full",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain parquet scan (B1) — the DataFrame the reference hands Spark."""
    return load_table(spark, sf_dir, "nation")


@query(
    "b03_projection",
    """
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + computed projection (B3).

    Catalyst prunes the parquet read schema to the 5 referenced
    columns (mirrors the reference's ProjectionExpression, A6).
    Per-row double arithmetic is IEEE-identical across engines — no
    decimal detour needed without aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


@query(
    "b04_filter_pushdown_set",
    """
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size >= 10 AND p_size < 40
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_name IS NOT NULL
      AND starts_with(p_type, 'STANDARD')
      AND contains(p_name, 'a')
      AND NOT (p_size = 25)
    """,
)
def filter_pushdown_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full pushdown-eligible predicate set (A7/B4):
    =, <, <=, >, >=, IN, IS NOT NULL, begins_with, contains, AND/NOT.

    Every one of these translates to a parquet PushedFilter the same
    way FilterPushdown.scala translated them to DynamoDB condition
    expressions.
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (F.col("p_size") >= 10)
        & (F.col("p_size") < 40)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_name").isNotNull()
        & F.col("p_type").startswith("STANDARD")
        & F.col("p_name").contains("a")
        & ~(F.col("p_size") == 25)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "b04_filter_residual",
    """
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE (o_orderpriority LIKE '%URGENT' OR o_orderstatus = 'F')
      AND o_totalprice > 1000.0
    """,
)
def filter_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-mixed predicates + endswith — the reference returns
    StringEndsWith to Spark as a post-scan filter (SURVEY §4.1); here
    Spark evaluates the residual after the scan the same way."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderpriority").endswith("URGENT") | (F.col("o_orderstatus") == "F"))
        & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")
