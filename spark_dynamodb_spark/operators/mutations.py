"""Mutation-shaped relational operators — MERGE upsert semantics and
SCD2 history building (round 4; extends A12's update-write and b34's
CDC latest-per-key toward the SQL-standard spellings).

Vanilla Spark parquet tables have no transactional MERGE INTO target
(that's a Delta/Iceberg table capability), so the engine exposes MERGE
as what it actually is underneath: ONE full-outer join between target
and source plus per-row branch logic — the exact physical plan a
lakehouse MERGE compiles to before the file rewrite. The driver
hash-checks the merged relation itself, which is the part with
semantics; the file commit is A11/A12's territory.

Scale notes: both operators are single-shuffle shapes. MERGE joins
target and source on the key once (AQE picks broadcast when the delta
set is small — the common case: daily deltas vs a huge dimension);
SCD2 is two windows over the same (custkey, time) partitioning, which
Spark evaluates in one sort+shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.exact import dsum, sql_dsum
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table

# MERGE delete branch: a matched customer whose order-volume delta is
# below this is dropped from the target (exercises WHEN MATCHED ...
# DELETE). The comparison input is an exact-decimal sum cast to
# double, so the branch decision is bit-identical across engines.
MERGE_DELETE_BELOW = 500_000.0


@query(
    "b58_merge_upsert",
    f"""
    WITH tgt AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    src AS (
      SELECT o_custkey AS k, {sql_dsum('o_totalprice')} AS delta
      FROM orders GROUP BY o_custkey
    ),
    j AS (SELECT * FROM tgt FULL OUTER JOIN src ON c_custkey = k),
    m AS (
      SELECT *,
             CASE
               WHEN c_custkey IS NOT NULL AND k IS NOT NULL
                    AND delta < {MERGE_DELETE_BELOW} THEN 'delete'
               WHEN c_custkey IS NOT NULL AND k IS NOT NULL THEN 'update'
               WHEN c_custkey IS NOT NULL THEN 'keep'
               ELSE 'insert'
             END AS action
      FROM j
    )
    SELECT coalesce(c_custkey, k) AS custkey,
           coalesce(c_name, 'NEW') AS name,
           CASE action
             WHEN 'update' THEN c_acctbal + delta
             WHEN 'keep' THEN c_acctbal
             ELSE delta
           END AS balance,
           action
    FROM m
    WHERE action <> 'delete'
    ORDER BY custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B58: MERGE INTO semantics — target = BUILDING-segment customers,
    source = per-customer order-volume deltas. All four branches:

      WHEN MATCHED AND delta < T  THEN DELETE
      WHEN MATCHED                THEN UPDATE SET balance += delta
      WHEN NOT MATCHED            THEN INSERT (name 'NEW', balance = delta)
      WHEN NOT MATCHED BY SOURCE  THEN keep row unchanged

    compiled to the one full-outer join + CASE that a lakehouse MERGE
    plans. delta goes through the exact-decimal sum; the +delta update
    is then a single IEEE add — bit-stable in both engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    tgt = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    src = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        dsum("o_totalprice", "delta")
    )
    matched = F.col("c_custkey").isNotNull() & F.col("k").isNotNull()
    action = (
        F.when(matched & (F.col("delta") < MERGE_DELETE_BELOW), F.lit("delete"))
        .when(matched, F.lit("update"))
        .when(F.col("c_custkey").isNotNull(), F.lit("keep"))
        .otherwise(F.lit("insert"))
    )
    return (
        tgt.join(src, tgt.c_custkey == src.k, "full_outer")
        .withColumn("action", action)
        .filter(F.col("action") != "delete")
        .select(
            F.coalesce("c_custkey", "k").alias("custkey"),
            F.coalesce("c_name", F.lit("NEW")).alias("name"),
            F.when(F.col("action") == "update", F.col("c_acctbal") + F.col("delta"))
            .when(F.col("action") == "keep", F.col("c_acctbal"))
            .otherwise(F.col("delta"))
            .alias("balance"),
            "action",
        )
        .orderBy("custkey")
    )


@query(
    "b59_scd2_intervals",
    """
    WITH h AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             lag(o_orderpriority) OVER w AS prev
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    chg AS (
      SELECT * FROM h WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey AS custkey,
           o_orderpriority AS priority,
           o_orderdate AS eff_from,
           coalesce(lead(o_orderdate) OVER w2,
                    TIMESTAMP '2099-12-31 00:00:00') AS eff_to,
           CAST(row_number() OVER w2 AS INT) AS version,
           (lead(o_orderdate) OVER w2 IS NULL) AS is_current
    FROM chg
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY custkey, version
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B59: slowly-changing-dimension type 2 — collapse a change log
    (each customer's order priority over time) into validity intervals
    [eff_from, eff_to) with version numbers and an is_current flag.
    Consecutive identical values collapse into one interval (lag-based
    change detection); the interval end is the next change's start
    (lead), open-ended for the current row.

    Scale shape: both windows share the (o_custkey → time) sort, so
    Spark plans ONE exchange + one sort and evaluates lag, lead and
    row_number in a single Window pass over it. No join, no second
    shuffle; at 100 TB this is the cheapest correct SCD2 build there
    is (one pass over the changelog per snapshot rebuild).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.lag("o_orderpriority").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
    )
    return (
        chg.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("eff_from"),
            # Open intervals close at the SCD2 far-future sentinel (2099 — inside pandas' datetime64[ns] range), not
            # NULL: a NULL timestamp materializes as pandas NaT, which
            # the driver's canonicalizer cannot stringify.
            F.coalesce(
                F.lead("o_orderdate").over(w),
                F.lit("2099-12-31 00:00:00").cast("timestamp"),
            ).alias("eff_to"),
            F.row_number().over(w).cast("int").alias("version"),
            F.lead("o_orderdate").over(w).isNull().alias("is_current"),
        )
        .orderBy("custkey", "version")
    )
