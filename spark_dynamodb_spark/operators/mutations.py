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


# --- b109: snapshot diff (changelog generation) ----------------------------
# v2 derivation rules (deterministic, mirrored in the oracle):
#   delete where key % 11 = 0; update price +50.00 where key % 5 = 0
#   (and not deleted); insert key+10M copies where key % 13 = 0.
@query(
    "b109_snapshot_diff",
    """
    WITH v1 AS (
      SELECT o_orderkey AS k,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
      FROM orders
    ),
    diffs AS (
      SELECT k, 'D' AS change_type, price_c AS old_price_cents,
             CAST(NULL AS BIGINT) AS new_price_cents
      FROM v1 WHERE k % 11 = 0
      UNION ALL
      SELECT k, 'U', price_c, price_c + 5000
      FROM v1 WHERE k % 11 <> 0 AND k % 5 = 0
      UNION ALL
      SELECT k + 10000000, 'I', CAST(NULL AS BIGINT), price_c
      FROM v1 WHERE k % 13 = 0
    )
    SELECT k AS o_orderkey, change_type, old_price_cents, new_price_cents
    FROM diffs
    ORDER BY o_orderkey, change_type
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B109: snapshot diff — generate the change feed (insert / update
    / delete rows) between two table versions by FULL OUTER joining on
    the key and comparing row contents. This is the REVERSE of b58's
    MERGE: where MERGE applies a changelog, diff derives one from
    snapshots — how CDC is bootstrapped when the source system has no
    change feed of its own.

    The v2 snapshot is derived in-query by deterministic rules, and
    the oracle computes the expected changelog directly FROM THE RULES
    — so the diff machinery (join + row comparison + classification)
    is what's actually under test. Prices compare in integer cents.

    Scale shape: one full-outer equi-join on the key (both sides
    hash-partition once); the row comparison is narrow; unchanged rows
    (the overwhelming majority at 100 TB) are filtered before any
    downstream work.
    """
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
    )
    v2 = (
        v1.filter(F.col("k") % 11 != 0)
        .select(
            "k",
            F.when(F.col("k") % 5 == 0, F.col("price_c") + 5000)
            .otherwise(F.col("price_c"))
            .alias("price_c"),
        )
        .unionAll(
            v1.filter(F.col("k") % 13 == 0).select(
                (F.col("k") + 10000000).alias("k"), "price_c"
            )
        )
    )
    a = v1.select(F.col("k").alias("k1"), F.col("price_c").alias("p1"))
    b = v2.select(F.col("k").alias("k2"), F.col("price_c").alias("p2"))
    joined = a.join(b, a.k1 == b.k2, "full_outer")
    change = (
        F.when(F.col("k2").isNull(), "D")
        .when(F.col("k1").isNull(), "I")
        .when(F.col("p1") != F.col("p2"), "U")
        .otherwise("N")
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type") != "N")
        .select(
            F.coalesce("k1", "k2").alias("o_orderkey"),
            "change_type",
            F.when(F.col("change_type") != "I", F.col("p1")).alias(
                "old_price_cents"
            ),
            F.when(F.col("change_type") != "D", F.col("p2")).alias(
                "new_price_cents"
            ),
        )
        .orderBy("o_orderkey", "change_type")
    )


# --- b110: point-in-time (temporal) join against the SCD2 dimension --------
@query(
    "b110_temporal_scd2_join",
    """
    WITH h AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             lag(o_orderpriority) OVER w AS prev
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    chg AS (SELECT * FROM h WHERE prev IS NULL OR prev <> o_orderpriority),
    iv AS (
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             o_orderdate AS eff_from,
             coalesce(lead(o_orderdate) OVER w2,
                      TIMESTAMP '2099-12-31 00:00:00') AS eff_to,
             CAST(row_number() OVER w2 AS INT) AS version
      FROM chg
      WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    probe AS (
      SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, l.l_shipdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT p.l_orderkey, p.l_linenumber, p.o_custkey AS custkey,
           p.l_shipdate AS ship_ts,
           iv.priority AS pit_priority, iv.version AS pit_version
    FROM probe p
    LEFT JOIN iv ON iv.custkey = p.o_custkey
                AND iv.eff_from <= p.l_shipdate AND p.l_shipdate < iv.eff_to
    ORDER BY l_orderkey, l_linenumber, ship_ts
    """,
)
def temporal_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B110: point-in-time join — each lineitem is joined to the SCD2
    dimension version (b59's validity intervals) that was in effect AT
    ITS SHIP DATE. This is the feature-store correctness primitive:
    training examples must see dimension attributes as they were at
    event time, never "current" values (that is label leakage).

    The join is an equi-join on the customer key with the interval
    containment as a residual range predicate — intervals are disjoint
    by construction, so at most one version matches and the plan never
    degenerates toward a cartesian (gated). Ship dates before a
    customer's first interval yield NULL (LEFT semantics, also the
    leak-proof default).

    Scale shape: the SCD2 side is change-cardinality-sized (far
    smaller than the fact); AQE broadcasts it. One fact pass.
    """
    from spark_dynamodb_spark.operators.mutations import scd2_intervals

    iv = scd2_intervals(spark, sf_dir).select(
        "custkey", "priority", "eff_from", "eff_to", "version"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probe = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", "l_shipdate"
    )
    joined = probe.join(
        iv,
        (probe.o_custkey == iv.custkey)
        & (iv.eff_from <= probe.l_shipdate)
        & (probe.l_shipdate < iv.eff_to),
        "left",
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        F.col("o_custkey").alias("custkey"),
        F.col("l_shipdate").alias("ship_ts"),
        F.col("priority").alias("pit_priority"),
        F.col("version").alias("pit_version"),
    ).orderBy("l_orderkey", "l_linenumber", "ship_ts")
