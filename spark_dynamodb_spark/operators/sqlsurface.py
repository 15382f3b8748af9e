"""Subquery / lateral / ordered-aggregation SQL surface — SURVEY §2
Part B extensions (round 2): EXISTS semi-join rewrites, correlated
scalar subqueries, LATERAL joins, and ordered string aggregation.

These exercise Catalyst's subquery decorrelation machinery through
``spark.sql`` (the same surface a reference user migrating SQL
workloads hits), not hand-built joins — the PLAN is the deliverable:

- EXISTS decorrelates to a left semi join on the correlation key (one
  shuffle, no row explosion — the 100 TB-safe shape for "has at least
  one matching child row").
- A correlated aggregate scalar subquery decorrelates to an
  aggregate-then-join: the per-key aggregate is computed ONCE and
  joined back, not re-run per outer row.
- LATERAL with ORDER BY + LIMIT decorrelates to a ranked window over
  the joined child — top-k-per-key without a driver loop.

Float discipline: aggregate outputs route through the exact-decimal
detour (functions/exact.py) so hashes match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.exact import sql_dsum
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table


@query(
    "b38_exists_subquery",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-07-01'
      AND o_orderdate < TIMESTAMP '1995-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38: correlated EXISTS (TPC-H Q4 shape — orders with at least
    one late-shipped line). Catalyst decorrelates to a left semi join
    on l_orderkey: the lineitem side never duplicates orders rows, and
    both date filters push to the scans."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem_v")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM sq_orders_v
        WHERE o_orderdate >= TIMESTAMP '1995-07-01'
          AND o_orderdate < TIMESTAMP '1995-10-01'
          AND EXISTS (
            SELECT 1 FROM sq_lineitem_v
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# Threshold expression written IDENTICALLY in both engines: exact
# decimal sum cast to double, one double divide, one double multiply —
# every IEEE op in the same order, so the per-part threshold is
# bit-identical and no boundary row can flip between engines.
_Q17_THRESHOLD = (
    "0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)"
    " / COUNT(l_quantity))"
)


@query(
    "b39_scalar_subquery",
    f"""
    SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT {_Q17_THRESHOLD} FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39: correlated aggregate scalar subquery (TPC-H Q17 shape —
    small-quantity orders vs each part's average). Catalyst
    decorrelates to one aggregate over lineitem grouped by partkey
    joined back — the inner aggregate runs once, not per outer row."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sq17_lineitem_v")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("sq17_part_v")
    return spark.sql(
        f"""
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                     / 7.0, 4) AS avg_yearly
        FROM sq17_lineitem_v JOIN sq17_part_v ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (
            SELECT {_Q17_THRESHOLD} FROM sq17_lineitem_v l2
            WHERE l2.l_partkey = p_partkey
          )
        """
    )


@query(
    "b40_lateral_topk_per_key",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders o
           WHERE o.o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2
         ) t
    WHERE c.c_custkey % 50 = 0
    ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
    """,
)
def lateral_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40: LATERAL correlated subquery with ORDER BY + LIMIT — the
    SQL spelling of top-k-per-key. Catalyst decorrelates the LIMIT
    into a ranked window over one join; no per-customer re-scan of
    orders happens (the 100 TB shape — same plan as b18_topk but
    reached through the LATERAL surface)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM lat_customer_v c,
             LATERAL (
               SELECT o_orderkey, o_totalprice
               FROM lat_orders_v o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               LIMIT 2
             ) t
        WHERE c.c_custkey % 50 = 0
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@query(
    "b41_string_agg",
    """
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey % 20 = 0
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: ordered string aggregation (LISTAGG/STRING_AGG). Spark has
    no ordered string_agg; collect_list → array_sort → array_join is
    the deterministic equivalent (sorting inside the row, AFTER the
    combinable collect, so partition order can't leak into output).
    The shuffle carries the collected arrays — bounded here by the
    sampled input; at 100 TB cap group sizes (slice) or use a
    sketch."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_custkey") % 20 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("c_mktsegment")), ","
            ).alias("segments"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# B96–B98 — Spark 4 SQL-language surface (round 4, parked for round-5)
# ---------------------------------------------------------------------------


@query(
    "b96_sql_udf",
    f"""
    SELECT l_returnflag,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS net_revenue,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
             AS charged_revenue
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B96: SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN
    expr`) — reusable business logic that stays INSIDE Catalyst: the
    function body inlines into the plan, so unlike Python UDFs it
    costs nothing (whole-stage codegen, pushdown through it). The
    pricing formulas here are defined once as SQL UDFs and used in an
    aggregate; the oracle spells the bodies out inline — equality
    proves the inlining is semantically transparent.

    Scale shape: identical to writing the expressions by hand —
    that's the point.
    """
    from spark_dynamodb_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "lineitem").createOrReplaceTempView("b96_lineitem_v")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION b96_net(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION b96_charged(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN b96_net(p, d) * (1 + t)"  # UDF calling a UDF
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(b96_net(l_extendedprice, l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE) AS net_revenue,
               CAST(SUM(CAST(b96_charged(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(28,6))) AS DOUBLE) AS charged_revenue
        FROM b96_lineitem_v
        WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "b97_parameterized_sql",
    f"""
    SELECT p_brand, count(*) AS n,
           {sql_dsum('p_retailprice')} AS total_price
    FROM part
    WHERE p_size BETWEEN 10 AND 30 AND p_type = 'PROMO'
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B97: named-parameter SQL (`spark.sql(..., args={...})`) — the
    injection-safe spelling for user-supplied values: parameters bind
    as typed literals in the parser, never string-spliced, and
    Catalyst constant-folds them like any literal (so pushdown still
    fires). The oracle inlines the same constants.

    Scale shape: identical plan to hand-inlined literals — the filter
    reaches the parquet scan.
    """
    from spark_dynamodb_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "part").createOrReplaceTempView("b97_part_v")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_price
        FROM b97_part_v
        WHERE p_size BETWEEN :lo AND :hi AND p_type = :ptype
        GROUP BY p_brand
        ORDER BY p_brand
        """,
        args={"lo": 10, "hi": 30, "ptype": "PROMO"},
    )


@query(
    "b98_pipe_syntax",
    f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B98: SQL pipe syntax (Spark 4's `|>` operators, the
    GoogleSQL-style linear form) — each stage reads top-to-bottom
    like a DataFrame chain but stays pure SQL. Parses to the same
    Catalyst plan as the nested spelling the oracle uses; a green
    row proves the two surfaces are one engine.
    """
    from spark_dynamodb_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("b98_orders_v")
    return spark.sql(
        """
        FROM b98_orders_v
        |> WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                       AS total
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "b119_udtf_variant_pipe",
    """
    WITH e AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INT) % 5 + 1 AS reps
      FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    x AS (SELECT event_type, unnest(generate_series(1, reps)) AS i FROM e)
    SELECT event_type,
           count(*) AS n_rows,
           CAST(SUM(i) AS BIGINT) AS sum_i
    FROM x
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def udtf_variant_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B119 (VERDICT r4 ask #8): composed showcase — the three Spark-4
    surfaces b26 (Python UDTF), b91 (VARIANT), and b98 (pipe syntax)
    interacting in ONE query. VARIANT extraction feeds a lateral UDTF
    fan-out whose rows are aggregated by a pipe-syntax tail; green
    means the surfaces compose, not just work in isolation.

    Scale shape: the UDTF fan-out is bounded (<=5 rows per event) and
    runs inside the scan stage; the only exchange is the final
    aggregate's, identical to the oracle's generate_series plan.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="i: int")
    class SeqRows:
        def eval(self, n):
            for i in range(1, (n or 0) + 1):
                yield (i,)

    spark.udtf.register("b119_seq_rows", SeqRows)
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type",
        (F.variant_get(v, "$.k", "int") % 5 + 1).alias("reps"),
    ).createOrReplaceTempView("b119_ev_v")
    return spark.sql(
        """
        FROM b119_ev_v, LATERAL b119_seq_rows(reps) s
        |> AGGREGATE count(*) AS n_rows,
                     CAST(SUM(s.i) AS BIGINT) AS sum_i
           GROUP BY event_type
        |> ORDER BY event_type
        """
    )
