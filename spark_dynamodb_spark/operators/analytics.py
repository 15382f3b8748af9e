"""Composite analytics queries — TPC-H-shaped multi-join aggregations
(round 4). Individual join/agg operators are covered by B5–B18; these
three exercise the composed plans a warehouse actually runs, where the
OPTIMIZER's choices (join order, broadcast vs shuffle, pushdown depth)
decide whether a 100 TB scan is feasible. Each is plan-gated in
tests/test_plans.py for the shape that transfers to a cluster: every
dimension broadcast, date filters reaching the parquet scan, the fact
table never shuffled before its aggregation.

Revenue sums ride the exact-decimal detour (functions/exact.py) so the
cross-engine hash comparison is exact; ORDER BY revenue tiebreaks on a
key column to stay total-order deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.exact import dsum, sql_dsum
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col() -> F.Column:
    # per-row product is IEEE-deterministic; only the SUM needs decimal
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "b62_tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {sql_dsum(_REVENUE)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B62: TPC-H Q3 (shipping priority) adapted to the fixture schema
    — top-10 highest-revenue orders from BUILDING customers, ordered
    before 1998 but shipped after. The canonical "filter two dims, hit
    the fact once, top-k the aggregate" warehouse query.

    Scale shape: customer (filtered) broadcasts into orders, the
    filtered orders side broadcasts into lineitem, the fact is
    scanned ONCE with l_shipdate pushed to parquet, and the top-10 is
    a TakeOrdered over partial aggregates — no global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        li.join(
            F.broadcast(orders), li.l_orderkey == orders.o_orderkey
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_revenue_col(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "b63_tpch_q5_local_supplier_volume",
    f"""
    SELECT n_name, {sql_dsum(_REVENUE)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B63: TPC-H Q5 (local supplier volume) — revenue by nation where
    the customer and the line's supplier share the nation, restricted
    to one region and a 3-year order window. Six relations; the join
    graph's selective edge (c_nationkey = s_nationkey) only binds
    AFTER both sides are reached — the classic join-ORDER test.

    Scale shape: region→nation→supplier collapse into one broadcast
    chain; customer broadcasts; lineitem joins orders on the fact key
    and everything else via broadcast — ONE pass over the fact, one
    shuffle for the final n_name aggregate.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue_col(), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "b64_tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, {sql_dsum(_REVENUE)} AS revenue, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B64: TPC-H Q10 (returned items) — the 20 customers losing the
    most revenue to returns in a 6-month window. The "find my problem
    accounts" pattern: selective fact filter (returnflag) + time
    window + customer rollup + top-k.

    Scale shape: l_returnflag = 'R' is pushed to the parquet scan
    (dictionary-filtered), orders' date range broadcast-joins the
    surviving third of the fact, and the top-20 is TakeOrdered over
    the aggregate — the fact shuffles once, keyed by customer.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_revenue_col(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "b68_mom_revenue_delta",
    f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY month
    )
    SELECT cur.month, cur.revenue,
           prev.revenue AS prev_revenue,
           round((cur.revenue - prev.revenue) / prev.revenue, 6) AS mom_pct
    FROM monthly cur
    JOIN monthly prev ON cur.month = prev.month + INTERVAL 1 MONTH
    ORDER BY cur.month
    """,
)
def mom_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B68: month-over-month revenue deltas via a self-join of one
    monthly aggregate — the canonical "same subquery twice" report.
    The monthly aggregate is cache()d so the fact-table aggregation
    runs ONCE and both join sides read the (tiny) cached result —
    plan-gated as exactly one aggregation subtree feeding two
    InMemoryTableScans. (Catalyst's automatic ReuseExchange does NOT
    fire here: the join infers a not-null filter on the +1-month side
    that makes the two subtrees structurally different — explicit
    caching of the small intermediate is the reliable spelling, and
    at 100 TB it is the difference between one fact pass and two.)

    (lag() over months would also work but silently treats GAPS in
    the month sequence as adjacent; the +1 MONTH equi-join is the
    gap-correct spelling, and months are dense here anyway.)

    Determinism: revenue is the exact-decimal sum; the delta is two
    IEEE ops on identical doubles — bit-stable in both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(dsum("o_totalprice", "revenue"))
        .cache()
    )
    cur = monthly
    prev = monthly.select(
        F.add_months("month", 1).alias("join_month"),
        F.col("revenue").alias("prev_revenue"),
    )
    mom = (F.col("revenue") - F.col("prev_revenue")) / F.col("prev_revenue")
    return (
        cur.join(prev, cur.month == prev.join_month)
        .select(
            "month",
            "revenue",
            "prev_revenue",
            F.round(mom, 6).alias("mom_pct"),
        )
        .orderBy("month")
    )
