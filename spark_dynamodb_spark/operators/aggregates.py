"""Aggregation operators — SURVEY.md §2 B11–B14.

Mirrors the relational surface the reference delivers by delegation
(SURVEY §2 Part B): the reference's connector feeds Spark's own
hash-aggregate; here we exercise that surface directly on the
fixtures.

Scale notes (100 TB): every query below is a map-side-combinable hash
aggregate over a parquet scan — Catalyst plans
partial_agg → shuffle(group keys) → final_agg; the shuffle carries
only the (few) group keys × partial states, never raw rows. Grouping
keys are low-cardinality (returnflag×linestatus = 6 groups), so AQE
coalesces the post-shuffle partitions to a handful of tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.exact import davg, dsum, sql_davg, sql_dsum
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import EVENTS_TS_SQL, load_table

# ---------------------------------------------------------------------------
# B11 — flagship: TPC-H Q1-style pricing summary (hash aggregation)
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan → filter → hash-agg → sort, the spine of the engine.

    Reference parity: the connector (SURVEY §2 A4/A7) would push the
    ``l_shipdate`` filter into the DynamoDB scan; on parquet Catalyst
    pushes it into the file scan (check: PushedFilters in explain).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query("b11_agg_flagship_q1", FLAGSHIP_ORACLE, doc="TPC-H Q1 pricing summary")(flagship)


# ---------------------------------------------------------------------------
# B12 — distinct aggregation
# ---------------------------------------------------------------------------

@query(
    "b12_agg_count_distinct",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per segment.

    Scale: Catalyst expands multi-distinct into an Expand + two-phase
    aggregate; distinct keys are deduped map-side before the shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# B13 — approximate distinct (HLL) — rows-only: Spark's HLL++ and
# DuckDB's approx_count_distinct are different sketches, so exact
# hash-match is impossible by construction. tests/test_aggregates.py
# asserts <5% relative error vs the exact count instead.
# ---------------------------------------------------------------------------

@query("b13_agg_approx_distinct", None)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct(user_id) per event_type (HyperLogLog++).

    Scale: the whole point at 100 TB — the HLL sketch shuffles a few KB
    per group instead of the full distinct key set.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B14 — rollup / cube / grouping sets
# ---------------------------------------------------------------------------

@query(
    "b14_agg_rollup",
    f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
)
def rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy with grouping() flags.

    Note: Spark's grouping_id() bit order is (first col = MSB) while
    DuckDB GROUPING(a,b) also packs a as MSB — but we compute the gid
    explicitly from per-column grouping() flags so the mapping is
    unambiguous in both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    from spark_dynamodb_spark.functions.exact import dsum as _dsum

    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")).alias("gid"),
            F.count("*").alias("n_orders"),
            _dsum("o_totalprice", "total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
        .orderBy("gid", "status", "priority")
    )


@query(
    "b14_agg_cube",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity", "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "b14_agg_min_max",
    """
    SELECT l_returnflag,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX on doubles and timestamps — order-independent, no decimal
    detour needed."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# B42 — time-bucket OHLC downsample (min_by / max_by surface)
# ---------------------------------------------------------------------------

@query(
    "b42_ohlc_downsample",
    f"""
    WITH e AS (
      SELECT event_type, value, event_id,
             {EVENTS_TS_SQL} AS ts
      FROM events
    ),
    k AS (
      SELECT event_type, value,
             date_trunc('hour', ts) AS bucket,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
      FROM e
    )
    SELECT event_type, bucket,
           arg_min(value, ord) AS open,
           arg_max(value, ord) AS close,
           min(value) AS low,
           max(value) AS high,
           COUNT(*) AS n_events
    FROM k
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42: time-series downsample to hourly OHLC bars per event type —
    the MIN_BY/MAX_BY (arg_min/arg_max) aggregate surface. The
    first/last pick orders by a zero-padded (epoch_us, event_id)
    string because a composite struct key has no DuckDB arg_min twin;
    event_id breaks timestamp ties deterministically.

    Scale shape: ONE combinable aggregation — min_by/max_by partial-
    aggregate map-side like min/max, so the shuffle carries one bar
    per (type, hour) per partition, never raw events. This is the
    hypertable-rollup/continuous-aggregate query at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    ordc = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            "event_type",
            "value",
            F.date_trunc("hour", "ts").alias("bucket"),
            ordc.alias("ord"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max_by("value", "ord").alias("close"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "b43_bitwise_agg",
    """
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey) AS key_or,
           bit_xor(o_orderkey) AS key_xor,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43: bitwise aggregates (BIT_AND/BIT_OR/BIT_XOR) — the bitmap
    building block (e.g. folding permission masks or feature flags).

    Scale shape: all three are associative+commutative, so they
    partial-aggregate map-side; the shuffle carries one 64-bit state
    per (priority, partition)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or("o_orderkey").alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# Histogram bucketing: the bucket index is floored EXPLICITLY on both
# sides (Spark double→long CAST truncates, DuckDB's rounds) and capped
# with least() so the max value lands in the top bucket, not one past.
HIST_LO, HIST_HI, HIST_N = 0.0, 600_000.0, 20


@query(
    "b44_histogram",
    f"""
    SELECT CAST(least(floor((o_totalprice - {HIST_LO}) / (({HIST_HI} - {HIST_LO}) / {HIST_N})), {HIST_N - 1}) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44: fixed-width histogram — equi-width bucketing of a numeric
    column with per-bucket count + exact sum. The profile/EDA query
    every pipeline runs before choosing quantization or filter bounds.

    Scale shape: bucket index is a narrow projection, then ONE
    combinable aggregate over {HIST_N} groups — the shuffle carries at
    most {HIST_N} rows per map partition regardless of input size."""
    orders = load_table(spark, sf_dir, "orders")
    width = (HIST_HI - HIST_LO) / HIST_N
    bucket = F.least(
        F.floor((F.col("o_totalprice") - HIST_LO) / width), F.lit(HIST_N - 1)
    ).cast("long")
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "b47_regression_aggs",
    f"""
    WITH s AS (
      SELECT l_returnflag, l_quantity AS x,
             l_extendedprice / 10000.0 AS y
      FROM lineitem),
    m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {sql_dsum('x')} AS sx,
             {sql_dsum('y')} AS sy,
             {sql_dsum('x * y')} AS sxy,
             {sql_dsum('x * x')} AS sx2,
             {sql_dsum('y * y')} AS sy2
      FROM s GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sx2 - sx * sx) AS slope,
           (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sx2 - sx * sx) * sx)
             / CAST(n AS DOUBLE) AS intercept,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sx2 - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * sy2 - sy * sy)) AS corr_xy,
           (sxy - sx * sy / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0) AS covar_s
    FROM m ORDER BY l_returnflag
    """,
)
def regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47: statistical aggregates — least-squares slope/intercept,
    Pearson correlation, sample covariance of (quantity, price) per
    return flag. The feature-correlation profile every dataset audit
    runs.

    Parity design: native CORR/REGR_* accumulate doubles in
    partition order (never hash-comparable across engines), so the
    five raw moments are summed through the exact-decimal detour and
    the closed-form statistics are derived from them with the SAME
    IEEE expression on both sides — bit-equal at any partitioning.
    Price is pre-scaled by 1e-4 so x, y, x·y and x·x (qty integral,
    price 2-decimal) land EXACTLY on the decimal(28,6) grid — no
    rounding decision for either engine's double→decimal cast (their
    midpoint behaviors differ!). y·y has 12 decimals and DOES round,
    but safely: its true tail is a multiple of 1e-12 and can never be
    the exact 5e-7 midpoint (c² ≡ 5·10⁵ mod 10⁶ has no solution mod
    64), so both engines round the bit-identical double the same way.
    Every moment total also stays under 9e9, the envelope where
    decimal→double casts are single-rounded in both engines. Correlation is scale-invariant; slope/intercept/
    covariance are reported on the scaled price (documented unit).

    Scale shape: ONE pass, one combinable aggregate; the shuffle
    carries 6 numbers per (flag, partition) regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice") / F.lit(10000.0)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum(x * y, "sxy"),
        dsum(x * x, "sx2"),
        dsum(y * y, "sy2"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    slope = (nd * sxy - sx * sy) / (nd * sx2 - sx * sx)
    intercept = (sy - slope * sx) / nd
    corr = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sx2 - sx * sx) * F.sqrt(nd * sy2 - sy * sy)
    )
    covar = (sxy - sx * sy / nd) / (nd - F.lit(1.0))
    return m.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        corr.alias("corr_xy"),
        covar.alias("covar_s"),
    ).orderBy("l_returnflag")


@query(
    "b50_conditional_aggs",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
           bool_and(o_totalprice > 0.0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_finished,
           min(o_orderkey) FILTER (WHERE o_orderstatus = 'O')
             AS first_open_key,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B50: conditional aggregates — count_if, bool_and/bool_or, and
    a filtered min. The SQL surface for "how many rows satisfy P per
    group" without a self-join or a pre-filter that would lose the
    group's other aggregates.

    Scale shape: every one of these is a combinable aggregate (the
    filter folds into the partial state update), so the shuffle
    carries one boolean/long per group per partition."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.min(
                F.when(
                    F.col("o_orderstatus") == "O", F.col("o_orderkey")
                )
            ).alias("first_open_key"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# B57 — two-stage salted aggregation (agg-skew variant of b32) (round 3)
# ---------------------------------------------------------------------------

B57_SALTS = 8


@query(
    "b57_salted_agg",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice')} AS total_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(l_quantity) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B57: two-stage salted aggregation — b32's skew treatment for
    AGGREGATIONS: a handful of hot group keys (l_returnflag has 3)
    would send whole key-worth of rows to single reducers; salting the
    first stage by a deterministic per-row hash spreads each hot key
    over {B57_SALTS} reducers, and a second tiny aggregation merges the
    per-salt partials. The oracle is the PLAIN single-stage GROUP BY —
    green proves the decomposition is exact (counts and decimal sums
    are associative; the mean folds from (sum, count) partials, never
    from averaged averages).

    Spark's own partial aggregation already does this map-side when
    state is small; the explicit salt matters when per-group state is
    too big to combine map-side (large collect-style or sketch states)
    — this query pins the pattern and its exactness.
    """
    from spark_dynamodb_spark.functions.text import md5_64

    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt",
        (md5_64(F.concat_ws("#", "l_orderkey", "l_linenumber")) % B57_SALTS).cast(
            "int"
        ),
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).alias("price_dec"),
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("qty_dec"),
        F.count("l_quantity").alias("n_qty"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("n_items").alias("n_items"),
            F.sum("price_dec").cast("double").alias("total_price"),
            (F.sum("qty_dec").cast("double") / F.sum("n_qty")).alias("avg_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- b103: exact interpolated percentiles ----------------------------------
# Quarter-point fractions keep the interpolation weight an exact
# DECIMAL(3,2); o_totalprice is 2-dp money, so lower/upper are exact
# DECIMAL(18,2) and the interpolated value is exact DECIMAL arithmetic
# end-to-end (cast to double only for the output column).
B103_PS = (25, 50, 75)  # percent points


@query(
    "b103_percentile_cont_exact",
    f"""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    pts AS (
      SELECT * FROM (VALUES {', '.join(f'({p})' for p in B103_PS)}) t(p)
    ),
    marks AS (
      SELECT o_orderpriority, p, n,
             ((n - 1) * p) // 100 + 1 AS lo_rn,
             (n - 1) * p % 100 AS pfrac
      FROM (SELECT DISTINCT o_orderpriority, n FROM ranked) g CROSS JOIN pts
    )
    SELECT m.o_orderpriority, m.p AS pct,
           CAST(lo.vc * 100
                + (COALESCE(hi.vc, lo.vc) - lo.vc) * m.pfrac AS BIGINT)
             AS percentile_micro
    FROM marks m
    JOIN ranked lo ON lo.o_orderpriority = m.o_orderpriority AND lo.rn = m.lo_rn
    LEFT JOIN ranked hi ON hi.o_orderpriority = m.o_orderpriority
                       AND hi.rn = m.lo_rn + 1
    ORDER BY m.o_orderpriority, pct
    """,
)
def percentile_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B103: interpolated percentiles (PERCENTILE_CONT semantics: value
    at virtual position (n-1)*p, linearly interpolated between the two
    bracketing order statistics) — exact, via rank selection instead
    of the native aggregate. Native percentile() interpolates in
    binary double where the last ulp is engine-private; here the
    bracketing values are DECIMAL(18,2) money and the quarter-point
    weight is DECIMAL(3,2), so the interpolation is exact decimal
    arithmetic, bit-identical everywhere (b88's rank-selection
    discipline generalized from the median to any p).

    Scale shape: one window pass partitioned by the group key (rank +
    group size share one sort), a tiny per-group mark table, and two
    rank-equi joins that AQE broadcasts. At 100 TB swap in
    percentile_approx for the same plan shape with sketch merges —
    this op is the exactness anchor.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("vc"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("o_orderpriority")).alias("n"),
    )
    pts = spark.range(0, len(B103_PS)).select(
        F.element_at(F.array(*[F.lit(p) for p in B103_PS]), (F.col("id") + 1).cast("int")).alias("p")
    )
    groups = ranked.select("o_orderpriority", "n").distinct()
    marks = groups.crossJoin(F.broadcast(pts)).select(
        "o_orderpriority",
        "p",
        ((F.col("n") - 1) * F.col("p")).cast("long").alias("tgt"),
    ).select(
        "o_orderpriority",
        "p",
        (F.expr("tgt div 100") + 1).cast("long").alias("lo_rn"),
        (F.col("tgt") % 100).alias("pfrac"),
    )
    lo = ranked.select(
        F.col("o_orderpriority").alias("gp"), F.col("rn").alias("lo_rn"), F.col("vc").alias("lo_v")
    )
    hi = ranked.select(
        F.col("o_orderpriority").alias("gp2"), F.col("rn").alias("hi_rn"), F.col("vc").alias("hi_v")
    )
    out = (
        marks.join(
            lo, (marks.o_orderpriority == lo.gp) & (marks.lo_rn == lo.lo_rn)
        )
        .join(
            hi,
            (marks.o_orderpriority == hi.gp2) & (marks.lo_rn + 1 == hi.hi_rn),
            "left",
        )
        .select(
            "o_orderpriority",
            F.col("p").alias("pct"),
            (
                F.col("lo_v") * 100
                + (F.coalesce(F.col("hi_v"), F.col("lo_v")) - F.col("lo_v"))
                * F.col("pfrac")
            )
            .cast("long")
            .alias("percentile_micro"),
        )
    )
    return out.orderBy("o_orderpriority", "pct")


# --- c65: winsorized statistics --------------------------------------------
# Nearest-rank (discontinuous) p10/p90 per event_type; clipping and
# means in integer micro-units so every engine agrees bit-for-bit.
C65_LO = 10
C65_HI = 90


@query(
    "c65_winsorized_stats",
    f"""
    WITH e AS (
      SELECT event_type, event_id,
             CAST(floor(value * 1000000) AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    thr AS (
      SELECT r1.event_type, r1.n,
             lo.v AS lo_v,
             hi.v AS hi_v
      FROM (SELECT DISTINCT event_type, n FROM ranked) r1
      JOIN ranked lo ON lo.event_type = r1.event_type
                    AND lo.rn = (r1.n - 1) * {C65_LO} // 100 + 1
      JOIN ranked hi ON hi.event_type = r1.event_type
                    AND hi.rn = (r1.n - 1) * {C65_HI} // 100 + 1
    )
    SELECT r.event_type,
           CAST(t.n AS BIGINT) AS n,
           t.lo_v AS lo_micro,
           t.hi_v AS hi_micro,
           CAST(SUM(least(greatest(r.v, t.lo_v), t.hi_v)) AS BIGINT)
             AS winsorized_sum_micro,
           CAST(SUM(least(greatest(r.v, t.lo_v), t.hi_v)) // t.n AS BIGINT)
             AS winsorized_mean_micro
    FROM ranked r JOIN thr t ON t.event_type = r.event_type
    GROUP BY r.event_type, t.n, t.lo_v, t.hi_v
    ORDER BY r.event_type
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C65: winsorized statistics — clip each group's values at its
    own nearest-rank p10/p90 before averaging, the robust-mean recipe
    metric pipelines use so a single corrupted reading can't drag a
    per-type average (trimming's keep-the-row cousin: sample size is
    preserved).

    Exactness: thresholds are order statistics picked by integer rank
    arithmetic (b88/b103's discipline); values clip and sum in integer
    micro-units; the mean is a floor division. Nothing floats.

    Scale shape: one window pass partitioned by the group key (rank +
    size share a sort), a tiny per-group threshold relation joined
    back (AQE broadcasts it), one combinable clipped rollup.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000).cast("long").alias("v"),
    )
    w = W.partitionBy("event_type").orderBy("v", "event_id")
    ranked = e.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )
    groups = ranked.select("event_type", "n").distinct()
    lo = ranked.select(
        F.col("event_type").alias("et1"), F.col("rn").alias("rn1"), F.col("v").alias("lo_v")
    )
    hi = ranked.select(
        F.col("event_type").alias("et2"), F.col("rn").alias("rn2"), F.col("v").alias("hi_v")
    )
    thr = (
        groups.join(
            lo,
            (groups.event_type == lo.et1)
            & (F.expr(f"(n - 1) * {C65_LO} div 100") + 1 == lo.rn1),
        )
        .join(
            hi,
            (groups.event_type == hi.et2)
            & (F.expr(f"(n - 1) * {C65_HI} div 100") + 1 == hi.rn2),
        )
        .select("event_type", "n", "lo_v", "hi_v")
    )
    clipped = ranked.select("event_type", "v").join(
        F.broadcast(thr), "event_type"
    ).select(
        "event_type",
        "n",
        "lo_v",
        "hi_v",
        F.least(F.greatest(F.col("v"), F.col("lo_v")), F.col("hi_v")).alias("cv"),
    )
    return (
        clipped.groupBy("event_type", "n", "lo_v", "hi_v")
        .agg(F.sum("cv").cast("long").alias("winsorized_sum_micro"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("lo_v").alias("lo_micro"),
            F.col("hi_v").alias("hi_micro"),
            "winsorized_sum_micro",
            F.expr("winsorized_sum_micro div n").cast("long").alias(
                "winsorized_mean_micro"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B141 — AQE partition coalescing (the other half of runtime re-planning)
# ---------------------------------------------------------------------------

_AQE_COALESCE_SESSIONS: dict[str, SparkSession] = {}  # keyed by applicationId


def aqe_coalesce_session(spark: SparkSession) -> SparkSession:
    """A session tuned so AQE's post-shuffle coalescing is *observable*
    at test scale (shared by b141 and its plan gate). 64 shuffle
    partitions is a stand-in for a cluster-sized default (e.g. 2000);
    the advisory size (1 MB) is what a ~84-group aggregate output can
    never fill, so AQE folds the 64 reducers into a handful. The
    mechanism is scale-independent — on a real cluster this is what
    turns a 2000-reducer config into 3 tasks for a small stage and
    leaves it at 2000 for the big ones, with NO per-query tuning.

    Memoized per SparkContext (ADVICE r9): a fresh newSession() per
    call would accumulate sessions across repeated runs. NOTE the
    returned DataFrames are bound to THIS session — joining/unioning
    them with frames from the caller's session mixes plans across
    sessions and fails; b141 returns a self-contained result for
    exactly that reason."""
    # Keyed by applicationId, not id(sparkContext) (ADVICE r10): a
    # stopped context can be garbage-collected and its id() reused by
    # a fresh one, which would hand back a session bound to the dead
    # context. applicationId is unique per context lifetime.
    key = spark.sparkContext.applicationId
    ns = _AQE_COALESCE_SESSIONS.get(key)
    if ns is None:
        ns = spark.newSession()
        ns.conf.set("spark.sql.adaptive.enabled", "true")
        ns.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        ns.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        ns.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        ns.conf.set("spark.sql.shuffle.partitions", "64")
        _AQE_COALESCE_SESSIONS[key] = ns
    return ns


@query(
    "b141_aqe_coalesce_agg",
    f"""
    SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ship_month,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def aqe_coalesce_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B141 (scale suite; pairs with b140's skew split): AQE partition
    COALESCING — the runtime fix for the over-partitioned small
    stage, the exact dual of b140's runtime fix for the
    under-partitioned hot one.

    The query is a plain ~84-group (ship-month) hash aggregate configured with 64
    shuffle partitions (a deliberate cluster-default stand-in). At
    map-output time AQE sees 64 near-empty reducer inputs and folds
    them to a handful of tasks (AQEShuffleRead 'coalesced' in the
    executed plan — gated in tests/test_plans.py). Why this matters
    at 100 TB: shuffle.partitions must be sized for the LARGEST
    stage of a job (tens of thousands); without coalescing every
    small follow-up stage pays that task count in scheduling and
    tiny-file output. With it, one config serves both — the 64→few
    fold here is the same decision that folds 20k→40 on a cluster.

    Results are partitioning-invariant by construction (dsum keeps
    the double sum exact under ANY partition layout — same discipline
    as b140), so the oracle is the plain aggregate.
    """
    ns = aqe_coalesce_session(spark)
    li = load_table(ns, sf_dir, "lineitem")
    return (
        li.groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ship_month")
        )
        .agg(
            dsum(F.expr("l_extendedprice * (1 - l_discount)"), "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("ship_month")
    )
