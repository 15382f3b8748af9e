"""Join operators — SURVEY.md §2 B5–B10.

The reference delegates all joins to Spark (it is a connector); these
queries exercise the full join surface on the star schema with the
physical strategy chosen deliberately:

- dims (region/nation/customer/supplier/part) → broadcast hash join:
  no shuffle of the fact side at any scale, the dim ships to every
  executor once. At 100 TB the fact table NEVER shuffles for a dim join.
- fact-fact (lineitem ⋈ orders) → sort-merge on the join key; AQE
  handles skew splitting. With both sides bucketed by orderkey in a
  real deployment this becomes a zero-shuffle join.
- range/theta joins are banded (equi-key AND range) so Spark plans an
  equi-join with a range residual instead of a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dynamodb_spark.functions.exact import dsum, sql_dsum
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import EVENTS_TS_SQL, EVENTS_TS_US_SQL, load_table


@query(
    "b05_broadcast_join",
    f"""
    SELECT p_brand,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: fact ⋈ small dim with an explicit broadcast hint.

    explain() shows BroadcastHashJoin — lineitem is never shuffled.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@query(
    "b06_multiway_join",
    f"""
    SELECT r_name AS region, n_name AS nation,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: 5-way star join (TPC-H Q5 shape).

    lineitem ⋈ orders is the only shuffle join (both large); the
    customer/nation/region chain broadcasts. Catalyst reorders —
    dims join onto orders BEFORE the fact join, shrinking the
    shuffled orders side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("region", "nation")
    )


@query(
    "b07_outer_join",
    f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
)
def outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: left outer join with a join-side predicate (kept in the ON
    clause — moving it to WHERE would change outer-join semantics).
    COUNT(col) skips nulls in both engines; SUM over an empty/null
    group is NULL in both."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus == "F"),
            "left",
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", "total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "b07_full_outer_join",
    """
    SELECT coalesce(a.k, b.k) AS k, a.n_high, b.n_urgent
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_high FROM orders
          WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) a
    FULL JOIN (SELECT o_custkey AS k, COUNT(*) AS n_urgent FROM orders
               WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
    ON a.k = b.k
    ORDER BY k
    """,
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: full outer join of two aggregated subsets (nulls on both sides)."""
    orders = load_table(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_high"))
    )
    b = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_urgent"))
    )
    return (
        a.join(b, a.k == b.k, "full")
        .select(
            F.coalesce(a.k, b.k).alias("k"),
            "n_high",
            "n_urgent",
        )
        .orderBy("k")
    )


@query(
    "b08_semi_anti_join",
    """
    SELECT 'with_urgent' AS bucket, COUNT(*) AS n FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'without_urgent' AS bucket, COUNT(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY bucket
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: left-semi (EXISTS) and left-anti (NOT EXISTS) — the anti
    join is also the relational form of the reference's delete-mode
    writer (SURVEY §2 A13: delete by key = keyed store anti-join)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    semi = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").agg(
        F.count("*").alias("n")
    ).select(F.lit("with_urgent").alias("bucket"), "n")
    anti = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").agg(
        F.count("*").alias("n")
    ).select(F.lit("without_urgent").alias("bucket"), "n")
    return semi.unionByName(anti).orderBy("bucket")


@query(
    "b09_range_join",
    f"""
    WITH e AS (SELECT event_id, user_id, event_type, {EVENTS_TS_SQL} AS ts FROM events)
    SELECT a.event_id AS purchase_id, COUNT(*) AS n_views_before
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND b.event_type = 'view'
     AND b.ts >= a.ts - INTERVAL 30 MINUTE
     AND b.ts < a.ts
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    ORDER BY a.event_id
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: banded interval self-join — views within 30 min before each
    purchase, per user.

    The equi-key (user_id) makes this a shuffle hash/sort-merge join
    with a range residual, NOT a cartesian product: at 100 TB the
    band must always ride on an equi-key (user, or a time bucket) to
    bound the join fan-out.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    return (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("b_ts") < F.col("a_ts")),
        )
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n_views_before"))
        .orderBy("purchase_id")
    )


@query(
    "b10_cross_join",
    """
    SELECT r.r_name, s.r_name AS other_name
    FROM region r CROSS JOIN region s
    WHERE r.r_regionkey < s.r_regionkey
    ORDER BY r.r_name, other_name
    """,
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: bounded cross join (unordered pairs of regions).

    Cross joins are only ever legal on provably tiny inputs — the
    similarity operators (C3) use block-bounded variants of this.
    """
    r = load_table(spark, sf_dir, "region")
    s = r.select(F.col("r_regionkey").alias("s_regionkey"), F.col("r_name").alias("other_name"))
    return (
        r.crossJoin(s)
        .filter(F.col("r_regionkey") < F.col("s_regionkey"))
        .select("r_name", "other_name")
        .orderBy("r_name", "other_name")
    )


N_SALT = 8


@query(
    "b32_salted_skew_join",
    f"""
    SELECT s_nationkey,
           {sql_dsum('l_extendedprice')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32 (scale suite): the salted shuffle-join pattern for a skewed
    fact key ⋈ dim too large to broadcast (VERDICT r1 #8 — the join
    twin of the salted two-phase aggregation).

    The fact side gets a deterministic salt in [0, N_SALT); the dim is
    exploded N_SALT× so every (key, salt) pair exists; joining on
    (key, salt) splits each hot key's rows across N_SALT shuffle
    partitions instead of one hotspot. The merge hint forces the
    sort-merge path (the regime where salting matters — with a
    broadcastable dim you would broadcast instead and skew is moot).
    Oracle: the plain unsalted join — salting must not change results.
    """
    fact = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALT)).cast("int"),
    )
    dim = (
        load_table(spark, sf_dir, "supplier")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)])))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    joined = fact.join(
        dim.hint("merge"),
        (fact.l_suppkey == dim.s_suppkey) & (fact.salt == dim.salt),
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            dsum(F.col("l_extendedprice"), "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("s_nationkey")
    )


def aqe_skew_session(spark: SparkSession) -> SparkSession:
    """A session tuned so AQE's skew-join handling triggers at test
    scale (shared by b140 and its plan gate). The *mechanism* is
    scale-independent — only the byte thresholds are shrunk so that a
    sf0.01 hot partition (~7 KB post-compression) crosses them the
    way a multi-GB hot partition crosses the 256 MB default on a real
    cluster."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.adaptive.enabled", "true")
    ns.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    ns.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB"
    )
    ns.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return ns


@query(
    "b140_aqe_skew_join",
    f"""
    SELECT s_nationkey,
           {sql_dsum('l_extendedprice')} AS revenue,
           COUNT(*) AS n_items
    FROM (SELECT CASE WHEN l_suppkey % 10 > 0 THEN 1 ELSE l_suppkey END
                   AS eff_suppkey,
                 l_extendedprice
          FROM lineitem) f
    JOIN supplier ON f.eff_suppkey = s_suppkey
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B140 (scale suite, VERDICT r6/r7 advice): AQE skew-join — the
    same hot-key fact ⋈ dim regime as b32_salted_skew_join, WITHOUT
    manual salting. The fixture routes 90% of lineitems to one
    "house" supplier (eff_suppkey = 1), the dim side stays a plain
    sort-merge shuffle (merge hint, broadcast disabled), and Spark's
    OptimizeSkewedJoin splits the hot reduce partition by mapper
    ranges at runtime — the executed plan carries
    ``SortMergeJoin(skew=true)`` (gated in tests/test_plans.py).

    Why this is the 100×-cluster answer: salting (b32) hard-codes a
    salt fan-out into the query and pays the dim-explosion cost even
    when data turns out balanced; AQE measures the actual map output
    sizes and splits only partitions that are actually skewed, with
    no query rewrite. The ``repartition(8)`` exists because the local
    fixture is ONE parquet row group = one map task, and a skewed
    partition fed by a single mapper has no mapper ranges to split —
    on a real cluster the fact side always arrives from many map
    tasks (discovered the hard way: MapOutputTracker showed
    [0,0,0,16674,0,0,0,0] for the hot reducer before the rebalance).

    Oracle: the plain unsalted join — skew splitting must not change
    results (dsum keeps the double aggregation exact under any
    partition split).
    """
    ns = aqe_skew_session(spark)
    li = load_table(ns, sf_dir, "lineitem").repartition(8)
    sup = load_table(ns, sf_dir, "supplier")
    fact = li.select(
        F.when(F.col("l_suppkey") % 10 > 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("eff_suppkey"),
        "l_extendedprice",
    )
    joined = fact.join(sup.hint("merge"), fact.eff_suppkey == sup.s_suppkey)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            dsum(F.col("l_extendedprice"), "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "b33_asof_join",
    f"""
    WITH e AS (SELECT event_id, user_id, event_type, value, {EVENTS_TS_SQL} AS ts
               FROM events),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    c AS (SELECT * FROM e WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.value AS purchase_value,
           c.event_id AS last_click_id,
           c.value AS last_click_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts < p.ts
    ORDER BY p.event_id
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: event-time AS-OF join (each purchase ⋈ the latest strictly-
    earlier click of the same user) — the feature-attribution shape
    every training pipeline needs and Spark lacks as a primitive.

    Implementation is the scalable union-carry-forward idiom, NOT a
    range join: tag both sides, union, and last(ignorenulls) over a
    (user_id, ts) window carries the most recent click forward onto
    each purchase row. ONE shuffle on user_id, state bounded by the
    window sort — no candidate-pair blowup, no range-join explosion,
    and the same plan holds at 100 TB (skew = hot users; salt-by-time
    if one user dominates). Ties (click.ts == purchase.ts) are
    excluded (strict <) by ordering PURCHASES before clicks at equal
    ts, so a same-instant click falls outside the purchase's
    strictly-preceding frame. Oracle: DuckDB's native ASOF LEFT JOIN.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    # side 0 = purchase (probe), side 1 = click (carrier): at equal ts
    # the PURCHASE sorts first, so a same-instant click lands AFTER it
    # and stays outside the strictly-preceding frame (strict <). The
    # opposite ordering would leak equal-ts clicks into the frame.
    tagged = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("side"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)  # strictly earlier rows
    )
    click_id = F.when(F.col("side") == 1, F.col("event_id"))
    click_val = F.when(F.col("side") == 1, F.col("value"))
    carried = tagged.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        "side",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_val, ignorenulls=True).over(w).alias("last_click_value"),
    )
    return (
        carried.filter(F.col("side") == 0)
        .select(
            "event_id",
            "user_id",
            F.col("value").alias("purchase_value"),
            "last_click_id",
            "last_click_value",
        )
        .orderBy("event_id")
    )


@query(
    "b49_nullsafe_join",
    """
    WITH c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN NULL
                  ELSE c_nationkey END AS nkey
      FROM customer),
    n AS (
      SELECT n_nationkey, n_name FROM nation
      UNION ALL SELECT NULL, 'UNMATCHED')
    SELECT n_name, COUNT(*) AS n_customers
    FROM c JOIN n ON nkey IS NOT DISTINCT FROM n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49: null-safe equality join (<=> / IS NOT DISTINCT FROM) —
    NULL keys match each other instead of vanishing, the semantics
    ETL reconciliation needs when "unknown" is a real category. Every
    5th customer's nation is nulled; a sentinel NULL dim row catches
    them.

    Scale shape: <=> is still an equi-join predicate — Catalyst plans
    a hash join (broadcast here: the dim is tiny), NOT the
    nested-loop fallback a `coalesce(a,-1)=coalesce(b,-1)` rewrite
    risks. All NULL keys hash to one partition; if the null share is
    large, pre-split them with the salted-join pattern (b32)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("c_nationkey"))
        .alias("nkey"),
    )
    nat = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .unionAll(
            spark.range(1).select(
                F.lit(None).cast("long").alias("n_nationkey"),
                F.lit("UNMATCHED").alias("n_name"),
            )
        )
    )
    return (
        cust.join(F.broadcast(nat), cust.nkey.eqNullSafe(nat.n_nationkey))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# B60 — runtime Bloom-filter join pruning (round 4)
# ---------------------------------------------------------------------------

_BLOOM_CONFS = {
    # Thresholds lowered so the toy fixture is eligible; the PLAN SHAPE
    # (bloom_filter_agg on the filtered dim, BloomFilterMightContain
    # guarding the fact scan) is what production gets by default.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Force the shuffle join: the 100 TB scenario is a dim too big to
    # broadcast — exactly when the runtime bloom filter pays for itself.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_pruned_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan builder shared by the b60 query and its plan gate."""
    # Isolated child session: same SparkContext/warehouse, OWN conf —
    # the threshold overrides must not leak into sibling queries run
    # on the driver's session.
    ns = spark.newSession()
    for k, v in _BLOOM_CONFS.items():
        ns.conf.set(k, v)
    li = load_table(ns, sf_dir, "lineitem")
    orders = load_table(ns, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "b60_bloom_join_prune",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B60: shuffle join with a RUNTIME Bloom filter planted on the
    fact side (VERDICT r3 #2d — promoted from a plan test to a
    first-class query). The selective dim filter (1-URGENT ≈ 20% of
    orders) builds a bloom_filter_agg over its join keys during
    planning; BloomFilterMightContain then kills non-matching fact
    rows AT THE SCAN, before they pay the shuffle. At 100 TB this is
    the difference between shuffling the full fact table and shuffling
    only the ~matching fraction — the standard semi-join reduction,
    with zero false-negative risk (Bloom false positives are removed
    by the exact join that follows, so results are bit-identical to
    the plain join; the oracle is exactly that plain join).

    tests/test_plans.py asserts the probe's presence in the physical
    plan, so a Spark upgrade silently dropping the runtime filter
    fails the gate rather than quietly re-shuffling everything.
    """
    return bloom_pruned_join_frame(spark, sf_dir)


# ---------------------------------------------------------------------------
# B65 — NOT IN with its three-valued null semantics (round 4)
# ---------------------------------------------------------------------------


@query(
    "b65_null_aware_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    )
    ORDER BY c_custkey
    """,
)
def null_aware_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B65: NOT IN — customers with no order since 1999. Deceptively
    NOT the same operator as b08's anti-join: NOT IN is three-valued,
    so one NULL in the subquery empties the whole result, and a NULL
    probe key never qualifies. Spark must therefore plan a
    null-AWARE anti join (it can't prove o_custkey non-null from
    parquet), not a plain LeftAnti — the plan gate pins that, and
    tests/test_scale_patterns.py proves the one-NULL-empties-it
    semantics against DuckDB's NOT IN on a crafted frame.

    Scale shape: the subquery side is broadcast (it must be visible
    in FULL to every probe task — that is the price of null-aware
    semantics, and why NOT EXISTS (b38) is the better spelling when
    the writer KNOWS keys are non-null: it stays a shuffleable
    LeftSemi/Anti).
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("naaj_customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("naaj_orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM naaj_customer_v
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM naaj_orders_v
          WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        )
        ORDER BY c_custkey
        """
    )


# ---------------------------------------------------------------------------
# B67 — bucketed tables: the co-located (exchange-free) join (round 4)
# ---------------------------------------------------------------------------

N_BUCKETS = 8


def _bucket_tag(sf_dir: str) -> str:
    import hashlib

    return hashlib.md5(f"bucketed:{sf_dir}".encode()).hexdigest()[:10]


def bucketed_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (once per sf) two bucketed tables and the exchange-free
    join over them; shared by the b67 query and its plan gate."""
    ns = spark.newSession()  # conf isolation; catalog is shared
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    tag = _bucket_tag(sf_dir)
    li_t, ord_t = f"b67_lineitem_{tag}", f"b67_orders_{tag}"
    if not ns.catalog.tableExists(li_t):
        # A fresh (in-memory) metastore doesn't know the table, but a
        # PREVIOUS session's warehouse directory may still exist on
        # disk — saveAsTable then fails LOCATION_ALREADY_EXISTS.
        # Managed-table data without its metastore entry is garbage by
        # definition; clear it before (re)creating.
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(ns.conf.get("spark.sql.warehouse.dir")).path
        for t in (li_t, ord_t):
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        (
            load_table(ns, sf_dir, "lineitem")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_t)
        )
        (
            load_table(ns, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(ord_t)
        )
    li, orders = ns.table(li_t), ns.table(ord_t)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "b67_bucketed_join",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B67: bucketing — both tables written bucketBy(8, join key) +
    sortBy, so the fact-fact join runs with ZERO exchanges: each task
    zips bucket i of one table with bucket i of the other (plan-gated:
    no Exchange under the SortMergeJoin). THE layout decision for a
    join two 100 TB tables hit daily — the shuffle is paid once at
    write time and amortized over every subsequent join; broadcast is
    disabled here precisely because the production case is
    both-sides-huge.

    The oracle joins the plain parquet ground truth, so bucketed
    write + read round-trips values exactly.
    """
    return bucketed_join_frame(spark, sf_dir)


B104_TOL_US = 3_600_000_000  # 1 hour nearest-match tolerance


@query(
    "b104_asof_nearest_join",
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, {EVENTS_TS_US_SQL} AS t
      FROM events WHERE event_type IN ('error', 'purchase')
    ),
    err AS (SELECT * FROM e WHERE event_type = 'error')
    SELECT err.event_id, err.user_id, m.mid AS matched_event_id, m.dt AS dt_us
    FROM err LEFT JOIN LATERAL (
      SELECT p.event_id AS mid, p.t - err.t AS dt
      FROM e p
      WHERE p.user_id = err.user_id AND p.event_type = 'purchase'
        AND abs(p.t - err.t) <= {B104_TOL_US}
      ORDER BY abs(p.t - err.t),
               CASE WHEN (p.t, p.event_id) < (err.t, err.event_id)
                    THEN 0 ELSE 1 END,
               CASE WHEN (p.t, p.event_id) < (err.t, err.event_id)
                    THEN -p.event_id ELSE p.event_id END
      LIMIT 1
    ) m ON TRUE
    ORDER BY err.user_id, err.event_id
    """,
)
def asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B104: NEAREST-neighbor as-of join — match each error event to
    its closest purchase by the SAME user within 1 hour, in either
    direction (b33 is the classic backward-only as-of; monitoring and
    attribution pipelines usually want nearest-either-side).

    The scalable spelling is the b33 union-sort trick extended with a
    forward pass: interleave both event sets on ONE (user, time) sort,
    take the last preceding purchase (running last_value ignorenulls)
    AND the first following purchase (the mirrored frame), then pick
    whichever is closer (ties prefer the earlier/preceding match,
    deterministically down to event_id). One shuffle, one sort, zero
    joins — per-task state is two structs.

    The oracle is the quadratic LATERAL nearest-1 spelling — a
    different algorithm entirely, which is what makes the hash match
    meaningful.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "purchase")
    )
    e = ev.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    pstruct = F.when(
        F.col("event_type") == "purchase", F.struct("t", "event_id")
    )
    prev = F.last(pstruct, ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    nxt = F.first(pstruct, ignorenulls=True).over(
        w.rowsBetween(1, W.unboundedFollowing)
    )
    cand = e.select(
        "event_id", "user_id", "event_type", "t",
        prev.alias("prev"), nxt.alias("nxt"),
    ).filter(F.col("event_type") == "error")
    dt_prev = F.col("prev.t") - F.col("t")  # <= 0
    dt_next = F.col("nxt.t") - F.col("t")  # >= 0
    prev_ok = F.col("prev").isNotNull() & (-dt_prev <= B104_TOL_US)
    next_ok = F.col("nxt").isNotNull() & (dt_next <= B104_TOL_US)
    use_prev = prev_ok & (~next_ok | (-dt_prev <= dt_next))
    matched_id = F.when(use_prev, F.col("prev.event_id")).otherwise(
        F.when(next_ok, F.col("nxt.event_id"))
    )
    dt = F.when(use_prev, dt_prev).otherwise(F.when(next_ok, dt_next))
    return cand.select(
        "event_id",
        "user_id",
        matched_id.alias("matched_event_id"),
        dt.alias("dt_us"),
    ).orderBy("user_id", "event_id")


# --- b111: fuzzy (approximate-string) join ---------------------------------
# Deletion-1 neighborhood blocking: two strings within edit distance 1
# share at least one common member of their delete-at-most-one-char
# neighborhoods, so the equi-join on neighborhood variants finds every
# candidate pair without any quadratic name-cross; levenshtein verifies.
@query(
    "b111_fuzzy_join",
    """
    WITH corrupted AS (
      SELECT c_custkey + 1000000 AS r_id,
             CASE WHEN c_custkey % 3 = 0
                  THEN substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))
                       || substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)
                  ELSE c_name END AS r_name
      FROM customer
    ),
    lv AS (
      SELECT c_custkey, c_name,
             unnest(list_prepend(c_name,
               list_transform(generate_series(1, length(c_name)),
                 i -> substr(c_name, 1, CAST(i - 1 AS INT))
                      || substr(c_name, CAST(i + 1 AS INT))))) AS variant
      FROM customer
    ),
    rv AS (
      SELECT r_id, r_name,
             unnest(list_prepend(r_name,
               list_transform(generate_series(1, length(r_name)),
                 i -> substr(r_name, 1, CAST(i - 1 AS INT))
                      || substr(r_name, CAST(i + 1 AS INT))))) AS variant
      FROM corrupted
    )
    SELECT DISTINCT lv.c_custkey, rv.r_id, lv.c_name, rv.r_name,
           CAST(levenshtein(lv.c_name, rv.r_name) AS INT) AS lev
    FROM lv JOIN rv ON lv.variant = rv.variant
    WHERE levenshtein(lv.c_name, rv.r_name) <= 1
    ORDER BY c_custkey, r_id
    """,
)
def fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B111: fuzzy join (entity resolution) — match records whose join
    keys differ by up to one edit, the dedup/linkage primitive for
    dirty real-world keys. The right side is a deterministically
    corrupted copy of customer names (every third name loses one
    character).

    The scalable algorithm is DELETION-NEIGHBORHOOD BLOCKING (the
    FastSS idea): each side expands to its <=1-deletion variants
    (length+1 strings per row — linear, not quadratic), candidates
    meet on a variant equi-join, and exact levenshtein verifies. No
    name-cross ever happens; the classic trigram blocking would
    collapse here (every name shares the 'Customer#' prefix grams —
    one giant block), which is exactly why neighborhood blocking is
    the right 100 TB shape for short keys.

    Scale shape: variant generation is narrow; one equi-join on the
    variant hash; DISTINCT collapses multi-variant hits before output.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    cut = (F.col("c_custkey") % F.length("c_name")).cast("int")
    corrupted = cust.select(
        (F.col("c_custkey") + 1000000).alias("r_id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))"),
                F.expr("substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)"),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("r_name"),
    )

    def variants(df, name_col):
        return df.select(
            "*",
            F.explode(
                F.expr(
                    f"array_prepend(transform(sequence(1, length({name_col})), "
                    f"i -> concat(substr({name_col}, 1, i - 1), "
                    f"substr({name_col}, i + 1))), {name_col})"
                )
            ).alias("variant"),
        )

    lv = variants(cust, "c_name")
    rv = variants(corrupted, "r_name")
    return (
        lv.join(rv, "variant")
        .filter(F.levenshtein("c_name", "r_name") <= 1)
        .select(
            "c_custkey",
            "r_id",
            "c_name",
            "r_name",
            F.levenshtein("c_name", "r_name").cast("int").alias("lev"),
        )
        .distinct()
        .orderBy("c_custkey", "r_id")
    )


# --- b112: geo radius join -------------------------------------------------
# Deterministic coordinates from md5; 1-degree grid cells with a 3x3
# neighborhood probe; degree-space L2 verify (multiplications only —
# trig would not be bit-stable across engines).
B112_RADIUS_DEG = 0.5


@query(
    "b112_geo_radius_join",
    f"""
    WITH c AS (
      SELECT c_custkey,
             CAST(('0x' || substr(md5('cl' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 160000000 / 1000000.0 - 80 AS lat,
             CAST(('0x' || substr(md5('cn' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 360000000 / 1000000.0 - 180 AS lon
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             CAST(('0x' || substr(md5('sl' || CAST(s_suppkey AS VARCHAR)), 1, 15)) AS BIGINT) % 160000000 / 1000000.0 - 80 AS lat,
             CAST(('0x' || substr(md5('sn' || CAST(s_suppkey AS VARCHAR)), 1, 15)) AS BIGINT) % 360000000 / 1000000.0 - 180 AS lon
      FROM supplier
    ),
    hits AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.lat - s.lat) * (c.lat - s.lat)
               + (c.lon - s.lon) * (c.lon - s.lon) AS d2
      FROM c CROSS JOIN s
      WHERE (c.lat - s.lat) * (c.lat - s.lat)
              + (c.lon - s.lon) * (c.lon - s.lon)
            <= {B112_RADIUS_DEG * B112_RADIUS_DEG}
    )
    , ranked AS (
      SELECT c_custkey, s_suppkey,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY d2, s_suppkey) AS rn
      FROM hits
    )
    SELECT c_custkey,
           COUNT(*) AS n_within,
           MAX(CASE WHEN rn = 1 THEN s_suppkey END) AS nearest_suppkey
    FROM ranked
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B112: geospatial radius join — for every customer location,
    count the supplier sites within a radius and identify the nearest
    (the store-locator / coverage-analysis query). Coordinates derive
    deterministically from md5 (the fixture has no geo columns).

    The scalable algorithm is GRID BUCKETING: snap points to a
    1-degree cell, probe each customer's 3x3 cell neighborhood via an
    equi-join on the cell key (radius 0.5 deg cannot escape the
    neighborhood), then verify exact distance. The oracle is the
    naive cross join — a different algorithm, so the hash match
    proves the grid probe loses nothing. Distance is degree-space L2
    (multiplications only): spherical trig is deliberately avoided —
    sin/cos are not bit-identical across engines' libm.

    Scale shape: the only join is an equi-join on (cell_lat,
    cell_lon); each customer meets ~9 cells' suppliers, not all of
    them; the rollup is combinable. Swap in a finer grid (geohash
    precision) to tune selectivity at 100 TB.
    """
    from spark_dynamodb_spark.functions.text import md5_64

    def coords(df, key, salt_lat, salt_lon):
        k = F.col(key).cast("string")
        lat = (md5_64(F.concat(F.lit(salt_lat), k)) % 160000000) / 1000000.0 - 80
        lon = (md5_64(F.concat(F.lit(salt_lon), k)) % 360000000) / 1000000.0 - 180
        return df.select(key, lat.alias("lat"), lon.alias("lon"))

    cust = coords(
        load_table(spark, sf_dir, "customer"), "c_custkey", "cl", "cn"
    )
    sup = coords(
        load_table(spark, sf_dir, "supplier"), "s_suppkey", "sl", "sn"
    )
    sup_cells = sup.select(
        "s_suppkey",
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        F.floor("lat").alias("cell_lat"),
        F.floor("lon").alias("cell_lon"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8), i -> struct(i div 3 - 1 AS dy, i % 3 - 1 AS dx)))"
    )
    probes = cust.select(
        "c_custkey", "lat", "lon", offsets.alias("o")
    ).select(
        "c_custkey",
        "lat",
        "lon",
        (F.floor("lat") + F.col("o.dy")).alias("cell_lat"),
        (F.floor("lon") + F.col("o.dx")).alias("cell_lon"),
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")
    ) * (F.col("lon") - F.col("s_lon"))
    hits = (
        probes.join(sup_cells, ["cell_lat", "cell_lon"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= B112_RADIUS_DEG * B112_RADIUS_DEG)
    )
    return (
        hits.groupBy("c_custkey")
        .agg(
            F.count("s_suppkey").alias("n_within"),
            F.expr("min_by(s_suppkey, struct(d2, s_suppkey))").alias(
                "nearest_suppkey"
            ),
        )
        .orderBy("c_custkey")
    )
