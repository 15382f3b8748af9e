"""Window function operators — SURVEY.md §2 B15–B17.

Determinism discipline: every window ORDER BY carries a unique
tiebreaker (primary key) so ranking / frame contents are total-order
deterministic and hash-comparable across engines.

Scale notes: a window = one shuffle on partitionBy + a per-partition
sort. Partition keys here (brand, user, supplier) are high-cardinality
relative to data volume, so partitions stay small and spillable; a
window with NO partitionBy (global rank) is a single-task bottleneck
and appears only in top-k form (B18) where a limit bounds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import EVENTS_TS_SQL, EVENTS_TS_US_SQL, load_table


@query(
    "b15_window_rank",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn, rnk, drnk, quartile
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number()  OVER w AS rn,
             rank()        OVER w AS rnk,
             dense_rank()  OVER w AS drnk,
             ntile(4)      OVER w AS quartile
      FROM part
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ) t
    WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: top-3 parts per brand with the full ranking family."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )


@query(
    "b16_window_analytic",
    f"""
    WITH e AS (SELECT event_id, user_id, value, {EVENTS_TS_SQL} AS ts FROM events)
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_value,
           value - lag(value) OVER w AS delta
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: lag/lead/first_value deltas per user ordered by event time."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "b17_window_frames",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(28,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_price_sum
    FROM lineitem
    WHERE l_suppkey <= 5
    ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: explicit ROWS frames — running total and 3-row moving sum.

    The decimal detour makes the running accumulation exact so the
    cross-engine hash matches at any partition count.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = W.partitionBy("l_suppkey").orderBy(*order)
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    moving = w.rowsBetween(-2, W.currentRow)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).over(running).cast("double").alias("running_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).over(moving).cast("double").alias("moving_price_sum"),
    ).orderBy("l_suppkey", *order)


@query(
    "b17_window_range_frame",
    f"""
    WITH e AS (SELECT event_id, user_id, value, {EVENTS_TS_SQL} AS ts FROM events)
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
             AS n_last_10min
    FROM e
    ORDER BY user_id, ts, event_id
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17b: RANGE frame over event-time seconds — events in the
    trailing 10 minutes per user. rangeBetween needs a numeric order
    key, so we order by epoch seconds (identical to DuckDB epoch())."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_10min"),
        "ts",
    ).orderBy("user_id", "ts", "event_id").drop("ts")


@query(
    "b45_window_distribution",
    """
    SELECT p_partkey, p_brand,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           ntile(10) OVER w AS decile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    ORDER BY p_partkey
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15b: distribution window functions — percent_rank/cume_dist/
    ntile give each row its position in the brand's price distribution
    (the building block for percentile-threshold filters).

    Determinism: the window orders by (price, pk) so ranks are total-
    order stable; percent_rank/cume_dist divide identical integers in
    both engines, so the doubles are bit-equal."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_partkey",
        "p_brand",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    ).orderBy("p_partkey")


@query(
    "c14_ts_interpolate",
    f"""
    WITH e AS (
      SELECT event_id, user_id, {EVENTS_TS_US_SQL} AS t,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    ), f AS (
      SELECT event_id, user_id, t, v,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER wp AS pt,
             first_value(v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER wn AS nt
      FROM e
      WINDOW wp AS (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pt IS NULL THEN nv
                WHEN nt IS NULL THEN pv
                WHEN nt = pt THEN pv
                ELSE pv + (nv - pv)
                          * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
           END AS v_filled,
           (v IS NULL) AS was_gap
    FROM f
    ORDER BY event_id
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14: time-series linear interpolation — fill masked readings
    (every 5th event plays the sensor dropout) from the nearest
    non-null neighbors per user, weighted by event-time distance.
    Leading/trailing gaps fall back to nearest-neighbor fill.

    Determinism: the time axis is integer epoch-micros (exact
    subtraction, then ONE double division), ordering is total
    (t, event_id), and the blend is the same IEEE expression in both
    engines.

    Scale shape: one shuffle on user_id; both window frames share the
    partitioning+ordering so Catalyst plans a single Exchange + Sort
    reused by the two Window passes. State per row is two (value, ts)
    pairs — no self-join, no point-lookup loop."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    v, t = F.col("v"), F.col("t")
    f = e.select(
        "event_id",
        "user_id",
        "t",
        "v",
        F.last(v, ignorenulls=True).over(wp).alias("pv"),
        F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp).alias("pt"),
        F.first(v, ignorenulls=True).over(wn).alias("nv"),
        F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn).alias("nt"),
    )
    pv, pt, nv, nt = F.col("pv"), F.col("pt"), F.col("nv"), F.col("nt")
    blend = pv + (nv - pv) * (
        (t - pt).cast("double") / (nt - pt).cast("double")
    )
    return f.select(
        "event_id",
        "user_id",
        F.when(v.isNotNull(), v)
        .when(pt.isNull(), nv)
        .when(nt.isNull(), pv)
        .when(nt == pt, pv)  # duplicate-timestamp neighbors: 0/0 guard
        .otherwise(blend)
        .alias("v_filled"),
        v.isNull().alias("was_gap"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# B54 — event-time range-interval window (round 3)
# ---------------------------------------------------------------------------

B54_WINDOW_US = 5 * 60 * 1_000_000  # 5 minutes of microseconds


@query(
    "b54_time_range_window",
    f"""
    WITH e AS (
      SELECT event_id, event_type, value, {EVENTS_TS_US_SQL} AS t FROM events
    )
    SELECT event_id, event_type,
           COUNT(*) OVER w AS n_in_window,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_5min
    FROM e
    WINDOW w AS (PARTITION BY event_type ORDER BY t
                 RANGE BETWEEN {B54_WINDOW_US} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54: trailing event-time window — per event, the count and
    exact sum of the last 5 minutes of same-type events. The moving-
    aggregate complement to B17's numeric range frames: the frame is
    defined on the EVENT-TIME axis (epoch micros), the standard
    "rolling 5-minute revenue / error rate" shape, and the batch twin
    of the s02 sliding stream window.

    Determinism: the frame bound is an integer range over exact epoch
    micros — ties in t land in the same frame on both engines, no
    order-dependence; the windowed sum takes the exact-decimal detour
    (functions/exact.py) so accumulation order can't show.

    Scale shape: one shuffle on event_type + per-partition sort, then
    a streaming frame scan (Spark's range-frame window keeps a sliding
    buffer, not the whole partition, in memory). A low-cardinality
    partition key at 100 TB would bottleneck — production would bucket
    by (event_type, day) first; here cardinality matches the fixture.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "event_type", "value", F.unix_micros("ts").alias("t")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t")
        .rangeBetween(-B54_WINDOW_US, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_in_window"),
        F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double").alias("sum_5min"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# B56 — distinct count over a trailing event-time window (round 3)
# ---------------------------------------------------------------------------

@query(
    "b56_distinct_over_window",
    f"""
    WITH e AS (
      SELECT event_id, event_type, user_id, {EVENTS_TS_US_SQL} AS t FROM events
      WHERE user_id IS NOT NULL
    )
    SELECT event_id, event_type,
           len(list_distinct(list(user_id) OVER w)) AS n_users_5min
    FROM e
    WINDOW w AS (PARTITION BY event_type ORDER BY t
                 RANGE BETWEEN {B54_WINDOW_US} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def distinct_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56: COUNT(DISTINCT) over a moving frame — neither engine
    supports it natively as a window aggregate, so both spell it as
    collect-into-frame-list + distinct + size (the rolling "unique
    users in the last 5 minutes" metric).

    Scale note: the frame list materializes every frame's members per
    row — fine while frames are bounded (minutes of events per type),
    but a 100 TB run with huge frames would switch to the streaming
    s02-style sliding window (state holds per-user latest-seen, not
    lists) or approx_count_distinct over the window, trading exactness
    for O(1) state. This exact variant is their correctness anchor.
    """
    ev = load_table(spark, sf_dir, "events")
    # Explicit non-null guard on both engines (ADVICE r3): Spark's
    # collect_list silently drops NULLs while DuckDB's list() keeps
    # them, so a fixture drift introducing NULL user_id would flip the
    # two counts differently. Filtering NULLs up front makes the
    # null-handling difference unreachable.
    e = ev.filter(F.col("user_id").isNotNull()).select(
        "event_id", "event_type", "user_id", F.unix_micros("ts").alias("t")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t")
        .rangeBetween(-B54_WINDOW_US, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.size(F.array_distinct(F.collect_list("user_id").over(w))).alias(
            "n_users_5min"
        ),
    ).orderBy("event_id")


@query("b56_distinct_over_window_approx", None)  # rows-only: HLL++ sketch has no DuckDB twin
def distinct_over_window_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56b: the SCALE path for distinct-count-over-moving-frame —
    approx_count_distinct (HLL++, rsd 2%) over the same 5-minute
    event-time range frame as the exact b56 twin.

    Why this exists (VERDICT r3 "What's wrong" #1): the exact variant
    materializes every frame as an array (collect_list + array_distinct)
    — O(frame size) task memory per row, a skew bomb when one
    event_type has a hot 5-minute burst at 100 TB. The HLL++ window
    aggregate keeps ONE bounded sketch buffer per frame evaluation
    instead: memory is O(2^p) constant, never O(frame). CPU is still
    O(frame) per row (window aggregates without retract support
    re-accumulate), so the streaming s02-style state is the ultimate
    answer for unbounded frames — this is the batch middle ground.

    Correctness: rows-only for the driver (DuckDB has no HLL++ twin by
    construction, same as z_b13); tests/test_plans.py gates the plan
    (no collect_list anywhere) and tests/test_scale_patterns.py
    bounds the relative error vs the exact twin.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("user_id").isNotNull()).select(
        "event_id", "event_type", "user_id", F.unix_micros("ts").alias("t")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t")
        .rangeBetween(-B54_WINDOW_US, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.approx_count_distinct("user_id", 0.02)
        .over(w)
        .alias("n_users_5min_approx"),
    ).orderBy("event_id")


@query(
    "b99_running_distinct_count",
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, {EVENTS_TS_SQL} AS ts FROM events
    ),
    f AS (
      SELECT event_id, user_id, ts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type ORDER BY ts, event_id
                  ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM e
    )
    SELECT event_id, user_id, first_seen,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS distinct_so_far
    FROM f
    ORDER BY user_id, ts, event_id
    """,
)
def running_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B99: running COUNT(DISTINCT) per key — the number of distinct
    event types each user has produced *so far* at every event.

    Neither Spark nor DuckDB allows DISTINCT inside a window frame, and
    the naive collect_set-over-frame is the exact O(frame) memory bomb
    b56 documents. The scalable spelling is the standard two-step:
    (1) a first-seen flag (row_number()==1 over (user, type)), then
    (2) a running SUM of the flag over (user). Both windows are keyed
    on the user axis, so state per partition is bounded by one user's
    history, and each step is one exchange + sort — no per-row set
    materializes anywhere.

    Scale shape: two exchanges ((user,type) then (user)); at 100 TB
    both keys are high-cardinality so partitions stay small. The flag
    is 1 bit per row — the shuffle carries no payload beyond the keys.
    """
    ev = load_table(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.row_number().over(w_first) == 1).cast("int").alias("first_seen"),
    )
    return (
        flagged.select(
            "event_id",
            "user_id",
            "first_seen",
            F.sum("first_seen").over(w_run).cast("long").alias("distinct_so_far"),
            "ts",
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


# b102 EWMA: dyadic weights 2^(H-1-k) for lag k, horizon H=8. Integer
# weights keep the weighted sum exact in decimal; the single final
# double division is IEEE-identical across engines.
B102_HORIZON = 8


@query(
    "b102_ewma_trailing",
    f"""
    WITH e AS (
      SELECT event_id, user_id, value, {EVENTS_TS_SQL} AS ts FROM events
    ),
    lagged AS (
      SELECT event_id, user_id, ts,
             {", ".join(
                 f"lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v{k}"
                 for k in range(8)
             )}
      FROM e
    )
    SELECT event_id, user_id,
           round(CAST(
             {" + ".join(
                 f"COALESCE(CAST(v{k} AS DECIMAL(28,6)) * {1 << (7 - k)}, 0)"
                 for k in range(8)
             )}
           AS DOUBLE) / (
             {" + ".join(
                 f"CASE WHEN v{k} IS NULL THEN 0 ELSE {1 << (7 - k)} END"
                 for k in range(8)
             )}
           ), 6) AS ewma
    FROM lagged
    ORDER BY user_id, ts, event_id
    """,
)
def ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B102: trailing exponentially-weighted moving average per user —
    the smoothing pass behind rate/latency dashboards and per-source
    quality trend tracking.

    True EWMA is an unbounded recursion (y_t = a*x_t + (1-a)*y_{t-1}),
    which no engine's window frame expresses and whose float error
    depends on history length. This is the bounded-horizon spelling
    every production system actually ships: 8 trailing terms with
    dyadic weights 2^(7-k) (= alpha 0.5 truncated at 8 taps,
    renormalized over the terms present). Integer weights x exact
    decimal values make the weighted sum bit-reproducible under any
    partitioning; the one final double division is a single IEEE op.

    Scale shape: ONE exchange on user_id + one sort; all 8 lags share
    the same window spec so Spark evaluates them in a single Window
    operator pass; everything downstream is narrow codegen arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", k).over(w).alias(f"v{k}") for k in range(B102_HORIZON)]
    lagged = ev.select("event_id", "user_id", "ts", *lags)
    num = None
    den = None
    for k in range(B102_HORIZON):
        wgt = 1 << (B102_HORIZON - 1 - k)
        v = F.col(f"v{k}")
        term = F.coalesce(v.cast("decimal(28,6)") * wgt, F.lit(0))
        dterm = F.when(v.isNull(), 0).otherwise(wgt)
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return (
        lagged.select(
            "event_id",
            "user_id",
            F.round(num.cast("double") / den, 6).alias("ewma"),
            "ts",
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


# b105: rolling OLS over a trailing 16-event frame. Time axis is
# integer seconds since the fixture epoch so squared sums stay inside
# BIGINT; value sums ride the decimal detour.
B105_FRAME = 16
B105_EPOCH_S = 1_704_067_200  # 2024-01-01 00:00:00 UTC


@query(
    "b105_rolling_regression",
    f"""
    WITH e AS (
      SELECT event_id, user_id,
             {EVENTS_TS_US_SQL} // 1000000 - {B105_EPOCH_S} AS x,
             value AS y
      FROM events
    ),
    m AS (
      SELECT event_id, user_id,
             COUNT(*) OVER w AS n,
             SUM(x) OVER w AS sx,
             SUM(CAST(y AS DECIMAL(28,6))) OVER w AS sy,
             SUM(CAST(x * y AS DECIMAL(28,6))) OVER w AS sxy,
             SUM(x * x) OVER w AS sxx
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY x, event_id
                   ROWS BETWEEN {B105_FRAME - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, CAST(n AS BIGINT) AS n_points,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / nullif(n * sxx - sx * sx, 0), 6) + 0 AS slope
    FROM m
    ORDER BY user_id, event_id
    """,
)
def rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B105: rolling least-squares trend — the OLS slope of value
    against time over each user's trailing 16 events (the drift
    detector behind rate/latency alerting and data-quality trend
    monitors).

    Exactness: the time axis is integer SECONDS from the fixture epoch
    (micros would overflow the squared sums), so sx/sxx are exact
    BIGINTs; sy/sxy ride the decimal detour; the closed-form slope is
    a fixed-order double expression from exact moments (the b47
    regression discipline inside a window frame). Degenerate frames
    (one event, or all in the same second) yield NULL via the zero
    denominator.

    Scale shape: ONE exchange on user_id + one sort; all five moment
    sums share the same frame so Spark computes them in a single
    Window operator; everything else is narrow arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        (F.expr("unix_micros(ts) div 1000000") - B105_EPOCH_S).alias("x"),
        F.col("value").alias("y"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("x", "event_id")
        .rowsBetween(-(B105_FRAME - 1), W.currentRow)
    )
    m = e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).over(w).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,6)")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    return m.select(
        "event_id",
        "user_id",
        n.cast("long").alias("n_points"),
        # `+ 0` collapses IEEE -0.0 to +0.0 (a flat frame can yield a
        # signed zero in one engine and not the other)
        (
            F.round(
                (n * sxy - sx * sy).cast("double")
                / F.nullif(n * sxx - sx * sx, F.lit(0)),
                6,
            )
            + 0
        ).alias("slope"),
    ).orderBy("user_id", "event_id")
