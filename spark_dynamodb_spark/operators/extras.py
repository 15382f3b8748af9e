"""Additional coverage: typed reads (A14), pivot, grouping sets via
the SQL API, sampling, and value-set ops — rounding out SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_dynamodb_spark.functions.exact import dsum, sql_dsum
from spark_dynamodb_spark.registry import query
from spark_dynamodb_spark.tables import load_table


@query(
    "a14_dynamo_typed_read",
    """
    SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
    """,
)
def dynamo_typed_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: user-supplied schema on the dynamo source — the PySpark
    equivalent of ``dynamodbAs[T]`` (schema injected, inference
    skipped; SURVEY §3 entry point 3). The projection to 3 columns
    rides the schema, like a case class with fewer fields."""
    from spark_dynamodb_spark.sources.dynamo import register
    from spark_dynamodb_spark.sources import keyed_store
    from spark_dynamodb_spark.sources.dynamo_queries import _ensure_customer_kv

    table = _ensure_customer_kv(spark, sf_dir)
    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), False),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    return (
        spark.read.format("dynamo")
        .schema(schema)
        .option("tableName", table)
        .option("storeDir", keyed_store.DEFAULT_STORE_DIR)
        .option("columns", "c_custkey,c_acctbal,c_mktsegment")
        .load()
    )


@query(
    "b14_pivot",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on l_linestatus (explicit value list → no extra pass to
    discover values — the scale-safe form)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_F"),
            F.col("O").alias("qty_O"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "b14_grouping_sets_sql",
    f"""
    SELECT coalesce(o_orderstatus, '∅') AS status,
           coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
    ORDER BY status, yr
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (same Catalyst plan
    as the DataFrame rollup/cube — B14's third face)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders_v")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '∅') AS status,
               coalesce(year(o_orderdate), -1) AS yr,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM gs_orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        ORDER BY status, yr
        """
    )


@query(
    "b12_agg_stats",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 8) AS qty_price_corr
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: exact interpolated percentiles (Spark
    `percentile` ≡ DuckDB `quantile_cont` — verified bit-identical),
    stddev/variance/corr rounded to absorb accumulation-order ulps.

    Scale note: exact percentile needs a sort per group — at 100 TB
    use approx_percentile (t-digest) instead; this is the exactness
    baseline for it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
            F.round(F.stddev("l_quantity"), 6).alias("sd_qty"),
            F.round(F.variance("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 8).alias("qty_price_corr"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "b03_sample_deterministic",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE (o_orderkey * 2654435761) % 100 < 10
    ORDER BY o_orderkey
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample via multiplicative hashing on the key —
    the reproducible alternative to rand()-based sampling (which can
    never hash-match across engines or re-runs). At 100 TB this is
    also restart-stable across retried tasks."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderkey") * 2654435761) % 100 < 10)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "b36_unpivot",
    """
    SELECT l_orderkey, l_linenumber, measure, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    )
    WHERE l_orderkey <= 1000
    ORDER BY l_orderkey, l_linenumber, measure
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: unpivot/melt — wide measure columns to (measure, value)
    rows, the inverse of b14_pivot. Spark's native unpivot is a narrow
    row-local expand (no shuffle, no UDF; the oracle spells it as the
    portable UNION ALL). Long-format is what training-metric stores
    and plotting pipelines ingest."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "measure",
            "value",
        )
        .withColumn("measure", F.regexp_replace("measure", "^l_", ""))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@query(
    "b37_recursive_cte",
    """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < DATE '1996-12-01'
    )
    SELECT m AS month_start,
           COUNT(o_orderkey) AS n_orders
    FROM months
    LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
    GROUP BY m
    ORDER BY m
    """,
)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: recursive CTE (Spark 4 WITH RECURSIVE) — a date spine that
    gap-fills months with zero orders, the join no plain GROUP BY can
    produce (absent months simply don't exist in the fact table).
    Time-series training pipelines need the dense spine for windowed
    features. The spine is 24 rows — broadcast side of the join; the
    fact scan aggregates once."""
    orders = load_table(spark, sf_dir, "orders")
    view = "orders_b37_rcte"
    orders.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
          WHERE m < DATE '1996-12-01'
        )
        SELECT m AS month_start,
               COUNT(o_orderkey) AS n_orders
        FROM months
        LEFT JOIN {view} ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m
        ORDER BY m
        """
    )


# --- B51/B52/B53: alternate source formats ---------------------------------
# Round-trip the orders table through CSV / JSON-lines / ORC and
# aggregate the re-read frame. The oracle reads the PARQUET ground
# truth, so a green row proves the format path is lossless (types,
# timestamps, doubles). Staging is per-format+sf under /tmp and
# re-written each call (overwrite — the queries must be rerunnable).

ORDERS_FMT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
       min(o_orderdate) AS first_date,
       max(o_orderkey) AS max_key
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _roundtrip_orders(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    import hashlib
    import tempfile
    import os

    orders = load_table(spark, sf_dir, "orders")
    tag = hashlib.md5(f"{fmt}:{sf_dir}".encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"fmt_rt_{fmt}_{tag}")
    writer = orders.write.mode("overwrite")
    if fmt == "csv":
        # header + explicit timestamp format; doubles use Java's
        # shortest round-trip repr so the re-read is bit-exact.
        writer.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).csv(path)
        back = (
            spark.read.schema(orders.schema)
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .csv(path)
        )
    elif fmt == "json":
        writer.option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).json(path)
        back = (
            spark.read.schema(orders.schema)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .json(path)
        )
    elif fmt == "orc":
        writer.orc(path)
        back = spark.read.orc(path)
    else:  # pragma: no cover
        raise ValueError(fmt)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


@query("b51_csv_roundtrip", ORDERS_FMT_ORACLE)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B51: CSV source/sink round trip — write orders as headered CSV,
    re-read with an explicit schema, aggregate. Green oracle = the
    text path preserves longs, doubles (shortest round-trip repr) and
    microsecond timestamps exactly.

    Scale shape: CSV write/read are narrow per-partition streams; the
    only shuffle is the aggregate's. Schema is explicit — header
    inference on 100 TB would scan files twice."""
    return _roundtrip_orders(spark, sf_dir, "csv")


@query("b52_jsonl_roundtrip", ORDERS_FMT_ORACLE)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B52: JSON-lines source/sink round trip (the interchange format
    of most corpus pipelines) — explicit schema on read, like B51."""
    return _roundtrip_orders(spark, sf_dir, "json")


@query("b53_orc_roundtrip", ORDERS_FMT_ORACLE)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53: ORC columnar round trip — the second columnar format the
    engine reads/writes natively; schema travels with the file."""
    return _roundtrip_orders(spark, sf_dir, "orc")


# ---------------------------------------------------------------------------
# B61 — range-partitioned sorted write layout (round 4)
# ---------------------------------------------------------------------------


def range_layout_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(f"rangelayout:{sf_dir}".encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"range_layout_{tag}")


@query(
    "b61_range_write_layout",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           min(l_orderkey) AS min_key
    FROM lineitem
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def range_write_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B61: the "sorted 100 TB output" story (VERDICT r3 #2e) — write
    lineitem clustered by ship date via repartitionByRange +
    sortWithinPartitions, then aggregate the READ-BACK files. The
    oracle reads the parquet ground truth, so a green row proves the
    clustered layout is lossless.

    Why this layout at scale: range partitioning puts each time slice
    in O(1) files, and the within-file sort gives parquet tight
    min/max column stats on l_shipdate — a later time-filtered scan
    prunes whole files/row-groups instead of reading 100 TB.
    tests/test_scale_patterns.py asserts the per-file min/max ranges
    are actually disjoint, which is the property pruning relies on;
    the RangePartitioning exchange is plan-gated in tests/test_plans.py.

    The sampled range boundaries are data-dependent but RESULT-neutral
    (any boundary split yields the same rows back), so the oracle
    comparison is unaffected by sampling nondeterminism.
    """
    li = load_table(spark, sf_dir, "lineitem")
    path = range_layout_path(sf_dir)
    (
        li.repartitionByRange(16, "l_shipdate")
        .sortWithinPartitions("l_shipdate", "l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
            F.min("l_orderkey").alias("min_key"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# B66 — hive-partitioned write + partition-pruned read (round 4)
# ---------------------------------------------------------------------------


def partitioned_layout_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(f"partlayout:{sf_dir}".encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"part_layout_{tag}")


def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read side of b66, exposed for the plan gate."""
    back = spark.read.parquet(partitioned_layout_path(sf_dir))
    return (
        back.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "b66_partitioned_write_prune",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B66: hive-partitioned output layout — write orders partitioned
    by o_orderpriority (directory per value), then answer a
    priority-filtered aggregate from the read-back. The sibling of
    b61: range-clustering prunes by SORT KEY ranges within files,
    directory partitioning prunes whole DIRECTORIES by exact value —
    the layout every lakehouse table uses for its coarse filter
    column.

    The plan gate (tests/test_plans.py) asserts the filter became a
    PartitionFilter on the scan — 4 of 5 directories are never
    opened, which at 100 TB is the difference between listing a fifth
    of the files and reading everything. The oracle aggregates the
    parquet ground truth, so the round trip (including the
    partition-column type restore) is value-checked.

    Partition-count discipline at scale: o_orderpriority has 5
    values; partitionBy on a HIGH-cardinality key would instead
    produce millions of tiny files — that case belongs to b61's
    range layout.
    """
    orders = load_table(spark, sf_dir, "orders")
    (
        orders.write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(partitioned_layout_path(sf_dir))
    )
    return partition_pruned_scan(spark, sf_dir)


# ---------------------------------------------------------------------------
# B86 — morton (z-order) interleaved write layout (round 4)
# ---------------------------------------------------------------------------

_MORTON_BITS = 8  # 8 bits per dimension -> 16-bit morton code


def _sql_morton(x: str, y: str) -> str:
    """Bit-interleave expression, valid in BOTH Spark SQL and DuckDB:
    morton = Σ ((x>>i)&1)·2^(2i) + ((y>>i)&1)·2^(2i+1). Disjoint bits,
    so plain addition — no OR needed."""
    terms = []
    for i in range(_MORTON_BITS):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


_MORTON_EXPR = _sql_morton("(l_partkey % 256)", "(l_suppkey % 256)")


def morton_layout_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(f"mortonlayout:{sf_dir}".encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"morton_layout_{tag}")


@query(
    "b86_morton_write_layout",
    f"""
    WITH m AS (SELECT *, {_MORTON_EXPR} AS morton FROM lineitem)
    SELECT CAST(morton // 1024 AS BIGINT) AS z_bucket,
           count(*) AS n,
           min(morton) AS min_morton,
           max(morton) AS max_morton,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM m
    GROUP BY z_bucket
    ORDER BY z_bucket
    """,
)
def morton_write_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B86: multi-dimensional clustering — write lineitem z-ordered on
    (l_partkey, l_suppkey) by range-partitioning + sorting on the
    16-bit morton interleave of the two keys, then aggregate the
    READ-BACK files. B61 clusters one dimension; the morton curve
    keeps BOTH keys' locality, so later scans filtered on EITHER key
    touch a small band of files (each key's bits occupy alternating
    positions → a key range maps to O(few) curve segments).

    The oracle computes the identical morton expression on the raw
    table — a green row proves the interleave + layout round-trip is
    lossless. Layout quality (per-file morton ranges disjoint) is
    asserted in tests/test_scale_patterns.py; the RangePartitioning
    exchange is plan-gated.

    Determinism: morton is pure integer bit math, bucket rollups are
    exact; revenue rides the decimal detour.
    """
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "morton", F.expr(_MORTON_EXPR)
    )
    path = morton_layout_path(sf_dir)
    (
        li.repartitionByRange(16, "morton")
        .sortWithinPartitions("morton", "l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy((F.col("morton") / 1024).cast("long").alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("morton").alias("min_morton"),
            F.max("morton").alias("max_morton"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# B93 — observe() pipeline metrics (round 4, parked for round-5)
# ---------------------------------------------------------------------------


@query(
    "b93_observe_metrics",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN l_discount >= 0.05 THEN 1 END) AS BIGINT)
             AS n_discounted,
           {sql_dsum('l_extendedprice')} AS total_price,
           CAST(min(l_shipdate) AS TIMESTAMP) AS first_ship
    FROM lineitem
    WHERE l_quantity >= 30
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B93: df.observe() — accumulator-backed metrics collected AS A
    SIDE EFFECT of an action, the API for pipeline health counters
    (rows written, nulls seen, value ranges) without a second scan.
    The query filters the fact, attaches four observed aggregates,
    drives the action with a foreach sink (row-discarding), and
    returns the observation as a 1-row frame.

    Oracle: the same aggregates computed the ordinary way — proving
    the observed metrics equal a dedicated aggregation pass.

    Scale shape: observe() adds a CollectMetrics node — per-partition
    partial aggregates merged on the driver, zero extra shuffles and
    zero extra scans; exactly why production pipelines use it instead
    of a second count().
    """
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    obs = Observation("b93")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_discount") >= 0.05, 1)).alias("n_discounted"),
        dsum("l_extendedprice", "total_price"),
        F.min("l_shipdate").alias("first_ship"),
    )
    # Drive the action with the row-discarding noop sink. NOT
    # .foreach(): that drops to the RDD path, which bypasses the
    # CollectMetrics node — the metrics never fire and obs.get blocks
    # forever (found the hard way).
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_discounted"],
                float(m["total_price"]),
                m["first_ship"],
            )
        ],
        "n_rows long, n_discounted long, total_price double, first_ship timestamp",
    )


# ---------------------------------------------------------------------------
# B94 — small-file compaction (round 4, parked for round-5)
# ---------------------------------------------------------------------------


def compaction_paths(sf_dir: str) -> tuple[str, str]:
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(f"compaction:{sf_dir}".encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"compaction_{tag}")
    return os.path.join(base, "fragmented"), os.path.join(base, "compacted")


COMPACT_TARGET_BYTES = 8 * 1024 * 1024  # aim ~8 MB files at fixture scale


@query(
    "b94_compaction",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B94: small-file compaction — the housekeeping job every
    streaming/incremental pipeline needs: a deliberately FRAGMENTED
    copy of the fact (64 shards at fixture scale ≙ thousands of
    per-micro-batch files in production) is rewritten into
    size-targeted files (total bytes / target → partition count via
    repartition). Read-back must be lossless — the oracle aggregates
    the ORIGINAL table, so a green row proves both writes preserved
    every row. tests/test_scale_patterns.py asserts the file count
    actually collapsed.

    Scale shape: compaction is one read + one round-robin exchange +
    one write; file count derives from measured input bytes, not a
    magic constant — the same arithmetic at 100 TB yields
    target-sized files regardless of input fragmentation.
    """
    import glob
    import os
    import shutil

    frag_dir, comp_dir = compaction_paths(sf_dir)
    shutil.rmtree(os.path.dirname(frag_dir), ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(frag_dir)
    frag_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(frag_dir, "*.parquet"))
    )
    n_out = max(1, round(frag_bytes / COMPACT_TARGET_BYTES))
    (
        spark.read.parquet(frag_dir)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(comp_dir)
    )
    back = spark.read.parquet(comp_dir)
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# B95 — ANALYZE TABLE statistics + cost-based optimization (round 4)
# ---------------------------------------------------------------------------


def _cbo_tag(sf_dir: str) -> str:
    import hashlib

    return hashlib.md5(f"cbo:{sf_dir}".encode()).hexdigest()[:10]


def cbo_session_and_tables(spark: SparkSession, sf_dir: str):
    """Catalog tables with column statistics + a CBO-enabled session
    (shared by the b95 query and its plan gate)."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.cbo.enabled", "true")
    ns.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    tag = _cbo_tag(sf_dir)
    names = {}
    for t in ("lineitem", "orders", "customer"):
        name = f"b95_{t}_{tag}"
        if not ns.catalog.tableExists(name):
            import shutil
            from urllib.parse import urlparse

            wh = urlparse(ns.conf.get("spark.sql.warehouse.dir")).path
            shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
            load_table(ns, sf_dir, t).write.mode("overwrite").saveAsTable(name)
            ns.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS"
            )
        names[t] = name
    return ns, names


@query(
    "b95_cbo_stats_join",
    f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           {sql_dsum('l_extendedprice')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000.0
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def cbo_stats_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B95: cost-based optimization — ANALYZE TABLE column statistics
    (ndv, min/max, null counts, histograms) feeding Catalyst's CBO
    join-reorder. With stats, the optimizer KNOWS the o_totalprice
    filter keeps only a sliver of orders and sizes/reorders the join
    graph from estimated cardinalities instead of raw file sizes —
    at 100 TB the difference between building a hash table on the
    filtered sliver vs a fact-sized relation. The plan gate asserts
    rowCount statistics actually reach the optimized plan.

    The catalog detour (saveAsTable) exists because path-based
    parquet reads can't carry ANALYZE stats; production tables live
    in a metastore for exactly this reason.
    """
    ns, names = cbo_session_and_tables(spark, sf_dir)
    li, orders, cust = (ns.table(names[t]) for t in ("lineitem", "orders", "customer"))
    return (
        li.join(
            orders.filter(F.col("o_totalprice") > 400000.0),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            dsum("l_extendedprice", "revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "b106_schema_evolution_read",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_with_chars,
           CAST(COALESCE(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END), 0)
                AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B106: schema evolution on read — a corpus written over months
    drifts schema (new columns appear in newer batches); the reader
    must union old and new files without rewriting history. Batch 1
    (even doc_ids) is written WITHOUT n_chars; batch 2 (odd) WITH it;
    the mergeSchema read reconciles to the union schema, nulls filling
    the old files — proven by per-lang counts of present/absent cells
    against the fixture-derived oracle.

    Scale shape: mergeSchema=true footer reconciliation is a driver-
    side planning cost (at 100 TB pin the merged schema explicitly or
    via a table catalog once known — same read path); the aggregation
    itself is one combinable rollup. Directory layout is the
    append-only batch pattern (one subdir per ingestion batch).
    """
    import hashlib
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    tag = hashlib.md5(f"schemaevo:{sf_dir}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"schema_evo_{tag}")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars")
    v1.write.mode("overwrite").parquet(os.path.join(root, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(root, "batch=2"))
    back = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(root)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("n_chars").cast("long").alias("n_with_chars"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "b108_incremental_agg_maintenance",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B108: incremental aggregate maintenance — the materialized-view
    refresh pattern that makes 100 TB dashboards feasible: keep the
    aggregate's PARTIAL STATE (count + exact decimal sum per group) as
    a stored table, and on new data merge agg(delta) into it instead
    of rescanning history. Here: the "historical" 2/3 of orders is
    pre-aggregated and written out; the arriving 1/3 is aggregated
    alone; the answer merges the two partial states — and must equal
    the full recompute (the oracle) EXACTLY, which is precisely what
    the decimal detour buys (double partials would drift under
    re-associating the merge).

    Scale shape: the stored state is group-cardinality-sized; the
    refresh touches only the delta + the state — history is never
    re-read. Counts and decimal sums are the canonical commutative
    merge pair (AVG rebuilt as sum/count at read time).
    """
    import hashlib
    import os
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    hist = orders.filter(F.col("o_orderkey") % 3 != 0)
    delta = orders.filter(F.col("o_orderkey") % 3 == 0)
    tag = hashlib.md5(f"ivm:{sf_dir}".encode()).hexdigest()[:10]
    state_path = os.path.join(tempfile.gettempdir(), f"agg_state_{tag}")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("sum_price"),
        )

    partial(hist).write.mode("overwrite").parquet(state_path)
    state = spark.read.parquet(state_path)
    merged = (
        state.unionByName(partial(delta))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("sum_price").alias("sum_price"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("sum_price").cast("double").alias("total_price"),
    ).orderBy("o_orderpriority")


@query(
    "b121_delta_join_maintenance",
    f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS total_price
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def delta_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B121: incremental JOIN-view maintenance — b108's sibling for a
    joined materialized view. The algebra: with inserts ΔA into A and
    ΔB into B,  A'⋈B' = (A⋈B) ∪ (ΔA⋈B') ∪ (A⋈ΔB);  aggregate each
    term to partial states and merge. History (A⋈B) is read from the
    stored state, never re-joined — the property that keeps a 100 TB
    joined dashboard refreshable in delta-sized time.

    Exactness: partial states carry count + exact decimal sum, the
    commutative merge pair, so the merged result equals the oracle's
    full recompute bitwise regardless of which term a row arrived in.

    Scale shape: the stored state is group-cardinality-sized; the
    refresh joins only delta-sized inputs against the current other
    side (broadcast when small); history cost is ZERO at refresh
    time.
    """
    import hashlib
    import os
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a_old = orders.filter(F.col("o_orderkey") % 4 != 0)
    da = orders.filter(F.col("o_orderkey") % 4 == 0)
    b_old = cust.filter(F.col("c_custkey") % 5 != 0)
    db = cust.filter(F.col("c_custkey") % 5 == 0)

    def partial(o: DataFrame, c: DataFrame) -> DataFrame:
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias(
                    "sum_price"
                ),
            )
        )

    tag = hashlib.md5(f"djm:{sf_dir}".encode()).hexdigest()[:10]
    state_path = os.path.join(tempfile.gettempdir(), f"join_state_{tag}")
    partial(a_old, b_old).write.mode("overwrite").parquet(state_path)
    state = spark.read.parquet(state_path)

    refreshed = (
        state.unionByName(partial(da, cust))  # ΔA ⋈ B'
        .unionByName(partial(a_old, db))  # A ⋈ ΔB
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("sum_price").alias("sum_price"),
        )
    )
    return refreshed.select(
        "c_mktsegment",
        "n_orders",
        F.col("sum_price").cast("double").alias("total_price"),
    ).orderBy("c_mktsegment")


@query(
    "b122_write_audit_publish",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           TRUE AS audits_passed
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B122: write-audit-publish (WAP) — the production pattern for
    mutating a 100 TB table safely: write the new snapshot to a STAGED
    location, run audits against the staged files (never the live
    table), and only then flip an atomic pointer so readers see v_new
    all-or-nothing. A failed audit leaves the live table untouched.

    Audits here: staged row count equals the source's group count, no
    NULL group keys, and the staged counts re-total to the source row
    count — the standard volume/nullability/reconciliation trio.

    The publish is a single atomic rename of a pointer file (the
    filesystem stand-in for a catalog swap / Iceberg snapshot commit);
    the returned result is read through the PUBLISHED pointer, so a
    green row proves the flip happened and exposed exactly the audited
    data. Oracle = the same aggregate computed directly on the source.
    """
    import hashlib
    import os
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    snap = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("sum_price"),
    )
    tag = hashlib.md5(f"wap:{sf_dir}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"wap_{tag}")
    staged_dir = os.path.join(root, "snapshot_v2")
    snap.write.mode("overwrite").parquet(staged_dir)

    # --- audit phase: staged files only, live pointer untouched ---
    staged = spark.read.parquet(staged_dir)
    expected_groups = orders.select("o_orderpriority").distinct().count()
    total_src = orders.count()
    n_rows = staged.count()
    n_null_keys = staged.filter(F.col("o_orderpriority").isNull()).count()
    # reconciliation expressed as a zero-violations check — a scalar
    # decision via count(), the same driver-side shape as the c02
    # convergence test (no row data crosses to the driver)
    n_bad_total = (
        staged.agg(F.sum("n_orders").alias("t"))
        .filter(F.col("t") != total_src)
        .count()
    )
    audits_passed = (
        n_rows == expected_groups and n_null_keys == 0 and n_bad_total == 0
    )
    if not audits_passed:
        raise RuntimeError(
            f"WAP audit failed — snapshot NOT published "
            f"(rows={n_rows}/{expected_groups}, nulls={n_null_keys}, "
            f"total_mismatch={n_bad_total})"
        )

    # --- publish phase: atomic pointer flip ---
    tmp_ptr = os.path.join(root, "_CURRENT.tmp")
    with open(tmp_ptr, "w") as f:
        f.write("snapshot_v2")
    os.replace(tmp_ptr, os.path.join(root, "_CURRENT"))

    # --- read through the published pointer ---
    with open(os.path.join(root, "_CURRENT")) as f:
        current = f.read().strip()
    published = spark.read.parquet(os.path.join(root, current))
    return published.select(
        "o_orderpriority",
        "n_orders",
        F.col("sum_price").cast("double").alias("total_price"),
        F.lit(True).alias("audits_passed"),
    ).orderBy("o_orderpriority")


@query(
    "b132_time_travel_read",
    f"""
    SELECT 1 AS version, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT 2 AS version, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    ORDER BY version
    """,
)
def time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B132: snapshot time travel — the read-side complement of b122's
    write-audit-publish. Two committed snapshots (v1 = the half-loaded
    earlier state, v2 = the full table) live under a version log (one
    manifest line per commit, pointer-file discipline); a reader asks
    for VERSION AS OF n and gets that snapshot's files, immutably,
    regardless of later commits. The returned row set reads BOTH
    versions through the log and proves isolation: v1's totals are
    unchanged by v2's commit. Oracle recomputes both states from the
    source directly.

    Scale shape: snapshots are written once (combinable rollups);
    version resolution reads a tiny manifest, never lists data files;
    each AS-OF read scans only that snapshot's files — time travel
    costs metadata, not data (the Iceberg/Delta snapshot-log
    contract, filesystem stand-in).
    """
    import hashlib
    import json
    import os
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    tag = hashlib.md5(f"tt:{sf_dir}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"tt_{tag}")
    log_path = os.path.join(root, "_VERSIONS.json")

    def _commit(version: int, df) -> None:
        snap_dir = os.path.join(root, f"v{version}")
        df.write.mode("overwrite").parquet(snap_dir)
        log = []
        if os.path.exists(log_path):
            with open(log_path) as f:
                log = json.load(f)
        log = [e for e in log if e["version"] != version]
        log.append({"version": version, "path": f"v{version}"})
        tmp = log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(log, key=lambda e: e["version"]), f)
        os.replace(tmp, log_path)

    def _as_of(version: int):
        with open(log_path) as f:
            log = json.load(f)
        entry = max(
            (e for e in log if e["version"] <= version),
            key=lambda e: e["version"],
        )
        return spark.read.parquet(os.path.join(root, entry["path"]))

    agg = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("sp"),
    )
    _commit(1, agg(orders.filter(F.col("o_orderkey") % 2 == 0)))
    _commit(2, agg(orders))

    v1 = _as_of(1).select(
        F.lit(1).alias("version"),
        "n_orders",
        F.col("sp").cast("double").alias("total_price"),
    )
    v2 = _as_of(2).select(
        F.lit(2).alias("version"),
        "n_orders",
        F.col("sp").cast("double").alias("total_price"),
    )
    return v1.unionAll(v2).orderBy("version")
