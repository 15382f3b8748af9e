"""Scale-pattern demonstrations: bucketed zero-shuffle joins and
skew-salted aggregation — the two levers the 100 TB deployment pulls
that local fixtures can't exercise by size (SURVEY §7 / C6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_dynamodb_spark.plans import physical_plan
from spark_dynamodb_spark.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; default spark.sql.warehouse.dir
    # under cwd works in local mode.
    return spark


def test_bucketed_join_has_no_shuffle(warehouse, sf_dir):
    """Both sides bucketed by the join key → SortMergeJoin with NO
    Exchange: the co-located fact-fact join that makes lineitem ⋈
    orders shuffle-free at 100 TB."""
    spark = warehouse
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    # A fresh session's in-memory catalog doesn't know about leftover
    # managed-table locations from previous sessions — saveAsTable
    # refuses (LOCATION_ALREADY_EXISTS). Clear them on disk.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("li_bucketed", "orders_bucketed"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    joined = (
        spark.table("li_bucketed")
        .join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy()
        .agg(F.count("*").alias("n"))
    )
    n = joined.collect()[0].n
    assert n > 0
    plan = physical_plan(joined)
    # The join itself must not shuffle either side (bucket co-location);
    # only the final single-group agg exchanges 1 row per partition.
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_salted_aggregation_matches_plain(spark, sf_dir):
    """Two-phase salted aggregation — the manual skew-mitigation
    pattern (salt → partial agg on (key, salt) → final agg on key) —
    must produce identical results to the direct aggregation."""
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.event_type): (r.n, r.total)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    salted = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("pt"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pt").cast("double").alias("total"),
        )
    )
    got = {(r.event_type): (r.n, r.total) for r in salted.collect()}
    assert got == plain


def test_partition_pruning_static(spark, sf_dir, tmp_path):
    """Hive-style date partitioning: a filter on the partition column
    must prune at PLANNING time (PartitionFilters on the scan) — the
    lever that turns a 100 TB table scan into a one-partition read."""
    from spark_dynamodb_spark.plans import explain_str

    out = str(tmp_path / "orders_by_month")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.partitionBy("order_month").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    one_month = back.filter(F.col("order_month") == "1995-03").select(
        F.count("*").alias("n")
    )
    plan = explain_str(one_month)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "order_month" in pf[0], plan
    # and no pushed/data filter needed — pruning is metadata-only
    want = orders.filter(F.col("order_month") == "1995-03").count()
    assert one_month.collect()[0].n == want


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a selective filter on the DIM side prunes the partitioned
    FACT side at runtime (dynamicpruning subquery in the scan) — the
    star-join pattern that avoids scanning 100 TB of non-matching
    partitions."""
    out = str(tmp_path / "li_by_flag")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    # The dim filter must be on a NON-join column: a filter on the join
    # key itself propagates as a static literal (constraint inference)
    # and no runtime pruning is needed — DPP is for filters whose
    # surviving key values are only known at runtime.
    dim = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .filter(F.col("l_linestatus") == "F")
        .select(F.col("l_returnflag").alias("flag"))
        .distinct()
    )
    joined = fact.join(dim, fact.l_returnflag == dim.flag).select(
        F.count("*").alias("n")
    )
    n = joined.collect()[0].n  # execute: AQE finalizes subquery plans
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    want = (
        li.join(
            dim.withColumnRenamed("flag", "f2"), li.l_returnflag == F.col("f2")
        ).count()
    )
    assert n == want


def test_dynamic_partition_overwrite_sink(spark, sf_dir, tmp_path):
    """Partitioned parquet sink with dynamic partition overwrite — the
    idempotent daily-backfill write: rewriting ONE day's partition
    must not truncate the others (static mode would wipe the whole
    table root). This is the batch-sink twin of the s05 streaming
    upsert."""
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
        before = {
            r["event_type"]: r["n"]
            for r in spark.read.parquet(out).groupBy("event_type").agg(
                F.count("*").alias("n")
            ).collect()
        }
        # Backfill exactly the 'click' partition with halved data.
        clicks = (
            load_table(spark, sf_dir, "events")
            .filter((F.col("event_type") == "click") & (F.col("event_id") % 2 == 0))
            .select("event_id", "event_type", "value")
        )
        clicks.write.partitionBy("event_type").mode("overwrite").parquet(out)
        after = {
            r["event_type"]: r["n"]
            for r in spark.read.parquet(out).groupBy("event_type").agg(
                F.count("*").alias("n")
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert after["click"] < before["click"]  # rewritten partition shrank
    for k in before:  # every other partition untouched
        if k != "click":
            assert after[k] == before[k], (k, before[k], after[k])


def test_bloom_filter_runtime_join_pruning(spark, sf_dir):
    """Runtime bloom-filter pushdown: a selective dim filter plants a
    BloomFilterMightContain probe on the fact side of the join, so
    fact rows that can't match die at the scan instead of crossing
    the shuffle — at 100 TB this is the difference between shuffling
    the full fact table and shuffling the matching ~1%. Thresholds
    are lowered only to make the toy fixture eligible; the plan shape
    is what production gets by default."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.adaptive.enabled": "false",  # stable plan to inspect
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = physical_plan(j)
        assert "bloom_filter_agg" in plan or "BloomFilterMightContain" in plan.replace(
            " ", ""
        ), plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_asof_join_excludes_equal_timestamp_click(spark, tmp_path):
    """Strict-< AS-OF semantics on a crafted tie: a click at EXACTLY
    the purchase's timestamp must not attribute (code-review r2: the
    window side-ordering previously leaked equal-ts clicks into the
    strictly-preceding frame). Verified end-to-end against the DuckDB
    ASOF oracle on the same crafted table."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dynamodb_spark.operators.joins import asof_join
    from spark_dynamodb_spark.registry import load_all

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ns(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # user 1: click at t+0, purchase at t+0 (TIE — must NOT match),
        # earlier click at t-60 (must match instead)
        (1, ns(-60), 1, "click", 1.0),
        (2, ns(0), 1, "click", 2.0),
        (3, ns(0), 1, "purchase", 30.0),
        # user 2: only a same-instant click → last_click_id NULL
        (4, ns(5), 2, "click", 4.0),
        (5, ns(5), 2, "purchase", 50.0),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {
        r.event_id: r.last_click_id
        for r in asof_join(spark, str(tmp_path)).collect()
    }
    assert got == {3: 1, 5: None}, got

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = load_all().resolve("b33_asof_join").oracle
    want = {r[0]: r[3] for r in con.execute(oracle).fetchall()}
    assert got == want


def test_range_layout_files_are_disjoint(spark, sf_dir):
    """b61: per-file l_shipdate [min, max] ranges must not overlap —
    the property that lets a time-filtered scan prune whole files."""
    import pyarrow.parquet as pq
    import glob
    import os

    from spark_dynamodb_spark.operators.extras import (
        range_layout_path,
        range_write_layout,
    )

    range_write_layout(spark, sf_dir).collect()  # (re)write the layout
    ranges = []
    for f in glob.glob(os.path.join(range_layout_path(sf_dir), "*.parquet")):
        md = pq.read_metadata(f)
        idx = pq.read_schema(f).names.index("l_shipdate")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1
    ranges.sort()
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi <= blo, (ahi, blo)


def test_distinct_over_window_approx_error_bound(spark, sf_dir):
    """b56b: the HLL++ windowed count stays within 10% relative error
    of the exact frame-list twin (rsd is 2%; 10% leaves slack for
    small frames where HLL++ switches to sparse exact mode)."""
    from spark_dynamodb_spark.operators.windows import (
        distinct_over_window,
        distinct_over_window_approx,
    )

    exact = {
        r["event_id"]: r["n_users_5min"]
        for r in distinct_over_window(spark, sf_dir).collect()
    }
    approx = {
        r["event_id"]: r["n_users_5min_approx"]
        for r in distinct_over_window_approx(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for eid, n in exact.items():
        a = approx[eid]
        assert abs(a - n) <= max(1, 0.10 * n), (eid, n, a)


def test_not_in_one_null_empties_result(spark, sf_dir):
    """b65's semantic cliff, proven on a crafted frame in BOTH engines:
    a single NULL in the NOT IN subquery returns zero rows."""
    import duckdb

    spark.createDataFrame([(1,), (2,)], "k BIGINT").createOrReplaceTempView("probe_v")
    spark.createDataFrame(
        [(1,), (None,)], "k BIGINT"
    ).createOrReplaceTempView("sub_v")
    n_spark = spark.sql(
        "SELECT k FROM probe_v WHERE k NOT IN (SELECT k FROM sub_v)"
    ).count()
    con = duckdb.connect()
    n_duck = con.execute(
        "SELECT count(*) FROM (VALUES (1), (2)) p(k) "
        "WHERE k NOT IN (SELECT * FROM (VALUES (1), (NULL)) s(k))"
    ).fetchone()[0]
    assert n_spark == 0 and n_duck == 0, (n_spark, n_duck)


def test_morton_layout_files_are_disjoint(spark, sf_dir):
    """b86: per-file morton [min, max] ranges must not overlap — the
    z-order clustering property that bounds file touches for scans
    filtered on either interleaved key."""
    import pyarrow.parquet as pq
    import glob
    import os

    from spark_dynamodb_spark.operators.extras import (
        morton_layout_path,
        morton_write_layout,
    )

    morton_write_layout(spark, sf_dir).collect()  # (re)write the layout
    ranges = []
    for f in glob.glob(os.path.join(morton_layout_path(sf_dir), "*.parquet")):
        md = pq.read_metadata(f)
        idx = pq.read_schema(f).names.index("morton")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1
    ranges.sort()
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi <= blo, (ahi, blo)


def test_compaction_collapses_file_count(spark, sf_dir):
    """b94: the compacted layout must have far fewer files than the
    fragmented input, and every file (except possibly stragglers)
    near the size target's implied count."""
    import glob
    import os

    from spark_dynamodb_spark.operators.extras import (
        compaction,
        compaction_paths,
    )

    compaction(spark, sf_dir).collect()
    frag_dir, comp_dir = compaction_paths(sf_dir)
    n_frag = len(glob.glob(os.path.join(frag_dir, "*.parquet")))
    n_comp = len(glob.glob(os.path.join(comp_dir, "*.parquet")))
    assert n_frag == 64
    assert n_comp < n_frag / 4, (n_frag, n_comp)


def test_kmv_estimate_error_bounded(spark, sf_dir):
    """c102: KMV's expected relative standard error at K=256 is
    ~1/sqrt(K-2) ~ 6.3%; assert every per-source estimate lands within
    4 RSE (~25%) — a regression in the estimator (wrong hash space,
    off-by-one in h_(K)) blows far past this."""
    from spark_dynamodb_spark.operators.dedup import kmv_sketch_rollup

    rows = kmv_sketch_rollup(spark, sf_dir).toPandas()
    assert len(rows) > 0
    assert (rows["err_pct"] <= 25.0).all(), rows


def test_cms_overcount_one_sided(spark, sf_dir):
    """c107: count-min can only OVERcount (collisions add, min never
    drops below truth). A negative overcount means the cell table and
    the probe disagree on the hash — the first thing to break if the
    md5 recipe drifts on either side."""
    from spark_dynamodb_spark.operators.text_analysis import countmin_heavy_hitters

    rows = countmin_heavy_hitters(spark, sf_dir).toPandas()
    assert len(rows) == 20
    assert (rows["overcount"] >= 0).all(), rows
    assert (rows["n_est"] >= rows["n_exact"]).all(), rows


def test_edit_distance_two_permutation_recovers_min_token_deletion(spark):
    """c101/c110: the round-9 docstring documented the one-permutation
    miss class — an edit that deletes THE minimum-hash token changes
    the block key and the pair is never a candidate. Round 10's second
    permutation (md5 of token || chr(1)) recovers it: this constructs
    exactly that adversarial pair (premises checked in pure Python
    against the same md5 recipe) and asserts the blocked join still
    finds it."""
    from hashlib import md5 as _pymd5

    from spark_dynamodb_spark.operators.dedup import (
        _ed_prepared,
        _ed_verified_pairs,
    )

    def h1(t: str) -> int:
        return int(_pymd5(t.encode()).hexdigest()[:15], 16)

    def h2(t: str) -> int:
        return int(_pymd5((t + "\x01").encode()).hexdigest()[:15], 16)

    toks = [f"tok{i:02d}" for i in range(30)]
    mn1 = min(toks, key=h1)
    rest = [t for t in toks if t != mn1]
    # premises: deleting the perm-1 minimum breaks the perm-1 block...
    assert min(rest, key=h1) != mn1
    # ...but leaves the perm-2 block intact (its minimum is another token)
    assert min(rest, key=h2) == min(toks, key=h2)

    text_a = " ".join(toks)
    text_b = " ".join(rest)
    docs = spark.createDataFrame(
        [(1, text_a, "en", len(text_a)), (2, text_b, "en", len(text_b))],
        "doc_id long, text string, lang string, n_chars long",
    )
    pairs = _ed_verified_pairs(_ed_prepared(docs)).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)], pairs
