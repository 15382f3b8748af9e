"""Multi-batch streaming semantics the single-batch registry queries
can't show: watermark-driven late-data drops across micro-batches."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """Two files processed as two micro-batches (maxFilesPerTrigger=1):
    batch 1 advances the watermark far ahead; batch 2's stale event
    falls behind the watermark and must be dropped by the windowed agg.
    """
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    indir = tmp_path / "in"
    indir.mkdir()

    def write_file(name: str, rows: list[tuple[int, str, float]]) -> None:
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [dt.datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        pq.write_table(table, str(indir / name))

    # Watermark/eviction timing: batch N runs with the watermark
    # committed at the end of batch N-1, and evicts windows at its own
    # end using that operative watermark. So: f1 opens the 10:00
    # window; f2 (12:00) raises the committed watermark to 11:50; f3
    # runs WITH wm=11:50 and evicts+emits [10:00,11:00)=1.0 at its
    # end; f4's 10:05 straggler then hits an already-evicted window
    # and is dropped by the watermark.
    write_file("f1.parquet", [(1, "2024-01-01 10:00:00", 1.0)])
    time.sleep(1.1)  # file source orders batches by modification time
    write_file("f2.parquet", [(2, "2024-01-01 12:00:00", 1.0)])
    time.sleep(1.1)
    write_file("f3.parquet", [(3, "2024-01-01 12:01:00", 1.0)])
    time.sleep(1.1)
    write_file("f4.parquet", [(4, "2024-01-01 10:05:00", 99.0)])
    base = os.path.getmtime(indir / "f4.parquet")
    for i, f in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        os.utime(indir / f, (base - 30 + i * 10,) * 2)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(indir))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("total"))
    )
    name = "wm_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append emits only finalized windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).collect()
    rows = {r["window"].start.strftime("%H:%M"): r["total"] for r in out}
    # The 10:00 window was finalized at 1.0 before the straggler
    # arrived; the 99.0 late event was dropped, and the window was not
    # re-emitted.
    assert rows.get("10:00") == 1.0, out
    assert sum(1 for r in out if r["window"].start.strftime("%H:%M") == "10:00") == 1
    drops = [
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    assert sum(drops) == 1, drops  # exactly the straggler


def test_stream_batch_window_equivalence(spark, sf_dir):
    """The streamed tumbling-window agg equals the same agg run in
    batch (SURVEY §5: batch-vs-stream window agreement)."""
    from spark_dynamodb_spark.streaming.stream_queries import tumbling_window
    from spark_dynamodb_spark.tables import load_table

    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_window(spark, sf_dir).collect()
    }
    from spark_dynamodb_spark.functions.exact import dsum

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 minute"), "event_type")
            .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        ).collect()
    }
    assert streamed == batch


def test_state_partitions_configurable(spark, sf_dir):
    """spark.dynamo.stream.statePartitions controls the state-store
    task count (VERDICT r1: was a frozen constant); results identical
    at a non-default value."""
    from spark_dynamodb_spark.streaming import stream_queries as sq

    baseline = [tuple(r) for r in sq.tumbling_window(spark, sf_dir).collect()]
    spark.conf.set(sq.STATE_PARTITIONS_CONF, "3")
    try:
        assert sq.state_partitions(spark) == 3
        agg = (
            sq.events_stream(spark, sf_dir)
            .groupBy(F.window("ts", "1 minute"), "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
        out = sq.run_to_table(spark, agg, "complete")
        assert out.count() > 0
        # run_to_table restored the session's shuffle partitioning
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev_shuffle
        got = [tuple(r) for r in sq.tumbling_window(spark, sf_dir).collect()]
        assert got == baseline
    finally:
        spark.conf.unset(sq.STATE_PARTITIONS_CONF)


def test_stream_stream_join_state_eviction_across_batches(spark, tmp_path):
    """Stream-stream interval join drops a click from state once the
    purchase-side watermark passes click_ts + join range: a purchase
    arriving later than that must NOT produce a match (and the state
    metric confirms eviction — without watermark + range the click
    would sit in state forever; s07's scale claim)."""
    import datetime as dt
    import os
    import time
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    indir = tmp_path / "in"
    indir.mkdir()

    def write_file(name: str, rows: list[tuple[int, str, str, int]]) -> None:
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [dt.datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "user_id": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        pq.write_table(table, str(indir / name))

    # Batch 1: click at 10:00 (user 1) + in-range purchase at 10:05
    # (user 2's click has no purchase yet).
    write_file(
        "f1.parquet",
        [
            (1, "2024-01-01 10:00:00", "click", 1),
            (2, "2024-01-01 10:05:00", "purchase", 1),
            (3, "2024-01-01 10:00:00", "click", 2),
        ],
    )
    time.sleep(1.1)
    # Batch 2: fresh traffic at 12:00 ON BOTH SIDES. The global
    # watermark is the MIN across the two withWatermark nodes, and
    # each node only sees rows that pass its side's filter — a click
    # alone would leave the purchase-side watermark at 9:55 and evict
    # nothing. Both advance to 11:50 >> 10:00+10min, evicting the
    # user-2 click from state.
    write_file(
        "f2.parquet",
        [
            (4, "2024-01-01 12:00:00", "click", 9),
            (6, "2024-01-01 12:00:00", "purchase", 8),
        ],
    )
    time.sleep(1.1)
    # Batch 3: any fresh row. State cleanup runs at the END of the
    # batch that holds the advanced operative watermark (joins do not
    # pre-filter late INPUT rows — eviction timing is the only
    # guarantee), so this batch is what physically evicts the user-2
    # click (11:50 > 10:00 + 10 min).
    write_file("f3.parquet", [(7, "2024-01-01 12:01:00", "click", 9)])
    time.sleep(1.1)
    # Batch 4: user-2 purchase arrives at 10:06 — inside the join
    # range but behind the watermark; the matching click is gone.
    write_file("f4.parquet", [(5, "2024-01-01 10:06:00", "purchase", 2)])
    base = os.path.getmtime(indir / "f4.parquet")
    for i, f in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        os.utime(indir / f, (base - 30 + i * 10,) * 2)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(indir))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 10 MINUTES"
        ),
    ).select("click_id", "purchase_id")
    name = "ssj_" + _uuid.uuid4().hex[:8]
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["click_id"], r["purchase_id"]) for r in spark.table(name).collect()}
    # Only the batch-1 in-range match; the late user-2 purchase found
    # evicted state.
    assert got == {(1, 2)}, got
    # State shrank after batch 2's watermark advance (clicks 1 and 3
    # evicted), proving bounded state.
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    assert totals and totals[-1] < max(totals), totals


def test_stream_event_time_matches_batch_loader(spark, sf_dir):
    """Tripwire for fixture ts-type drift (VERDICT r2 bug of the round:
    streaming kept the ns->us div-1000 after the fixtures moved to
    timestamp[us], compressing event time 1000x). Stream the REAL
    fixture through events_stream and assert min/max event-time equals
    the batch loader's — any unit/zone mismatch between the two paths
    fails here before it reaches the driver."""
    from spark_dynamodb_spark.streaming.stream_queries import (
        events_stream,
        run_to_table,
    )
    from spark_dynamodb_spark.tables import load_table

    agg = events_stream(spark, sf_dir).agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    srow = run_to_table(spark, agg, "complete").collect()[0]
    brow = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert (srow.lo, srow.hi) == (brow.lo, brow.hi)
    assert srow.lo.year > 1971, srow.lo  # the 1000x bug lands in Jan 1970


def test_stream_batch_equivalence_sliding_session_join(spark, sf_dir):
    """SURVEY §5 batch-vs-stream agreement for the remaining windowed
    queries: the streamed sliding window (s02), session window (s03)
    and stream-stream interval join (s07) must equal the same logic
    run in batch over the fixture. (s01 has its own test above; the
    driver's DuckDB oracles check values too — this pins the
    batch/stream agreement property itself, independent of DuckDB.)"""
    from spark_dynamodb_spark.functions.exact import dsum
    from spark_dynamodb_spark.streaming.stream_queries import (
        session_window,
        sliding_window,
        stream_stream_join,
    )
    from spark_dynamodb_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    streamed = {
        (r.window_start, r.n_events, r.total_value)
        for r in sliding_window(spark, sf_dir).collect()
    }
    batch = {
        (r.window_start, r.n_events, r.total_value)
        for r in (
            ev.groupBy(F.window("ts", "5 minutes", "1 minute"))
            .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
            .select(
                F.col("window.start").alias("window_start"),
                "n_events",
                "total_value",
            )
        ).collect()
    }
    assert streamed == batch

    streamed_s = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in session_window(spark, sf_dir).collect()
    }
    batch_s = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in (
            ev.groupBy(F.session_window("ts", "30 seconds"), "user_id")
            .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events",
                "total_value",
            )
        ).collect()
    }
    assert streamed_s == batch_s

    streamed_j = {
        (r.click_id, r.purchase_id, r.gap_us)
        for r in stream_stream_join(spark, sf_dir).collect()
    }
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch_j = {
        (r.click_id, r.purchase_id, r.gap_us)
        for r in clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")
            ),
        )
        .select(
            "click_id",
            "purchase_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
                "gap_us"
            ),
        )
        .collect()
    }
    assert streamed_j == batch_j


def test_file_sink_commit_log_hides_uncommitted_files(spark, sf_dir):
    """s13's exactly-once claim: a parquet file in the sink directory
    that is NOT in the _spark_metadata commit log (e.g. debris from a
    crashed/retried batch) must be invisible to readers that go
    through the sink's log."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dynamodb_spark.streaming.stream_queries import (
        file_sink_exactly_once,
        file_sink_path,
    )

    committed = file_sink_exactly_once(spark, sf_dir).collect()
    out_dir, _ = file_sink_path(sf_dir)
    # plant an orphan data file shaped like the sink's schema
    orphan = pa.table(
        {
            "window_start": pa.array([0], pa.timestamp("us")),
            "event_type": pa.array(["ORPHAN"], pa.string()),
            "n_events": pa.array([10**6], pa.int64()),
            "total_value": pa.array([1e9], pa.float64()),
        }
    )
    pq.write_table(orphan, os.path.join(out_dir, "part-orphan.parquet"))
    try:
        back = spark.read.parquet(out_dir)
        types = [r["event_type"] for r in back.select("event_type").distinct().collect()]
        assert "ORPHAN" not in types, types
        # and the aggregate over the committed files is unchanged
        again = file_sink_exactly_once(spark, sf_dir).collect()
        assert committed == again
    finally:
        shutil.rmtree(os.path.dirname(out_dir), ignore_errors=True)


def test_cascaded_windows_across_batches(spark, tmp_path):
    """s14's chain across micro-batches: 5-min windows from TWO
    separate batches must roll up into one hour row, emitted exactly
    once after the watermark closes the hour."""
    import datetime as dt
    import os
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    indir = tmp_path / "in"
    indir.mkdir()

    def write_file(name, rows):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [dt.datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        pq.write_table(table, str(indir / name))

    # hour 10 gets two 5-min windows from two DIFFERENT batches;
    # batch 3 raises the watermark past 11:00 and closes the hour.
    write_file("f1.parquet", [(1, "2024-01-01 10:00:30", 1.0)])
    time.sleep(1.1)
    write_file("f2.parquet", [(2, "2024-01-01 10:07:00", 2.0)])
    time.sleep(1.1)
    write_file("f3.parquet", [(3, "2024-01-01 12:00:00", 4.0)])
    base = os.path.getmtime(indir / "f3.parquet")
    for i, f in enumerate(["f1.parquet", "f2.parquet"]):
        os.utime(indir / f, (base - 20 + i * 10,) * 2)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(indir))
    )
    lvl1 = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.sum("value").alias("v5"))
    )
    lvl2 = (
        lvl1.groupBy(F.window(F.window_time("window"), "1 hour").alias("hw"))
        .agg(F.sum("v5").alias("total"))
    )
    name = "casc_" + uuid.uuid4().hex[:8]
    q = (
        lvl2.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).collect()
    rows = {r["hw"].start.strftime("%H:%M"): r["total"] for r in out}
    assert rows.get("10:00") == 3.0, out  # both batches' 5-min windows
    assert sum(1 for r in out if r["hw"].start.strftime("%H:%M") == "10:00") == 1
    assert "12:00" not in rows, out  # still open, must not emit


def test_dedup_within_watermark_state_expires(spark, tmp_path):
    """s15's semantic difference from plain dropDuplicates: once the
    watermark passes a key's first-seen time + delay, its dedup state
    is dropped — a LATER recurrence of the same key is emitted AGAIN.
    Plain dropDuplicates would suppress it forever."""
    import datetime as dt
    import os
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    indir = tmp_path / "in"
    indir.mkdir()

    def write_file(name, rows):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [dt.datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
        pq.write_table(table, str(indir / name))

    # Eviction timing: batch N evicts at its END using its OPERATIVE
    # watermark (committed at the end of batch N-1). So:
    # f1: key 7 at 10:00 (emitted; dedup state expires at 10:10).
    # f2: 12:00 event → watermark commits to 11:50 after this batch.
    # f3: runs WITH wm=11:50 → key 7's expired state is evicted at
    #     this batch's end.
    # f4: key 7 AGAIN at 12:02 — re-emitted (state gone); the
    #     in-batch duplicate still dedups.
    write_file("f1.parquet", [(7, "2024-01-01 10:00:00")])
    time.sleep(1.1)
    write_file("f2.parquet", [(1, "2024-01-01 12:00:00")])
    time.sleep(1.1)
    write_file("f3.parquet", [(2, "2024-01-01 12:01:00")])
    time.sleep(1.1)
    write_file(
        "f4.parquet",
        [(7, "2024-01-01 12:02:00"), (7, "2024-01-01 12:02:00")],
    )
    base = os.path.getmtime(indir / "f4.parquet")
    for i, f in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        os.utime(indir / f, (base - 30 + i * 10,) * 2)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(indir))
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id"]
    )
    name = "ddww_" + uuid.uuid4().hex[:8]
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).collect()
    emits_for_7 = sorted(r["ts"] for r in out if r["user_id"] == 7)
    assert len(emits_for_7) == 2, out  # 10:00 and the post-expiry 12:00:30
    assert emits_for_7[0].hour == 10 and emits_for_7[1].hour == 12


def test_session_timeout_fires_across_batches(spark, tmp_path):
    """s17: an EventTimeTimeout must actually FIRE when the watermark
    passes an idle session's last-seen + gap (no new data for that
    key), closing the session; a later event for the same user then
    opens session #2."""
    import datetime as dt
    import os
    import time
    import uuid

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from spark_dynamodb_spark.streaming.stream_queries import S17_GAP_MIN

    indir = tmp_path / "in"
    indir.mkdir()

    def write_file(name, rows):
        table = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [dt.datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
        pq.write_table(table, str(indir / name))

    # b1: user 7 opens a session at 10:00 (timeout target 10:30).
    # b2: user 1 at 12:00 → wm commits to 11:50 > 10:30.
    # b3: user 1 at 12:05 → batch runs with wm 11:50; user 7's timer
    #     FIRES (no data for 7 in this batch) → session closes.
    # b4: user 7 again at 12:10 → session #2 opens; final emission for
    #     user 7 must show n_sessions = 2.
    write_file("f1.parquet", [(7, "2024-01-01 10:00:00")])
    time.sleep(1.1)
    write_file("f2.parquet", [(1, "2024-01-01 12:00:00")])
    time.sleep(1.1)
    write_file("f3.parquet", [(1, "2024-01-01 12:05:00")])
    time.sleep(1.1)
    write_file("f4.parquet", [(7, "2024-01-01 12:10:00")])
    base = os.path.getmtime(indir / "f4.parquet")
    for i, f in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        os.utime(indir / f, (base - 30 + i * 10,) * 2)

    gap_us = S17_GAP_MIN * 60 * 1_000_000
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_sessions", T.LongType()),
            T.StructField("open", T.BooleanType()),
            T.StructField("timed_out_calls", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_closed", T.LongType()),
            T.StructField("open_start", T.LongType()),
            T.StructField("open_last", T.LongType()),
            T.StructField("n_timeouts", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n_closed, o_start, o_last, n_to = (
            state.get if state.exists else (0, -1, -1, 0)
        )
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(
                pd.to_datetime(pdf["ts"]).astype("datetime64[us]").astype("int64").tolist()
            )
        if state.hasTimedOut and not ts_all and o_start >= 0:
            n_closed += 1
            o_start, o_last = -1, -1
            n_to += 1
        for t in sorted(ts_all):
            if o_start < 0:
                o_start, o_last = t, t
            elif t - o_last > gap_us:
                n_closed += 1
                o_start, o_last = t, t
            else:
                o_last = t
        state.update((n_closed, o_start, o_last, n_to))
        if o_last >= 0:
            desired = o_last // 1000 + S17_GAP_MIN * 60 * 1000
            state.setTimeoutTimestamp(max(desired, state.getCurrentWatermarkMs() + 1000))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_closed + (1 if o_start >= 0 else 0)],
                "open": [o_start >= 0],
                "timed_out_calls": [n_to],
            }
        )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(indir))
    )
    result = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = "sto_" + uuid.uuid4().hex[:8]
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = [r for r in spark.table(name).collect() if r["user_id"] == 7]
    assert out, spark.table(name).collect()
    final = max(out, key=lambda r: (r["n_sessions"], r["timed_out_calls"]))
    assert final["timed_out_calls"] >= 1, out  # the timer actually fired
    assert final["n_sessions"] == 2, out  # closed session + reopened one


def test_transform_with_state_in_pandas_guarded(spark, sf_dir, tmp_path):
    """Spark 4's transformWithStateInPandas (the successor API to
    s06's applyInPandasWithState) needs `google.protobuf` in the
    Python workers — absent in this container and installs are
    forbidden (COVERAGE.md API-variant note: verified to die in
    _handle_pre_init). This test keeps the capability visible: it
    SKIPS while the dependency is missing and runs a real
    StatefulProcessor count-per-user pipeline (checked against the
    batch groupBy) the moment the environment gains protobuf."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip(
            "google.protobuf not installed - transformWithStateInPandas "
            "workers cannot start (capability covered by "
            "s06_stream_stateful_custom via applyInPandasWithState)"
        )

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from spark_dynamodb_spark.streaming.stream_queries import events_stream

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
        ]
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "n", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    result = (
        events_stream(spark, sf_dir)
        .groupBy("user_id")
        .transformWithStateInPandas(
            CountProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
    q = (
        result.writeStream.format("memory")
        .queryName("tws_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    got = (
        spark.table("tws_counts")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events")
    )
    from spark_dynamodb_spark.tables import load_table

    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_s23_staging_yields_real_microbatches(spark, sf_dir):
    """s23's whole point is INCREMENTAL merging — which only exists if
    the stream actually delivers multiple micro-batches. The staging
    step must produce 4 parquet part files (maxFilesPerTrigger=1 ->
    4 batches), not the fixture's single file (= a single batch, which
    would vacuously 'prove' merge associativity)."""
    import glob
    import os

    from spark_dynamodb_spark.streaming.stream_queries import _docs_stream_staging

    staged = _docs_stream_staging(spark, sf_dir)
    files = [
        f for f in glob.glob(os.path.join(staged, "*.parquet"))
        if os.path.getsize(f) > 0
    ]
    # repartition(n, col) hash-distributes and CAN leave a partition
    # empty; >= 2 non-empty parts is what "real micro-batches" needs
    # (ADVICE r9 — the old == 4 assert over-pinned an unguaranteed
    # property), and <= 4 pins that staging didn't over-split.
    assert 2 <= len(files) <= 4, files


def test_s26_bucket_state_bounded(spark):
    """s26's band-bucket state invariant: a bucket keeps members only
    while its cumulative count is <= cap (dead buckets keep the count,
    drop the ids — so membership storage and per-batch pair work are
    cap-bounded); provenance pairs come only from alive buckets; and
    the gen-time cap is a superset of the final cap (monotone counts),
    which is what makes the final-count filter restore exact one-shot
    semantics independent of the batch split."""
    from spark_dynamodb_spark.streaming.stream_queries import _neardup_bucket_merge

    cap = 3

    def bands(rows):
        return spark.createDataFrame(rows, "doc_id long, band int, key long")

    # batch 1: bucket A gets 2 docs (alive), bucket B gets 3 (at cap)
    b1 = bands([(1, 0, 100), (2, 0, 100), (10, 1, 200), (11, 1, 200), (12, 1, 200)])
    state1, prov1 = _neardup_bucket_merge(None, b1, cap)
    s1 = {(r["band"], r["key"]): r for r in state1.collect()}
    assert sorted(s1[(0, 100)]["ids"]) == [1, 2] and s1[(0, 100)]["cnt"] == 2
    assert sorted(s1[(1, 200)]["ids"]) == [10, 11, 12]
    p1 = {(r["doc_a"], r["doc_b"]) for r in prov1.collect()}
    assert p1 == {(1, 2), (10, 11), (10, 12), (11, 12)}

    # batch 2: bucket A gains 1 (still alive: new-old pairs, no old-old
    # regeneration), bucket B gains 1 (cnt 4 > cap: dies — ids emptied,
    # cnt kept, NO new pairs)
    b2 = bands([(3, 0, 100), (13, 1, 200)])
    state2, prov2 = _neardup_bucket_merge(state1, b2, cap)
    s2 = {(r["band"], r["key"]): r for r in state2.collect()}
    assert sorted(s2[(0, 100)]["ids"]) == [1, 2, 3] and s2[(0, 100)]["cnt"] == 3
    assert s2[(1, 200)]["ids"] == [] and s2[(1, 200)]["cnt"] == 4
    p2 = {(r["doc_a"], r["doc_b"]) for r in prov2.collect()}
    assert p2 == {(1, 3), (2, 3)}

    # batch 3: dead bucket stays dead (monotone) even with one arrival
    b3 = bands([(14, 1, 200)])
    state3, prov3 = _neardup_bucket_merge(state2, b3, cap)
    s3 = {(r["band"], r["key"]): r for r in state3.collect()}
    assert s3[(1, 200)]["ids"] == [] and s3[(1, 200)]["cnt"] == 5
    assert prov3.count() == 0


def test_s26_matches_one_shot_lsh_verdict(spark, sf_dir):
    """s26's final state must value-equal the verdict fold of the
    ONE-SHOT c02 MinHash-LSH pipeline (not just the exact-Jaccard
    oracle): is_dup iff some smaller-id verified partner exists,
    canon = the smallest one — the batch-split-independence contract."""
    from pyspark.sql import functions as F

    from spark_dynamodb_spark.operators.dedup import dedup_minhash_lsh
    from spark_dynamodb_spark.streaming.stream_queries import stream_neardup_state
    from spark_dynamodb_spark.tables import load_table

    got = [tuple(r) for r in stream_neardup_state(spark, sf_dir).collect()]
    pairs = dedup_minhash_lsh(spark, sf_dir)
    partners = pairs.groupBy("doc_b").agg(F.min("doc_a").alias("mn"))
    want_df = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(partners.select(F.col("doc_b").alias("doc_id"), "mn"), "doc_id", "left")
        .select(
            F.col("doc_id").cast("long"),
            F.col("mn").isNotNull().alias("is_dup"),
            F.coalesce("mn", "doc_id").cast("long").alias("canon_id"),
        )
        .orderBy("doc_id")
    )
    want = [tuple(r) for r in want_df.collect()]
    assert got == want and len(got) > 0


def test_s27_pending_buffer_and_exactly_once(spark, sf_dir):
    """s27's staging deliberately writes a DATA shard before the seed
    shard (mtime order), so vectors arrive before the index is trained
    and the pending-buffer path runs on every invocation — pinned here
    via the staged file mtimes. The final state must cover every
    vector exactly once (a pending buffer drained twice, or a batch
    assigned twice, would show as duplicate vec_ids)."""
    import os

    from pyspark.sql import functions as F

    from spark_dynamodb_spark.streaming.stream_queries import (
        _emb_stream_staging,
        stream_ivf_assign_state,
    )
    from spark_dynamodb_spark.tables import load_table

    staged = _emb_stream_staging(spark, sf_dir)
    mt = {
        f: os.stat(os.path.join(staged, f)).st_mtime_ns
        for f in os.listdir(staged)
        if f.endswith(".parquet")
    }
    assert len(mt) == 4, mt
    assert mt["shard1.parquet"] < mt["shard0.parquet"], mt

    out = stream_ivf_assign_state(spark, sf_dir)
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    rows = out.collect()
    assert len(rows) == n_vec
    assert len({r["vec_id"] for r in rows}) == n_vec
    from spark_dynamodb_spark.operators.similarity import NLIST

    assert all(0 <= r["cell"] < NLIST for r in rows)


def test_s28_group_collapse_state_is_rep_quadratic_not_member_quadratic(spark):
    """VERDICT r11 #1's 'done' criterion: for a replica clique of k
    identical docs, s28's state must hold ONE group (not k bucket
    members) and its verified-pair ledger O(reps^2) group pairs (not
    O(k^2) doc pairs). Driven through the real batch transition
    (_s28_group_merge + the shared _neardup_bucket_merge) with a
    60-replica clique split across two batches plus two distinct docs:
    the clique contributes ZERO pairs (one group, no partner), the two
    near-identical distinct docs contribute their single group pair's
    candidate, and bucket member lists hold group ids."""
    import pyspark.sql.functions as F

    from spark_dynamodb_spark.operators.dedup import MAX_BUCKET_DOCS
    from spark_dynamodb_spark.streaming.stream_queries import (
        _neardup_band_rows,
        _neardup_bucket_merge,
        _s28_group_merge,
    )

    words = [f"w{i:03d}" for i in range(40)]
    clique_text = " ".join(words)
    near_text = " ".join(words[:-1] + ["zzz"])  # J >> 0.8 vs clique
    far_text = " ".join(f"q{i:03d}" for i in range(40))

    # reuse the exact query-side signature construction
    from spark_dynamodb_spark.operators.dedup import _shingle_arrays

    def batch_sigs(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return _shingle_arrays(df).select(
            "doc_id",
            F.array_sort(
                F.array_distinct(F.transform("sharr", lambda s: F.xxhash64(s)))
            ).alias("sarr"),
        )

    b1 = batch_sigs([(i, clique_text) for i in range(1, 31)] + [(100, near_text)])
    b2 = batch_sigs(
        [(i, clique_text) for i in range(31, 61)] + [(200, far_text)]
    )

    g1 = _s28_group_merge(None, b1).localCheckpoint(eager=True)
    # 30 clique replicas -> ONE group; near doc -> its own group
    rows1 = {r["gid"]: r for r in g1.collect()}
    assert len(rows1) == 2
    assert rows1[1]["cnt"] == 30 and rows1[1]["rep_id"] == 1
    bands1 = _neardup_band_rows(
        g1.filter("is_new").select(
            F.col("gid").alias("doc_id"), F.col("sarr").alias("harr")
        )
    )
    st1, prov1 = _neardup_bucket_merge(None, bands1, MAX_BUCKET_DOCS)
    st1 = st1.localCheckpoint(eager=True)
    # bucket member lists hold GROUP ids — never more entries than groups
    assert st1.select(F.max(F.size("ids"))).first()[0] <= 2
    # candidate pairs are GROUP pairs: at most {clique-group, near-group}
    p1 = {(r["doc_a"], r["doc_b"]) for r in prov1.collect()}
    assert p1 <= {(1, 100)}

    g2 = _s28_group_merge(g1.drop("is_new"), b2).localCheckpoint(eager=True)
    rows2 = {r["gid"]: r for r in g2.collect()}
    assert len(rows2) == 3
    # 30 more replicas: count bump only, NOT a new group
    assert rows2[1]["cnt"] == 60 and not rows2[1]["is_new"]
    bands2 = _neardup_band_rows(
        g2.filter("is_new").select(
            F.col("gid").alias("doc_id"), F.col("sarr").alias("harr")
        )
    )
    st2, prov2 = _neardup_bucket_merge(st1, bands2, MAX_BUCKET_DOCS)
    # the 60-member clique generated ZERO ledger pairs across both
    # batches (one group, its only near partner is doc 100's group):
    # total candidate work is O(groups^2) = O(9), not O(60^2)
    p_all = p1 | {(r["doc_a"], r["doc_b"]) for r in prov2.collect()}
    assert all(a in (1, 100, 200) and b in (1, 100, 200) for a, b in p_all)
    assert len(p_all) <= 3


def test_s28_matches_s26_verdicts(spark, sf_dir):
    """The two streaming near-dup spellings must produce the SAME
    verdict table — s28 is a state-machinery optimization, not a
    semantics change."""
    from spark_dynamodb_spark.streaming.stream_queries import (
        stream_neardup_state,
        stream_neardup_verdict,
    )

    got26 = [tuple(r) for r in stream_neardup_state(spark, sf_dir).collect()]
    got28 = [tuple(r) for r in stream_neardup_verdict(spark, sf_dir).collect()]
    assert got26 == got28


def test_s29_dynamo_backed_state_matches_s28(spark, sf_dir):
    """Moving the signature-group state into the dynamo keyed store
    must change NOTHING about the verdicts (same shared oracle), and
    the store must end holding exactly the distinct-signature groups
    with batch-put upserts folded (cnt sums to the non-empty-sig doc
    count; rep_id <= gid everywhere since rep only shrinks)."""
    import pyspark.sql.functions as F

    from spark_dynamodb_spark.sources import read_dynamo
    from spark_dynamodb_spark.sources.dynamo_queries import _sf_tag
    from spark_dynamodb_spark.streaming.stream_queries import (
        stream_neardup_dynamo_state,
        stream_neardup_verdict,
    )

    got29 = [tuple(r) for r in stream_neardup_dynamo_state(spark, sf_dir).collect()]
    got28 = [tuple(r) for r in stream_neardup_verdict(spark, sf_dir).collect()]
    assert got29 == got28
    store = read_dynamo(spark, f"neardup_groups_{_sf_tag(sf_dir)}")
    agg = store.agg(
        F.count("*").alias("groups"),
        F.sum("cnt").alias("members"),
        F.max(F.col("rep_id") > F.col("gid")).alias("rep_above_gid"),
        F.count_distinct("sig64").alias("distinct_keys"),
    ).first()
    assert agg["groups"] == agg["distinct_keys"]  # put-replace, no dup items
    assert agg["members"] == 500  # every non-empty-sig doc counted once
    assert not agg["rep_above_gid"]  # rep_id only shrinks from gid


def test_s29_collision_guard_counts_both_violation_classes(spark):
    """Round-15 internals change: s29's collision guard rides the
    batch-put job as observe() metrics over `_s29_collision_flag`
    instead of a dedicated per-batch count() action. Pin that the
    observed sum still counts BOTH violation classes the original
    guard checked — batch-internal duplicate sig64 (k>1 under the
    window) and batch-vs-stored sarr mismatch — and that the metric
    actually fires on a write action (the fusion's whole point)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from spark_dynamodb_spark.streaming.stream_queries import _s29_collision_flag

    m = spark.createDataFrame(
        [
            # clean row: unique key, no stored counterpart
            (1, [1, 2], None),
            # batch-internal collision: sig64=2 on two rows -> 2 bad
            (2, [3, 4], None),
            (2, [5, 6], None),
            # stored-mismatch collision: same key, different sarr -> 1 bad
            (3, [7, 8], [9, 9]),
            # clean row: same key, SAME stored sarr (normal re-merge)
            (4, [1, 9], [1, 9]),
        ],
        "sig64 long, sarr array<bigint>, sarr_stored array<bigint>",
    )
    obs = Observation("s29_guard_test")
    (
        m.withColumn("bad", _s29_collision_flag())
        .observe(obs, F.sum("bad").alias("bad_rows"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    assert obs.get["bad_rows"] == 3


def test_s28_rep_shrinks_when_smaller_replica_arrives_late(spark):
    """Arrival-order independence, the path the ordered fixture
    batches never exercise: a replica with a SMALLER doc_id arriving
    AFTER its clique's gid was minted must shrink rep_id (gid stays
    stable), and the group-floor fold must then mark the original
    minting doc as a dup of the late arrival."""
    import pyspark.sql.functions as F

    from spark_dynamodb_spark.operators.dedup import _shingle_arrays
    from spark_dynamodb_spark.streaming.stream_queries import _s28_group_merge

    text = " ".join(f"w{i:03d}" for i in range(40))

    def batch_sigs(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return _shingle_arrays(df).select(
            "doc_id",
            F.array_sort(
                F.array_distinct(F.transform("sharr", lambda s: F.xxhash64(s)))
            ).alias("sarr"),
        )

    g1 = _s28_group_merge(None, batch_sigs([(100, text)])).localCheckpoint(
        eager=True
    )
    r1 = g1.collect()[0]
    assert (r1["gid"], r1["rep_id"], r1["cnt"], r1["is_new"]) == (100, 100, 1, True)

    g2 = _s28_group_merge(g1.drop("is_new"), batch_sigs([(5, text)])).localCheckpoint(
        eager=True
    )
    r2 = g2.collect()[0]
    # gid STABLE (bucket members and pair ledger stay valid),
    # rep_id SHRUNK (the verdict fold reads this), count folded
    assert (r2["gid"], r2["rep_id"], r2["cnt"], r2["is_new"]) == (100, 5, 2, False)
    # the group-floor fold on this state: doc 100 > floor 5 -> dup of 5;
    # doc 5 == floor -> keeper (exactly the c110 semantics, streamed)
    floor = min(r2["rep_id"], r2["gid"])
    assert floor == 5


def test_s30_matches_one_shot_decontamination(spark, sf_dir):
    """The ingest-time ledger, finalized, must equal the one-shot c10
    corpus-wide decontamination row-for-row (same discipline as
    test_s28_matches_s26_verdicts: the streaming spelling is an
    execution strategy, not new semantics)."""
    from spark_dynamodb_spark.operators.dedup import decontamination
    from spark_dynamodb_spark.streaming.stream_queries import (
        stream_decontamination,
    )

    got = [tuple(r) for r in stream_decontamination(spark, sf_dir).collect()]
    want = [tuple(r) for r in decontamination(spark, sf_dir).collect()]
    assert got == want
    assert len(got) > 0  # the fixture must actually exercise the path


def test_s31_matches_one_shot_serving_rollup(spark, sf_dir):
    """The incrementally merged per-source token ledger must equal the
    per-source rollup of c115's one-shot per-doc serving output —
    streaming is an execution strategy, not new semantics."""
    from pyspark.sql import functions as F

    from spark_dynamodb_spark.operators.text_analysis import tokenizer_encode
    from spark_dynamodb_spark.streaming.stream_queries import (
        stream_tokenize_state,
    )
    from spark_dynamodb_spark.tables import load_table

    got = [tuple(r) for r in stream_tokenize_state(spark, sf_dir).collect()]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    want = [
        tuple(r)
        for r in tokenizer_encode(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("source")
        .collect()
    ]
    assert got == want
    assert len(got) > 1  # multiple sources actually exercised


def test_s33_matches_batch_c09_exactly(spark, sf_dir):
    """s33's streamed pack assignment must equal the batch c09 answer
    row-for-row: the carried per-source base + range-ordered arrival
    reproduces the global prefix-sum. Also pins the staging property
    the equality depends on: ranged stage files carry ascending
    doc_id ranges AND ascending mtimes (FileStreamSource processes
    oldest-first)."""
    import os

    from spark_dynamodb_spark.operators.pipeline import sequence_packing
    from spark_dynamodb_spark.streaming.stream_queries import (
        _docs_stream_staging_ranged,
        stream_pack_assignment,
    )

    staged = _docs_stream_staging_ranged(spark, sf_dir)
    pfiles = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
    assert len(pfiles) >= 2
    mtimes = [os.stat(os.path.join(staged, f)).st_mtime for f in pfiles]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    # ascending doc_id ranges across files
    prev_max = -1
    for f in pfiles:
        ids = [
            r.doc_id
            for r in spark.read.parquet(os.path.join(staged, f))
            .select("doc_id")
            .collect()
        ]
        assert min(ids) > prev_max
        prev_max = max(ids)

    got = {
        r.doc_id: (r.source, r.n_tokens, r.pack_id, r.pack_offset)
        for r in stream_pack_assignment(spark, sf_dir).collect()
    }
    want = {
        r.doc_id: (r.source, r.n_tokens, r.pack_id, r.pack_offset)
        for r in sequence_packing(spark, sf_dir).collect()
    }
    assert got == want


def test_s34_matches_batch_c121_exactly(spark, sf_dir):
    """s34 (round 14): the streamed landing zone — ONE stream running
    decontaminate -> exact dedup -> near-dup verdict -> tokenize ->
    pack with four carried states — must emit the batch capstone
    c121's train-shard manifest row-for-row. The two entries share
    c121's composed five-stage CTE oracle; this test pins the
    Spark-side equality directly so a divergence is attributable
    without the oracle in the loop."""
    from spark_dynamodb_spark.operators.pipeline import train_shards_capstone
    from spark_dynamodb_spark.streaming.stream_queries import (
        stream_landing_zone_capstone,
    )

    got = [tuple(r) for r in stream_landing_zone_capstone(spark, sf_dir).collect()]
    want = [tuple(r) for r in train_shards_capstone(spark, sf_dir).collect()]
    assert len(got) > 0
    assert got == want


def test_s35_consumer_incremental_closure_and_c124_equality(spark, sf_dir):
    """s35 (round 15, VERDICT r14 #2): the streaming shard consumer.

    Three pins: (1) closure is INCREMENTAL — at S35_PACK_BUDGET at
    least one pack closes (and is emitted) strictly before the final
    micro-batch, and no (epoch, key) assignment is ever emitted
    twice across the batch ledger; (2) the in-stream-closed set is
    exactly the batch-independent rule "pack_id < the source's max"
    (each source's last pack only appears in the OPEN state); (3) the
    final state — incremental emissions plus the finalization of the
    still-open packs — equals the batch consumer c124 row-for-row
    when run at c124's production budget."""
    import os
    import shutil
    from collections import Counter

    from spark_dynamodb_spark.operators.pipeline import (
        PACK_BUDGET,
        shard_assignment,
    )
    from spark_dynamodb_spark.streaming.stream_queries import (
        S35_PACK_BUDGET,
        _landing_zone_stream_run,
        _s35_consumer,
        stream_shard_consumer,
    )

    root = _landing_zone_stream_run(
        spark, sf_dir, post_batch=_s35_consumer, pack_budget=S35_PACK_BUDGET
    )
    try:
        closed_dir = os.path.join(root, "closed")
        batches = sorted(os.listdir(closed_dir))
        assert len(batches) >= 2
        per_batch = {
            b: [
                (r.epoch, r.key)
                for r in spark.read.parquet(os.path.join(closed_dir, b)).collect()
            ]
            for b in batches
        }
        # (1) something closed BEFORE the final batch, and once only
        early = [k for b in batches[:-1] for k in per_batch[b]]
        assert early, per_batch
        all_emitted = [k for v in per_batch.values() for k in v]
        dupes = [k for k, n in Counter(all_emitted).items() if n > 1]
        assert not dupes, dupes
        # (2) the open state holds exactly one (max) pack per source
        open_dir = os.path.join(root, "open")
        last_open = spark.read.parquet(
            os.path.join(open_dir, sorted(os.listdir(open_dir))[-1])
        ).collect()
        assert len({r.source for r in last_open}) == len(last_open)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # (3) final state at the production budget == c124 row-for-row
    got = [
        tuple(r)
        for r in stream_shard_consumer(
            spark, sf_dir, with_final=True, pack_budget=PACK_BUDGET
        ).collect()
    ]
    want = [tuple(r) for r in shard_assignment(spark, sf_dir).collect()]
    assert len(got) > 0
    assert got == want


def test_s33_out_of_order_arrival_degrades_to_arrival_order_packing(
    spark, sf_dir
):
    """The s33 docstring's degradation contract, demonstrated (VERDICT
    r13 "What's wrong" #3): feed the SAME code reversed-mtime range
    staging (arrival order = descending doc_id ranges) and the result
    is a valid ARRIVAL-ORDER packing — equal to the c09 greedy applied
    to the permuted order, with identical per-source token totals —
    but a DIFFERENT assignment than the doc_id-ordered batch answer."""
    import os

    from spark_dynamodb_spark.operators.pipeline import (
        PACK_BUDGET,
        sequence_packing,
    )
    from spark_dynamodb_spark.streaming.stream_queries import (
        _stage_docs,
        stream_pack_assignment,
    )

    def _descending_mtimes(stage: str) -> None:
        import time as _time

        base = _time.time() - 7200
        pfiles = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
        for i, f in enumerate(pfiles):
            p = os.path.join(stage, f)
            t = base + 10 * (len(pfiles) - i)
            os.utime(p, (t, t))

    staged = _stage_docs(
        spark, sf_dir, 4, "docs_stream_rev_",
        lambda df: df.repartitionByRange(4, "doc_id"),
        post_fn=_descending_mtimes,
    )
    got = {
        r.doc_id: (r.source, r.n_tokens, r.pack_id, r.pack_offset)
        for r in stream_pack_assignment(spark, sf_dir, staged=staged).collect()
    }
    want_ordered = {
        r.doc_id: (r.source, r.n_tokens, r.pack_id, r.pack_offset)
        for r in sequence_packing(spark, sf_dir).collect()
    }
    assert set(got) == set(want_ordered)  # same docs, nothing lost
    # (a) the degraded result DIFFERS from the doc_id-ordered answer
    assert got != want_ordered
    # (b) it equals the c09 greedy applied to the ARRIVAL order:
    # files oldest-mtime-first, doc_id within each file
    arrival: list[tuple[int, str, int]] = []  # (doc_id, source, n_tokens)
    pfiles = sorted(
        (f for f in os.listdir(staged) if f.endswith(".parquet")),
        key=lambda f: os.stat(os.path.join(staged, f)).st_mtime,
    )
    from spark_dynamodb_spark.functions.text import tokens as tok_fn

    for f in pfiles:
        rows = (
            spark.read.parquet(os.path.join(staged, f))
            .select(
                "doc_id",
                "source",
                F.size(tok_fn("text")).cast("long").alias("n_tokens"),
            )
            .orderBy("doc_id")
            .collect()
        )
        arrival.extend((r.doc_id, r.source, r.n_tokens) for r in rows)
    running: dict[str, int] = {}
    expect: dict[int, tuple[str, int, int, int]] = {}
    for doc_id, source, n_tokens in arrival:
        pre = running.get(source, 0)
        expect[doc_id] = (
            source,
            n_tokens,
            pre // PACK_BUDGET,
            pre % PACK_BUDGET,
        )
        running[source] = pre + n_tokens
    assert got == expect
    # (c) per-source token totals are permutation-invariant
    totals_got: dict[str, int] = {}
    totals_want: dict[str, int] = {}
    for src, n, _, _ in got.values():
        totals_got[src] = totals_got.get(src, 0) + n
    for src, n, _, _ in want_ordered.values():
        totals_want[src] = totals_want.get(src, 0) + n
    assert totals_got == totals_want
    # (d) still a VALID packing: offsets in range
    assert all(0 <= off < PACK_BUDGET for (_, _, _, off) in got.values())
