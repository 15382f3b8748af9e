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
