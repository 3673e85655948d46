"""Event-time windows + watermarks: the streaming semantics the reference lacks
(SURVEY.md §2.6 — its answer to lateness is keyed LWW merge; the engine also
offers real watermarked windowed aggregation for metric-style streams)."""

import os
import time

from pyspark.sql import functions as F


def test_watermark_drops_late_rows_and_finalizes_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "user_id long, ts timestamp"

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(os.path.join(src, name))

    # batch 1: two events in the 10:00 hour
    write_batch("b1", [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("win"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _wait_batches(q, 1)
        # batch 2: an event at 12:00 advances the watermark to 11:30,
        # finalizing the 10:00 window
        write_batch("b2", [(1, "2024-01-01 12:00:00")])
        _wait_batches(q, 2)
        # batch 3: a LATE event for the already-finalized 10:00 window — must be
        # dropped, not double-counted
        write_batch("b3", [(1, "2024-01-01 10:20:00")])
        _wait_batches(q, 3)
    finally:
        q.stop()

    out = {r["win"]: r["n"] for r in spark.table("wm_out").collect()}
    # the 10:00 window was emitted exactly once, with the 2 on-time events only
    assert out.get("2024-01-01 10:00:00") == 2
    # the 12:00 window is not finalized (watermark hasn't passed it) → not emitted
    assert "2024-01-01 12:00:00" not in out


def _wait_batches(q, n, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= n:
            # one extra idle tick lets the state-store commit settle
            time.sleep(2)
            return
        time.sleep(0.5)
    raise AssertionError(f"stream did not reach {n} data batches")


def test_streaming_drop_redeliveries(spark, tmp_path):
    """Source-side duplicate elimination (SqsExtractor.java:190-232 analogue):
    an exact re-delivery (same key+lsn) arriving within the watermark delay is
    dropped; a genuinely new event for the same key passes."""
    from pocket_etl_spark.streaming.dedupe import drop_redeliveries

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "repo string, path string, lsn long, ts timestamp"

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, "repo string, path string, lsn long, ts_s string").select(
            "repo", "path", "lsn", F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(os.path.join(src, name))

    write_batch("b1", [("r", "p", 1, "2024-01-01 10:00:00"), ("r", "p", 2, "2024-01-01 10:00:05")])

    stream = drop_redeliveries(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/*"),
        key_cols=["repo", "path"], delay="10 minutes",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _wait_batches(q, 1)
        # re-deliver lsn 2 verbatim (at-least-once) + one genuinely new event
        write_batch("b2", [("r", "p", 2, "2024-01-01 10:00:05"), ("r", "p", 3, "2024-01-01 10:00:10")])
        _wait_batches(q, 2)
    finally:
        q.stop()

    rows = sorted((r["repo"], r["path"], r["lsn"]) for r in spark.table("dedup_out").collect())
    assert rows == [("r", "p", 1), ("r", "p", 2), ("r", "p", 3)]  # lsn 2 exactly once


def test_batch_drop_redeliveries_plain_dedup(spark):
    from pocket_etl_spark.streaming.dedupe import drop_redeliveries

    df = spark.createDataFrame(
        [("r", "p", 1, None), ("r", "p", 1, None), ("r", "q", 1, None)],
        "repo string, path string, lsn long, ts timestamp",
    )
    assert drop_redeliveries(df, key_cols=["repo", "path"]).count() == 2
