"""Hierarchical timer tree (EtlProfilingScope.java:47-128 analogue) and its
integration with apply_batch lineage."""

import json
import time

from pocket_etl_spark.profiling import Profiler


def test_scopes_nest_and_roll_up():
    prof = Profiler()
    with prof.scope("run"):
        with prof.scope("extract"):
            time.sleep(0.02)
        with prof.scope("load"):
            with prof.scope("write_parts"):
                time.sleep(0.02)
    [run] = prof.tree()
    assert run["name"] == "run"
    names = [c["name"] for c in run["children"]]
    assert names == ["extract", "load"]
    # rollup invariant: parent elapsed >= sum of children; self = the gap
    child_sum = sum(c["elapsed_sec"] for c in run["children"])
    assert run["elapsed_sec"] >= child_sum
    # tree() rounds elapsed/self to 6 decimals independently, so the rollup
    # identity only holds to ~2 ulps of that rounding.
    assert abs(run["self_sec"] - (run["elapsed_sec"] - child_sum)) < 5e-6
    load = run["children"][1]
    assert load["children"][0]["name"] == "write_parts"

    flat = prof.flat()
    assert set(flat) == {"run", "run.extract", "run.load", "run.load.write_parts"}
    assert flat["run.load"] >= flat["run.load.write_parts"]


def test_apply_batch_records_phase_timings(spark, tmp_path):
    from pocket_etl_spark.cdc.apply import apply_batch
    from pocket_etl_spark.datagen import gen_change_events
    from pocket_etl_spark.lake import ParquetLakeTable

    events = gen_change_events(spark, n_events=500, n_keys=50, seed=11)
    table = ParquetLakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    res = apply_batch(events, table, batch_id=0, lineage=True)
    for phase in ("dlq_split", "batch_stats", "lineage_stats", "merge", "lineage_write"):
        assert phase in res.timings, res.timings
        assert res.timings[phase] >= 0
    # the lineage document carries the same tree (merge timing known by then)
    doc = json.load(open(res.lineage_path))
    assert doc["timings"]["merge"] == res.timings["merge"]
