"""Every queries() entry vs its DuckDB oracle at sf0.001 (fast smoke of the
driver's sf0.01 gate; tools/check_oracle.py runs the full-size version)."""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

spec = importlib.util.spec_from_file_location("entrymod", os.path.join(REPO, "__spark_entry__.py"))
entrymod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entrymod)

from pocket_etl_spark.oracle import compare_frames, duckdb_oracle  # noqa: E402

QUERY_NAMES = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    fn = entrymod.queries()[name]
    got = fn(spark, SF_DIR).toPandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        pytest.skip("rows-only query (no SQL oracle)")
    want = duckdb_oracle(sql, SF_DIR)
    problems = compare_frames(got, want)
    assert not problems, f"{name}: {problems}"
