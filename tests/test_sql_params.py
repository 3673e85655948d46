"""Parameterized SQL extraction + unknown-column tunnelling.

Ports the reference's SQL-parameter functional tests, including the
SQL-injection regression (SqlExtractorFunctionalTest.java:90-119: a hostile
parameter value must bind as data, never alter the statement), and the
EtlBeanMapper unknown-column catch-all (EtlBeanMapper.java:46-49,100-112)."""

import pytest

from pocket_etl_spark.etl import BufferLoader, EtlStream
from pocket_etl_spark.sources import (
    CsvExtractor,
    JsonExtractor,
    SqlExtractor,
    bind_sql_params,
    encode_sql_literal,
    rewrite_hash_params,
)

ROWS = [
    {"name": "alice", "role": "admin", "score": 10},
    {"name": "bob", "role": "user", "score": 7},
    {"name": "mallory", "role": "user", "score": 1},
]


@pytest.fixture()
def people(spark):
    spark.createDataFrame(ROWS).createOrReplaceTempView("people")
    yield
    spark.catalog.dropTempView("people")


def test_sql_extractor_named_params(spark, people):
    src = SqlExtractor(
        "SELECT name, score FROM people WHERE role = #role AND score >= #min_score",
        args={"role": "user", "min_score": 5},
    )
    got = src.to_df(spark).collect()
    assert [r["name"] for r in got] == ["bob"]


def test_sql_extractor_injection_regression(spark, people):
    """The reference's injection test: a value crafted to escape its literal
    must be treated as DATA. With ' OR '1'='1 spliced raw, the predicate
    becomes a tautology and returns all rows — parameter binding must return
    zero instead."""
    hostile = "nobody' OR '1'='1"
    src = SqlExtractor(
        "SELECT name FROM people WHERE name = #who", args={"who": hostile}
    )
    assert src.to_df(spark).count() == 0
    # sanity: the same value spliced raw WOULD have matched everything
    tautology = spark.sql(
        f"SELECT name FROM people WHERE name = '{hostile}'"
    )
    assert tautology.count() == len(ROWS)


def test_rewrite_hash_params_skips_string_literals():
    assert (
        rewrite_hash_params("SELECT '#not_a_param', c FROM t WHERE k = #k")
        == "SELECT '#not_a_param', c FROM t WHERE k = :k"
    )


def test_bind_sql_params_literal_encoding(spark, people):
    """The JDBC-path literal binder: hostile quote AND trailing-backslash
    payloads stay inside their literal when Spark parses the bound statement."""
    for hostile in ["x' OR '1'='1", "x\\", "x\\' OR 1=1 --"]:
        bound = bind_sql_params(
            "SELECT name FROM people WHERE name = #who", {"who": hostile}
        )
        assert spark.sql(bound).count() == 0, bound
    # round-trips normal values and IN-lists
    bound = bind_sql_params(
        "SELECT name FROM people WHERE role IN #roles AND score > #n",
        {"roles": ["user", "ops"], "n": 2},
    )
    assert spark.sql(bound).count() == 1
    with pytest.raises(KeyError):
        bind_sql_params("SELECT #missing", {})


def test_encode_sql_literal_types():
    assert encode_sql_literal(None) == "NULL"
    assert encode_sql_literal(True) == "TRUE"
    assert encode_sql_literal(3) == "3"
    assert encode_sql_literal("a'b") == "'a''b'"
    assert encode_sql_literal(["a", 1]) == "('a', 1)"


# --- unknown-column tunnelling (EtlBeanMapper secondary-mapper analogue) ---


def test_csv_unknown_columns_tunnel_through_pipeline(spark, tmp_path):
    """An undeclared CSV column survives a two-stage pipeline inside the
    extras map — the dynamic-Map property of EtlBeanMapper.java:100-112."""
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("name,score,shard\nx,1,s1\ny,2,s2\n")
    src = CsvExtractor(p, schema="name string, score int", extras_col="extras")
    buf = BufferLoader()
    (
        EtlStream.extract(src)
        .transform(lambda df: df.filter("score >= 1"), name="keep")
        .transform(lambda df: df.withColumn("score2", df.score * 2), name="double")
        .load(buf)
        .run(spark)
    )
    by_name = {r["name"]: r for r in buf.rows}
    assert by_name["x"]["extras"] == {"shard": "s1"}  # tunnelled through both stages
    assert by_name["y"]["extras"] == {"shard": "s2"}
    assert by_name["x"]["score2"] == 2  # declared columns still typed (int math)


def test_json_unknown_keys_tunnel(spark, tmp_path):
    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write('{"name": "x", "score": 3, "region": "eu", "tier": "gold"}\n')
        f.write('{"name": "y", "score": 4}\n')
    df = JsonExtractor(
        p, schema="name string, score int", extras_col="extras"
    ).to_df(spark)
    rows = {r["name"]: r for r in df.collect()}
    assert rows["x"]["score"] == 3
    assert rows["x"]["extras"] == {"region": "eu", "tier": "gold"}
    assert rows["y"]["extras"] == {}


def test_iceberg_watermark_binds_hostile_query_id(spark, tmp_path):
    """VERDICT r2 #3: last_batch_id/_advance_watermark must bind query_id as a
    named parameter, never interpolate it — a query id full of quote/backslash
    hostility round-trips intact and cannot alter the statement. Runs the
    EXACT watermark SQL with table_format='parquet' (same statements, no
    Iceberg jar needed)."""
    from pocket_etl_spark.lake import IcebergLakeTable

    t = IcebergLakeTable(spark, "wm_hostile_qid", table_format="parquet")
    try:
        evil = "q'; DROP TABLE wm_hostile_qid_watermarks; --\\' OR '1'='1"
        t._advance_watermark(evil, batch_id=7, version=1)
        t._advance_watermark("plain", batch_id=3, version=2)
        assert t.last_batch_id(evil) == 7
        assert t.last_batch_id("plain") == 3
        assert t.last_batch_id("absent") == -1
        assert t.current_version() == 2
        # unfenced batch-mode merges advance only the version counter
        t._advance_watermark(None, batch_id=None, version=3)
        assert t.current_version() == 3
        assert t.last_batch_id(evil) == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS wm_hostile_qid_watermarks")


def test_scanner_honors_backslash_escaped_quotes():
    """ADVICE r2: Spark string literals honor backslash escapes by default, so
    a ``\\'`` inside a literal must NOT close it — a ``#name`` after one is
    still literal text and must survive both the rewrite and the bind."""
    sql = r"SELECT '\' #not_a_param', #real FROM t"
    assert rewrite_hash_params(sql) == r"SELECT '\' #not_a_param', :real FROM t"
    assert (
        bind_sql_params(sql, {"real": 7}) == r"SELECT '\' #not_a_param', 7 FROM t"
    )
    # and the degenerate trailing-backslash-in-literal case stays in-string
    sql2 = r"SELECT '\\' || '#x' FROM t"
    assert rewrite_hash_params(sql2) == sql2


def test_encode_sql_literal_rejects_non_finite_floats():
    """ADVICE r2: repr(inf/nan) is not a SQL literal — refuse, don't emit."""
    assert encode_sql_literal(1.5) == "1.5"
    assert encode_sql_literal(1e-7) == "1e-07"
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError):
            encode_sql_literal(bad)


def test_csv_extras_requires_header(spark, tmp_path):
    """ADVICE r2: the extras_col path identifies undeclared columns by header
    name; header=False used to silently consume the first data row as a
    header — now it's an explicit error."""
    p = tmp_path / "x.csv"
    p.write_text("1,a\n2,b\n")
    with pytest.raises(ValueError, match="header"):
        CsvExtractor(
            str(p), schema="id int", header=False, extras_col="extras"
        ).to_df(spark)
