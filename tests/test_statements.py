"""Statement routing through Engine.sql() for the session / prepared /
metadata statement surface (SqlBase.g4:90,135,148-149,153-157,159):
SET/RESET SESSION, SET TIME ZONE, PREPARE/EXECUTE/DEALLOCATE,
DESCRIBE INPUT/OUTPUT, SHOW CREATE TABLE, USE."""

from __future__ import annotations

import pytest

from trino_private_spark.api import Engine


@pytest.fixture()
def engine(spark):
    e = Engine(spark)
    e.attach("/root/testdata/sf0.001")
    return e


def test_set_and_show_session(engine):
    engine.sql("SET SESSION query_max_execution_time = '7d'")
    rows = {r["Name"]: r["Value"] for r in engine.sql("SHOW SESSION").collect()}
    assert rows["query_max_execution_time"] == "7d"


def test_reset_session_restores_default(engine):
    engine.sql("SET SESSION query_max_execution_time = '7d'")
    engine.sql("RESET SESSION query_max_execution_time")
    rows = {r["Name"]: (r["Value"], r["Default"])
            for r in engine.sql("SHOW SESSION").collect()}
    v, d = rows["query_max_execution_time"]
    assert v == d


def test_set_time_zone_statement(engine):
    engine.sql("SET TIME ZONE 'America/New_York'")
    assert (
        engine.spark.conf.get("spark.sql.session.timeZone")
        == "America/New_York"
    )
    engine.sql("SET TIME ZONE 'UTC'")
    assert engine.spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_prepare_execute_deallocate_statements(engine):
    engine.sql("PREPARE q1 FROM SELECT n_name FROM nation WHERE n_regionkey = ? ORDER BY n_name")
    got = [r.n_name for r in engine.sql("EXECUTE q1 USING 0").collect()]
    assert got == sorted(got) and len(got) > 0
    # re-execute with a different binding — same plan text
    got2 = [r.n_name for r in engine.sql("EXECUTE q1 USING 1").collect()]
    assert got2 and got2 != got
    engine.sql("DEALLOCATE PREPARE q1")
    with pytest.raises(KeyError):
        engine.sql("EXECUTE q1 USING 0")


def test_execute_string_and_null_literals(engine):
    engine.sql("PREPARE q2 FROM SELECT count(*) AS c FROM nation WHERE n_name = ?")
    n = engine.sql("EXECUTE q2 USING 'NATION_3'").collect()[0].c
    assert n == 1
    # quoted-quote unescaping
    engine.sql("PREPARE q3 FROM SELECT ? AS s")
    assert engine.sql("EXECUTE q3 USING 'it''s'").collect()[0].s == "it's"


def test_describe_input(engine):
    engine.sql(
        "PREPARE q4 FROM SELECT * FROM nation WHERE n_regionkey = ? AND n_name <> ?"
    )
    rows = engine.sql("DESCRIBE INPUT q4").collect()
    assert [r["Position"] for r in rows] == [0, 1]
    assert all(r["Type"] == "unknown" for r in rows)


def test_describe_input_ignores_question_mark_in_string(engine):
    engine.sql("PREPARE q5 FROM SELECT '?' AS lit FROM nation WHERE n_regionkey = ?")
    rows = engine.sql("DESCRIBE INPUT q5").collect()
    assert len(rows) == 1


def test_describe_output(engine):
    engine.sql(
        "PREPARE q6 FROM SELECT n_name, n_regionkey, count(*) AS c "
        "FROM nation GROUP BY n_name, n_regionkey"
    )
    rows = {r["Column Name"]: r["Type"] for r in engine.sql("DESCRIBE OUTPUT q6").collect()}
    assert rows["n_name"] == "varchar"
    assert rows["n_regionkey"] == "integer"
    assert rows["c"] == "bigint"


def test_show_create_table(engine):
    ddl = engine.sql("SHOW CREATE TABLE nation").collect()[0]["Create Table"]
    assert ddl.startswith("CREATE TABLE nation (")
    assert "n_name varchar" in ddl
    assert "n_nationkey integer" in ddl


def test_use_statement(engine):
    engine.sql("USE default")
    assert engine.spark.catalog.currentDatabase() == "default"
    with pytest.raises(ValueError, match="Schema does not exist"):
        engine.sql("USE no_such_schema")


def test_explain_analyze_statement(engine):
    rows = engine.sql(
        "EXPLAIN ANALYZE SELECT count(*) AS c FROM nation"
    ).collect()
    assert len(rows) == 1
    assert "Aggregate" in rows[0]["Query Plan"] or "HashAggregate" in rows[0]["Query Plan"]


def test_comment_on_and_set_path(engine):
    engine.sql("COMMENT ON TABLE nation IS 'the nations'")
    engine.sql("COMMENT ON COLUMN nation.n_name IS 'it''s a name'")
    assert engine._comments["table:nation"] == "the nations"
    assert engine._comments["column:nation.n_name"] == "it's a name"
    engine.sql("COMMENT ON TABLE nation IS NULL")
    assert "table:nation" not in engine._comments
    engine.sql("SET PATH a.b")
    assert engine._sql_path == "a.b"


def test_show_create_view_routes(engine):
    ddl = engine.sql("SHOW CREATE VIEW nation").collect()[0]["Create Table"]
    assert ddl.startswith("CREATE TABLE nation (")


def test_show_stats_for_query(engine):
    rows = {
        r["column_name"]: r
        for r in engine.sql(
            "SHOW STATS FOR (SELECT n_name, n_regionkey FROM nation)"
        ).collect()
    }
    assert rows["n_name"]["distinct_values_count"] == 25.0
    assert rows["n_name"]["nulls_fraction"] == 0.0
    assert rows[None]["row_count"] == 25.0
    assert rows["n_regionkey"]["low_value"] == "0"


def test_trino_type_rendering(engine):
    from pyspark.sql import types as T

    assert Engine._trino_type(T.StringType()) == "varchar"
    assert Engine._trino_type(T.DecimalType(12, 2)) == "decimal(12,2)"
    assert (
        Engine._trino_type(T.ArrayType(T.IntegerType())) == "array(integer)"
    )
    assert (
        Engine._trino_type(
            T.StructType([T.StructField("a", T.LongType())])
        )
        == "row(a bigint)"
    )
    assert (
        Engine._trino_type(T.MapType(T.StringType(), T.DoubleType()))
        == "map(varchar, double)"
    )


def test_show_functions(engine):
    # SHOW FUNCTIONS (SqlBase.g4:145): reference 6-column shape over the
    # mapped Trino-name surface (registry + translate renames)
    df = engine.sql("SHOW FUNCTIONS")
    assert df.columns == [
        "Function", "Return Type", "Argument Types", "Function Type",
        "Deterministic", "Description",
    ]
    names = {r.Function for r in df.collect()}
    assert len(names) >= 190
    assert {"approx_distinct", "strpos", "st_area", "hmac_sha256"} <= names
    like = engine.sql("SHOW FUNCTIONS LIKE 'approx%'").collect()
    assert like and all(r.Function.startswith("approx") for r in like)


def test_ctas_iceberg_partitioned(engine, tmp_path):
    # WITH (partitioning = ARRAY['grp']) analogue: ctas records a real
    # partition spec and the registered view reads back the full result
    loc = str(tmp_path / "ice_ctas")
    engine.ctas(
        "ice_nation_p",
        "SELECT n_nationkey, n_regionkey FROM nation",
        path=loc,
        fmt="iceberg",
        partition_by=["n_regionkey"],
    )
    from trino_private_spark.sources.iceberg import IcebergTable

    t = IcebergTable(loc)
    assert [f.transform for f in t.partition_specs()[0].fields] == ["identity"]
    assert engine.spark.table("ice_nation_p").count() == 25
    out = t.read(engine.spark, partition_filter=[("n_regionkey", "=", 2)])
    assert out.count() == 5 and t.last_scan["scanned_data_files"] == 1


def test_truncate_table_iceberg(engine, tmp_path):
    """TRUNCATE TABLE commits a zero-data-file replace snapshot; the
    pre-truncate snapshot stays time-travelable."""
    from trino_private_spark.sources.iceberg import IcebergTable, read_iceberg

    loc = str(tmp_path / "ice_tr")
    engine.ctas(
        "ice_tr_t", "SELECT n_nationkey FROM nation", path=loc, fmt="iceberg"
    )
    pre = IcebergTable(loc).current_snapshot()["snapshot-id"]
    engine.sql("TRUNCATE TABLE ice_tr_t")
    assert engine.sql("SELECT COUNT(*) AS c FROM ice_tr_t").collect()[0].c == 0
    assert read_iceberg(engine.spark, loc, snapshot_id=pre).count() == 25


def test_truncate_table_cow(engine):
    engine.ctas("cow_tr_t", "SELECT r_regionkey FROM region")
    engine.sql("TRUNCATE TABLE cow_tr_t")
    assert engine.sql("SELECT COUNT(*) AS c FROM cow_tr_t").collect()[0].c == 0


def test_drop_table_iceberg_unregisters(engine, tmp_path):
    import pytest as _pytest

    loc = str(tmp_path / "ice_drop")
    engine.ctas(
        "ice_drop_t", "SELECT n_nationkey FROM nation", path=loc, fmt="iceberg"
    )
    engine.sql("DROP TABLE ice_drop_t")
    with _pytest.raises(Exception, match="(?i)cannot be found|not found"):
        engine.sql("SELECT * FROM ice_drop_t").collect()
    # external-location semantics: the tree stays on disk
    import os as _os

    assert _os.path.isdir(_os.path.join(loc, "metadata"))


def test_create_table_plain_columns(engine, tmp_path):
    """CREATE TABLE name (col type, ...) WITH (...) — the no-AS form:
    an EMPTY Iceberg table of the declared schema; positional INSERT
    coerces to the declared types."""
    loc = str(tmp_path / "ct")
    engine.sql(
        f"CREATE TABLE ct_cols (k bigint, v varchar, d date) "
        f"WITH (format='ICEBERG', partitioning = ARRAY['month(d)'], "
        f"location = '{loc}')"
    )
    assert engine.sql("SELECT COUNT(*) AS c FROM ct_cols").collect()[0].c == 0
    engine.sql(
        "INSERT INTO ct_cols "
        "SELECT n_nationkey, n_name, DATE '2024-03-05' FROM nation"
    )
    df = engine.spark.table("ct_cols")
    assert df.count() == 25
    # coercion: int32 source landed as the declared bigint
    assert dict(df.dtypes)["k"] == "bigint"
    # IF NOT EXISTS on an existing name is a no-op
    engine.sql("CREATE TABLE IF NOT EXISTS ct_cols (x bigint)")
    assert engine.spark.table("ct_cols").count() == 25


def test_show_create_table_renders_iceberg_properties(engine, tmp_path):
    loc = str(tmp_path / "ct2")
    engine.sql(
        f"CREATE TABLE ct_props (k bigint, d date) WITH ("
        f"format='ICEBERG', partitioning = ARRAY['month(d)'], "
        f"sorted_by = ARRAY['k'], location = '{loc}')"
    )
    ddl = engine.sql("SHOW CREATE TABLE ct_props").collect()[0][0]
    assert "format = 'ICEBERG'" in ddl
    assert "partitioning = ARRAY['month(d)']" in ddl
    assert "sorted_by = ARRAY['k']" in ddl
    assert f"location = '{loc}'" in ddl


def test_rollback_to_snapshot_iceberg(engine, tmp_path):
    from trino_private_spark.sources.iceberg import IcebergTable

    loc = str(tmp_path / "ct3")
    engine.sql(
        f"CREATE TABLE ct_rb (k bigint) WITH (format='ICEBERG', "
        f"location = '{loc}')"
    )
    engine.sql("INSERT INTO ct_rb SELECT n_nationkey FROM nation")
    snaps = IcebergTable(loc).snapshots()
    assert len(snaps) == 2
    engine.sql(
        f"CALL system.rollback_to_snapshot('ct_rb', "
        f"{snaps[0]['snapshot-id']})"
    )
    assert engine.sql("SELECT COUNT(*) AS c FROM ct_rb").collect()[0].c == 0
    # metadata-only: both snapshots survive, rolling forward works
    assert len(IcebergTable(loc).snapshots()) == 2
    engine.sql(
        f"CALL system.rollback_to_snapshot('ct_rb', "
        f"{snaps[1]['snapshot-id']})"
    )
    assert engine.sql("SELECT COUNT(*) AS c FROM ct_rb").collect()[0].c == 25
