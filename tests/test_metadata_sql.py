"""SQL access to Iceberg metadata tables via the reference's quoted
suffix syntax — SELECT ... FROM "t$snapshots" / "t$files" / ...
(plugin/trino-iceberg TableType suffixes resolved in
IcebergMetadata.getTableHandle). Unknown names/kinds stay untouched and
fail loudly downstream."""

from __future__ import annotations

import tempfile

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    from trino_private_spark.api import Engine

    e = Engine(spark)
    e.attach(SF)
    loc = tempfile.mkdtemp(prefix="tps_mdsql_") + "/t"
    e.ctas(
        "ice_md",
        "SELECT n_nationkey, n_name FROM nation",
        path=loc, fmt="iceberg",
    )
    return e


def test_snapshots_table(eng):
    rows = eng.sql('SELECT * FROM "ice_md$snapshots"').collect()
    assert len(rows) == 1 and rows[0]["operation"] == "append"


def test_files_join_with_history(eng, spark):
    n = eng.sql(
        'SELECT SUM(f.record_count) AS n FROM "ice_md$files" f '
        'JOIN "ice_md$snapshots" s ON f.sequence_number <= '
        "s.sequence_number WHERE f.content = 0"
    ).collect()[0]["n"]
    assert n == spark.table("ice_md").count()


def test_dml_then_metadata_reflects(eng, spark):
    eng.sql("DELETE FROM ice_md WHERE n_nationkey = 0")
    ops = [
        r["operation"]
        for r in eng.sql(
            'SELECT operation FROM "ice_md$snapshots" '
            "ORDER BY committed_at"
        ).collect()
    ]
    assert ops[0] == "append" and "delete" in ops


def test_unknown_kind_fails_loudly(eng):
    with pytest.raises(Exception):
        eng.sql('SELECT * FROM "ice_md$bogus"').collect()


def test_unregistered_name_untouched(eng):
    with pytest.raises(Exception):
        eng.sql('SELECT * FROM "nosuch$files"').collect()


def test_dollar_ref_inside_string_literal_is_data(eng):
    rows = eng.sql(
        "SELECT '\"ice_md$files\"' AS s FROM ice_md WHERE n_nationkey = 1"
    ).collect()
    assert rows[0]["s"] == '"ice_md$files"'
