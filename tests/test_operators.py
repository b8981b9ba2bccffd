"""Unit tests: skew utilities, recursion helper, sources round-trips, and
the Engine facade (DDL/utility surface)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trino_private_spark.catalog import load_table


def test_salted_join_matches_plain_join(spark):
    from trino_private_spark.operators.skew import salted_join

    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    plain = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .collect()[0]
    )
    salted = (
        salted_join(orders, customer, "o_custkey", "c_custkey", salt=4)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .collect()[0]
    )
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_top_keys_shares_sum_below_one(spark):
    from trino_private_spark.operators.skew import top_keys

    orders = load_table(spark, SF_SMOKE, "orders")
    rows = top_keys(orders, "o_orderstatus", n=3).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01  # 3 statuses total


def test_recursive_cte_distinct_mode_terminates(spark):
    from trino_private_spark.operators.recursion import recursive_cte

    # graph reachability with a cycle: 1->2->3->1; distinct mode must stop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src int, dst int"
    )
    base = spark.createDataFrame([(1,)], "node int")

    def step(prev):
        return (
            prev.join(edges, prev["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )

    got = recursive_cte(base, step, max_iterations=10, distinct=True)
    assert sorted(r.node for r in got.collect()) == [1, 2, 3]


def test_sources_roundtrip_formats(spark):
    from trino_private_spark.sources.readers import read_table, write_table

    df = load_table(spark, SF_SMOKE, "nation")
    with tempfile.TemporaryDirectory() as d:
        for fmt in ("parquet", "csv", "json", "orc"):
            path = os.path.join(d, fmt)
            write_table(df, path, fmt=fmt)
            back = read_table(
                spark,
                path,
                fmt=fmt,
                schema="n_nationkey int, n_name string, n_regionkey int"
                if fmt in ("csv", "json")
                else None,
            )
            assert back.count() == df.count(), fmt
            assert set(back.columns) == set(df.columns), fmt


def test_memory_catalog(spark):
    from trino_private_spark.sources.readers import MemoryCatalog

    cat = MemoryCatalog(spark)
    df = load_table(spark, SF_SMOKE, "region")
    cat.create("mem_region", df)
    assert spark.sql("SELECT COUNT(*) c FROM mem_region").collect()[0].c == 5
    cat.insert("mem_region", df)
    assert spark.sql("SELECT COUNT(*) c FROM mem_region").collect()[0].c == 10
    cat.drop("mem_region")
    assert "mem_region" not in [t.name for t in spark.catalog.listTables()]


def test_engine_facade_sql_and_ddl(spark):
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(SF_SMOKE)
    # Trino dialect: FETCH FIRST / OFFSET ... ROWS
    got = eng.sql(
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey "
        "OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY"
    ).collect()
    assert [r.n_nationkey for r in got] == [2, 3, 4]
    # CTAS (lazy view) + SHOW/DESCRIBE
    eng.ctas("big_orders", "SELECT * FROM orders WHERE o_totalprice > 100000")
    assert eng.sql("SELECT COUNT(*) AS c FROM big_orders", dialect="spark").collect()[
        0
    ].c > 0
    assert any(r.tableName == "big_orders" for r in eng.show_tables().collect())
    cols = {r.col_name for r in eng.describe("big_orders").collect()}
    assert "o_orderkey" in cols
    # EXPLAIN returns a plan string
    assert "Physical Plan" in eng.explain("SELECT COUNT(*) FROM orders")


def test_engine_ctas_materialized_and_insert(spark):
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mat")
        eng.ctas("mat_nations", "SELECT * FROM nation", path=path)
        n0 = eng.sql("SELECT COUNT(*) AS c FROM mat_nations", dialect="spark").collect()[0].c
        eng.insert_into(path, "SELECT * FROM nation WHERE n_nationkey < 5")
        back = spark.read.parquet(path)
        assert back.count() == n0 + 5


def test_engine_delete_update_cow(spark):
    """DELETE/UPDATE copy-on-write snapshots (SqlBase.g4:61,160; Hive ACID
    delete deltas in the reference)."""
    import os
    import tempfile

    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "cow_nation")
        eng.create_cow_table("mut_nation", "SELECT * FROM nation", root)
        n0 = spark.table("mut_nation").count()

        deleted = eng.delete_from("mut_nation", "n_nationkey >= 20")
        assert deleted == n0 - 20
        assert spark.table("mut_nation").count() == 20
        # old snapshot untouched (readers of v0 undisturbed)
        assert spark.read.parquet(os.path.join(root, "v0")).count() == n0

        updated = eng.update(
            "mut_nation",
            {"n_name": "upper(n_name)", "n_regionkey": "n_regionkey + 100"},
            "n_nationkey < 5",
        )
        assert updated == 5
        got = {
            r.n_nationkey: (r.n_name, r.n_regionkey)
            for r in spark.table("mut_nation").collect()
        }
        assert all(got[k][0] == got[k][0].upper() and got[k][1] >= 100
                   for k in range(5))
        # rows outside the predicate unchanged
        assert all(got[k][1] < 100 for k in got if k >= 5)
        # no-match mutations do not write a snapshot
        v_before = eng._cow["mut_nation"][2]
        assert eng.delete_from("mut_nation", "n_nationkey = -1") == 0
        assert eng._cow["mut_nation"][2] == v_before
        # vacuum drops superseded snapshots, keeps current
        eng.vacuum("mut_nation")
        assert not os.path.exists(os.path.join(root, "v0"))
        assert spark.table("mut_nation").count() == 20


class TestAvroCodec:
    """Pure-Python Avro binary codec (sources/decoders.py)."""

    SCHEMA = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "ok", "type": "boolean"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "opt", "type": ["null", "string"]},
            {"name": "color", "type": {"type": "enum", "name": "c", "symbols": ["R", "G", "B"]}},
        ],
    }

    def test_roundtrip_all_types(self):
        import json

        from trino_private_spark.sources.decoders import (
            avro_decode_bytes,
            avro_encode,
        )

        val = {
            "id": -(2**40), "name": "héllo", "score": 3.5, "ok": True,
            "tags": ["a", "b", ""], "props": {"x": 1, "y": -2},
            "opt": None, "color": "G",
        }
        assert avro_decode_bytes(avro_encode(val, self.SCHEMA), json.dumps(self.SCHEMA)) == val
        val2 = dict(val, opt="present", id=0, tags=[], props={})
        assert avro_decode_bytes(avro_encode(val2, self.SCHEMA), json.dumps(self.SCHEMA)) == val2

    def test_zigzag_edges(self):
        import json

        from trino_private_spark.sources.decoders import (
            avro_decode_bytes,
            avro_encode,
        )

        s = {"type": "record", "name": "z", "fields": [{"name": "v", "type": "long"}]}
        for v in (0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62)):
            assert avro_decode_bytes(avro_encode({"v": v}, s), json.dumps(s)) == {"v": v}


def test_sequencefile_roundtrip(spark, tmp_path):
    from trino_private_spark.sources.readers import (
        read_sequencefile,
        write_sequencefile,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "k bigint, v string"
    )
    path = str(tmp_path / "seq")
    write_sequencefile(df, path)
    back = read_sequencefile(spark, path, key_col="k", value_col="v")
    assert sorted(map(tuple, back.collect())) == [
        (1, "alpha"),
        (2, "beta"),
        (3, "gamma"),
    ]
