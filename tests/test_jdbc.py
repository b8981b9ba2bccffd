"""JDBC federation smoke test (plugin/trino-base-jdbc analogue,
sources/readers.read_jdbc) against the Derby embedded database that ships
on Spark's own classpath (jars/derby-*.jar, bundled for the Hive
metastore) — a real in-JVM JDBC round-trip, including the partitioned-read
contract (partitionColumn/lowerBound/upperBound/numPartitions), which is
the part that matters on a 1000-executor cluster: each executor opens its
own connection and reads one slice of the key range."""

from __future__ import annotations

import pytest

from trino_private_spark.sources.readers import read_jdbc


def _derby_available(spark) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("Derby driver not on the Spark classpath")
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db_dir};create=true"
    # seed a table through the JVM-side JDBC DriverManager
    jvm = spark._jvm  # noqa: SLF001
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE t_orders (id INT PRIMARY KEY, amount DOUBLE, tag VARCHAR(16))")
    ps = conn.prepareStatement("INSERT INTO t_orders VALUES (?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setDouble(2, float(i) * 1.5)
        ps.setString(3, "even" if i % 2 == 0 else "odd")
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    return url


def test_jdbc_simple_read(spark, derby_url):
    df = read_jdbc(
        spark, derby_url, "t_orders", driver="org.apache.derby.jdbc.EmbeddedDriver"
    )
    assert df.count() == 100
    assert {c.lower() for c in df.columns} == {"id", "amount", "tag"}


def test_jdbc_partitioned_read(spark, derby_url):
    df = read_jdbc(
        spark,
        derby_url,
        "t_orders",
        partition_column="ID",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    # the partitioned reader opens one slice per partition
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    got = df.groupBy("TAG").count().collect()
    assert {r["TAG"]: r["count"] for r in got} == {"even": 50, "odd": 50}


def test_jdbc_pushdown_subquery(spark, derby_url):
    # Trino pushes predicates into the remote DB; Spark does the same via a
    # dbtable subquery — verify the filtered read
    df = read_jdbc(
        spark,
        derby_url,
        "(SELECT id, amount FROM t_orders WHERE amount > 75.0) q",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert df.count() == 49  # ids 51..99


def test_jdbc_explain_io_entry(spark, derby_url):
    """EXPLAIN (TYPE IO) reports a jdbc entry with pushed filters for
    RowDataSourceScanExec leaves (IoPlanPrinter analogue for the
    federation path)."""
    import json

    from trino_private_spark.plans.explain import explain_typed

    df = read_jdbc(
        spark, derby_url, "t_orders",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).where("id > 10").select("id", "amount")
    io = json.loads(explain_typed(df, "IO"))
    assert io["inputTableInfos"], io
    entry = io["inputTableInfos"][0]
    assert entry["format"] == "jdbc"
    assert "id" in entry.get("pushedFilters", "") or "10" in str(entry)


def test_jdbc_pushed_filters_in_plan(spark, derby_url):
    """Plan-level pushdown contract vs the reference's
    plugin/trino-base-jdbc JdbcMetadata.applyFilter/applyLimit:

    - FILTERS: Spark's (V1) JDBC source compiles supported predicates
      into the remote WHERE clause — the scan leaf's metadata must list
      them under PushedFilters (equivalent of Trino applyFilter).
    - LIMIT: the V1 JDBC relation does NOT push LIMIT into the remote SQL
      (Trino's applyLimit does; Spark only gains that with the DSv2 JDBC
      catalog) — so the plan must show a Spark-side limit ABOVE the scan,
      and this test documents that known delta.
    """
    from trino_private_spark.sources.readers import read_jdbc

    df = (
        read_jdbc(
            spark, derby_url, "t_orders",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        )
        .where("id > 10 AND tag = 'even'")
        .select("id", "amount")
    )
    plan = df._jdf.queryExecution().sparkPlan()  # noqa: SLF001
    leaves = plan.collectLeaves()
    assert leaves.size() == 1
    leaf = leaves.apply(0)
    assert leaf.getClass().getSimpleName() == "RowDataSourceScanExec"
    meta = leaf.metadata()
    it = meta.iterator()
    raw = {}
    while it.hasNext():
        kv = it.next()
        raw[kv._1()] = kv._2()
    pushed = raw.get("PushedFilters", "")
    assert "GreaterThan(ID,10)" in pushed, pushed
    assert "EqualTo(TAG,even)" in pushed, pushed
    # remote result is correctly filtered (ids 12..98 even-tagged > 10)
    assert df.count() == 44

    # LIMIT stays Spark-side on the V1 path: the scan metadata carries no
    # limit, and the plan has a limit node above the JDBC scan
    lim = df.limit(5)
    lim_plan = lim._jdf.queryExecution().sparkPlan().toString()  # noqa: SLF001
    assert "Limit" in lim_plan
    assert lim.count() == 5
