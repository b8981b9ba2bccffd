"""Iceberg table statistics (sources/iceberg_stats.py).

Reference parity: plugin/trino-iceberg TableStatisticsReader (connector
stats from manifest metrics + Puffin NDVs, zero data IO) and
TableStatisticsWriter (ANALYZE writing statistics files referenced from
the metadata "statistics" list, spec §"Table Statistics").
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trino_private_spark.sources.iceberg import IcebergTable
from trino_private_spark.sources.iceberg_stats import (
    analyze_table,
    show_stats_frame,
    table_stats,
)
from trino_private_spark.sources.iceberg_write import (
    iceberg_create,
    iceberg_delete,
)


@pytest.fixture()
def stats_table(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("v"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .alias("n"),
    )
    iceberg_create(df.repartition(4), loc)
    iceberg_delete(spark, loc, "k >= 90")
    return loc


class TestTableStats:
    def test_manifest_only_stats(self, spark, stats_table):
        st = table_stats(stats_table)
        # 100 written - 10 position-deleted, counted from metadata alone
        assert st["row_count"] == 90
        assert st["columns"]["k"]["low"] == 0
        assert st["columns"]["k"]["high"] == 99
        assert st["columns"]["n"]["nulls"] == 10
        assert st["columns"]["v"]["ndv"] is None  # no ANALYZE yet
        assert st["data_size"] > 0

    def test_analyze_records_ndv(self, spark, stats_table):
        ndvs = analyze_table(spark, stats_table)
        assert ndvs["v"] == 7
        st = table_stats(stats_table)
        assert st["columns"]["v"]["ndv"] == 7
        # the statistics entry carries the spec's file fields
        md = IcebergTable(stats_table).metadata
        (entry,) = md["statistics"]
        assert entry["snapshot-id"] == (
            IcebergTable(stats_table).current_snapshot()["snapshot-id"]
        )
        assert entry["file-size-in-bytes"] > 0

    def test_reanalyze_replaces_entry(self, spark, stats_table):
        analyze_table(spark, stats_table)
        analyze_table(spark, stats_table)
        md = IcebergTable(stats_table).metadata
        assert len(md["statistics"]) == 1

    def test_show_stats_shape(self, spark, stats_table):
        analyze_table(spark, stats_table)
        rows = {
            r["column_name"]: r
            for r in show_stats_frame(spark, stats_table).collect()
        }
        assert rows[None]["row_count"] == 90.0
        assert rows["n"]["nulls_fraction"] == pytest.approx(10 / 90, abs=1e-5)
        assert rows["v"]["distinct_values_count"] == 7.0
        assert rows["k"]["low_value"] == "0"
        assert rows["k"]["high_value"] == "99"

    def test_incomplete_bounds_widen_to_none(self, spark, tmp_path):
        # a table written WITHOUT metrics for a column (all-null binary
        # columns get no bounds) must not fabricate bounds
        loc = str(tmp_path / "t2")
        df = spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.lit(None).cast("string").alias("s"),
        )
        iceberg_create(df, loc)
        st = table_stats(loc)
        assert st["columns"]["s"]["low"] is None
        assert st["columns"]["s"]["nulls"] == 10
