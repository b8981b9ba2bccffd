"""Batch sources/sinks — the reference's connector surface on Spark readers.

Reference: ConnectorPageSource SPI + per-format readers (lib/trino-parquet,
lib/trino-orc, Hive serdes for csv/json/text/avro — SURVEY.md §2.6). Spark
ships all of these as builtin DataSource V2 readers with filter/column
pushdown; these wrappers add uniform options (multiline JSON, csv headers)
and the scale-tuned defaults so connector choice is one string.

JDBC federation (plugin/trino-base-jdbc) maps to spark.read.jdbc —
``read_jdbc`` forwards partitioning options (partitionColumn/num_partitions)
because an unpartitioned JDBC read is a single-task scan at any scale.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "orc", "csv", "json", "text", "avro"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "false" if schema else "true")
    if fmt == "json":
        options.setdefault("multiLine", "false")  # line-delimited scales; one
        # JSON doc per line splits across tasks, multiLine forces 1 file/task
    try:
        return reader.options(**options).format(fmt).load(path)
    except Exception as e:  # noqa: BLE001
        if fmt == "avro" and "avro" in str(e).lower():
            raise NotImplementedError(
                "avro needs the external spark-avro module on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
                "not bundled in this environment"
            ) from e
        raise


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Iterable[str] | None = None,
    **options,
) -> None:
    """Write with optional hive-style partitioning. At 100 TB choose
    partition columns with bounded cardinality (date/hour, not user_id) so
    file counts stay manageable; writers inherit AQE-coalesced partitions."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    if fmt == "csv":
        options.setdefault("header", "true")
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """JDBC federation (plugin/trino-base-jdbc analogue). Exercised against
    the Derby embedded DB on Spark's classpath (tests/test_jdbc.py) including
    the partitioned-read contract — partitionColumn/lower/upper/numPartitions
    gives each executor its own connection + key-range slice, which is the
    part that matters at cluster scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


class MemoryCatalog:
    """trino-memory connector analogue: named in-memory tables backed by
    cached DataFrames (MemoryPagesStore.java:41). CREATE/INSERT/DROP via
    temp views + cache; sizes must fit the cluster's storage memory."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    def create(self, name: str, df: DataFrame, cache: bool = True) -> None:
        if cache:
            df = df.cache()
        df.createOrReplaceTempView(name)
        self._tables[name] = df

    def insert(self, name: str, df: DataFrame) -> None:
        old = self._tables[name]
        merged = old.unionByName(df)
        self.create(name, merged)
        # Unpersist the superseded table AFTER the merged one is registered;
        # otherwise the old cache entry (often a bare parquet read) lingers in
        # the CacheManager forever and hijacks later identical scans with an
        # InMemoryTableScan (killing filter pushdown for unrelated queries).
        old.unpersist()

    def drop(self, name: str) -> None:
        df = self._tables.pop(name)
        df.unpersist()
        self.spark.catalog.dropTempView(name)

    def tables(self) -> list[str]:
        return sorted(self._tables)


def read_sequencefile(
    spark: SparkSession,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Hadoop SequenceFile source (the reference reads these through Hive
    serdes — plugin/trino-hive HiveStorageFormat SEQUENCEFILE). Spark's
    native sequenceFile input splits by Hadoop block, so scan parallelism
    matches any other format; keys/values deserialize from Writables to
    their Python/JVM twins and arrive as a two-column DataFrame."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, [key_col, value_col])


def write_sequencefile(df: DataFrame, path: str) -> None:
    """SequenceFile sink for two-column DataFrames (key, value) — the
    round-trip partner of :func:`read_sequencefile`."""
    cols = df.columns
    if len(cols) != 2:
        raise ValueError("sequencefile sink expects exactly (key, value)")
    df.rdd.map(tuple).saveAsSequenceFile(path)
