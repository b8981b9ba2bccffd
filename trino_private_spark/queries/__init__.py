"""Probe-query registry: the SURVEY.md §2 coverage contract.

Each probe pairs a Spark-first implementation (DataFrame API or Spark SQL)
with an equivalent DuckDB oracle SQL string. The driver runs both at sf0.01
and compares row count + schema + order-insensitive value hash.

Conventions (FIXTURES.md):
- column names identical on both sides (alias every computed column);
- double aggregates rounded to a fixed scale on BOTH sides so that
  float summation order (Spark partial aggs vs DuckDB parallel agg)
  cannot flip the value hash;
- every LIMIT query carries a total ORDER BY for a deterministic prefix.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.catalog import TABLES, load_table


@dataclass(frozen=True)
class Probe:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Probe] = {}


def probe(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a probe; decorated fn has signature (spark, sf_dir) -> DataFrame."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Probe(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


class T:
    """Lazy table accessor: ``T(spark, sf)(name)`` or ``T(spark, sf).lineitem``.

    Applies the runtime-settable session confs the probes' semantics depend
    on (UTC timezone for timestamp<->epoch parity with the DuckDB oracle;
    nanosAsLong so events.parquet's TIMESTAMP(NANOS) column is readable) —
    the driver runs queries in ITS OWN SparkSession, which doesn't carry
    engine.get_spark()'s defaults."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        # set-once per session: each conf.set is a py4j roundtrip and T()
        # is constructed once per probe call
        if not getattr(spark, "_tps_confs_set", False):
            for k, v in (
                ("spark.sql.session.timeZone", "UTC"),
                ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ):
                try:
                    spark.conf.set(k, v)
                except Exception:
                    pass
            spark._tps_confs_set = True  # type: ignore[attr-defined]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return load_table(self._spark, self._sf_dir, name)
        raise AttributeError(name)


def spread(df: DataFrame) -> DataFrame:
    """Fan a sub-parallelism scan out to the session's cores before
    per-row-EXPENSIVE compute (pure-Python geometry/sketch kernels, HOF
    n-gram passes). A single small parquet file plans as ONE input split
    -> one task, serializing the kernel on one core (guide §2.5 input
    skew: "one huge unsplittable file ... repartition immediately after
    the read"). At production scale every scan has >= cores splits, so
    this is a no-op there — the repartition only fires below the
    session's default parallelism."""
    try:
        nparts = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover — never block a probe on this
        return df
    return df.repartition(target) if nparts < target else df


def all_probes() -> dict[str, Probe]:
    _load_modules()
    return dict(REGISTRY)


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for registration side effects
    from trino_private_spark.queries import (  # noqa: F401
        aggregates,
        approx,
        dialect_probes,
        edge_probes,
        events_probes,
        functions_probes,
        geo_probes,
        geom_probes,
        iceberg_probes,
        layout_probes,
        llm,
        map_aggs,
        misc_probes,
        pattern,
        r10_probes,
        r11_probes,
        reference_suite,
        reference_suite2,
        reference_suite3,
        reference_suite4,
        reference_suite5,
        reference_suite6,
        reference_suite7,
        relational,
        subqueries,
        temporal_probes,
        time_probes,
        tpcds_shapes,
        tpcds_shapes2,
        tpcds_shapes3,
        tpcds_shapes4,
        tpcds_shapes5,
        tpcds_shapes6,
        tpcds_shapes7,
        tpcds_shapes8,
        tpcds_shapes9,
        tpcds_shapes10,
        tpcds_shapes11,
        tpcds_shapes12,
        tpcds_shapes13,
        tpcds_shapes14,
        tpcds_shapes15,
        tpcds_sqltext,
        tpcds_sqltext2,
        tpch_shapes,
        tpch_shapes2,
        tpch_sqltext,
        windows,
        windows_nulls,
    )

    _LOADED = True
