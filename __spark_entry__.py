"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001
queries()      — name -> (spark, sf_dir) -> DataFrame, one per SURVEY §2 probe
oracle_sql()   — name -> DuckDB SQL oracle (omitted for hash-seeded approx ops)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from trino_private_spark.queries import all_probes

    return all_probes()["p_hashagg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from trino_private_spark.queries import all_probes

    return {name: p.fn for name, p in all_probes().items()}


def oracle_sql() -> dict[str, str]:
    from trino_private_spark.queries import all_probes

    return {
        name: p.oracle for name, p in all_probes().items() if p.oracle is not None
    }
