"""User extension API — the reference's plugin-function surface (§2.8).

The reference lets plugins contribute scalar functions (@ScalarFunction,
455 sites, parsed by ScalarFromAnnotationsParser), aggregates
(@AggregationFunction with input/combine/output state functions, parsed by
AggregationFromAnnotationsParser.java) and window functions
(SqlWindowFunction) via spi/Plugin.java:56 getFunctions(). Its test suite
registers CustomAdd / CustomSum / CustomRank
(testing/trino-testing/.../CustomAdd.java, CustomSum.java, CustomRank.java)
to exercise the path.

Spark-first mapping — a thin registry over the native extension points:

- scalar    -> Column-builder (JVM expressions, fast path) or
               `spark.udf.register` (Python, slow path — flagged)
- aggregate -> Arrow-batched GROUPED_AGG pandas UDF: Spark's partial/final
               split replaces the reference's @CombineFunction state merge
- window    -> the same GROUPED_AGG UDF over a Window spec, or an
               applyInPandas rank-style helper for ordering-dependent
               functions (per-partition materialization, exactly the
               reference's window operator pagination model)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class _Registered:
    name: str
    kind: str  # scalar | scalar_python | aggregate | window
    fn: Callable


class Extensions:
    """Per-engine function registry (Plugin.getFunctions() analogue)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._fns: dict[str, _Registered] = {}

    def registered(self) -> dict[str, str]:
        """SHOW FUNCTIONS over the extension set."""
        return {r.name: r.kind for r in self._fns.values()}

    # --- scalar ----------------------------------------------------------

    def scalar(self, name: str, builder: Callable[..., Column]) -> None:
        """Fast path: a Column-expression builder (stays in codegen —
        the analogue of a @ScalarFunction compiled to bytecode)."""
        self._fns[name] = _Registered(name, "scalar", builder)

    def scalar_python(self, name: str, fn: Callable, return_type: str) -> None:
        """Slow path: row-at-a-time Python, registered SQL-callable.
        Deliberately separate so callers see the Python hop in the name."""
        self._spark.udf.register(name, fn, return_type)
        self._fns[name] = _Registered(name, "scalar_python", fn)

    # --- aggregate -------------------------------------------------------

    def aggregate(self, name: str, fn: Callable[[pd.Series], object],
                  return_type: str) -> None:
        """Custom aggregate as an Arrow-batched GROUPED_AGG pandas UDF.
        Spark evaluates it per group after the hash shuffle; the
        input->combine->output state machine of the reference collapses to
        one per-group vector reduction."""
        def wrapper(v):
            return fn(v)

        # type-hint style (the non-deprecated Spark 4 spelling): a
        # Series -> scalar signature selects GROUPED_AGG evaluation
        wrapper.__annotations__ = {"v": pd.Series, "return": float}
        udf = F.pandas_udf(wrapper, return_type)
        self._fns[name] = _Registered(name, "aggregate", udf)

    # --- window ----------------------------------------------------------

    def window_rank(self, name: str,
                    fn: Callable[[pd.DataFrame], pd.Series]) -> None:
        """Ordering-dependent window function (CustomRank shape): `fn` maps
        a partition's frame (as a DataFrame sorted by the caller) to one
        value per row. Applied via applyInPandas — per-partition
        materialization, the reference's window-operator model."""
        self._fns[name] = _Registered(name, "window", fn)

    # --- application -----------------------------------------------------

    def col(self, name: str, *args) -> Column:
        """Use a registered scalar/aggregate in a select/agg expression."""
        r = self._fns[name]
        if r.kind == "scalar_python":
            return F.call_udf(r.name, *[
                a if isinstance(a, Column) else F.lit(a) for a in args
            ])
        return r.fn(*args)

    def over_partitions(self, name: str, df: DataFrame, partition_by: str,
                        order_by: str, out_col: str,
                        out_type: str = "long") -> DataFrame:
        """Evaluate a window_rank extension over df partitioned by
        `partition_by`, ordered by `order_by` (one output value per row).
        Shuffles once on the partition key — same exchange a native window
        function would need."""
        r = self._fns[name]
        assert r.kind == "window", name
        schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out_col} {out_type}"
        fn = r.fn

        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
            pdf[out_col] = fn(pdf)
            return pdf

        return df.groupBy(partition_by).applyInPandas(apply, schema)
