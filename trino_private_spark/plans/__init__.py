"""Plan/dialect layer: Trino-SQL text -> Spark-SQL text translation plus
EXPLAIN helpers (SURVEY.md §2.7, §4)."""

from trino_private_spark.plans.translate import translate
from trino_private_spark.plans.explain import explain_str, assert_pushed_filters

__all__ = ["translate", "explain_str", "assert_pushed_filters"]
