"""Trino-name -> Spark-expression compatibility layer (SURVEY.md §2.5).

``registry.py`` exposes each Trino function whose name or argument order
differs from Spark's as a Python Column-builder, and ``register_all(spark)``
installs the SQL-callable subset so `spark.sql` text written against the
reference dialect runs unchanged.
"""

from trino_private_spark.functions.registry import TRINO_FUNCTIONS, register_all
from trino_private_spark.functions import colors as _colors  # noqa: F401  (registers color/rgb/render/bar)

__all__ = ["TRINO_FUNCTIONS", "register_all"]
