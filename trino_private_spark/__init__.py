"""trino_private_spark — a PySpark-native analytics engine.

Re-expresses the query capabilities of the reference engine (a Trino
364-SNAPSHOT fork, see SURVEY.md) on Spark SQL / Catalyst, Spark-first:
logical plans are declared with the DataFrame/SQL API and Catalyst +
Tungsten pick the physical strategy. Custom operators (sketch UDAFs,
MinHash dedup, ANN search, GROUPS window frames, MATCH_RECOGNIZE) are
built as compositions of DataFrame ops or Arrow-batched pandas UDFs.

Layout:
- engine.py    — SparkSession factory with scale-tuned defaults
- catalog.py   — table registration over the driver parquet fixtures
- operators/   — relational/agg/window/dedup operators beyond builtins
- functions/   — Trino-name -> Spark expression compatibility registry
- plans/       — SQL dialect translation (Trino SQL -> Spark SQL)
- sources/     — batch readers/writers
- streaming/   — Structured Streaming operators over the events table
- llm/         — LLM-data-pipeline ops: dedup, similarity, text, multimodal
- queries.py   — probe-query registry (the SURVEY §2 coverage contract)
"""

from trino_private_spark.engine import get_spark
from trino_private_spark.catalog import register_tables

__all__ = ["get_spark", "register_tables"]
__version__ = "0.1.0"
