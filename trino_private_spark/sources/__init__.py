"""Sources/sinks: the connector surface (SURVEY.md §2.6) on Spark readers."""

from trino_private_spark.sources.readers import (
    read_table,
    write_table,
    MemoryCatalog,
)

__all__ = ["read_table", "write_table", "MemoryCatalog"]
