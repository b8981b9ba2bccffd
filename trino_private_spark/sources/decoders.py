"""Row decoders: raw message bytes/strings -> typed columns.

Reference: lib/trino-record-decoder (json/csv/avro/raw decoders used by the
kafka/kinesis/redis connectors — SURVEY §2.6). Spark-first: `from_json` /
`from_csv` expressions (JVM-side, codegen'd), applied identically to batch
frames and streaming frames (a kafka readStream value column decodes with
the same call)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_json(col: Column, schema: str, options: dict | None = None) -> Column:
    """JSON decoder (decoder/json/JsonRowDecoder.java analogue)."""
    return F.from_json(col.cast("string"), schema, options or {})


def decode_csv(col: Column, schema: str, sep: str = ",") -> Column:
    """CSV decoder (decoder/csv/CsvRowDecoder.java analogue)."""
    return F.from_csv(col.cast("string"), schema, {"sep": sep})


def decode_raw(col: Column, typ: str = "string") -> Column:
    """RAW decoder (decoder/raw/RawRowDecoder.java): whole payload as one
    typed value."""
    return col.cast(typ)


def decoded_table(
    df: DataFrame,
    value_col: str,
    fmt: str,
    schema: str,
    keep_cols: list[str] | None = None,
    **opts,
) -> DataFrame:
    """Decode a message table/stream: keeps ``keep_cols`` (keys, offsets,
    timestamps) and flattens the decoded struct into top-level columns —
    the shape a `spark.readStream.format("kafka")` pipeline uses."""
    c = F.col(value_col)
    if fmt == "json":
        decoded = decode_json(c, schema, opts or None)
    elif fmt == "csv":
        decoded = decode_csv(c, schema, opts.get("sep", ","))
    elif fmt == "raw":
        decoded = decode_raw(c, schema)
    else:
        raise ValueError(f"unsupported decoder {fmt!r} (json|csv|raw)")
    out = df.select(*(keep_cols or []), decoded.alias("__decoded"))
    if fmt == "raw":
        return out.withColumnRenamed("__decoded", "value")
    return out.select(*(keep_cols or []), "__decoded.*")
