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


# --------------------------------------------------------------------------
# AVRO decoder — pure Python from the public Avro binary spec
# --------------------------------------------------------------------------
#
# The reference's avro decoder (decoder/avro/AvroRowDecoder.java) reads the
# schema-driven Avro binary encoding; Spark's from_avro needs the external
# spark-avro jar, which this environment doesn't ship — so the wire format
# is implemented directly (it is small and fully specified): zigzag-varint
# int/long, little-endian float/double, length-prefixed bytes/string,
# 1-byte boolean, concatenated record fields, block-encoded arrays/maps,
# union = branch index + value, enum = index, fixed = raw bytes.

import pandas as pd
from pyspark.sql.functions import pandas_udf as _pandas_udf

import struct as _struct


class _AvroReader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.i = 0

    def _varint(self) -> int:
        shift = acc = 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read(self, schema):
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union: branch index then value
            idx = self._varint()
            return self.read(schema[idx])
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            v = self.b[self.i] != 0
            self.i += 1
            return v
        if t in ("int", "long"):
            return self._varint()
        if t == "float":
            v = _struct.unpack_from("<f", self.b, self.i)[0]
            self.i += 4
            return v
        if t == "double":
            v = _struct.unpack_from("<d", self.b, self.i)[0]
            self.i += 8
            return v
        if t in ("bytes", "string"):
            n = self._varint()
            v = self.b[self.i : self.i + n]
            self.i += n
            return v.decode("utf-8") if t == "string" else bytes(v)
        if t == "record":
            return {f["name"]: self.read(f["type"]) for f in schema["fields"]}
        if t == "enum":
            return schema["symbols"][self._varint()]
        if t == "fixed":
            n = schema["size"]
            v = bytes(self.b[self.i : self.i + n])
            self.i += n
            return v
        if t == "array":
            out = []
            while True:
                cnt = self._varint()
                if cnt == 0:
                    break
                if cnt < 0:  # block with byte size
                    cnt = -cnt
                    self._varint()
                for _ in range(cnt):
                    out.append(self.read(schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                cnt = self._varint()
                if cnt == 0:
                    break
                if cnt < 0:
                    cnt = -cnt
                    self._varint()
                for _ in range(cnt):
                    k = self.read("string")
                    out[k] = self.read(schema["values"])
            return out
        raise ValueError(f"unsupported avro type {t!r}")


def avro_decode_bytes(buf: bytes, schema_json: str):
    """Decode one Avro-binary datum against a JSON schema."""
    import json as _json

    return _AvroReader(bytes(buf)).read(_json.loads(schema_json))


def avro_encode(value, schema) -> bytes:
    """Inverse encoder (tests/interchange)."""
    out = bytearray()

    def zig(n: int):
        n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                break

    def emit(v, s):
        if isinstance(s, str):
            t = s
        elif isinstance(s, list):
            for i, branch in enumerate(s):
                bt = branch if isinstance(branch, str) else branch["type"]
                if (v is None) == (bt == "null"):
                    if v is None and bt != "null":
                        continue
                    zig(i)
                    emit(v, branch)
                    return
            raise ValueError("no union branch matched")
        else:
            t = s["type"]
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            zig(int(v))
        elif t == "float":
            out.extend(_struct.pack("<f", v))
        elif t == "double":
            out.extend(_struct.pack("<d", v))
        elif t in ("bytes", "string"):
            raw = v.encode("utf-8") if t == "string" else bytes(v)
            zig(len(raw))
            out.extend(raw)
        elif t == "record":
            for f in s["fields"]:
                ft = f["type"]
                # a key absent from the record dict encodes as null when
                # the field is null-unioned (writer-side leniency real
                # Avro gets from field defaults); a non-nullable field
                # stays a loud KeyError
                if (
                    f["name"] not in v
                    and isinstance(ft, list)
                    and "null" in ft
                ):
                    emit(None, ft)
                else:
                    emit(v[f["name"]], ft)
        elif t == "enum":
            zig(s["symbols"].index(v))
        elif t == "fixed":
            out.extend(bytes(v))
        elif t == "array":
            if v:
                zig(len(v))
                for item in v:
                    emit(item, s["items"])
            zig(0)
        elif t == "map":
            if v:
                zig(len(v))
                for k, item in v.items():
                    emit(k, "string")
                    emit(item, s["values"])
            zig(0)
        else:
            raise ValueError(f"unsupported avro type {t!r}")

    emit(value, schema)
    return bytes(out)


def decode_avro(col: Column, schema_json: str, spark_schema) -> Column:
    """AVRO decoder column: binary datum -> typed struct (the
    trino-record-decoder avro path).  ``spark_schema`` is the target
    StructType (DataType object — resolvable without a session)."""
    import json as _json

    avro_schema = _json.loads(schema_json)
    field_names = [f["name"] for f in avro_schema["fields"]]

    @_pandas_udf(spark_schema)
    def _dec(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            if b is None:
                rows.append({n: None for n in field_names})
            else:
                rows.append(_AvroReader(bytes(b)).read(avro_schema))
        return pd.DataFrame(rows, columns=field_names)

    return _dec(col)


# test/interchange encoder UDF for the probe path
_EVENT_AVRO_SCHEMA = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "value", "type": "double"},
    ],
}


def _avro_event_encoder():
    from pyspark.sql.types import BinaryType

    @_pandas_udf(BinaryType())
    def enc(eid: pd.Series, etype: pd.Series, val: pd.Series) -> pd.Series:
        return pd.Series(
            [
                avro_encode(
                    {"event_id": int(i), "event_type": t, "value": float(v)},
                    _EVENT_AVRO_SCHEMA,
                )
                for i, t, v in zip(eid, etype, val)
            ]
        )

    return enc
