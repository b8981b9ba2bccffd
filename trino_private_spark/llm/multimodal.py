"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no codec libraries, so the *decode* kernels are stubbed
(deterministic fakes clearly marked below); everything Spark-side — schema,
partition sizing, Arrow batch shape, mapInPandas signatures — is real and
tested. Swap `_decode_image_stub` for a PIL/ffmpeg call and the pipeline is
production-shaped.

Scale notes: media rows are large and skew-prone. ``pack_media`` keeps the
binary payload in its own column so Parquet stores it as one chunk and
column pruning skips it unless asked for; ``repartition_for_media`` sizes
partitions by payload bytes (not row count) so one Arrow batch stays within
executor memory at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB — deterministic fake feature extractor.

    A real implementation would decode the image (PIL/libjpeg), resize, and
    run a feature net. Here: a stable 8-dim byte-histogram-ish projection so
    tests have deterministic values. Raises on None like a decoder would."""
    if payload is None:
        raise NotImplementedError("no payload; real decoder requires bytes")
    buckets = [0] * 8
    for b in payload:
        buckets[b & 7] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


def extract_features(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over media rows via mapInPandas.

    mapInPandas (not a scalar pandas_udf) because media decode is
    per-row-expensive and benefits from generator-style batching; the small
    ``batch_rows`` cap bounds the bytes per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _decode_image_stub(p) if p is not None else None
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_for_media(df: DataFrame, target_bytes: int = 64 * 1024 * 1024,
                          payload_col: str = "payload") -> DataFrame:
    """Repartition so each partition carries ~target_bytes of payload —
    byte-based sizing, since media row counts say nothing about memory."""
    stats = df.select(
        F.sum(F.length(F.col(payload_col)).cast("bigint")).alias("total")
    ).collect()[0]
    total = stats["total"] or 0
    n = max(1, int(total / max(target_bytes, 1)) + 1)
    return df.repartition(n)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_ts_ms) rows from
    metadata only — no decode. The downstream decode step is the stubbed
    pandas UDF. sequence() is JVM-side, so the expansion never touches Python."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.coalesce(F.col("meta_duration_ms"), F.lit(0)).cast("bigint"),
                    F.lit(every_ms).cast("bigint"),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = patterned bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 251 for j in range(128 + (i % 5) * 32))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# REAL container-header decoding — no external libraries
# --------------------------------------------------------------------------
#
# The earlier feature path stubs pixel DECODE (no image libs in this
# environment), but container METADATA needs only the published header
# layouts, all parseable with stdlib struct: PNG IHDR, JPEG SOFn markers,
# GIF logical screen descriptor, BMP BITMAPINFOHEADER, and RIFF/WAVE fmt
# chunks.  This is the part of a media pipeline that drives partitioning,
# filtering and dedup decisions (resolution/duration gates) — and it runs
# Arrow-batched over binary columns like every other media op here.

import struct as _struct

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType as _Bin
from pyspark.sql.types import IntegerType as _Int
from pyspark.sql.types import StringType as _Str
from pyspark.sql.types import StructField as _SF
from pyspark.sql.types import StructType as _ST

_IMAGE_META_T = _ST([
    _SF("format", _Str()), _SF("width", _Int()), _SF("height", _Int()),
])
_WAV_META_T = _ST([
    _SF("sample_rate", _Int()), _SF("channels", _Int()),
    _SF("bits", _Int()), _SF("duration_ms", _Int()),
])


def image_meta_bytes(b: bytes):
    """(format, width, height) from the container header; None if the
    payload matches no known magic."""
    if b is None or len(b) < 12:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is always the first chunk: length(4) 'IHDR' w(4) h(4)
        w, h = _struct.unpack_from(">II", b, 16)
        return ("png", int(w), int(h))
    if b[:3] == b"GIF":
        w, h = _struct.unpack_from("<HH", b, 6)
        return ("gif", int(w), int(h))
    if b[:2] == b"BM":
        w, h = _struct.unpack_from("<ii", b, 18)
        return ("bmp", int(w), abs(int(h)))
    if b[:2] == b"\xff\xd8":
        # JPEG: scan markers for SOF0..SOF15 (except DHT/DAC/RST)
        i = 2
        n = len(b)
        while i + 9 < n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = _struct.unpack_from(">H", b, i + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = _struct.unpack_from(">HH", b, i + 5)
                return ("jpeg", int(w), int(h))
            i += 2 + seg_len
        return ("jpeg", 0, 0)
    return None


def wav_meta_bytes(b: bytes):
    """(sample_rate, channels, bits, duration_ms) from RIFF/WAVE chunks."""
    if b is None or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    rate = channels = bits = data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = _struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt ":
            channels, rate = _struct.unpack_from("<HI", b, i + 10)
            bits = _struct.unpack_from("<H", b, i + 22)[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if rate is None:
        return None
    dur_ms = 0
    if data_size and channels and bits:
        bytes_per_sec = rate * channels * (bits // 8)
        dur_ms = int(data_size * 1000 / bytes_per_sec) if bytes_per_sec else 0
    return (int(rate), int(channels), int(bits), dur_ms)


@pandas_udf(_IMAGE_META_T)
def image_meta(payload: pd.Series) -> pd.DataFrame:
    rows = []
    for b in payload:
        m = image_meta_bytes(None if b is None else bytes(b))
        rows.append(
            {"format": None, "width": None, "height": None}
            if m is None
            else {"format": m[0], "width": m[1], "height": m[2]}
        )
    return pd.DataFrame(rows)


@pandas_udf(_WAV_META_T)
def wav_meta(payload: pd.Series) -> pd.DataFrame:
    rows = []
    for b in payload:
        m = wav_meta_bytes(None if b is None else bytes(b))
        rows.append(
            {"sample_rate": None, "channels": None, "bits": None, "duration_ms": None}
            if m is None
            else {"sample_rate": m[0], "channels": m[1], "bits": m[2], "duration_ms": m[3]}
        )
    return pd.DataFrame(rows)


# -- encoders for tests/probes (real, valid files) -------------------------


def make_png(width: int, height: int) -> bytes:
    """A real, decodable 8-bit grayscale PNG of the given size (zlib is
    stdlib)."""
    import binascii
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = binascii.crc32(tag + data) & 0xFFFFFFFF
        return _struct.pack(">I", len(data)) + tag + data + _struct.pack(">I", crc)

    ihdr = _struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(sample_rate: int, channels: int, n_samples: int, bits: int = 16) -> bytes:
    data = bytes(n_samples * channels * (bits // 8))
    fmt = _struct.pack(
        "<HHIIHH",
        1,
        channels,
        sample_rate,
        sample_rate * channels * bits // 8,
        channels * bits // 8,
        bits,
    )
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def make_jpeg(width: int, height: int) -> bytes:
    """A minimal well-formed JPEG header stream (SOI + APP0 + SOF0) —
    enough for metadata parsing; not a full decodable image."""
    app0_payload = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    app0 = b"\xff\xe0" + _struct.pack(">H", 2 + len(app0_payload)) + app0_payload
    sof_payload = b"\x08" + _struct.pack(">HH", height, width) + b"\x03" + bytes(9)
    sof = b"\xff\xc0" + _struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + sof


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + _struct.pack("<HH", width, height) + bytes(7)


def make_bmp(width: int, height: int) -> bytes:
    return b"BM" + bytes(16) + _struct.pack("<ii", width, height) + bytes(24)


@pandas_udf(_Bin())
def png_of(w: pd.Series, h: pd.Series) -> pd.Series:
    """Column encoder: a real PNG per row with the given dimensions."""
    return pd.Series([make_png(int(a), int(b)) for a, b in zip(w, h)])


@pandas_udf(_Bin())
def wav_of(rate: pd.Series, secs: pd.Series) -> pd.Series:
    """Column encoder: a real mono 16-bit WAV per row of the given
    sample rate and duration."""
    return pd.Series(
        [make_wav(int(r), 1, int(r) * int(s)) for r, s in zip(rate, secs)]
    )


# -- MP4 / ISO BMFF (public spec ISO/IEC 14496-12) -------------------------

_MP4_META_T = _ST([
    _SF("duration_ms", _Int(), True),
    _SF("timescale", _Int(), True),
    _SF("width", _Int(), True),
    _SF("height", _Int(), True),
    _SF("n_tracks", _Int(), True),
])


def _bmff_boxes(b: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) walking one box level."""
    i = start
    while i + 8 <= end:
        size = _struct.unpack_from(">I", b, i)[0]
        btype = b[i + 4 : i + 8]
        payload = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            size = _struct.unpack_from(">Q", b, i + 8)[0]
            payload = i + 16
        elif size == 0:  # box extends to end of file
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, payload, i + size
        i += size


def mp4_meta_bytes(b: bytes):
    """(duration_ms, timescale, width, height, n_tracks) from the ISO BMFF
    box tree: moov/mvhd carries movie timescale+duration, each moov/trak/
    tkhd carries 16.16-fixed track dimensions (video tracks have nonzero
    width/height). Pure byte-walking — no media libraries."""
    if b is None or len(b) < 12:
        return None
    if b[4:8] not in (b"ftyp", b"moov", b"styp"):
        return None
    duration_ms = timescale = None
    width = height = None
    n_tracks = 0
    for btype, s, e in _bmff_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in _bmff_boxes(b, s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                version = b[cs]
                if version == 1:
                    ts = _struct.unpack_from(">I", b, cs + 20)[0]
                    dur = _struct.unpack_from(">Q", b, cs + 24)[0]
                else:
                    ts = _struct.unpack_from(">I", b, cs + 12)[0]
                    dur = _struct.unpack_from(">I", b, cs + 16)[0]
                timescale = ts
                duration_ms = int(dur * 1000 / ts) if ts else 0
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, ts_, te in _bmff_boxes(b, cs, ce):
                    if ttype == b"tkhd":
                        version = b[ts_]
                        # version+flags (4) + times/ids: v0 = 5x4, v1 = 8+8+4+4+8
                        off = ts_ + 4 + (32 if version == 1 else 20)
                        # layer2 alternate2 volume2 reserved2 matrix36
                        wh = off + 8 + 2 + 2 + 2 + 2 + 36
                        if wh + 8 <= te:
                            w = _struct.unpack_from(">I", b, wh)[0] >> 16
                            h = _struct.unpack_from(">I", b, wh + 4)[0] >> 16
                            if w and h:
                                width, height = w, h
    if timescale is None:
        return None
    return (duration_ms, timescale, width, height, n_tracks)


@pandas_udf(_MP4_META_T)
def mp4_meta(payload: pd.Series) -> pd.DataFrame:
    rows = []
    for b in payload:
        m = mp4_meta_bytes(None if b is None else bytes(b))
        rows.append(
            {"duration_ms": None, "timescale": None, "width": None,
             "height": None, "n_tracks": None}
            if m is None
            else {"duration_ms": m[0], "timescale": m[1], "width": m[2],
                  "height": m[3], "n_tracks": m[4]}
        )
    return pd.DataFrame(rows)


def make_mp4(
    duration_ms: int, timescale: int = 1000, width: int = 0, height: int = 0
) -> bytes:
    """A minimal valid ISO BMFF header (ftyp + moov[mvhd + optional
    trak/tkhd]) for tests — real box framing, parseable by any BMFF
    walker."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return _struct.pack(">I", 8 + len(payload)) + tag + payload

    ftyp = box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isomiso2mp41")
    dur = int(duration_ms * timescale / 1000)
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + _struct.pack(">IIII", 0, 0, timescale, dur)
        + _struct.pack(">I", 0x00010000)  # rate 1.0
        + _struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + _struct.pack(">I", 2),  # next track id
    )
    parts = [mvhd]
    if width and height:
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + _struct.pack(">IIIII", 0, 0, 1, 0, dur)
            + b"\x00" * 8
            + _struct.pack(">HHHH", 0, 0, 0, 0)
            + _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + _struct.pack(">II", width << 16, height << 16),
        )
        parts.append(box(b"trak", tkhd))
    return ftyp + box(b"moov", b"".join(parts))
