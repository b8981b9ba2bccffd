"""Sequence packing + stratified sampling (llm/packing.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from trino_private_spark.llm.packing import pack_sequences, stratified_sample


class TestPackSequences:
    def test_invariants(self, spark):
        rows = [(i, 1 + (i * 37) % 900) for i in range(500)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(4)
        packed = pack_sequences(df, budget=1000)
        pdf = packed.toPandas()
        # every doc assigned exactly once
        assert sorted(pdf.doc_id) == list(range(500))
        # no bin over budget (no doc exceeds it here)
        per_bin = pdf.groupby("bin_id").n_tokens.sum()
        assert per_bin.max() <= 1000
        # bin_fill column agrees with actual fills
        fills = pdf.groupby("bin_id").bin_fill.first()
        assert (per_bin == fills.loc[per_bin.index]).all()

    def test_utilization(self, spark):
        rows = [(i, 1 + (i * 37) % 900) for i in range(2000)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(4)
        pdf = pack_sequences(df, budget=1000).toPandas()
        total = pdf.n_tokens.sum()
        n_bins = pdf.bin_id.nunique()
        # FFD: waste bounded; allow generous slack for 4 partition residues
        assert n_bins <= total // 1000 + 4 + total // 1000 // 3

    def test_oversize_doc_gets_own_bin(self, spark):
        df = spark.createDataFrame(
            [(1, 5000), (2, 100), (3, 200)], ["doc_id", "n_tokens"]
        ).coalesce(1)
        pdf = pack_sequences(df, budget=1000).toPandas()
        big = pdf[pdf.doc_id == 1]
        assert big.bin_fill.iloc[0] == 5000  # flagged: fill > budget
        others = pdf[pdf.doc_id != 1]
        assert (others.bin_id != big.bin_id.iloc[0]).all()

    def test_deterministic(self, spark):
        rows = [(i, 1 + (i * 13) % 500) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).coalesce(1)
        a = pack_sequences(df, budget=512).toPandas().sort_values("doc_id")
        b = pack_sequences(df, budget=512).toPandas().sort_values("doc_id")
        assert (a.bin_id.to_numpy() == b.bin_id.to_numpy()).all()


class TestStratifiedSample:
    def test_exact_quota(self, spark):
        rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(1000)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        out = stratified_sample(df, "lang", quota=50)
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"en": 50, "de": 50, "fr": 50}

    def test_small_stratum_kept_whole(self, spark):
        rows = [(i, "big" if i < 900 else "small") for i in range(910)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        out = stratified_sample(df, "lang", quota=100)
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"big": 100, "small": 10}

    def test_deterministic_and_subset(self, spark):
        rows = [(i, ["en", "de"][i % 2]) for i in range(400)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        a = sorted(r.doc_id for r in stratified_sample(df, "lang", 30).collect())
        b = sorted(r.doc_id for r in stratified_sample(df, "lang", 30).collect())
        assert a == b
        assert set(a) <= set(range(400))

    def test_seed_changes_selection(self, spark):
        rows = [(i, "en") for i in range(500)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        a = set(r.doc_id for r in stratified_sample(df, "lang", 50, seed=1).collect())
        b = set(r.doc_id for r in stratified_sample(df, "lang", 50, seed=2).collect())
        assert a != b


class TestMediaHeaderDecoding:
    """REAL container-header parsing (llm/multimodal image_meta/wav_meta) —
    no external libraries, just the published header layouts."""

    def test_png_real_file(self):
        import zlib

        from trino_private_spark.llm.multimodal import image_meta_bytes, make_png

        png = make_png(640, 480)
        assert image_meta_bytes(png) == ("png", 640, 480)
        # the generated PNG is genuinely decodable: IDAT inflates to
        # height * (1 + width) filter-prefixed rows
        idat_off = png.index(b"IDAT") + 4
        import struct as st

        idat_len = st.unpack_from(">I", png, idat_off - 8)[0]
        raw = zlib.decompress(png[idat_off : idat_off + idat_len])
        assert len(raw) == 480 * (1 + 640)

    def test_jpeg_gif_bmp(self):
        from trino_private_spark.llm.multimodal import (
            image_meta_bytes,
            make_bmp,
            make_gif,
            make_jpeg,
        )

        assert image_meta_bytes(make_jpeg(800, 600)) == ("jpeg", 800, 600)
        assert image_meta_bytes(make_gif(320, 200)) == ("gif", 320, 200)
        assert image_meta_bytes(make_bmp(100, 50)) == ("bmp", 100, 50)
        assert image_meta_bytes(make_bmp(100, -50)) == ("bmp", 100, 50)  # top-down
        assert image_meta_bytes(b"not an image") is None

    def test_wav(self):
        from trino_private_spark.llm.multimodal import make_wav, wav_meta_bytes

        assert wav_meta_bytes(make_wav(16000, 2, 16000)) == (16000, 2, 16, 1000)
        assert wav_meta_bytes(make_wav(44100, 1, 22050)) == (44100, 1, 16, 500)
        assert wav_meta_bytes(b"RIFFxxxx") is None

    def test_spark_udfs(self, spark):
        from trino_private_spark.llm.multimodal import (
            image_meta,
            make_png,
            make_wav,
            wav_meta,
        )

        rows = [(1, make_png(64, 32), make_wav(8000, 1, 4000)),
                (2, b"junk", b"junk")]
        df = spark.createDataFrame(rows, "id long, img binary, aud binary")
        out = (
            df.select("id", image_meta("img").alias("im"), wav_meta("aud").alias("wm"))
            .orderBy("id")
            .collect()
        )
        assert out[0]["im"]["width"] == 64 and out[0]["im"]["format"] == "png"
        assert out[0]["wm"]["duration_ms"] == 500
        assert out[1]["im"]["format"] is None and out[1]["wm"]["sample_rate"] is None


def test_mp4_meta_roundtrip():
    from trino_private_spark.llm.multimodal import make_mp4, mp4_meta_bytes

    m = mp4_meta_bytes(make_mp4(90_500, timescale=600, width=1920, height=1080))
    assert m == (90_500, 600, 1920, 1080, 1)
    audio = mp4_meta_bytes(make_mp4(2_000, timescale=44100))
    assert audio == (2_000, 44100, None, None, 0)
    assert mp4_meta_bytes(b"junk" * 10) is None


def test_mp4_meta_udf(spark):
    import pyspark.sql.functions as F

    from trino_private_spark.llm.multimodal import make_mp4, mp4_meta

    df = spark.createDataFrame(
        [(1, make_mp4(5_000, 1000, 640, 360)), (2, make_mp4(250, 90000)), (3, None)],
        "id int, payload binary",
    )
    rows = {
        r.id: (r.m.duration_ms, r.m.timescale, r.m.width, r.m.height, r.m.n_tracks)
        for r in df.select("id", mp4_meta(F.col("payload")).alias("m")).collect()
    }
    assert rows[1] == (5_000, 1000, 640, 360, 1)
    assert rows[2] == (250, 90000, None, None, 0)
    assert rows[3] == (None, None, None, None, None)


def test_mixture_quotas_sum_to_total():
    # largest-remainder fill: quotas must sum to exactly total for any
    # count distribution and alpha (bare floors under-deliver)
    import random

    from trino_private_spark.llm.packing import mixture_quotas

    rng = random.Random(7)
    for _ in range(50):
        n_src = rng.randint(1, 12)
        counts = {f"s{i}": rng.randint(1, 10_000) for i in range(n_src)}
        total = rng.randint(1, 5000)
        alpha = rng.choice([0.0, 0.3, 0.5, 0.7, 1.0])
        q = mixture_quotas(counts, total, alpha)
        assert sum(q.values()) == total
        assert all(v >= 0 for v in q.values())


def test_temperature_mixture_exact_total(spark):
    from pyspark.sql import functions as F

    from trino_private_spark.llm.packing import temperature_mixture

    df = spark.range(0, 900).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 7)).alias("source"),
    )
    out = temperature_mixture(df, total=500, alpha=0.5)
    assert out.count() == 500
