"""Shared pytest fixtures: one SparkSession per test session + the
DuckDB-oracle comparison harness mirroring the driver's t2 check."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from trino_private_spark.engine import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tps-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: columns sorted by name, rows sorted by all
    columns, values stringified canonically."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_canon)
        else:
            df[c] = df[c].map(_canon)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _canon(v):
    import decimal

    if v is None:
        return "<null>"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # canonical float form: 12 significant digits (rounding already
        # applied query-side; this only strips repr noise like 0.30000000004)
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_canon(x)) for x in v) + "]"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def _dtype_category(dtype) -> str:
    s = str(dtype)
    if "int" in s:
        return "int"
    if "float" in s or "double" in s:
        return "float"
    if "bool" in s:
        return "bool"
    if "datetime" in s:
        return "ts"
    return "obj"


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    # exact-width dtype parity (int64 vs int32 etc.) — the driver compares
    # schemas, so a width mismatch is a failure even when values hash equal
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        sa, sb = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        cat_a, cat_b = _dtype_category(sa), _dtype_category(sb)
        assert cat_a == cat_b, f"{name}.{c}: dtype category {sa} vs {sb}"
        if cat_a == "int":
            assert sa == sb, f"{name}.{c}: int width {sa} vs {sb}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(5).add_suffix("_spark"),
             b[diff_mask].head(5).add_suffix("_duck")],
            axis=1,
        )
        raise AssertionError(f"{name}: value mismatch; first diffs:\n{sample}")
