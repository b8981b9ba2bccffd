"""Dev harness for the TPC-DS SQL-text corpus.

Usage:
  python examples/dstext_check.py tables          # hash-compare every tpcds_* fixture table
  python examples/dstext_check.py q04 q11 ...     # run probes vs oracle at sf0.001
  SF=/root/testdata/sf0.01 python examples/dstext_check.py q04

Compares with the driver's method: sorted columns, order-insensitive
value hash, row count, schema (column names).
"""
from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
import pandas as pd

SF = os.environ.get("SF", "/root/testdata/sf0.001")


def canon(v):
    import decimal

    if v is None:
        return "<null>"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def vhash(p):
    p = p[sorted(p.columns)]
    return hashlib.md5(
        "\n".join(
            sorted("|".join(canon(v) for v in r) for r in p.itertuples(index=False))
        ).encode()
    ).hexdigest()


def main():
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    from trino_private_spark.queries import tpcds_sqltext as m
    from trino_private_spark.queries import tpcds_sqltext2  # noqa: F401
    from trino_private_spark.queries import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    args = sys.argv[1:]
    if args and args[0] == "tables":
        m._register_views(spark, SF)
        names = sorted(m._spark_views(SF))
        for name in names:
            s = spark.table(name).toPandas()
            d = con.execute(
                f"WITH {m._DUCK_CTES} SELECT * FROM {name}"
            ).fetchdf()
            cols_ok = sorted(s.columns) == sorted(d.columns)
            rows_ok = len(s) == len(d)
            h_ok = cols_ok and rows_ok and vhash(s) == vhash(d)
            status = "OK " if h_ok else "FAIL"
            print(f"{status} {name}: spark {len(s)}x{len(s.columns)} "
                  f"duck {len(d)}x{len(d.columns)}", flush=True)
            if not h_ok and cols_ok and rows_ok:
                sc = set(s.columns)
                for c in sorted(sc):
                    if vhash(s[[c]]) != vhash(d[[c]]):
                        print(f"     col diff: {c} "
                              f"spark={s[c].head(3).tolist()} "
                              f"duck={d[c].head(3).tolist()}")
            elif not cols_ok:
                print("     spark-only:", sorted(set(s.columns) - set(d.columns)))
                print("     duck-only:", sorted(set(d.columns) - set(s.columns)))
        return

    for q in args:
        name = f"p_dstext_{q}"
        ent = REGISTRY[name]
        try:
            s = ent.fn(spark, SF).toPandas()
        except Exception as e:
            print(f"FAIL {q} spark: {str(e)[:300]}", flush=True)
            continue
        try:
            d = con.execute(ent.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {q} duck: {str(e)[:300]}", flush=True)
            continue
        cols_ok = sorted(s.columns) == sorted(d.columns)
        rows_ok = len(s) == len(d)
        h_ok = cols_ok and rows_ok and vhash(s) == vhash(d)
        empty = "  (EMPTY!)" if len(s) == 0 else ""
        if h_ok:
            print(f"OK   {q}: {len(s)} rows{empty}", flush=True)
        else:
            print(f"FAIL {q}: spark {len(s)}x{len(s.columns)} duck "
                  f"{len(d)}x{len(d.columns)} cols_ok={cols_ok}", flush=True)
            if cols_ok and rows_ok:
                for c in sorted(s.columns):
                    if vhash(s[[c]].astype(str)) != vhash(d[[c]].astype(str)):
                        print(f"     col diff {c}: spark={s[c].head(3).tolist()}"
                              f" duck={d[c].head(3).tolist()}")
            elif not cols_ok:
                print("     spark cols:", list(s.columns))
                print("     duck cols:", list(d.columns))


if __name__ == "__main__":
    main()
