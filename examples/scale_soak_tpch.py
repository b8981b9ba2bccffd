#!/usr/bin/env python
"""Relational-side scale soak (VERDICT r4 item 4): sf1-equivalent TPC-H.

Generates a 10x replica of the sf0.1 fixture (≈6M lineitem rows) with
key-shifted copies — same value distributions, same referential joins
(lineitem->orders->customer, lineitem->part/supplier) — then runs the 22
reference TPC-H SQL-text probes (p_sqltext_q01..q22) AND the bench set
through the SAME oracle comparison the driver uses (DuckDB, sorted-column
order-insensitive value hash), at that scale, recording per-probe wall
times for SCALE.md.

Replication discipline: copy k shifts every key family by k * (max key of
the family at sf0.1), so each copy joins only within itself — cardinality
scales 10x in facts and dims alike while per-key fan-outs (lines per
order, orders per customer) stay exactly at fixture levels. Dates,
prices, quantities are untouched, so every literal window and domain
re-mapping in the probes stays on-distribution.

Usage: python examples/scale_soak_tpch.py [--out /tmp/scale_tpch_sf1]
       [--copies 10] [--skip-gen]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb
import pandas as pd

SRC_SF = "/root/testdata/sf0.1"
TABLES = "region nation customer supplier part orders lineitem".split()
# events/documents/embeddings aren't exercised by the tpch sqltext or
# bench families; link them through so the catalog stays complete
LINK_TABLES = "events documents embeddings".split()

BENCH = ["p_scan", "p_hashagg", "p_innerjoin", "p_topnranking", "p_window"]


def generate(spark, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    src = {t: spark.read.parquet(f"{SRC_SF}/{t}.parquet") for t in TABLES}
    maxes = {
        "orderkey": src["orders"].agg(F.max("o_orderkey")).collect()[0][0],
        "custkey": src["customer"].agg(F.max("c_custkey")).collect()[0][0],
        "partkey": src["part"].agg(F.max("p_partkey")).collect()[0][0],
        "suppkey": src["supplier"].agg(F.max("s_suppkey")).collect()[0][0],
    }
    shifts = {
        # column -> key family
        "o_orderkey": "orderkey", "l_orderkey": "orderkey",
        "o_custkey": "custkey", "c_custkey": "custkey",
        "p_partkey": "partkey", "l_partkey": "partkey",
        "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    }
    copies_df = spark.range(copies).withColumnRenamed("id", "__k")
    for t in TABLES:
        df = src[t]
        if t in ("region", "nation"):
            out = df  # global dims: shared across copies
        else:
            out = df.crossJoin(F.broadcast(copies_df))
            for col in df.columns:
                fam = shifts.get(col)
                if fam is not None:
                    out = out.withColumn(
                        col,
                        (F.col(col) + F.col("__k") * maxes[fam]).cast(
                            df.schema[col].dataType
                        ),
                    )
            if t == "lineitem":
                # De-tie the copies: identical value-sets per copy make
                # "= (SELECT max(total_revenue) ...)" (q15) an exact
                # 10-way FLOAT tie — DuckDB's deterministic sum order
                # keeps the tie bit-exact, Spark's partial-sum order
                # doesn't, so row counts diverge. A per-copy relative
                # nudge of 1e-6 (fractions of a cent; no TPC-H literal
                # predicates touch extendedprice) separates the copies'
                # revenues by ~1e-6 relative — orders of magnitude above
                # FP summation noise — so both engines agree on a unique
                # max. Real sf1 data has no exact FP ties; this keeps
                # the replica faithful to that.
                out = out.withColumn(
                    "l_extendedprice",
                    F.col("l_extendedprice")
                    * (F.lit(1.0) + F.col("__k") * F.lit(1e-6)),
                )
            out = out.drop("__k")
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"generated {t}: {spark.read.parquet(f'{out_dir}/{t}.parquet').count()} rows", flush=True)
    for t in LINK_TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC_SF}/{t}.parquet", dst)


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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_tpch_sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--families",
        default="tpch",
        help="comma list: tpch (22 sqltext + bench), dstext (99 TPC-DS texts)",
    )
    args = ap.parse_args()

    # The engine's tuned session (AQE, CBO, bloom joins, broadcast
    # threshold) — the soak must measure the engine's own posture, not a
    # bare default session.
    from trino_private_spark.engine import get_spark

    spark = get_spark(
        app_name="tpch-soak",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_gen:
        t0 = time.time()
        generate(spark, args.out, args.copies)
        print(f"GEN wall {time.time() - t0:.1f}s", flush=True)

    con = duckdb.connect()
    for t in TABLES + LINK_TABLES:
        p = f"{args.out}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    from trino_private_spark.queries import all_probes

    probes = all_probes()
    fams = {f.strip() for f in args.families.split(",")}
    names = []
    if "tpch" in fams:
        names += [f"p_sqltext_q{i:02d}" for i in range(1, 23)] + BENCH
    if "dstext" in fams:
        names += [f"p_dstext_q{i:02d}" for i in range(1, 100)]
    ok = bad = 0
    rows = []
    for n in names:
        ent = probes[n]
        t0 = time.time()
        try:
            s = ent.fn(spark, args.out).toPandas()
            wall = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {n} spark: {str(e)[:200]}", flush=True)
            bad += 1
            continue
        t1 = time.time()
        d = con.execute(ent.oracle).fetchdf()
        dwall = time.time() - t1
        good = (
            sorted(s.columns) == sorted(d.columns)
            and len(s) == len(d)
            and vhash(s) == vhash(d)
        )
        status = "ok" if good else "FAIL"
        ok += good
        bad += not good
        empty = " EMPTY" if len(s) == 0 else ""
        rows.append((n, wall, dwall, len(s), status))
        print(f"{status} {n}: spark {wall:.1f}s duck {dwall:.1f}s "
              f"rows {len(s)}{empty}", flush=True)
    print(f"SOAK SUMMARY ok={ok} fail={bad} total={len(names)}", flush=True)
    print("| probe | spark wall (s) | duck wall (s) | rows |")
    print("|---|---|---|---|")
    for n, w, dw, r, st in sorted(rows, key=lambda x: -x[1]):
        print(f"| {n} | {w:.1f} | {dw:.1f} | {r} ({st}) |")


if __name__ == "__main__":
    main()
