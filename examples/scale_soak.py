#!/usr/bin/env python
"""Scale soak for the LLM-pipeline operators (VERDICT r2 item 5).

Generates a sf1-equivalent synthetic corpus — 10x the sf0.1 fixture:
50k documents with injected exact/near-dup structure and 20k clustered
embeddings — then runs every llm-tagged probe through the SAME oracle
comparison the driver uses, at that scale.  This verifies the skew caps,
count-derived cutoffs and recall floors hold off the tiny fixtures, and
records per-probe wall times (SCALE.md).

The generator deliberately uses a LARGER vocabulary (4000 tokens) than the
fixtures: at 50k docs a 20-word vocab would make every doc share shingles
with every other, which is neither realistic nor scalable for truth-set
construction.  Dup partners are spread uniformly over the id range so the
probes' count-derived cutoffs keep the truth sets non-vacuous.

Usage: python examples/scale_soak.py [--out /tmp/scale_sf1] [--docs 50000]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF = "/root/testdata/sf0.1"
LINK_TABLES = "region nation customer supplier part orders lineitem events".split()


def generate(out_dir: str, n_docs: int, n_vecs: int, seed: int = 7) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i:04d}" for i in range(4000)])
    langs = np.array(["en", "zh", "de", "fr", "es"])
    sources = np.array(["web", "book", "code", "wiki"])

    texts: list[str] = []
    for i in range(n_docs):
        r = i % 10
        if r == 9 and i >= 9:
            # near-dup of doc i-9 (same decade -> both land on the same
            # side of any count-proportional cutoff): replace 2 words
            words = texts[i - 9].split()
            for _ in range(2):
                words[int(rng.integers(len(words)))] = str(
                    vocab[int(rng.integers(len(vocab)))]
                )
            texts.append(" ".join(words))
        elif r == 8 and i >= 8:
            # exact dup of doc i-8
            texts.append(texts[i - 8])
        else:
            n_words = int(rng.integers(30, 80))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[np.arange(n_docs) % len(langs)], pa.string()),
            "source": pa.array(
                sources[np.arange(n_docs) % len(sources)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # embeddings: 10 clusters in 64-d, unit-ish vectors with gaussian noise
    centers = rng.normal(size=(10, 64)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vecs)
    vecs = centers[labels] + rng.normal(scale=0.15, size=(n_vecs, 64)).astype(
        np.float32
    )
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    for t in LINK_TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC_SF, f"{t}.parquet"), dst)


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


def vhash(p: pd.DataFrame) -> str:
    p = p[sorted(p.columns)]
    rows = sorted("|".join(canon(v) for v in r) for r in p.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_sf1")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vecs", type=int, default=20_000)
    ap.add_argument("--tags", default="llm")
    args = ap.parse_args()

    t0 = time.time()
    generate(args.out, args.docs, args.vecs)
    print(f"generated {args.docs} docs / {args.vecs} vecs in {time.time()-t0:.1f}s")

    import duckdb
    from pyspark.sql import SparkSession

    from trino_private_spark.queries import all_probes

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in LINK_TABLES + ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.out}/{t}.parquet'"
        )

    wanted = set(args.tags.split(","))
    probes = {
        n: p for n, p in all_probes().items() if wanted & set(p.tags)
    }
    ok = bad = weak = 0
    timings: dict[str, float] = {}
    for n in sorted(probes):
        p = probes[n]
        t1 = time.time()
        try:
            s = p.fn(spark, args.out).toPandas()
        except Exception as e:  # noqa: BLE001
            print("FAIL", n, str(e)[:160])
            bad += 1
            continue
        timings[n] = time.time() - t1
        if p.oracle is None:
            weak += 1
            continue
        d = con.execute(p.oracle).fetchdf()
        if (
            sorted(s.columns) != sorted(d.columns)
            or len(s) != len(d)
            or vhash(s) != vhash(d)
        ):
            print("FAIL", n, f"mismatch spark_rows={len(s)} oracle_rows={len(d)}")
            bad += 1
            continue
        ok += 1
    print("\nper-probe seconds (slowest first):")
    for n, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"  {sec:7.1f}  {n}")
    print(
        f"SOAK SUMMARY ok={ok} weak={weak} fail={bad} total={len(probes)} "
        f"docs={args.docs} wall={time.time()-t0:.0f}s"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
