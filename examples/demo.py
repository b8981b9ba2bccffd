#!/usr/bin/env python
"""Five-minute tour of the engine — run: python examples/demo.py [sf_dir].

Walks the surfaces a reference-engine user cares about: translated Trino
SQL, MATCH_RECOGNIZE, geospatial SQL, sketches, the LLM-data pipeline,
and copy-on-write time travel.
"""

from __future__ import annotations

import os
import sys
import tempfile


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.functions.geometry import register_geometry_udfs

    eng = Engine()
    eng.spark.sparkContext.setLogLevel("ERROR")
    eng.attach(sf_dir)
    register_geometry_udfs(eng.spark)

    print("== Trino SQL through the dialect translator ==")
    eng.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS orders, CAST(SUM(o_totalprice) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY revenue DESC
        FETCH FIRST 3 ROWS ONLY
        """
    ).show()

    print("== MATCH_RECOGNIZE (the reference's own syntax) ==")
    eng.sql(
        """SELECT * FROM orders MATCH_RECOGNIZE (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ONE ROW PER MATCH
             PATTERN (UP{3,})
             DEFINE UP AS o_totalprice > PREV(o_totalprice)
           )"""
    ).orderBy(F.col("n_rows").desc()).show(3)

    print("== Geospatial SQL (73 ST_* functions) ==")
    eng.spark.sql(
        """
        SELECT round(st_area(st_intersection(
                 'POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))',
                 'POLYGON ((1 1, 5 1, 5 3, 1 3, 1 1))')), 2)  AS lshape_clip,
               round(st_area(st_buffer('LINESTRING (0 0, 10 0)', 2.0)), 2) AS capsule,
               geometry_de9im('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))',
                              'POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))')       AS touch_matrix
        """
    ).show(truncate=False)

    print("== Mergeable sketches ==")
    from trino_private_spark.functions.kll import kll_agg, kll_value_at_quantile

    sk = kll_agg(eng.spark.table("orders"), "o_totalprice", ["o_orderstatus"])
    sk.select(
        "o_orderstatus", F.round(kll_value_at_quantile(F.col("kll"), 0.5), 2).alias("p50")
    ).orderBy("o_orderstatus").show()

    print("== LLM-data pipeline: near-dup candidates + PII scrub ==")
    from trino_private_spark.llm.dedup import minhash_lsh_candidates
    from trino_private_spark.llm.text import scrub_pii

    docs = eng.spark.table("documents")
    print("LSH near-dup candidate pairs:", minhash_lsh_candidates(docs).count())
    docs.select(
        scrub_pii(
            F.concat(F.lit("contact alice@example.com about: "), F.col("text"))
        ).alias("scrubbed")
    ).show(1, truncate=80)

    print("== Copy-on-write snapshots + time travel ==")
    with tempfile.TemporaryDirectory() as root:
        eng.create_cow_table(
            "demo_orders", "SELECT * FROM orders WHERE o_orderkey <= 100",
            os.path.join(root, "t"),
        )
        n0 = eng.spark.table("demo_orders").count()
        eng.delete_from("demo_orders", "o_orderkey <= 50")
        print("rows now:", eng.spark.table("demo_orders").count(), "| v0 had:", eng.read_version("demo_orders", 0).count(), "| started with:", n0)
        eng.snapshots("demo_orders").show()

    eng.spark.stop()


if __name__ == "__main__":
    main()
