#!/usr/bin/env python
"""BENCH harness: times the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Protocol mirrors the reference benchmark config (BASELINE.md, tpch.yaml:24-37
``runs: 6, prewarm-runs: 2``): 2 warm-up runs then median of 5 measured runs
per query, timed around a full materialization (collect of the
already-declared plan). Sub-second queries on a shared 32-core box jitter
±30% run-to-run; median-of-5 after double prewarm keeps single outliers from
reading as regressions (VERDICT r5 recommendation).

Prints ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": "..."}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

BENCH_QUERIES = ["p_scan", "p_hashagg", "p_innerjoin", "p_topnranking", "p_window"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from trino_private_spark.engine import get_spark
    from trino_private_spark.queries import all_probes

    spark = get_spark(app_name="tps-bench")
    probes = all_probes()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = probes[name].fn
        for _ in range(2):  # warm-up (JIT + file listing + codegen)
            fn(spark, sf_dir).collect()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
