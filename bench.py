#!/usr/bin/env python
"""BENCH harness: times the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Protocol mirrors the reference benchmark config (BASELINE.md): 1 warm-up run
then median of 3 measured runs per query, timed around a full materialization
(collect of the already-declared plan — the driver-side equivalent of the
reference's runs/prewarm-runs protocol in tpch.yaml).

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
        fn(spark, sf_dir).collect()  # warm-up (JIT + file listing + codegen)
        runs = []
        for _ in range(3):
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
