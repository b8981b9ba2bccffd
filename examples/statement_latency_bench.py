"""End-to-end ``Engine.sql()`` statement latency vs Iceberg file count.

Round-9 measurement for SCALE.md (r8 VERDICT "What's missing" #1): the
Python-side scan PLANNING was already cached (data_files() 6.3 ms warm
at 102k files), but every ``sql()`` statement re-registered each
referenced Iceberg view from a fresh ``read_iceberg(...)`` — rebuilding
the full Spark relation (``spark.read.parquet(<100k paths>)`` plus any
merge-on-read joins) per statement even when the table's metadata
version was unchanged. The reference reuses the loaded table handle per
query (IcebergMetadata caches it); round 9 caches the constructed
full-read DataFrame per (metadata version, session).

This script fabricates a REAL small table, then grafts N-file manifests
onto it metadata-only (the files alias the same physical parquet files
so the relation is constructible), and times:

  - read_iceberg() cold (first construction at this metadata version),
  - read_iceberg() warm (the per-version DataFrame cache),
  - Engine.sql("SELECT COUNT(*) ...") statement-to-DataFrame latency
    (analysis only, no execution) on repeat statements.

Usage: python examples/statement_latency_bench.py [N_FILES ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from trino_private_spark.sources import iceberg as ice  # noqa: E402
from trino_private_spark.sources.iceberg import IcebergTable, read_iceberg
from trino_private_spark.sources.iceberg_write import (
    _commit_snapshot,
    iceberg_create,
)

FIELDS = [(1, "k", "long")]


def build(spark, n_files: int) -> str:
    loc = tempfile.mkdtemp(prefix="tps_stmtbench_") + "/t"
    iceberg_create(spark.range(0, 100).selectExpr("id AS k"), loc)
    real = [f.path for f in IcebergTable(loc).data_files()]
    # graft n_files DISTINCT paths (hard links to the real parquet
    # files — zero extra bytes) so relation construction really carries
    # n_files paths; aliased paths would dedupe in read()
    data_dir = os.path.join(loc, "data")
    per_manifest = 1024
    groups = []
    for i in range(0, n_files, per_manifest):
        files = []
        for j in range(i, min(i + per_manifest, n_files)):
            p = os.path.join(data_dir, f"graft-{j}.parquet")
            os.link(real[j % len(real)], p)
            files.append(
                {
                    "path": p,
                    "record_count": 100,
                    "file_size_in_bytes": 4096,
                    "metrics": {},
                }
            )
        groups.append((files, 0))
    _commit_snapshot(loc, groups, operation="append", replace=True)
    return loc


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from trino_private_spark.api import Engine
    from trino_private_spark.engine import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 10240, 102400]
    spark = get_spark(app_name="stmt-latency-bench")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)
    print(
        f"{'files':>7} {'read_cold_s':>11} {'read_warm_s':>11} "
        f"{'sql_first_s':>11} {'sql_repeat_s':>12}"
    )
    for n in sizes:
        loc = build(spark, n)
        ice._AVRO_CACHE.clear()
        ice._DATAFILE_CACHE.clear()
        ice._READ_DF_CACHE.clear()
        cold = timed(lambda: read_iceberg(spark, loc), reps=1)
        warm = timed(lambda: read_iceberg(spark, loc))
        eng._iceberg_views = {"bigt": loc}
        ice._READ_DF_CACHE.clear()  # honest cold-statement measurement
        sql_first = timed(
            lambda: eng.sql("SELECT COUNT(*) AS n FROM bigt"), reps=1
        )
        repeat = timed(lambda: eng.sql("SELECT COUNT(*) AS n FROM bigt"))
        print(
            f"{n:>7} {cold:>11.4f} {warm:>11.4f} {sql_first:>11.4f} "
            f"{repeat:>12.4f}"
        )
        shutil.rmtree(os.path.dirname(loc), ignore_errors=True)


if __name__ == "__main__":
    main()
