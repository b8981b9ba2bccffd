"""Scan-PLANNING cost vs manifest count (pure metadata, no Spark).

Round-8 measurement for SCALE.md: the Iceberg metadata plane must stay
O(matching manifests) per statement, not O(all manifests). This script
fabricates a table with N single-partition manifests (the post-churn
shape of a real table before compaction: one manifest per commit),
then times IcebergTable.data_files()

  - cold (empty immutable-manifest cache) full walk,
  - warm full walk (cache hit on every manifest),
  - warm PRUNED walk (manifest-list field_summaries skip all but one
    manifest before it is opened).

Data files never exist on disk — planning never opens them, which is
exactly the point being measured.

Usage: python examples/manifest_plan_bench.py [N_MANIFESTS ...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from trino_private_spark.sources import iceberg as ice
from trino_private_spark.sources.iceberg import IcebergTable
from trino_private_spark.sources.iceberg_write import _commit_snapshot

FIELDS = [(1, "k", "long"), (2, "grp", "long")]
SPEC = [
    {"name": "grp", "transform": "identity", "source-id": 2, "field-id": 1000}
]


def build(n_manifests: int) -> str:
    loc = tempfile.mkdtemp(prefix="tps_planbench_") + "/t"
    for i in range(n_manifests):
        files = [
            {
                "path": f"/nonexistent/data-{i}-{j}.parquet",
                "record_count": 1000,
                "file_size_in_bytes": 4096,
                "partition": {"grp": i},
                "metrics": {},
            }
            for j in range(4)  # 4 files per manifest
        ]
        _commit_snapshot(
            loc,
            [(files, 0)],
            operation="append",
            schema_fields=FIELDS if i == 0 else None,
            partition_spec=SPEC if i == 0 else None,
        )
    return loc


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100, 500, 1000]
    print(
        f"{'manifests':>9} {'cold_full_s':>11} {'warm_full_s':>11} "
        f"{'warm_pruned_s':>13} {'opened':>6}"
    )
    for n in sizes:
        loc = build(n)
        t = IcebergTable(loc)
        ice._AVRO_CACHE.clear()
        cold = timed(lambda: t.data_files(), reps=1)
        warm = timed(lambda: t.data_files())
        pf = [("grp", "=", n // 2)]
        pruned = timed(lambda: t.data_files(partition_filter=pf))
        t.data_files(partition_filter=pf)
        opened = t.last_manifest_scan["manifests_opened"]
        print(
            f"{n:>9} {cold:>11.4f} {warm:>11.4f} {pruned:>13.4f} "
            f"{opened:>6}"
        )
        shutil.rmtree(loc.rsplit("/", 1)[0], ignore_errors=True)


if __name__ == "__main__":
    main()
