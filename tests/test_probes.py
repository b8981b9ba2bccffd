"""Oracle-diff tests: every probe with an oracle runs on Spark and DuckDB at
sf0.01 and must match exactly after driver-style normalization — the same
gate the driver applies (CORRECTNESS_r{N}.json). Probes without an oracle
are smoke-checked for stable schema + execution here and property-tested in
their dedicated test modules.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, compare_frames
from trino_private_spark.queries import all_probes

PROBES = all_probes()


@pytest.mark.parametrize("name", sorted(PROBES))
def test_probe_matches_oracle(name, spark, duck):
    p = PROBES[name]
    sdf = p.fn(spark, SF_ORACLE)
    spark_pdf = sdf.toPandas()
    if p.oracle is None:
        assert len(spark_pdf) >= 0
        # re-run must be deterministic
        again = p.fn(spark, SF_ORACLE).toPandas()
        compare_frames(spark_pdf, again, f"{name} (determinism)")
        return
    duck_pdf = duck.execute(p.oracle).fetchdf()
    compare_frames(spark_pdf, duck_pdf, name)
