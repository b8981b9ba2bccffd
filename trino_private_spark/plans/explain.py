"""Plan inspection helpers: EXPLAIN (ANALYZE) + plan-shape assertions.

Reference analogue: ExplainAnalyzeOperator + the plan-shape test matchers
(core/trino-main/src/test/.../sql/planner/assertions/). The assertion
helpers let tests pin the physical properties that matter at 100 TB:
pushed filters reached the scan, the small side actually broadcast, the
whole-stage codegen span covers the hot expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert every fragment appears in the PushedFilters of the plan."""
    plan = explain_str(df)
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; plan:\n{plan}"


def assert_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = explain_str(df)
    for frag in fragments:
        assert frag in plan, f"{frag!r} not in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = explain_str(df)
    for frag in fragments:
        assert frag not in plan, f"{frag!r} unexpectedly in plan:\n{plan}"


def explain_typed(df: DataFrame, type_: str = "DISTRIBUTED") -> str:
    """Trino's ``EXPLAIN (TYPE ...)`` forms (SqlBase.g4:124 explainOption)
    mapped onto Spark plan surfaces:

    - LOGICAL     -> the Catalyst optimized logical plan
    - DISTRIBUTED -> the physical plan with exchanges (formatted mode, the
                     closest analogue of Trino's fragmented distributed plan)
    - VALIDATE    -> analysis only; returns "VALID" or raises
    - IO          -> JSON of the tables/files read, pushed filters and the
                     pruned read schema (IoPlanPrinter analogue), extracted
                     from the formatted plan's scan nodes
    """
    t = type_.strip().upper()
    qe = df._jdf.queryExecution()  # noqa: SLF001
    if t == "LOGICAL":
        return qe.optimizedPlan().toString()
    if t == "DISTRIBUTED":
        return explain_str(df, "formatted")
    if t == "VALIDATE":
        qe.analyzed()  # raises AnalysisException on invalid queries
        return "VALID"
    if t == "IO":
        import json

        # Walk the physical plan OBJECTS (not the formatted text, which is
        # brittle to render changes and silently drops fields): every scan
        # leaf of the pre-adaptive plan carries a metadata map with the
        # pushed filters, pruned read schema and file locations — the same
        # facts Trino's IoPlanPrinter reports. Pushdown is decided at
        # planning time, so qe.sparkPlan() (stable node shape, no AQE
        # wrapper hiding the subtree) is the right surface.
        plan = qe.sparkPlan()
        leaves = plan.collectLeaves()
        scans = []
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            cls = leaf.getClass().getSimpleName()
            entry: dict = {}
            if cls == "FileSourceScanExec":
                meta = leaf.metadata()
                it = meta.iterator()
                raw = {}
                while it.hasNext():
                    kv = it.next()
                    raw[kv._1()] = kv._2()
                entry["format"] = raw.get("Format", "").lower()
                tid = leaf.tableIdentifier()
                entry["table"] = str(tid.get()) if tid.isDefined() else ""
                for key, label in (
                    ("Location", "location"),
                    ("PushedFilters", "pushedFilters"),
                    ("PartitionFilters", "partitionFilters"),
                    ("ReadSchema", "readSchema"),
                ):
                    if key in raw:
                        entry[label] = raw[key]
                # a parquet leaf under a registered Iceberg table root is
                # part of a composed Iceberg read: report the TABLE, the
                # way IoPlanPrinter names the connector table
                try:
                    from trino_private_spark.sources.iceberg import (
                        IO_TABLE_ROOTS,
                    )

                    loc = entry.get("location", "")
                    for root in IO_TABLE_ROOTS:
                        if root and root in loc:
                            entry["format"] = "iceberg"
                            entry["table"] = root
                            # manifest-level scan planning stats (candidate/
                            # scanned/pruned data files — the reference's
                            # split pruning counts from IcebergSplitSource)
                            from trino_private_spark.sources.iceberg import (
                                IO_SCAN_INFO,
                            )

                            if root in IO_SCAN_INFO:
                                entry["icebergScan"] = IO_SCAN_INFO[root]
                            break
                except ImportError:  # pragma: no cover
                    pass
            elif cls == "RowDataSourceScanExec":
                # JDBC (and other row-based V1 sources): metadata carries
                # the pushed filters and read schema like the file scan
                meta = leaf.metadata()
                it = meta.iterator()
                raw = {}
                while it.hasNext():
                    kv = it.next()
                    raw[kv._1()] = kv._2()
                entry["format"] = "jdbc"
                entry["table"] = ""
                if "PushedFilters" in raw:
                    entry["pushedFilters"] = raw["PushedFilters"]
                if "ReadSchema" in raw:
                    entry["readSchema"] = raw["ReadSchema"]
            elif cls in ("InMemoryTableScanExec", "TableCacheQueryStageExec"):
                entry["format"] = "cached"
                entry["table"] = ""
            elif cls in ("RDDScanExec", "LocalTableScanExec"):
                # VALUES / in-memory literals: no external IO.
                continue
            else:
                entry["format"] = cls
                entry["table"] = ""
            scans.append(entry)
        return json.dumps({"inputTableInfos": scans}, indent=2)
    raise ValueError(f"unsupported EXPLAIN TYPE {type_!r}")
