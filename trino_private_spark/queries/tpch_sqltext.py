"""The reference's ACTUAL TPC-H Trino SQL texts, end-to-end through the
dialect translator (plans/translate.py) — probes p_sqltext_q01..q22.

Source texts: testing/trino-benchto-benchmarks/src/main/resources/sql/
presto/tpch/q01.sql..q22.sql (read verbatim from /root/reference at run
time; replaying the reference's own benchmark corpus is the verification
assignment, per SURVEY §5/§6).

Fixture adaptation (FIXTURES.md: the driver's star schema is a TRIMMED
TPC-H — no partsupp, several columns dropped): each probe first registers
``tpch_<table>`` temp views that expose the benchto-style UNPREFIXED column
names and synthesize the missing columns with DETERMINISTIC integer-keyed
formulas, and the DuckDB oracle defines the SAME relations as CTEs with the
same formulas — so both engines query identical data and the comparison
stays a full value-hash. partsupp is derived from lineitem's actual
(partkey, suppkey) pairs so every partsupp join is non-vacuous.

Per-query text patches (_PATCHES, applied IDENTICALLY on both sides):
output aliases where the reference text leaves duplicate/unnamed columns
(q02/q10/q18 — the hash compare needs unique names), total-order
tie-breakers appended to ORDER BY ... LIMIT prefixes (q03/q10/q18 — the
reference's sort is not total, so the LIMIT prefix is engine-dependent
otherwise), ``date(x)`` -> ``DATE x`` (q20; Trino's date() is a cast,
DuckDB has no such function), and ``${scale}`` -> 1 (q11).

CONSTANT re-domaining (also in _PATCHES, so that the probes are
non-vacuous): the texts' TPC-H literals target dbgen's value domains, but
the driver fixture is synthetic (FIXTURES.md) — nations are 'NATION_0'..
'NATION_24', part types single words, dates start 1995. Date windows are
shifted into the fixture span (1993/1994 -> 1996) and nation/type/brand/
name literals mapped into the synthetic domains ('GERMANY' -> 'NATION_7',
'ECONOMY ANODIZED STEEL' -> 'ECONOMY', '%green%' -> '%red%', ...); q22's
NOT EXISTS gets a date bound because every fixture customer has orders.
Query STRUCTURE — joins, subqueries, grouping, having, ordering — is
byte-identical to the reference text.

Double aggregates are rounded AFTER the query on both sides (driver
convention, FIXTURES.md) and DATE outputs canonicalized to strings.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import probe

_REF_DIR = (
    "/root/reference/testing/trino-benchto-benchmarks/src/main/resources/"
    "sql/presto/tpch"
)

_TBL = re.compile(r'"\$\{database\}"\."\$\{schema\}"\."\$\{prefix\}(\w+)"')

_SHIPMODES = "'REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'"
_INSTRUCT = "'DELIVER IN PERSON','COLLECT COD','NONE','TAKE BACK RETURN'"
_CONTAINERS = (
    "'SM CASE','SM BOX','SM PACK','SM PKG','MED BAG','MED BOX','MED PKG',"
    "'MED PACK','LG CASE','LG BOX','LG PACK','LG PKG'"
)

# ---- augmented relations: Spark temp-view SQL (reads the sf_dir parquet) --


def _spark_views(sf: str) -> dict[str, str]:
    p = lambda t: f"parquet.`{sf}/{t}.parquet`"  # noqa: E731
    return {
        "tpch_region": f"""
            SELECT r_regionkey AS regionkey, r_name AS name FROM {p('region')}""",
        "tpch_nation": f"""
            SELECT n_nationkey AS nationkey, n_name AS name,
                   n_regionkey AS regionkey FROM {p('nation')}""",
        "tpch_customer": f"""
            SELECT c_custkey AS custkey, c_name AS name,
                   c_nationkey AS nationkey, c_acctbal AS acctbal,
                   c_mktsegment AS mktsegment,
                   'caddr' || CAST(c_custkey % 89 AS STRING) AS address,
                   CAST(c_custkey % 25 + 10 AS STRING) || '-' ||
                     CAST(c_custkey % 900 + 100 AS STRING) AS phone,
                   'cc' || CAST(c_custkey % 100 AS STRING) AS comment
            FROM {p('customer')}""",
        "tpch_supplier": f"""
            SELECT s_suppkey AS suppkey, s_name AS name,
                   s_nationkey AS nationkey, s_acctbal AS acctbal,
                   'addr' || CAST(s_suppkey % 97 AS STRING) AS address,
                   CAST(s_suppkey % 25 + 10 AS STRING) || '-' ||
                     CAST(s_suppkey % 900 + 100 AS STRING) AS phone,
                   CASE WHEN s_suppkey % 13 = 0
                        THEN 'slow Customer service Complaints noted'
                        ELSE 'sc' || CAST(s_suppkey % 100 AS STRING) END
                     AS comment
            FROM {p('supplier')}""",
        "tpch_part": f"""
            SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand,
                   p_type AS type, p_size AS size,
                   p_retailprice AS retailprice,
                   'Manufacturer#' || CAST(p_partkey % 5 + 1 AS STRING)
                     AS mfgr,
                   element_at(array({_CONTAINERS}),
                              CAST(p_partkey % 12 AS INT) + 1) AS container,
                   'pc' || CAST(p_partkey % 100 AS STRING) AS comment
            FROM {p('part')}""",
        "tpch_orders": f"""
            SELECT o_orderkey AS orderkey, o_custkey AS custkey,
                   o_orderstatus AS orderstatus, o_totalprice AS totalprice,
                   CAST(o_orderdate AS DATE) AS orderdate,
                   o_orderpriority AS orderpriority,
                   0 AS shippriority,
                   'Clerk#' || CAST(o_custkey % 1000 AS STRING) AS clerk,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN 'special deposits requests'
                        ELSE 'oc' || CAST(o_orderkey % 50 AS STRING) END
                     AS comment
            FROM {p('orders')}""",
        "tpch_lineitem": f"""
            SELECT l_orderkey AS orderkey, l_partkey AS partkey,
                   l_suppkey AS suppkey, l_linenumber AS linenumber,
                   l_quantity AS quantity, l_extendedprice AS extendedprice,
                   l_discount AS discount, l_tax AS tax,
                   l_returnflag AS returnflag, l_linestatus AS linestatus,
                   CAST(l_shipdate AS DATE) AS shipdate,
                   DATE_ADD(CAST(l_shipdate AS DATE),
                            CAST(l_orderkey % 30 AS INT) - 15) AS commitdate,
                   DATE_ADD(CAST(l_shipdate AS DATE),
                            CAST(l_orderkey % 30 AS INT) - 15
                            + CAST(l_suppkey % 10 AS INT) - 4)
                     AS receiptdate,
                   element_at(array({_SHIPMODES}),
                              CAST((l_orderkey + l_linenumber) % 7 AS INT)
                              + 1) AS shipmode,
                   element_at(array({_INSTRUCT}),
                              CAST(l_suppkey % 4 AS INT) + 1) AS shipinstruct,
                   'lc' || CAST(l_orderkey % 100 AS STRING) AS comment
            FROM {p('lineitem')}""",
        "tpch_partsupp": f"""
            SELECT partkey, suppkey,
                   CAST((partkey * 31 + suppkey * 17) % 9999 + 1 AS INT)
                     AS availqty,
                   CAST((partkey * 53 + suppkey * 19) % 10000 AS DOUBLE)
                     / 100.0 + 1.0 AS supplycost,
                   'psc' || CAST(partkey % 100 AS STRING) AS comment
            FROM (SELECT DISTINCT l_partkey AS partkey,
                                  l_suppkey AS suppkey
                  FROM {p('lineitem')})""",
    }


# ---- the same relations as DuckDB CTEs over the driver-registered views --

_DUCK_CTES = f"""
tpch_region AS (
  SELECT r_regionkey AS regionkey, r_name AS name FROM region),
tpch_nation AS (
  SELECT n_nationkey AS nationkey, n_name AS name, n_regionkey AS regionkey
  FROM nation),
tpch_customer AS (
  SELECT c_custkey AS custkey, c_name AS name, c_nationkey AS nationkey,
         c_acctbal AS acctbal, c_mktsegment AS mktsegment,
         'caddr' || CAST(c_custkey % 89 AS VARCHAR) AS address,
         CAST(c_custkey % 25 + 10 AS VARCHAR) || '-' ||
           CAST(c_custkey % 900 + 100 AS VARCHAR) AS phone,
         'cc' || CAST(c_custkey % 100 AS VARCHAR) AS comment
  FROM customer),
tpch_supplier AS (
  SELECT s_suppkey AS suppkey, s_name AS name, s_nationkey AS nationkey,
         s_acctbal AS acctbal,
         'addr' || CAST(s_suppkey % 97 AS VARCHAR) AS address,
         CAST(s_suppkey % 25 + 10 AS VARCHAR) || '-' ||
           CAST(s_suppkey % 900 + 100 AS VARCHAR) AS phone,
         CASE WHEN s_suppkey % 13 = 0
              THEN 'slow Customer service Complaints noted'
              ELSE 'sc' || CAST(s_suppkey % 100 AS VARCHAR) END AS comment
  FROM supplier),
tpch_part AS (
  SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand,
         p_type AS type, p_size AS size, p_retailprice AS retailprice,
         'Manufacturer#' || CAST(p_partkey % 5 + 1 AS VARCHAR) AS mfgr,
         list_extract([{_CONTAINERS}],
                      CAST(p_partkey % 12 AS INTEGER) + 1) AS container,
         'pc' || CAST(p_partkey % 100 AS VARCHAR) AS comment
  FROM part),
tpch_orders AS (
  SELECT o_orderkey AS orderkey, o_custkey AS custkey,
         o_orderstatus AS orderstatus, o_totalprice AS totalprice,
         CAST(o_orderdate AS DATE) AS orderdate,
         o_orderpriority AS orderpriority, 0 AS shippriority,
         'Clerk#' || CAST(o_custkey % 1000 AS VARCHAR) AS clerk,
         CASE WHEN o_orderkey % 7 = 0 THEN 'special deposits requests'
              ELSE 'oc' || CAST(o_orderkey % 50 AS VARCHAR) END AS comment
  FROM orders),
tpch_lineitem AS (
  SELECT l_orderkey AS orderkey, l_partkey AS partkey,
         l_suppkey AS suppkey, l_linenumber AS linenumber,
         l_quantity AS quantity, l_extendedprice AS extendedprice,
         l_discount AS discount, l_tax AS tax, l_returnflag AS returnflag,
         l_linestatus AS linestatus, CAST(l_shipdate AS DATE) AS shipdate,
         CAST(l_shipdate AS DATE)
           + (CAST(l_orderkey % 30 AS INTEGER) - 15) AS commitdate,
         CAST(l_shipdate AS DATE)
           + (CAST(l_orderkey % 30 AS INTEGER) - 15
              + CAST(l_suppkey % 10 AS INTEGER) - 4) AS receiptdate,
         list_extract([{_SHIPMODES}],
                      CAST((l_orderkey + l_linenumber) % 7 AS INTEGER) + 1)
           AS shipmode,
         list_extract([{_INSTRUCT}],
                      CAST(l_suppkey % 4 AS INTEGER) + 1) AS shipinstruct,
         'lc' || CAST(l_orderkey % 100 AS VARCHAR) AS comment
  FROM lineitem),
tpch_partsupp AS (
  SELECT partkey, suppkey,
         CAST((partkey * 31 + suppkey * 17) % 9999 + 1 AS INTEGER)
           AS availqty,
         CAST((partkey * 53 + suppkey * 19) % 10000 AS DOUBLE) / 100.0
           + 1.0 AS supplycost,
         'psc' || CAST(partkey % 100 AS VARCHAR) AS comment
  FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
        FROM lineitem))
"""

# ---- per-query adaptations / output contracts --------------------------

_PATCHES: dict[str, list[tuple[str, str]]] = {
    "q02": [
        (
            "s.acctbal,\n  s.name,\n  n.name,\n  p.partkey,\n  p.mfgr,\n"
            "  s.address,\n  s.phone,\n  s.comment",
            "s.acctbal,\n  s.name AS s_name,\n  n.name AS n_name,\n"
            "  p.partkey,\n  p.mfgr,\n  s.address,\n  s.phone,\n"
            "  s.comment AS s_comment",
        ),
        ("like '%BRASS'", "like '%STANDARD'"),
    ],
    "q03": [("ORDER BY\n  revenue DESC,\n  o.orderdate\nLIMIT 10",
             "ORDER BY\n  revenue DESC,\n  o.orderdate,\n  l.orderkey"
             "\nLIMIT 10")],
    "q04": [("DATE '1993-07-01'", "DATE '1996-07-01'")],
    "q05": [("DATE '1994-01-01'", "DATE '1996-01-01'")],
    "q06": [("DATE '1994-01-01'", "DATE '1996-01-01'")],
    "q07": [("'FRANCE'", "'NATION_6'"), ("'GERMANY'", "'NATION_7'")],
    "q08": [("'BRAZIL'", "'NATION_2'"),
            ("'ECONOMY ANODIZED STEEL'", "'ECONOMY'")],
    "q09": [("'%green%'", "'%red%'")],
    "q10": [
        ("c.name,\n  sum", "c.name AS c_name,\n  sum"),
        ("c.acctbal,\n  n.name,", "c.acctbal,\n  n.name AS n_name,"),
        ("ORDER BY\n  revenue DESC\nLIMIT 20",
         "ORDER BY\n  revenue DESC, c.custkey\nLIMIT 20"),
        ("DATE '1993-10-01'", "DATE '1996-10-01'"),
    ],
    "q11": [("${scale}", "1"), ("'GERMANY'", "'NATION_7'")],
    "q12": [("DATE '1994-01-01'", "DATE '1996-01-01'")],
    "q15": [
        # Compare the scalar-max at cent precision, identically on both
        # engines. Both Spark and DuckDB inline the revenue0 CTE, so the
        # "= (SELECT max(...))" predicate evaluates the SAME double sum
        # TWICE with independent parallel orderings; above ~1M rows the
        # two orderings differ in the last bits and the exact-equality
        # filter silently returns 0 rows (caught by the sf1 soak,
        # SCALE.md). round(..., 2) makes the self-comparison stable at
        # any scale; the engine-vs-engine hash still goes through _ROUND.
        ("total_revenue = (SELECT max(total_revenue) FROM revenue0)",
         "round(total_revenue, 2) = "
         "(SELECT max(round(total_revenue, 2)) FROM revenue0)"),
    ],
    "q16": [("'Brand#45'", "'Brand#4'"),
            ("'MEDIUM POLISHED%'", "'MEDIUM%'")],
    "q18": [
        ("sum(l.quantity)\nFROM", "sum(l.quantity) AS sum_qty\nFROM"),
        ("ORDER BY\n  o.totalprice DESC,\n  o.orderdate\nLIMIT 100",
         "ORDER BY\n  o.totalprice DESC,\n  o.orderdate,\n  o.orderkey"
         "\nLIMIT 100"),
    ],
    "q19": [("'Brand#34'", "'Brand#14'")],
    "q20": [("date('1994-01-01')", "DATE '1994-01-01'"),
            ("'forest%'", "'red%'"), ("'CANADA'", "'NATION_3'"),
            ("DATE '1994-01-01'", "DATE '1996-01-01'")],
    "q21": [("'SAUDI ARABIA'", "'NATION_11'")],
    "q22": [("o.custkey = c.custkey",
             "o.custkey = c.custkey AND o.orderdate < DATE '1996-01-01'")],
}

_COLS: dict[str, list[str]] = {
    "q01": ["returnflag", "linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
            "avg_disc", "count_order"],
    "q02": ["acctbal", "s_name", "n_name", "partkey", "mfgr", "address",
            "phone", "s_comment"],
    "q03": ["orderkey", "revenue", "orderdate", "shippriority"],
    "q04": ["orderpriority", "order_count"],
    "q05": ["name", "revenue"],
    "q06": ["revenue"],
    "q07": ["supp_nation", "cust_nation", "l_year", "revenue"],
    "q08": ["o_year", "mkt_share"],
    "q09": ["nation", "o_year", "sum_profit"],
    "q10": ["custkey", "c_name", "revenue", "acctbal", "n_name", "address",
            "phone", "comment"],
    "q11": ["partkey", "value"],
    "q12": ["shipmode", "high_line_count", "low_line_count"],
    "q13": ["c_count", "custdist"],
    "q14": ["promo_revenue"],
    "q15": ["suppkey", "name", "address", "phone", "total_revenue"],
    "q16": ["brand", "type", "size", "supplier_cnt"],
    "q17": ["avg_yearly"],
    "q18": ["name", "custkey", "orderkey", "orderdate", "totalprice",
            "sum_qty"],
    "q19": ["revenue"],
    "q20": ["name", "address"],
    "q21": ["name", "numwait"],
    "q22": ["cntrycode", "numcust", "totacctbal"],
}

# Rounding applies identically on both sides with a +1.3e-5 nudge first:
# sums of 2dp x 2dp products land EXACTLY on .xx5 midpoints, where Spark
# (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB (binary
# half-away-from-zero) disagree even for identical doubles; the nudge moves
# every on-grid value safely off the midpoint without affecting any other
# value at these scales.
_ROUND: dict[str, dict[str, int]] = {
    "q01": {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2,
            "sum_charge": 2, "avg_qty": 4, "avg_price": 4, "avg_disc": 4},
    "q03": {"revenue": 2},
    "q05": {"revenue": 2},
    "q06": {"revenue": 2},
    "q07": {"revenue": 2},
    "q08": {"mkt_share": 6},
    "q09": {"sum_profit": 2},
    "q10": {"revenue": 2},
    "q11": {"value": 2},
    "q14": {"promo_revenue": 6},
    "q15": {"total_revenue": 2},
    "q17": {"avg_yearly": 2},
    "q18": {"sum_qty": 2},
    "q19": {"revenue": 2},
    "q22": {"totacctbal": 2},
}

# integer outputs whose width differs between engines (Spark year() ->
# int32 vs DuckDB extract -> int64; DuckDB sum(int) -> hugeint)
_LONGS: dict[str, tuple[str, ...]] = {
    "q07": ("l_year",),
    "q08": ("o_year",),
    "q09": ("o_year",),
    "q12": ("high_line_count", "low_line_count"),
}

_DATES: dict[str, tuple[str, ...]] = {
    "q03": ("orderdate",),
    "q18": ("orderdate",),
}


def _load(q: str) -> str:
    with open(os.path.join(_REF_DIR, f"{q}.sql")) as fh:
        text = fh.read()
    text = _TBL.sub(r"tpch_\1", text)
    for old, new in _PATCHES.get(q, ()):
        assert old in text, f"{q}: patch target drifted: {old[:40]!r}"
        text = text.replace(old, new)
    return text.strip().rstrip(";")


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    # Memoized per (session, sf_dir): 22 probes share one fixture; paying
    # file-listing + footer reads per probe is pure metadata overhead
    # (the same reasoning as catalog.load_table's memo — at 100 TB this
    # is a driver metadata storm, cf. Trino's CachingHiveMetastore).
    # The ready-set lives ON the session object: an id(spark)-keyed module
    # global can collide when CPython recycles a GC'd session's address
    # (ADVICE r5) and a dead session would pin the memo forever.
    ready = getattr(spark, "_tps_sqltext_views_ready", None)
    if ready is None:
        ready = set()
        spark._tps_sqltext_views_ready = ready
    if sf_dir in ready:
        return
    for name, sql in _spark_views(sf_dir).items():
        spark.sql(sql).createOrReplaceTempView(name)
    ready.add(sf_dir)


def _oracle(q: str) -> str:
    cols = _COLS[q]
    proj = []
    for c in cols:
        if c in _ROUND.get(q, {}):
            proj.append(f"round({c} + 1.3e-5, {_ROUND[q][c]}) AS {c}")
        elif c in _DATES.get(q, ()):
            proj.append(f"strftime({c}, '%Y-%m-%d') AS {c}")
        elif c in _LONGS.get(q, ()):
            proj.append(f"CAST({c} AS BIGINT) AS {c}")
        else:
            proj.append(c)
    return (
        f"WITH {_DUCK_CTES}, __q AS (\n{_load(q)}\n)\n"
        f"SELECT {', '.join(proj)} FROM __q AS __t({', '.join(cols)})"
    )


def _runner(q: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_views(spark, sf_dir)
        df = spark.sql(translate(_load(q)))
        df = df.toDF(*_COLS[q])
        for c, nd in _ROUND.get(q, {}).items():
            df = df.withColumn(c, F.round(F.col(c) + 1.3e-5, nd))
        for c in _DATES.get(q, ()):
            df = df.withColumn(c, F.date_format(F.col(c), "yyyy-MM-dd"))
        for c in _LONGS.get(q, ()):
            df = df.withColumn(c, F.col(c).cast("long"))
        return df

    run.__doc__ = (
        f"Reference Trino SQL text tpch/{q}.sql run verbatim (modulo the "
        "documented fixture adaptations) through translate() + spark.sql."
    )
    run.__name__ = f"p_sqltext_{q}"
    return run


for _q in _COLS:
    probe(f"p_sqltext_{_q}", oracle=_oracle(_q), tags=("tpch", "sqltext"))(
        _runner(_q)
    )
