"""As-of and range join probes (operators/temporal_join.py). The reference
can only express these as theta joins lowered to NestedLoopJoin
(operator/NestedLoopJoinOperator.java); DuckDB's native ASOF JOIN and
inequality join serve as the oracles. Our implementations are the scale
paths: union+window (zero join nodes) and interval binning (hash join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.operators.temporal_join import asof_join, range_join_points
from trino_private_spark.queries import T, probe
from trino_private_spark.queries.relational import dround


@probe(
    "p_asof_join",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, ts AS pts, MAX(value) AS mv
               FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT l.event_id, l.user_id, ROUND(r.mv, 2) AS last_purchase
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.pts
    ORDER BY l.event_id
    """,
    tags=("temporal", "custom"),
)
def p_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent prior-or-simultaneous
    purchase. Backward-inclusive as-of via union+window: one shuffle on
    user_id, no join node. Right side pre-aggregated per (user, ts) so tie
    choice is deterministic on both engines."""
    t = T(spark, sf_dir)
    ev = t.events
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max("value").alias("mv"))
    )
    out = asof_join(clicks, purchases, ["user_id"], "ts", "pts", ["mv"])
    return out.select(
        "event_id", "user_id", dround(F.col("mv"), 2).alias("last_purchase")
    ).orderBy("event_id")


@probe(
    "p_range_join",
    oracle="""
    SELECT s_suppkey,
           COUNT(*)::BIGINT AS cnt,
           ROUND(SUM(p_retailprice), 2) AS total
    FROM supplier JOIN part
      ON p_retailprice BETWEEN s_acctbal AND s_acctbal + 1000
    GROUP BY s_suppkey
    ORDER BY s_suppkey
    """,
    tags=("temporal", "custom"),
)
def p_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval join (parts priced within each supplier's
    [acctbal, acctbal+1000] band) via interval binning: candidates are
    co-binned pairs only — a hash equi-join on the bin id, never a nested
    loop. bin_width == interval span, so each interval replicates to <= 2
    bins."""
    t = T(spark, sf_dir)
    points = t.part.select("p_partkey", "p_retailprice")
    intervals = t.supplier.select(
        "s_suppkey",
        F.col("s_acctbal").alias("lo"),
        (F.col("s_acctbal") + 1000.0).alias("hi"),
    )
    joined = range_join_points(points, intervals, "p_retailprice", "lo", "hi", 1000.0)
    return (
        joined.groupBy("s_suppkey")
        .agg(
            F.count("*").alias("cnt"),
            dround(F.sum("p_retailprice"), 2).alias("total"),
        )
        .orderBy("s_suppkey")
    )
