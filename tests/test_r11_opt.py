"""Round-11 optimization pins: the partition-wide restructure of the
row-pattern executors must keep group-boundary semantics exact, spread()
must be a no-op at full parallelism, and the distance_join rectangle
cover must keep results identical to the trimmed cover."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from trino_private_spark.operators.match_recognize import Symbol, match_recognize
from trino_private_spark.operators.row_pattern import (
    match_recognize_general,
    nav_shift,
    vectorized,
)


def test_prev_does_not_leak_across_groups_window(spark):
    """Stacked groups classified in ONE pandas pass: PREV at each group's
    first row must see null (no match), not the previous group's last row.
    Data: group A ends high (10.0), group B starts lower (5.0) — a leaked
    PREV would classify B's first row as a decrease."""
    from trino_private_spark.api import Engine

    rows = [
        ("a", 1, 20.0), ("a", 2, 10.0),  # a: one decrease at seq 2
        ("b", 1, 5.0), ("b", 2, 9.0),    # b: no decrease anywhere
    ]
    df = spark.createDataFrame(rows, "g string, seq int, price double")
    df.createOrReplaceTempView("rpw_leak")
    out = Engine(spark).sql(
        """
        SELECT g, seq, run FROM (
          SELECT g, seq, sum(price) OVER (
              PARTITION BY g ORDER BY seq
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
              AFTER MATCH SKIP TO NEXT ROW
              PATTERN (D+)
              DEFINE D AS D.price < PREV(D.price)
          ) AS run FROM rpw_leak
        ) WHERE run IS NOT NULL ORDER BY g, seq
        """
    ).collect()
    # only ('a', 2) is a decrease (10 < 20); a leaked PREV would add
    # ('b', 1) because 5 < 10 against group a's last row
    assert [(r.g, r.seq, r.run) for r in out] == [("a", 2, 10.0)]


def test_prev_does_not_leak_across_groups_general(spark):
    """match_recognize_general partition-wide fast path (group_safe
    defines): a decrease-pattern match must not appear at a group's first
    row via a leaked cross-group shift."""
    rows = [
        ("a", 1, 20.0), ("a", 2, 10.0),
        ("b", 1, 5.0), ("b", 2, 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, seq int, price double")
    defines = {
        "d": vectorized(
            lambda p: p["price"] < nav_shift(p, "price", 1), group_safe=True
        )
    }
    out = match_recognize_general(
        df, partition_by=["g"], order_by=["seq"], pattern="d+",
        defines=defines, mode="one",
    ).collect()
    assert [(r.g, r.start_pos, r.n_rows) for r in out] == [("a", 1, 1)]


def test_non_group_safe_defines_fall_back(spark):
    """A plain-shift (NOT group-safe) predicate still computes per group —
    same expected result, via the fallback path."""
    rows = [
        ("a", 1, 20.0), ("a", 2, 10.0),
        ("b", 1, 5.0), ("b", 2, 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, seq int, price double")
    defines = {"d": vectorized(lambda p: p["price"] < p["price"].shift(1))}
    out = match_recognize_general(
        df, partition_by=["g"], order_by=["seq"], pattern="d+",
        defines=defines, mode="one",
    ).collect()
    assert [(r.g, r.start_pos, r.n_rows) for r in out] == [("a", 1, 1)]


def test_restricted_subset_prev_none_at_group_start(spark):
    """operators/match_recognize: prev must be None at each group's first
    row after the itertuples restructure (a leak would match 'down' at
    B's first row: 100.0 -> 5.0)."""
    rows = [
        ("A", 1, 100.0), ("A", 2, 50.0),
        ("B", 1, 5.0), ("B", 2, 9.0),
    ]
    df = spark.createDataFrame(rows, "ticker string, seq int, price double")
    down = Symbol(
        "down", lambda cur, prev: prev is not None and cur.price < prev.price, "+"
    )
    got = match_recognize(df, ["ticker"], ["seq"], [down], "seq").collect()
    assert [(r.ticker, r.start_val) for r in got] == [("A", "2")]


def test_nav_shift_without_gid_is_plain_shift():
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0]})
    assert nav_shift(pdf, "v", 1).tolist()[1:] == [1.0, 2.0]


def test_spread_noop_at_full_parallelism(spark):
    from trino_private_spark.queries import spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, target + 4)
    assert spread(wide) is wide  # already >= cores: untouched
    narrow = spark.range(0, 100, 1, 1)
    assert spread(narrow).rdd.getNumPartitions() == target


def test_distance_join_rect_cover_matches_exact(spark):
    """The rectangle cover (corner trim removed) must produce exactly the
    pairs within the radius — verified against a brute-force cross join."""
    import math

    from trino_private_spark.operators.spatial_join import distance_join

    pts = [(i, (i * 37 % 160) - 80.0, (i * 91 % 360) - 180.0) for i in range(60)]
    hubs = [("h1", 48.8, 2.3), ("h2", -33.8, 151.2), ("h3", 0.0, 0.0)]
    pdf = spark.createDataFrame(pts, "id int, lat double, lon double")
    hdf = spark.createDataFrame(hubs, "hub string, hlat double, hlon double")
    got = sorted(
        (r.id, r.hub)
        for r in distance_join(
            pdf, hdf, "lat", "lon", "hlat", "hlon", radius_km=900.0, zoom=6
        ).collect()
    )

    def gcd(lat1, lon1, lat2, lon2):
        la1, lo1, la2, lo2 = map(math.radians, (lat1, lon1, lat2, lon2))
        dlon = lo1 - lo2
        y = math.sqrt(
            (math.cos(la2) * math.sin(dlon)) ** 2
            + (math.cos(la1) * math.sin(la2)
               - math.sin(la1) * math.cos(la2) * math.cos(dlon)) ** 2
        )
        x = math.sin(la1) * math.sin(la2) + math.cos(la1) * math.cos(la2) * math.cos(dlon)
        return math.atan2(y, x) * 6371.01

    want = sorted(
        (i, h)
        for i, lat, lon in pts
        for h, hlat, hlon in hubs
        if gcd(lat, lon, hlat, hlon) <= 900.0
    )
    assert got == want
