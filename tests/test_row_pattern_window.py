"""Row pattern recognition in WINDOW structures (round 11 —
sql/pattern-recognition-in-window.rst; operators/row_pattern_window.py).
Closes the one statement-doc exemption of the round's first half.
"""

from __future__ import annotations

import pytest

from trino_private_spark.api import Engine
from trino_private_spark.operators.row_pattern_window import (
    parse_window_pattern_spec,
)


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


@pytest.fixture(scope="module")
def vshape(spark):
    rows = []
    for ck, prices in [(1, [10, 8, 6, 7, 9]), (2, [5, 5, 5, 5, 5])]:
        for d, p in enumerate(prices):
            rows.append((ck, d, float(p)))
    spark.createDataFrame(
        rows, "cust_key int, order_date int, total_price double"
    ).createOrReplaceTempView("rpw_v")
    return "rpw_v"


DOC_QUERY = """
SELECT cust_key, order_date, value OVER w AS v, label OVER w AS lab
FROM rpw_v
WINDOW w AS (
    PARTITION BY cust_key
    ORDER BY order_date
    MEASURES
        RUNNING LAST(total_price) AS value,
        CLASSIFIER() AS label
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
    PATTERN (A B+ C+)
    DEFINE
        B AS B.total_price < PREV(B.total_price),
        C AS C.total_price > PREV(C.total_price)
)
ORDER BY cust_key, order_date
"""


class TestParser:
    def test_components(self):
        spec = parse_window_pattern_spec(
            """PARTITION BY k ORDER BY d
            MEASURES LAST(v) AS lv
            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
            AFTER MATCH SKIP TO NEXT ROW SEEK
            PATTERN (A B+) SUBSET U = (A, B)
            DEFINE B AS B.v < PREV(B.v)"""
        )
        assert spec["partition_by"] == ["k"]
        assert spec["frame_rows"] == 4
        assert spec["seek"] is True
        assert spec["skip"] == "to_next_row"
        assert spec["subsets"] == {"U": ("A", "B")}
        assert list(spec["defines"]) == ["B"]
        assert spec["measures"] == [("LAST(v)", "lv")]

    def test_match_number_rejected(self):
        with pytest.raises(ValueError, match="MATCH_NUMBER"):
            parse_window_pattern_spec(
                """ORDER BY d MEASURES MATCH_NUMBER() AS mn
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                PATTERN (A) DEFINE A AS true"""
            )

    def test_frame_must_start_at_current_row(self):
        with pytest.raises(ValueError):
            parse_window_pattern_spec(
                """ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                PATTERN (A) DEFINE A AS true"""
            )


class TestDocExample:
    def test_window_clause_form(self, eng, vshape):
        rows = eng.sql(DOC_QUERY).collect()
        by_key = {(r["cust_key"], r["order_date"]): r for r in rows}
        # cust 1: full V-match anchored at row 0 (A=10, B+=8,6, C+=7,9):
        # FINAL LAST value = 9.0, last classifier = C
        assert by_key[(1, 0)]["v"] == 9.0
        assert by_key[(1, 0)]["lab"] == "C"
        # rows consumed by the match (SKIP PAST LAST ROW default) are
        # 'skipped' -> unmatched output
        for d in (1, 2, 3, 4):
            assert by_key[(1, d)]["v"] is None
        # cust 2: flat prices, B never matches -> all unmatched
        for d in range(5):
            assert by_key[(2, d)]["v"] is None

    def test_inline_over_aggregate(self, eng, vshape):
        rows = eng.sql(
            """
            SELECT order_date, sum(total_price) OVER (
                PARTITION BY cust_key ORDER BY order_date
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                AFTER MATCH SKIP TO NEXT ROW
                PATTERN (D+)
                DEFINE D AS D.total_price < PREV(D.total_price)
            ) AS s FROM rpw_v WHERE cust_key = 1 ORDER BY order_date
            """
        ).collect()
        got = [r["s"] for r in rows]
        # runs: row1 (8,6)=14, row2 (6)=6; rows 0/3/4 unmatched
        assert got == [None, 14.0, 6.0, None, None]

    def test_where_filters_before_window(self, eng, vshape):
        # excluding the '6' row breaks the 8->6 decrease: with WHERE
        # applied BEFORE the window (SQL semantics), row 8's run is just
        # itself (8 < 10 still holds), and 7,9 stay unmatched
        rows = eng.sql(
            """
            SELECT order_date, sum(total_price) OVER (
                PARTITION BY cust_key ORDER BY order_date
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                AFTER MATCH SKIP TO NEXT ROW
                PATTERN (D+)
                DEFINE D AS D.total_price < PREV(D.total_price)
            ) AS s FROM rpw_v
            WHERE cust_key = 1 AND total_price <> 6.0
            ORDER BY order_date
            """
        ).collect()
        got = [r["s"] for r in rows]
        # data after the filter: 10, 8, 7, 9 — runs anchored at 8 (8,7)
        # and at 7 (7). Post-filter semantics would have yielded 14.0
        # (8+6 computed over the UNfiltered window) — the prefilter is
        # what this pins.
        assert got == [None, 15.0, 7.0, None]


class TestModes:
    def test_seek_finds_detached_match(self, eng, spark):
        spark.createDataFrame(
            [(1, 0, 5.0), (1, 1, 9.0), (1, 2, 3.0)],
            "k int, d int, v double",
        ).createOrReplaceTempView("rpw_seek")
        # INITIAL: row 0 can't match (no decrease at row 0); SEEK finds
        # the decrease at row 2 within the frame
        init = eng.sql(
            """
            SELECT d, lastv OVER (
                PARTITION BY k ORDER BY d
                MEASURES LAST(v) AS lastv
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                PATTERN (D) DEFINE D AS D.v < PREV(D.v)
            ) AS m FROM rpw_seek ORDER BY d
            """
        ).collect()
        assert [r["m"] for r in init] == [None, None, 3.0]
        seek = eng.sql(
            """
            SELECT d, lastv OVER (
                PARTITION BY k ORDER BY d
                MEASURES LAST(v) AS lastv
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                AFTER MATCH SKIP TO NEXT ROW
                SEEK PATTERN (D) DEFINE D AS D.v < PREV(D.v)
            ) AS m FROM rpw_seek ORDER BY d
            """
        ).collect()
        assert [r["m"] for r in seek] == [3.0, 3.0, 3.0]

    def test_bounded_frame_limits_match(self, eng, spark):
        spark.createDataFrame(
            [(1, i, float(10 - i)) for i in range(5)],
            "k int, d int, v double",
        ).createOrReplaceTempView("rpw_bound")
        rows = eng.sql(
            """
            SELECT d, cnt OVER (
                PARTITION BY k ORDER BY d
                MEASURES LAST(d) AS cnt
                ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING
                AFTER MATCH SKIP TO NEXT ROW
                PATTERN (D+) DEFINE D AS D.v < PREV(D.v)
            ) AS m FROM rpw_bound ORDER BY d
            """
        ).collect()
        # frame of 2 rows: a D+ match can consume at most 2 rows, so the
        # measured LAST(d) is at most d+1
        for r in rows[1:]:
            assert r["m"] is not None and r["m"] <= r["d"] + 1

    def test_classifier_first_and_subset(self, eng, vshape):
        rows = eng.sql(
            """
            SELECT order_date, fl OVER w AS fl, ul OVER w AS ul
            FROM rpw_v
            WINDOW w AS (
                PARTITION BY cust_key ORDER BY order_date
                MEASURES FIRST(CLASSIFIER()) AS fl, LAST(U.total_price) AS ul
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                PATTERN (A B+ C+)
                SUBSET U = (A, B)
                DEFINE B AS B.total_price < PREV(B.total_price),
                       C AS C.total_price > PREV(C.total_price)
            ) WHERE cust_key = 1 ORDER BY order_date
            """
        ).collect()
        # match anchored at row 0: first classifier A; last A/B row is 6.0
        assert rows[0]["fl"] == "A" and rows[0]["ul"] == 6.0

    def test_unpartitioned_window(self, eng, spark):
        spark.createDataFrame(
            [(0, 4.0), (1, 2.0), (2, 1.0)], "d int, v double"
        ).createOrReplaceTempView("rpw_nopart")
        rows = eng.sql(
            """
            SELECT d, sum(v) OVER (
                ORDER BY d
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                AFTER MATCH SKIP TO NEXT ROW
                PATTERN (D+) DEFINE D AS D.v < PREV(D.v)
            ) AS s FROM rpw_nopart ORDER BY d
            """
        ).collect()
        assert [r["s"] for r in rows] == [None, 3.0, 1.0]
