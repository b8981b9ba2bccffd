"""MATCH_RECOGNIZE subset: V-shape (down+ up+) pattern over a deterministic
price series — hand-computed expected matches."""

from __future__ import annotations

from trino_private_spark.operators.match_recognize import Symbol, match_recognize


def test_v_shape_pattern(spark):
    # series: two clean V shapes per ticker
    rows = []
    prices = [10, 8, 6, 7, 9, 11, 5, 4, 8, 12]  # V at idx1-5, V at idx6-9
    for t, base in (("A", 0), ("B", 100)):
        for i, p in enumerate(prices):
            rows.append((t, i, float(base + p)))
    df = spark.createDataFrame(rows, "ticker string, seq int, price double")

    down = Symbol(
        "down", lambda cur, prev: prev is not None and cur.price < prev.price, "+"
    )
    up = Symbol(
        "up", lambda cur, prev: prev is not None and cur.price > prev.price, "+"
    )
    got = match_recognize(
        df,
        partition_by=["ticker"],
        order_by=["seq"],
        pattern=[down, up],
        measure_col="seq",
    ).orderBy("ticker", "match_id")
    res = got.collect()
    assert [(r.ticker, r.match_id, r.start_val, r.end_val) for r in res] == [
        ("A", 0, "1", "5"),
        ("A", 1, "6", "9"),
        ("B", 0, "1", "5"),
        ("B", 1, "6", "9"),
    ]
    assert all(r.n_down >= 1 and r.n_up >= 1 for r in res)


def test_no_match_returns_empty(spark):
    df = spark.createDataFrame(
        [("A", i, float(i)) for i in range(5)], "ticker string, seq int, price double"
    )
    down = Symbol(
        "down", lambda cur, prev: prev is not None and cur.price < prev.price, "+"
    )
    got = match_recognize(df, ["ticker"], ["seq"], [down], "seq")
    assert got.count() == 0
