"""SQL front-end for MATCH_RECOGNIZE (operators/row_pattern_sql.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from trino_private_spark.operators.row_pattern_sql import (
    _compile_define,
    parse_match_recognize,
    sql_match_recognize,
)

CLAUSE = """
MATCH_RECOGNIZE (
  PARTITION BY k
  ORDER BY ord
  MEASURES MATCH_NUMBER() AS mn, FIRST(v) AS first_v, LAST(v) AS last_v
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (UP{2,})
  DEFINE UP AS v > PREV(v)
)
"""


class TestParser:
    def test_components(self):
        spec = parse_match_recognize(CLAUSE)
        assert spec["partition_by"] == ["k"]
        assert spec["order_by"] == ["ord"]
        assert spec["pattern"] == "UP{2,}"
        assert spec["mode"] == "one"
        assert spec["skip"] == "past_last_row"
        assert list(spec["defines"]) == ["UP"]
        assert [a for _, a in spec["measures"]] == ["mn", "first_v", "last_v"]

    def test_skip_variants(self):
        c = CLAUSE.replace("SKIP PAST LAST ROW", "SKIP TO NEXT ROW")
        assert parse_match_recognize(c)["skip"] == "to_next_row"
        c = CLAUSE.replace("SKIP PAST LAST ROW", "SKIP TO LAST UP")
        assert parse_match_recognize(c)["skip"] == ("to_last", "UP")

    def test_multiple_defines(self):
        c = CLAUSE.replace(
            "DEFINE UP AS v > PREV(v)",
            "DEFINE UP AS v > PREV(v), DOWN AS v < PREV(v)",
        ).replace("PATTERN (UP{2,})", "PATTERN (UP+ DOWN)")
        spec = parse_match_recognize(c)
        assert set(spec["defines"]) == {"UP", "DOWN"}

    def test_reject_garbage(self):
        with pytest.raises(ValueError):
            parse_match_recognize("MATCH_RECOGNIZE (PATTERN (A))")


class TestDefineCompiler:
    def test_prev_comparison(self):
        pred = _compile_define("v > PREV(v)", ["v"])
        p = pd.DataFrame({"v": [1, 3, 2, 5]})
        assert list(pred(p).fillna(False)) == [False, True, False, True]

    def test_boolean_combo_and_literals(self):
        pred = _compile_define("v > 2 AND NOT (tag = 'x')", ["v", "tag"])
        p = pd.DataFrame({"v": [1, 5, 5], "tag": ["a", "x", "b"]})
        assert list(pred(p)) == [False, False, True]

    def test_symbol_prefix_and_next(self):
        pred = _compile_define("A.v < NEXT(v)", ["v"])
        p = pd.DataFrame({"v": [1, 3, 2]})
        assert list(pred(p).fillna(False)) == [True, False, False]

    def test_prev_with_offset(self):
        pred = _compile_define("v > PREV(v, 2)", ["v"])
        p = pd.DataFrame({"v": [1, 9, 5, 8]})
        assert list(pred(p).fillna(False)) == [False, False, True, False]

    def test_unknown_column_rejected(self):
        with pytest.raises(ValueError):
            _compile_define("nope > 1", ["v"])

    def test_no_arbitrary_code(self):
        with pytest.raises(ValueError):
            _compile_define("__import__('os')", ["v"])


class TestEndToEnd:
    def test_one_row_per_match(self, spark):
        rows = [("k1", i, v) for i, v in enumerate([1, 2, 3, 1, 2, 9, 9])]
        df = spark.createDataFrame(rows, "k string, ord int, v int")
        out = (
            sql_match_recognize(df, CLAUSE)
            .toPandas()
            .sort_values("match_number")
            .reset_index(drop=True)
        )
        # rises: (1,2,3) then (1,2,9)? v=1->2->9 rises; 9->9 not
        assert list(out["n_rows"]) == [2, 2]
        assert list(out["first_v"]) == ["2", "2"]
        assert list(out["last_v"]) == ["3", "9"]

    def test_all_rows_with_classifier(self, spark):
        clause = """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ord
          ALL ROWS PER MATCH
          PATTERN (UP DOWN)
          DEFINE UP AS v > PREV(v), DOWN AS v < PREV(v)
        )
        """
        rows = [("k", i, v) for i, v in enumerate([1, 5, 2, 7, 3])]
        df = spark.createDataFrame(rows, "k string, ord int, v int")
        out = (
            sql_match_recognize(df, clause)
            .toPandas()
            .sort_values("row_pos")
            .reset_index(drop=True)
        )
        assert list(out["classifier"]) == ["UP", "DOWN", "UP", "DOWN"]


class TestEngineSqlRouting:
    def test_full_statement_through_engine(self, spark):
        from trino_private_spark.api import Engine

        rows = [("k", i, v) for i, v in enumerate([1, 2, 3, 1, 5, 6])]
        spark.createDataFrame(rows, "k string, ord int, v int").createOrReplaceTempView(
            "mr_src"
        )
        eng = Engine(spark)
        out = eng.sql(
            """SELECT * FROM mr_src MATCH_RECOGNIZE (
                 PARTITION BY k ORDER BY ord
                 ONE ROW PER MATCH
                 PATTERN (UP{2,})
                 DEFINE UP AS v > PREV(v)
               )"""
        ).toPandas()
        assert sorted(out["n_rows"]) == [2, 2]


class TestSubsetAndExclusion:
    """SUBSET union variables (SqlBase.g4:339) and {- -} exclusions
    (SqlBase.g4:601), per PatternRecognitionAnalyzer.java semantics."""

    PRICES = [10, 8, 6, 9, 12, 7, 5, 11]

    def _df(self, spark):
        rows = [("g", i, v) for i, v in enumerate(self.PRICES)]
        return spark.createDataFrame(rows, "k string, t int, price int")

    def test_subset_measures_and_skip(self, spark):
        from trino_private_spark.operators.row_pattern_sql import (
            sql_match_recognize,
        )

        clause = """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY t
          MEASURES FIRST(price) AS startp, LAST(DOWN.price) AS bottom,
                   LAST(U.price) AS lastu, CLASSIFIER(U) AS cls
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO LAST U
          PATTERN (STRT DOWN+ UP+)
          SUBSET U = (DOWN, UP)
          DEFINE DOWN AS price < PREV(price), UP AS price > PREV(price)
        )"""
        out = (
            sql_match_recognize(self._df(spark), clause)
            .toPandas()
            .sort_values("match_number")
            .reset_index(drop=True)
        )
        # V-shapes: 10,8,6,9,12 then (skip to last U = row 4) 12,7,5,11
        assert list(out["startp"]) == ["10", "12"]
        assert list(out["bottom"]) == ["6", "5"]
        assert list(out["lastu"]) == ["12", "11"]
        assert list(out["cls"]) == ["UP", "UP"]

    def test_exclusion_drops_rows_from_all_rows_output(self, spark):
        from trino_private_spark.operators.row_pattern_sql import (
            sql_match_recognize,
        )

        clause = """
        MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY t
          MEASURES CLASSIFIER() AS cls
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (STRT {- DOWN+ -} UP+)
          DEFINE DOWN AS price < PREV(price), UP AS price > PREV(price)
        )"""
        out = (
            sql_match_recognize(self._df(spark), clause)
            .toPandas()
            .sort_values(["match_number", "row_pos"])
            .reset_index(drop=True)
        )
        # DOWN spans (rows 1-2 and row 6) omitted; row_pos stays absolute
        assert list(out["row_pos"]) == [0, 3, 4, 5, 7]
        assert list(out["classifier"]) == ["STRT", "UP", "UP", "STRT", "UP"]

    def test_exclusion_rows_still_count_in_measures(self, spark):
        from trino_private_spark.operators.row_pattern import (
            match_recognize_general,
            vectorized,
        )

        df = self._df(spark)
        out = match_recognize_general(
            df,
            partition_by=["k"],
            order_by=["t"],
            pattern="strt {- down+ -} up+",
            defines={
                "down": vectorized(lambda p: p["price"] < p["price"].shift(1)),
                "up": vectorized(lambda p: p["price"] > p["price"].shift(1)),
            },
            mode="one",
        ).toPandas()
        # ONE ROW PER MATCH: exclusions don't change match extent
        # (match 1: 10,8,6,9,12; match 2 resumes past it: 7,5,11)
        assert sorted(out["n_rows"]) == [3, 5]

    def test_quantified_exclusion_parses(self, spark):
        from trino_private_spark.operators.row_pattern import compile_pattern

        entry, prog = compile_pattern("a {- b -}? c")
        assert any(ins[0] == "excl_open" for ins in prog)


class TestComposedLowering:
    """MATCH_RECOGNIZE as a table primary inside composed queries
    (api.py _lower_match_recognize; SqlBase.g4:339 allows
    patternRecognition wherever a relation is)."""

    @pytest.fixture()
    def eng(self, spark):
        from trino_private_spark.api import Engine

        spark.createDataFrame(
            [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0), (1, 4, 1.0),
             (2, 1, 5.0), (2, 2, 6.0), (2, 3, 7.0)],
            "k int, ord int, v double",
        ).createOrReplaceTempView("mrc_src")
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "k int, label string"
        ).createOrReplaceTempView("mrc_dim")
        return Engine(spark)

    MR = ("mrc_src MATCH_RECOGNIZE ("
          " PARTITION BY k ORDER BY ord"
          " MEASURES LAST(v) AS last_v ONE ROW PER MATCH"
          " PATTERN (UP{2,}) DEFINE UP AS v > PREV(v))")

    def test_join_with_dimension(self, eng):
        # the NFA engine emits untyped (string) partition/measure columns;
        # cast at the SQL surface like the probes do
        rows = eng.sql(
            f"SELECT label, CAST(mr.k AS INT) AS k, "
            f"CAST(last_v AS DOUBLE) AS last_v FROM {self.MR} AS mr "
            f"JOIN mrc_dim ON mr.k = mrc_dim.k ORDER BY CAST(mr.k AS INT)"
        ).collect()
        assert [(r.label, r.k, r.last_v) for r in rows] == [
            ("alpha", 1, 3.0), ("beta", 2, 7.0)
        ]

    def test_inside_subquery_aggregate(self, eng):
        rows = eng.sql(
            f"SELECT count(*) AS c FROM (SELECT k FROM {self.MR})"
        ).collect()
        assert rows[0].c == 2

    def test_top_level_still_routes(self, eng):
        assert eng.sql(f"SELECT * FROM {self.MR}").count() == 2

    def test_unknown_source_clear_error(self, eng):
        from pyspark.errors.exceptions.captured import AnalysisException

        with pytest.raises(AnalysisException):
            eng.sql(
                "SELECT * FROM nonexistent_tbl MATCH_RECOGNIZE ("
                " PARTITION BY k ORDER BY ord MEASURES LAST(v) AS lv"
                " ONE ROW PER MATCH PATTERN (A) DEFINE A AS v > 0) AS x"
                " JOIN mrc_dim ON 1 = 1"
            )
