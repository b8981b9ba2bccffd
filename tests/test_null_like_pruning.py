"""IS [NOT] NULL and LIKE-'prefix%' pruning (r9): the reference prunes
null domains (TupleDomain onlyNull/notNull from contains_null summaries
and null_value_counts) and derives a [prefix, next(prefix)) range from
a trailing-%-only LIKE (DomainTranslator). The invariant is the same as
every other prune path: CONSERVATIVE — a file that can hold a matching
row is never skipped, for any transform, any data.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from trino_private_spark.sources.iceberg import parse_partition_predicate
from trino_private_spark.sources.iceberg_partition import (
    PartitionField,
    PartitionSpec,
    _next_prefix,
    file_matches,
    manifest_matches,
    metrics_match,
    serialize_single_value,
    transform_value,
)


def _spec(transform: str, source_type: str = "string") -> PartitionSpec:
    return PartitionSpec(
        spec_id=0,
        fields=(
            PartitionField(
                name="p", source_name="c",
                source_type=source_type, transform=transform,
            ),
        ),
    )


class TestParse:
    def test_is_null(self):
        assert parse_partition_predicate("c IS NULL") == [
            ("c", "isnull", None)
        ]

    def test_is_not_null(self):
        assert parse_partition_predicate("c IS NOT NULL") == [
            ("c", "notnull", None)
        ]

    def test_like_prefix(self):
        assert parse_partition_predicate("c LIKE 'ab%'") == [
            ("c", "prefix", "ab")
        ]

    def test_like_all_is_notnull(self):
        assert parse_partition_predicate("c LIKE '%'") == [
            ("c", "notnull", None)
        ]

    def test_like_inner_wildcards_skipped(self):
        assert parse_partition_predicate("c LIKE 'a%b%'") == []
        assert parse_partition_predicate("c LIKE 'a_c%'") == []
        assert parse_partition_predicate("c LIKE 'abc'") == []

    def test_not_like_skipped(self):
        assert parse_partition_predicate("c NOT LIKE 'a%'") == []

    def test_escaped_quote_in_pattern(self):
        assert parse_partition_predicate("c LIKE 'o''b%'") == [
            ("c", "prefix", "o'b")
        ]

    def test_conjunction_with_other_terms(self):
        assert parse_partition_predicate(
            "g = 3 AND c IS NOT NULL AND c LIKE 'x%'"
        ) == [("g", "=", 3), ("c", "notnull", None), ("c", "prefix", "x")]


class TestNextPrefix:
    def test_simple(self):
        assert _next_prefix("ab") == "ac"

    def test_orders_every_extension(self):
        for ext in ("", "a", "zzz", "￿"):
            assert "ab" + ext < _next_prefix("ab")

    def test_max_char_carries(self):
        assert _next_prefix("a\U0010ffff") == "b"

    def test_unconstructible(self):
        assert _next_prefix("\U0010ffff") is None


class TestFileMatches:
    def test_isnull_prunes_nonnull_partition(self):
        sp = _spec("identity")
        pred = [("c", "isnull", None)]
        assert not file_matches(sp, {"p": "x"}, pred)
        assert file_matches(sp, {"p": None}, pred)

    def test_notnull_prunes_null_partition(self):
        sp = _spec("bucket[8]", "long")
        pred = [("c", "notnull", None)]
        assert not file_matches(sp, {"p": None}, pred)
        assert file_matches(sp, {"p": 3}, pred)

    def test_void_never_prunes(self):
        sp = _spec("void")
        assert file_matches(sp, {"p": None}, [("c", "notnull", None)])
        assert file_matches(sp, {"p": None}, [("c", "isnull", None)])

    def test_prefix_identity(self):
        sp = _spec("identity")
        pred = [("c", "prefix", "ab")]
        assert file_matches(sp, {"p": "abc"}, pred)
        assert not file_matches(sp, {"p": "ad"}, pred)
        assert not file_matches(sp, {"p": None}, pred)

    def test_prefix_truncate_shorter_than_literal(self):
        sp = _spec("truncate[1]")
        pred = [("c", "prefix", "ab")]
        assert file_matches(sp, {"p": "a"}, pred)  # 'ab...'[:1] == 'a'
        assert not file_matches(sp, {"p": "b"}, pred)

    def test_prefix_truncate_longer_than_literal(self):
        sp = _spec("truncate[4]")
        pred = [("c", "prefix", "ab")]
        assert file_matches(sp, {"p": "abzz"}, pred)
        assert not file_matches(sp, {"p": "aczz"}, pred)

    def test_prefix_bucket_never_prunes(self):
        sp = _spec("bucket[8]")
        assert file_matches(sp, {"p": 5}, [("c", "prefix", "ab")])


class TestMetricsMatch:
    FIELDS = [{"id": 1, "name": "c", "type": "string"}]

    def _m(self, pred, lo=None, hi=None, nulls=None, cnt=None):
        lob = {1: serialize_single_value("string", lo)} if lo is not None else {}
        hib = {1: serialize_single_value("string", hi)} if hi is not None else {}
        nvc = {1: nulls} if nulls is not None else {}
        vc = {1: cnt} if cnt is not None else {}
        return metrics_match(self.FIELDS, pred, lob, hib, nvc, vc)

    def test_isnull_prunes_zero_null_count(self):
        assert not self._m([("c", "isnull", None)], nulls=0, cnt=10)
        assert self._m([("c", "isnull", None)], nulls=1, cnt=10)
        assert self._m([("c", "isnull", None)])  # unrecorded: no prune

    def test_notnull_prunes_all_null(self):
        assert not self._m([("c", "notnull", None)], nulls=10, cnt=10)
        assert self._m([("c", "notnull", None)], nulls=9, cnt=10)

    def test_prefix_prunes_outside_bounds(self):
        pred = [("c", "prefix", "m")]
        assert not self._m(pred, lo="a", hi="c")  # hi < 'm'
        assert not self._m(pred, lo="x", hi="z")  # lo >= 'n'
        assert self._m(pred, lo="a", hi="z")
        assert self._m(pred, lo="ma", hi="mz")

    def test_prefix_all_null_prunes(self):
        assert not self._m([("c", "prefix", "m")], nulls=5, cnt=5)


class TestManifestSummaries:
    def _summaries(self, contains_null, lo=None, hi=None, vt="string"):
        s = {"contains_null": contains_null}
        if lo is not None:
            s["lower_bound"] = serialize_single_value(vt, lo)
        if hi is not None:
            s["upper_bound"] = serialize_single_value(vt, hi)
        return [s]

    def test_isnull_prunes_nullfree_manifest(self):
        sp = _spec("identity")
        pred = [("c", "isnull", None)]
        assert not manifest_matches(sp, self._summaries(False), pred)
        assert manifest_matches(sp, self._summaries(True), pred)

    def test_notnull_never_prunes_at_summary_level(self):
        sp = _spec("identity")
        assert manifest_matches(
            sp, self._summaries(True), [("c", "notnull", None)]
        )

    def test_prefix_prunes_disjoint_range(self):
        sp = _spec("identity")
        pred = [("c", "prefix", "m")]
        assert not manifest_matches(sp, self._summaries(False, "a", "c"), pred)
        assert not manifest_matches(sp, self._summaries(False, "x", "z"), pred)
        assert manifest_matches(sp, self._summaries(False, "a", "z"), pred)

    def test_prefix_truncate_width(self):
        sp = _spec("truncate[1]")
        pred = [("c", "prefix", "mid")]
        # truncate[1] partition values: bounds over first chars
        assert not manifest_matches(sp, self._summaries(False, "a", "c"), pred)
        assert manifest_matches(sp, self._summaries(False, "a", "m"), pred)


def _like(row: str | None, prefix: str) -> bool:
    return row is not None and row.startswith(prefix)


class TestConservative:
    """The strongest invariant: a file/manifest holding a matching row is
    NEVER pruned — property-tested across transforms and random data,
    the same discipline as tests/test_pruning_properties.py."""

    @settings(max_examples=300, deadline=None)
    @given(
        rows=st.lists(
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(min_codepoint=32, max_codepoint=300),
                    max_size=6,
                ),
            ),
            min_size=1,
            max_size=8,
        ),
        prefix=st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=300),
            min_size=1,
            max_size=4,
        ),
        transform=st.sampled_from(
            ["identity", "truncate[1]", "truncate[3]", "bucket[8]", "void"]
        ),
    )
    def test_prefix_never_wrong_prunes(self, rows, prefix, transform):
        sp = _spec(transform)
        pred = [("c", "prefix", prefix)]
        for row in rows:
            if not _like(row, prefix):
                continue
            pv = transform_value(transform, row, "string")
            assert file_matches(sp, {"p": pv}, pred), (
                transform, row, prefix, pv,
            )

    @settings(max_examples=300, deadline=None)
    @given(
        rows=st.lists(
            st.one_of(st.none(), st.text(max_size=5)),
            min_size=1,
            max_size=8,
        ),
        transform=st.sampled_from(
            ["identity", "truncate[2]", "bucket[8]", "void"]
        ),
        neg=st.booleans(),
    )
    def test_null_terms_never_wrong_prune(self, rows, transform, neg):
        sp = _spec(transform)
        op = "notnull" if neg else "isnull"
        pred = [("c", op, None)]
        for row in rows:
            matches = (row is not None) if neg else (row is None)
            if not matches:
                continue
            pv = transform_value(transform, row, "string")
            assert file_matches(sp, {"p": pv}, pred), (transform, row, op)

    @settings(max_examples=300, deadline=None)
    @given(
        rows=st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=300),
                max_size=6,
            ),
            min_size=1,
            max_size=8,
        ),
        prefix=st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=300),
            min_size=1,
            max_size=4,
        ),
    )
    def test_metrics_prefix_never_wrong_prunes(self, rows, prefix):
        fields = [{"id": 1, "name": "c", "type": "string"}]
        lo, hi = min(rows), max(rows)
        pred = [("c", "prefix", prefix)]
        if any(_like(r, prefix) for r in rows):
            assert metrics_match(
                fields,
                pred,
                {1: serialize_single_value("string", lo)},
                {1: serialize_single_value("string", hi)},
                {1: 0},
                {1: len(rows)},
            ), (rows, prefix)

    @settings(max_examples=200, deadline=None)
    @given(
        rows=st.lists(
            st.one_of(st.none(), st.text(max_size=4)), min_size=1, max_size=8
        ),
        neg=st.booleans(),
    )
    def test_metrics_null_terms_never_wrong_prune(self, rows, neg):
        fields = [{"id": 1, "name": "c", "type": "string"}]
        nulls = sum(1 for r in rows if r is None)
        op = "notnull" if neg else "isnull"
        matches = any(
            (r is not None) if neg else (r is None) for r in rows
        )
        if matches:
            assert metrics_match(
                fields,
                [("c", op, None)],
                {},
                {},
                {1: nulls},
                {1: len(rows)},
            ), (rows, op)


class TestStartsWith:
    def test_starts_with_prefix_term(self):
        assert parse_partition_predicate("starts_with(c, 'ab')") == [
            ("c", "prefix", "ab")
        ]

    def test_starts_with_percent_is_literal(self):
        # no wildcard semantics in starts_with: % is an ordinary char
        assert parse_partition_predicate("starts_with(c, 'a%b')") == [
            ("c", "prefix", "a%b")
        ]

    def test_starts_with_empty_is_notnull(self):
        assert parse_partition_predicate("starts_with(c, '')") == [
            ("c", "notnull", None)
        ]

    def test_starts_with_in_conjunction(self):
        assert parse_partition_predicate(
            "g = 1 AND starts_with(c, 'x')"
        ) == [("g", "=", 1), ("c", "prefix", "x")]
