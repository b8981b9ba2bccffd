"""Property tests: Iceberg file pruning must be CONSERVATIVE by
construction — a file containing a row that satisfies the predicate may
NEVER be pruned, for any data, any transform, any literal type. A wrong
prune silently drops rows (and corrupts DELETE/UPDATE), so this is the
strongest invariant in the layer. Pure-Python (no JVM round-trips):
exercises iceberg_partition.file_matches / metrics_match exactly as the
reader calls them.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from trino_private_spark.sources.iceberg_partition import (
    PartitionField,
    PartitionSpec,
    deserialize_single_value,
    file_matches,
    metrics_match,
    serialize_single_value,
    transform_value,
)

_OPS = st.sampled_from(["=", "<", "<=", ">", ">="])


def _eval(op, row, val):
    if row is None or val is None:
        return False
    if op == "=":
        return row == val
    if op == "<":
        return row < val
    if op == "<=":
        return row <= val
    if op == ">":
        return row > val
    if op == ">=":
        return row >= val
    raise AssertionError(op)


_TRANSFORMS = st.sampled_from(
    ["identity", "bucket[8]", "truncate[10]", "void"]
)
_DATE_TRANSFORMS = st.sampled_from(
    ["identity", "year", "month", "day", "bucket[8]", "void"]
)


class TestPartitionPruneConservative:
    @settings(max_examples=300, deadline=None)
    @given(
        rows=st.lists(
            st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=8
        ),
        op=_OPS,
        val=st.integers(-50, 50),
        transform=_TRANSFORMS,
    )
    def test_long_column(self, rows, op, val, transform):
        spec = PartitionSpec(
            0, (PartitionField("p", "c", "long", transform),)
        )
        # the writer stores ONE partition tuple per file; model each row
        # as its own file (the worst case for pruning)
        for row in rows:
            pv = transform_value(transform, row, "long")
            if _eval(op, row, val):
                assert file_matches(spec, {"p": pv}, [("c", op, val)]), (
                    row, op, val, transform, pv,
                )

    @settings(max_examples=300, deadline=None)
    @given(
        days=st.lists(st.integers(-3000, 3000), min_size=1, max_size=8),
        op=_OPS,
        val_day=st.integers(-3000, 3000),
        transform=_DATE_TRANSFORMS,
    )
    def test_date_column(self, days, op, val_day, transform):
        epoch = datetime.date(1970, 1, 1)
        spec = PartitionSpec(
            0, (PartitionField("p", "c", "date", transform),)
        )
        val = epoch + datetime.timedelta(days=val_day)
        for d in days:
            row = epoch + datetime.timedelta(days=d)
            pv = transform_value(transform, row, "date")
            if _eval(op, row, val):
                assert file_matches(spec, {"p": pv}, [("c", op, val)]), (
                    row, op, val, transform, pv,
                )

    @settings(max_examples=200, deadline=None)
    @given(
        rows=st.lists(
            st.text(min_size=0, max_size=6), min_size=1, max_size=6
        ),
        val=st.text(min_size=0, max_size=6),
        transform=st.sampled_from(["identity", "bucket[8]", "truncate[10]", "truncate[3]", "void"]),
    )
    def test_string_equality(self, rows, val, transform):
        spec = PartitionSpec(
            0, (PartitionField("p", "c", "string", transform),)
        )
        for row in rows:
            pv = transform_value(transform, row, "string")
            if row == val:
                assert file_matches(spec, {"p": pv}, [("c", "=", val)])

    @settings(max_examples=200, deadline=None)
    @given(
        micros=st.integers(0, 2_000_000_000_000_000),
        ambiguous_int=st.integers(0, 2_000_000_000_000_000),
        transform=st.sampled_from(["identity", "year", "month", "day", "hour"]),
    )
    def test_timestamp_int_literals_never_prune(
        self, micros, ambiguous_int, transform
    ):
        # a bare int literal against a timestamp source is un-evaluable:
        # whatever the stored tuple, the file must survive
        spec = PartitionSpec(
            0, (PartitionField("p", "c", "timestamp", transform),)
        )
        row = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=micros
        )
        pv = transform_value(transform, row, "timestamp")
        assert file_matches(spec, {"p": pv}, [("c", "=", ambiguous_int)])
        assert file_matches(spec, {"p": pv}, [("c", ">=", ambiguous_int)])


class TestMetricsPruneConservative:
    @settings(max_examples=400, deadline=None)
    @given(
        rows=st.lists(
            st.one_of(st.none(), st.integers(-1000, 1000)),
            min_size=1,
            max_size=10,
        ),
        op=_OPS,
        val=st.integers(-1000, 1000),
    )
    def test_long_metrics(self, rows, op, val):
        fields = [{"id": 1, "name": "c", "type": "long"}]
        present = [r for r in rows if r is not None]
        lob, upb = {}, {}
        if present:
            lob[1] = serialize_single_value("long", min(present))
            upb[1] = serialize_single_value("long", max(present))
        nvc = {1: len(rows) - len(present)}
        vc = {1: len(rows)}
        if any(_eval(op, r, val) for r in rows):
            assert metrics_match(
                fields, [("c", op, val)], lob, upb, nvc, vc
            ), (rows, op, val)

    @settings(max_examples=200, deadline=None)
    @given(
        rows=st.lists(
            st.one_of(st.none(), st.text(max_size=8)),
            min_size=1,
            max_size=8,
        ),
        val=st.text(max_size=8),
        op=_OPS,
    )
    def test_string_metrics(self, rows, val, op):
        fields = [{"id": 1, "name": "c", "type": "string"}]
        present = [r for r in rows if r is not None]
        lob, upb = {}, {}
        if present:
            lob[1] = serialize_single_value("string", min(present))
            upb[1] = serialize_single_value("string", max(present))
        nvc = {1: len(rows) - len(present)}
        vc = {1: len(rows)}
        if any(_eval(op, r, val) for r in rows):
            assert metrics_match(
                fields, [("c", op, val)], lob, upb, nvc, vc
            ), (rows, op, val)

    @settings(max_examples=200, deadline=None)
    @given(
        vals=st.lists(st.integers(-100, 100), min_size=1, max_size=5),
        rows=st.lists(st.integers(-100, 100), min_size=1, max_size=8),
    )
    def test_in_list(self, vals, rows):
        fields = [{"id": 1, "name": "c", "type": "long"}]
        lob = {1: serialize_single_value("long", min(rows))}
        upb = {1: serialize_single_value("long", max(rows))}
        if set(vals) & set(rows):
            assert metrics_match(
                fields, [("c", "in", vals)], lob, upb, {1: 0}, {1: len(rows)}
            )

    @settings(max_examples=200, deadline=None)
    @given(
        t=st.sampled_from(
            ["int", "long", "float", "double", "date", "timestamp",
             "string", "boolean"]
        ),
        i=st.integers(-(2**31) + 1, 2**31 - 1),
    )
    def test_serialization_roundtrip_property(self, t, i):
        if t == "boolean":
            v = bool(i % 2)
        elif t in ("float", "double"):
            v = float(i) / 16
            if t == "float":
                import struct as _s

                v = _s.unpack("<f", _s.pack("<f", v))[0]
        elif t == "string":
            v = str(i)
        else:
            v = i
        assert deserialize_single_value(t, serialize_single_value(t, v)) == v


class TestManifestPruneConservative:
    """manifest_matches (manifest-list field_summary skip) must never
    skip a manifest that lists a file holding a satisfying row — the
    summaries are [min, max] + contains_null over the manifest's
    partition VALUES, so this mirrors the file-level property one level
    up the metadata tree."""

    @staticmethod
    def _summary(pvs, transform, source_type):
        from trino_private_spark.sources.iceberg_partition import (
            partition_value_type,
        )

        present = [p for p in pvs if p is not None]
        s = {
            "contains_null": any(p is None for p in pvs),
            "lower_bound": None,
            "upper_bound": None,
        }
        if present:
            vt = partition_value_type(transform, source_type)
            s["lower_bound"] = serialize_single_value(vt, min(present))
            s["upper_bound"] = serialize_single_value(vt, max(present))
        return s

    @settings(max_examples=300, deadline=None)
    @given(
        rows=st.lists(
            st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=8
        ),
        op=_OPS,
        val=st.integers(-50, 50),
        transform=_TRANSFORMS,
    )
    def test_long_column(self, rows, op, val, transform):
        from trino_private_spark.sources.iceberg_partition import (
            manifest_matches,
        )

        spec = PartitionSpec(
            0, (PartitionField("p", "c", "long", transform),)
        )
        pvs = [transform_value(transform, r, "long") for r in rows]
        summary = self._summary(pvs, transform, "long")
        if any(_eval(op, r, val) for r in rows):
            assert manifest_matches(spec, [summary], [("c", op, val)]), (
                rows, op, val, transform, summary,
            )

    @settings(max_examples=300, deadline=None)
    @given(
        days=st.lists(st.integers(-3000, 3000), min_size=1, max_size=8),
        op=_OPS,
        val_day=st.integers(-3000, 3000),
        transform=_DATE_TRANSFORMS,
    )
    def test_date_column(self, days, op, val_day, transform):
        from trino_private_spark.sources.iceberg_partition import (
            manifest_matches,
        )

        epoch = datetime.date(1970, 1, 1)
        spec = PartitionSpec(
            0, (PartitionField("p", "c", "date", transform),)
        )
        val = epoch + datetime.timedelta(days=val_day)
        rows = [epoch + datetime.timedelta(days=d) for d in days]
        pvs = [transform_value(transform, r, "date") for r in rows]
        summary = self._summary(pvs, transform, "date")
        if any(_eval(op, r, val) for r in rows):
            assert manifest_matches(spec, [summary], [("c", op, val)]), (
                rows, op, val, transform, summary,
            )

    @settings(max_examples=200, deadline=None)
    @given(
        rows=st.lists(st.text(min_size=0, max_size=6), min_size=1, max_size=6),
        val=st.text(min_size=0, max_size=6),
        transform=st.sampled_from(
            ["identity", "bucket[8]", "truncate[10]", "truncate[3]", "void"]
        ),
    )
    def test_string_equality(self, rows, val, transform):
        from trino_private_spark.sources.iceberg_partition import (
            manifest_matches,
        )

        spec = PartitionSpec(
            0, (PartitionField("p", "c", "string", transform),)
        )
        pvs = [transform_value(transform, r, "string") for r in rows]
        summary = self._summary(pvs, transform, "string")
        if val in rows:
            assert manifest_matches(spec, [summary], [("c", "=", val)])

    def test_missing_summaries_never_prune(self):
        from trino_private_spark.sources.iceberg_partition import (
            manifest_matches,
        )

        spec = PartitionSpec(
            0, (PartitionField("p", "c", "long", "identity"),)
        )
        assert manifest_matches(spec, None, [("c", "=", 1)])
        assert manifest_matches(spec, [], [("c", "=", 1)])
        assert manifest_matches(None, [{}], [("c", "=", 1)])
        # a summary without bounds proves nothing
        assert manifest_matches(
            spec,
            [{"contains_null": False, "lower_bound": None,
              "upper_bound": None}],
            [("c", "=", 1)],
        )
