"""Registration-count audit (round-11; VERDICT r10 What's wrong #2).

register_all used to swallow every registration failure behind blanket
``except: pass`` blocks — a failed import could silently erase whole SQL
families (that is exactly how the wrong geometry_union and the unreachable
documented aggregates stayed invisible). Now every failure warns with the
entry name, and this audit pins the EXACT expected count so any drift is
loud.
"""

from __future__ import annotations

import warnings

import pytest

from trino_private_spark.functions.registry import (
    _SESSIONS_REGISTERED,
    expected_registrations,
    register_all,
)


def test_register_all_reports_exact_expected_count(spark):
    _SESSIONS_REGISTERED.discard(spark)  # force a fresh registration pass
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        n = register_all(spark)
    reg_warnings = [
        str(w.message) for w in wlist if "failed" in str(w.message)
    ]
    assert reg_warnings == [], (
        f"registration failures on a healthy session: {reg_warnings}"
    )
    assert n == expected_registrations(), (
        f"register_all registered {n}, expected {expected_registrations()} "
        "— a family shrank (or grew without updating the expected count)"
    )


def test_broken_shim_warns_loudly(spark, monkeypatch):
    """A deliberately-broken shim must produce a warning naming it —
    never a silent no-op."""
    from trino_private_spark.functions import sql_shims

    broken = dict(sql_shims.SQL_SHIMS)
    broken["__tps_test_broken"] = "CREATE TEMPORARY FUNCTION ((("
    monkeypatch.setattr(sql_shims, "SQL_SHIMS", broken)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        sql_shims.install_sql_shims(spark)
    msgs = [str(w.message) for w in wlist]
    assert any("__tps_test_broken" in m for m in msgs), msgs


def test_memoization_skips_second_pass(spark):
    register_all(spark)
    assert register_all(spark) == 0
