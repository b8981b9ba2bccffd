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
    "to_unixtime": "unix_timestamp",
    "from_unixtime": "timestamp_seconds",
    "levenshtein_distance": "levenshtein",
    # StringFunctions.java starts_with -> Spark's startswith (both
    # boolean(string, prefix)); without this entry the registry function
    # and the prefix-prune branch are unreachable from SQL text
    "starts_with": "startswith",
    "codepoint": "ascii",
    "from_base64": "unbase64",
    "to_base64": "base64",
    "from_hex": "unhex",
    "to_hex": "hex",
    "is_nan": "isnan",
    "ln": "ln",
    "format": "format_string",
    "reduce": "aggregate",
    "any_match": "exists",
    "all_match": "forall",
    "contains": "array_contains",
    "cardinality": "size",
    # Trino element_at is null-on-miss (ElementAt.java); Spark's throws
    # under ANSI mode, so the forgiving variant is the correct mapping.
    # (1-based subscripts a[i], which DO throw in Trino, become Spark
    # element_at below — also throwing under ANSI. Semantics preserved.)
    "element_at": "try_element_at",
    # round-10 reachability audit: registry entries whose Spark builtin
    # matches semantics exactly (DateTimeFunctions.java calendar family,
    # JoniRegexpFunctions regexp_split = split-all, ArrayFunctions zip,
    # TeradataStringFunctions index = strpos)
    "day_of_year": "dayofyear",
    "doy": "dayofyear",
    "week_of_year": "weekofyear",
    "week": "weekofyear",
    "day_of_month": "dayofmonth",
    "last_day_of_month": "last_day",
    "regexp_split": "split",
    "zip": "arrays_zip",
    "from_iso8601_timestamp": "to_timestamp",
    "parse_datetime": "to_timestamp",
    "json_extract": "get_json_object",
    "format_datetime": "date_format",
    "index": "instr",
}

def _checksum_template(args):
    """checksum(x) macro body — delegates to registry._checksum_sql (lazy
    import: registry pulls in pandas/pyspark at module scope)."""
    from trino_private_spark.functions.registry import _checksum_sql

    return _checksum_sql(args[0])


# --- documented-aggregate macro bodies (round-11: VERDICT r10 What's
# missing #1 — map_agg/multimap_agg/map_union/histogram/reduce_agg and the
# sketch/ml/geo aggregates resolve from SQL text). The map-valued ones are
# pure Spark SQL: aggregate to an entry array, then first-wins key dedupe
# (KeyValuePairs.java:122-128 "only add if we haven't seen this key") —
# explicit because the session runs mapKeyDedupPolicy=EXCEPTION for Trino
# parity. Catalyst dedupes the textually-repeated array_agg into ONE
# aggregate buffer, so the repetition costs nothing at runtime.


def _dedup_first_entries(arr: str) -> str:
    # element_at(..., 1), NOT [0]: this body feeds back through the
    # translator, whose subscript rewrite treats brackets as Trino
    # 1-based access — a literal [0] would become an invalid index
    return (
        f"map_from_entries(transform(array_distinct(transform({arr}, "
        f"__e -> __e.key)), __k -> named_struct('key', __k, 'value', "
        f"element_at(filter({arr}, __e -> __e.key <=> __k), 1).value)))"
    )


def _map_agg_template(args):
    """map_agg(k, v) — MapAggregationFunction.java (null keys ignored,
    first value per key wins)."""
    a = (
        f"array_agg(CASE WHEN ({args[0]}) IS NOT NULL THEN "
        f"named_struct('key', {args[0]}, 'value', {args[1]}) END)"
    )
    return _dedup_first_entries(a)


def _multimap_agg_template(args):
    """multimap_agg(k, v) — MultimapAggregationFunction.java; rides the
    multimap_from_entries macro (expanded on the next fixpoint pass)."""
    return (
        f"multimap_from_entries(array_agg(CASE WHEN ({args[0]}) IS NOT NULL "
        f"THEN named_struct('key', {args[0]}, 'value', {args[1]}) END))"
    )


def _map_union_template(args):
    """map_union(m) — MapUnionAggregation.java (first map's value wins
    per key, null maps skipped by array_agg)."""
    a = f"flatten(array_agg(map_entries({args[0]})))"
    return _dedup_first_entries(a)


def _histogram_template(args):
    """histogram(x) — Histogram.java value->count map, nulls ignored."""
    h = f"array_agg({args[0]})"
    return (
        f"map_from_entries(transform(array_distinct({h}), "
        f"__k -> named_struct('key', __k, 'value', "
        f"CAST(size(filter({h}, __v -> __v <=> __k)) AS BIGINT))))"
    )


def _reduce_agg_template(args):
    init = args[1].strip()
    if re.fullmatch(r"-?\d+", init):
        init = f"CAST({init} AS BIGINT)"
    elif re.fullmatch(r"-?\d+\.\d*(?:[eE][+-]?\d+)?", init):
        init = f"CAST({init} AS DOUBLE)"
    return f"aggregate(array_agg({args[0]}), {init}, {args[2]})"


def _empty_approx_set_template(args):
    """empty_approx_set() — the empty TPHL sketch as a hex literal."""
    from trino_private_spark.functions.agg_shims import empty_approx_set_hex

    return f"unhex('{empty_approx_set_hex()}')"


def _features_template(args):
    """features(x1, ..., xn) — MLFeatures.java dense vector; the repo's
    carrier is array<double> (functions/ml.py features)."""
    inner = ", ".join(f"CAST({a} AS DOUBLE)" for a in args)
    return f"array({inner})"


#: map-typed cosine_similarity body (MathFunctions.java:1313 — key-joined
#: dot product over map(varchar,double); missing right keys contribute 0)
_COS_MAP_BODY = (
    "(aggregate(map_keys(<0>), CAST(0 AS DOUBLE), (__a, __k) -> __a + "
    "CAST(element_at(<0>, __k) AS DOUBLE) * "
    "CAST(coalesce(try_element_at(<1>, __k), CAST(0 AS DOUBLE)) AS DOUBLE)) / "
    "(sqrt(aggregate(map_values(<0>), CAST(0 AS DOUBLE), (__a, __v) -> "
    "__a + CAST(__v AS DOUBLE) * CAST(__v AS DOUBLE))) * "
    "sqrt(aggregate(map_values(<1>), CAST(0 AS DOUBLE), (__a, __v) -> "
    "__a + CAST(__v AS DOUBLE) * CAST(__v AS DOUBLE)))))"
)

#: array-typed cosine_similarity (positional zip — the repo's extension
#: signature; kept for array columns)
_COS_ARRAY_BODY = (
    "(aggregate(zip_with(<0>, <1>, (__x, __y) -> "
    "CAST(__x AS DOUBLE) * CAST(__y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (__a, __v) -> __a + __v) / "
    "(sqrt(aggregate(<0>, CAST(0 AS DOUBLE), (__a, __x) -> "
    "__a + CAST(__x AS DOUBLE) * CAST(__x AS DOUBLE))) * "
    "sqrt(aggregate(<1>, CAST(0 AS DOUBLE), (__a, __x) -> "
    "__a + CAST(__x AS DOUBLE) * CAST(__x AS DOUBLE)))))"
)

_MAPISH_ARG = re.compile(
    r"^\s*(map\s*\(|map_from|map_concat\s*\(|map_filter\s*\(|"
    r"transform_keys\s*\(|transform_values\s*\(|map_zip_with\s*\(|"
    r"str_to_map\s*\()",
    re.IGNORECASE,
)


def _cosine_template(args):
    """cosine_similarity — the DOCUMENTED signature is the map form
    (MathFunctions.java:1313); the array form is this repo's extension.
    Map-shaped argument TEXT selects the map body directly; ambiguous
    column references default to the array body, and Engine.sql retries
    the whole statement with the map body (_FN_TEMPLATES_ALT) when
    analysis fails with a type mismatch."""
    if _MAPISH_ARG.match(args[0]) or _MAPISH_ARG.match(args[1]):
        body = _COS_MAP_BODY
    else:
        body = _COS_ARRAY_BODY
    return body.replace("<0>", args[0]).replace("<1>", args[1])


# Type-generic registry functions that no monomorphic SQL UDF can front
# (array<T> parameters, aggregate bodies, literal-driven dispatch): macro
# templates expanded at translate time, ``<N>`` = N-th argument text. The
# bodies transcribe the SAME expressions as functions/registry.py (file
# citations there). Keyed by arity — uncovered arities are left untouched
# (they then resolve against a same-named SQL shim, or fail loudly).
_FN_TEMPLATES: dict[str, dict[int, str]] = {
    # json_parse canonicalizes (JsonFunctions.java jsonParse produces the
    # canonical compact text — json.rst: json_parse('[1, 2, 3]') renders
    # '[1,2,3]'); json_format of an already-canonical value is identity
    "json_parse": {1: "__tps_json_canon(<0>)"},
    "json_format": {1: "<0>"},
    # unicodedata kernel registered by sql_shims; form defaults to NFC
    # (StringFunctions.java normalize). Trino's grammar spells the form
    # as a BARE KEYWORD (SqlBase.g4: NORMALIZE '(' expr (',' normalForm)?
    # ')') — the callable template quotes it; a string-valued form still
    # works through upper().
    "normalize": {
        1: "__tps_normalize(<0>, 'NFC')",
        2: lambda args: (
            f"__tps_normalize({args[0]}, "
            + (
                f"'{args[1].strip().upper()}'"
                if re.fullmatch(
                    r"NFC|NFD|NFKC|NFKD", args[1].strip(), re.IGNORECASE
                )
                else f"upper({args[1]})"
            )
            + ")"
        ),
    },
    "sha256": {1: "sha2(<0>, 256)"},
    "sha512": {1: "sha2(<0>, 512)"},
    "millisecond": {1: "CAST(date_format(<0>, 'SSS') AS BIGINT)"},
    "to_iso8601": {1: "date_format(<0>, 'yyyy-MM-dd''T''HH:mm:ss.SSS''Z''')"},
    "geometric_mean": {1: "exp(avg(ln(<0>)))"},
    # wrapping 64-bit sum of xxhash64*PRIME64 (ChecksumAggregationFunction
    # .java:124-139) — the body is built by registry._checksum_sql so the
    # SQL-text and DataFrame planes can never diverge again (round-10
    # ADVICE: the xor variant cancelled even multiplicities of dup rows)
    "checksum": {1: _checksum_template},
    "trim_array": {2: "slice(<0>, 1, greatest(size(<0>) - (<1>), 0))"},
    "ngrams": {
        2: (
            "CASE WHEN size(<0>) >= (<1>) THEN transform("
            "sequence(1, size(<0>) - (<1>) + 1), "
            "__i -> slice(<0>, __i, <1>)) ELSE array(<0>) END"
        )
    },
    "contains_sequence": {
        2: (
            "CASE WHEN size(<1>) = 0 THEN true "
            "WHEN size(<0>) < size(<1>) THEN false "
            "ELSE exists(sequence(1, size(<0>) - size(<1>) + 1), "
            "__i -> slice(<0>, __i, size(<1>)) = <1>) END"
        )
    },
    # entries normalize through a single-entry map so ANY 2-field struct
    # works (Trino ROW fields are anonymous — ROW('a', 1) arrives as
    # col1/col2, map_entries output as key/value; .key access alone broke
    # the documented ROW form, round-11 doc-surface audit)
    "multimap_from_entries": {
        1: (
            "map_from_arrays("
            "array_distinct(transform(<0>, __x -> "
            "element_at(map_keys(map_from_entries(array(__x))), 1))), "
            "transform(array_distinct(transform(<0>, __x -> "
            "element_at(map_keys(map_from_entries(array(__x))), 1))), "
            "__k -> transform(filter(<0>, __x -> "
            "element_at(map_keys(map_from_entries(array(__x))), 1) <=> __k), "
            "__x -> element_at(map_values(map_from_entries(array(__x))), 1))))"
        )
    },
    "cosine_similarity": {2: _cosine_template},
    # --- documented aggregates (round-11 tier-2 closure; see the macro
    # builders above and functions/agg_shims.py for the __tps_* kernels)
    "map_agg": {2: _map_agg_template},
    "multimap_agg": {2: _multimap_agg_template},
    "map_union": {1: _map_union_template},
    "histogram": {1: _histogram_template},
    # reduce_agg(input, init, input_fn, combine_fn) — Trino lambdas are
    # Spark lambdas syntactically; the single-node fold over the grouped
    # array applies input_fn only (ReduceAggregationFunction.java — the
    # combine_fn merges partial states, which this rewrite never has).
    # Callable: Trino coerces the initial state to the lambda's wider
    # type, Spark does not — a bare integer-literal init (the documented
    # form `reduce_agg(v, 0, ...)`) gets widened to BIGINT, a bare
    # decimal literal to DOUBLE; anything else passes through as typed.
    "reduce_agg": {4: _reduce_agg_template},
    "numeric_histogram": {
        2: (
            "map_from_entries(__tps_numeric_histogram("
            "CAST(<0> AS INT), CAST(<1> AS DOUBLE)))"
        ),
        3: (
            "map_from_entries(__tps_numeric_histogram_w("
            "CAST(<0> AS INT), CAST(<1> AS DOUBLE), CAST(<2> AS DOUBLE)))"
        ),
    },
    "approx_most_frequent": {
        3: (
            "map_from_entries(__tps_approx_most_frequent("
            "CAST(<0> AS INT), CAST(<1> AS STRING), CAST(<2> AS INT)))"
        )
    },
    "approx_set": {
        1: "__tps_approx_set(CAST(<0> AS STRING))",
        2: "__tps_approx_set(CAST(<0> AS STRING))",  # max-error arg ignored
    },
    "merge": {1: "__tps_merge(<0>)"},
    "make_set_digest": {1: "__tps_make_set_digest(CAST(<0> AS STRING))"},
    "empty_approx_set": {0: _empty_approx_set_template},
    "qdigest_agg": {
        1: "__tps_qdigest_agg(CAST(<0> AS DOUBLE), CAST(1 AS DOUBLE))",
        2: "__tps_qdigest_agg(CAST(<0> AS DOUBLE), CAST(<1> AS DOUBLE))",
        # accuracy argument accepted and ignored (the KLL k is fixed)
        3: "__tps_qdigest_agg(CAST(<0> AS DOUBLE), CAST(<1> AS DOUBLE))",
    },
    "tdigest_agg": {
        1: "__tps_tdigest_agg(CAST(<0> AS DOUBLE), CAST(1 AS DOUBLE))",
        2: "__tps_tdigest_agg(CAST(<0> AS DOUBLE), CAST(<1> AS DOUBLE))",
    },
    "learn_classifier": {2: "__tps_learn_classifier(CAST(<0> AS DOUBLE), <1>)"},
    "learn_regressor": {2: "__tps_learn_regressor(CAST(<0> AS DOUBLE), <1>)"},
    # libsvm variants: the params string is accepted and ignored (the
    # engine's model family is the linear one either way)
    "learn_libsvm_classifier": {
        3: "__tps_learn_classifier(CAST(<0> AS DOUBLE), <1>)"
    },
    "learn_libsvm_regressor": {
        3: "__tps_learn_regressor(CAST(<0> AS DOUBLE), <1>)"
    },
    "features": {
        n: _features_template for n in range(1, 33)
    },
    "geometry_union_agg": {1: "__tps_geometry_union_agg(<0>)"},
    "convex_hull_agg": {1: "__tps_convex_hull_agg(<0>)"},
    # --- round-11 documented-surface audit findings (tests/
    # test_doc_surface.py): names the registry-driven audits skipped
    # because they sat in _FN_RENAMES with sentinel targets ('&',
    # '!exists') or wrong targets (truncate->trunc is Spark's DATE
    # truncation — a wrong-function rename).
    # bitwise_and / bitwise_not live as BIGINT-typed SQL shims beside
    # bitwise_or/xor (sql_shims.py) — a bare `(x & y)` template here
    # inherits the INPUT width (int32 over nationkey) and flips the
    # driver's exact-width schema check (caught by the round-11
    # whole-suite run)
    "none_match": {2: "(NOT exists(<0>, <1>))"},
    # MathFunctions.java truncate = toward-zero; Spark has no numeric
    # 1-arg truncation builtin
    "truncate": {
        1: (
            "CAST(CASE WHEN (<0>) < 0 THEN ceil(<0>) "
            "ELSE floor(<0>) END AS DOUBLE)"
        )
    },
    # Trino bit_count(x, bits) interprets x as a bits-wide two's
    # complement value (MathFunctions.java bitCount); Spark's builtin is
    # 64-bit only — mask to the low bits first (for bits=64 the mask is
    # the identity)
    "bit_count": {
        2: (
            "bit_count((<0>) & (CASE WHEN CAST(<1> AS INT) >= 64 THEN -1 "
            "ELSE shiftleft(CAST(1 AS BIGINT), CAST(<1> AS INT)) - 1 END))"
        )
    },
    # FormatNumberFunction.java: 1-arg humanized magnitude (123456 ->
    # '123K'); Spark's format_number is the 2-arg thousands-separator
    # form, untouched here (arity 2 not covered)
    "format_number": {
        1: (
            "CASE WHEN abs(CAST(<0> AS DOUBLE)) < 1000.0D THEN "
            "CAST(CAST(<0> AS BIGINT) AS STRING) "
            "WHEN abs(CAST(<0> AS DOUBLE)) < 1000000.0D THEN "
            "concat(CAST(CAST(round(CAST(<0> AS DOUBLE) / 1000.0D) "
            "AS BIGINT) AS STRING), 'K') "
            "WHEN abs(CAST(<0> AS DOUBLE)) < 1000000000.0D THEN "
            "concat(CAST(CAST(round(CAST(<0> AS DOUBLE) / 1000000.0D) "
            "AS BIGINT) AS STRING), 'M') "
            "WHEN abs(CAST(<0> AS DOUBLE)) < 1000000000000.0D THEN "
            "concat(CAST(CAST(round(CAST(<0> AS DOUBLE) / 1000000000.0D) "
            "AS BIGINT) AS STRING), 'B') "
            "ELSE concat(CAST(CAST(round(CAST(<0> AS DOUBLE) / "
            "1000000000000.0D) AS BIGINT) AS STRING), 'T') END"
        )
    },
    # Trino's 2-arg regexp forms default to group 0 / empty replacement
    # (JoniRegexpFunctions.java); Spark's default group is 1 (wrong
    # result with groups, error without) and regexp_replace has no 2-arg
    # form. The expansions hit the 3-arg shapes, which the fixpoint loop
    # leaves alone (arity 3 not templated).
    "regexp_extract": {2: "regexp_extract(<0>, <1>, 0)"},
    "regexp_extract_all": {2: "regexp_extract_all(<0>, <1>, 0)"},
    "regexp_replace": {2: "regexp_replace(<0>, <1>, '')"},
    # quadkey-decode form of bing_tile (BingTileFunctions.fromQuadKey);
    # the (x, y, zoom) encode form is a session SQL shim. Digit at
    # position p contributes bit 2^(zoom-p): x from digit%2, y from
    # digit/2 (tile = x*2^28 + y*32 + zoom).
    "bing_tile": {
        1: (
            "aggregate(sequence(1, length(<0>)), CAST(0 AS BIGINT), "
            "(__acc, __p) -> __acc + ((ascii(substring(<0>, __p, 1)) - 48) "
            "% 2) * CAST(pow(2.0D, length(<0>) - __p) AS BIGINT)) "
            "* 268435456 + "
            "aggregate(sequence(1, length(<0>)), CAST(0 AS BIGINT), "
            "(__acc, __p) -> __acc + CAST((ascii(substring(<0>, __p, 1)) "
            "- 48) / 2 AS BIGINT) * CAST(pow(2.0D, length(<0>) - __p) "
            "AS BIGINT)) * 32 + CAST(length(<0>) AS BIGINT)"
        )
    },
    "json_array_contains": {
        2: (
            "__tps_json_array_contains(CAST(<0> AS STRING), "
            "CAST(<1> AS STRING), typeof(<1>))"
        )
    },
    "regexp_position": {
        3: (
            "CAST(CASE WHEN regexp_instr(substr(<0>, <2>), <1>) = 0 "
            "THEN -1 ELSE regexp_instr(substr(<0>, <2>), <1>) + (<2>) - 1 "
            "END AS INT)"
        ),
        # occurrence form (JoniRegexpFunctions.java regexpPosition 4-arg)
        # — python re kernel; Spark's regexp_instr has no occurrence arg
        4: (
            "__tps_regexp_position4(<0>, <1>, CAST(<2> AS INT), "
            "CAST(<3> AS INT))"
        ),
    },
    # timestamptz offset of a UTC-session instant is 0 (SURVEY §1.2)
    "timezone_hour": {1: "CAST(0 AS BIGINT)"},
    "timezone_minute": {1: "CAST(0 AS BIGINT)"},
    # color-family interpolation forms onto the __tps_* kernels
    # (functions/sql_shims.py registers them)
    "color": {
        3: (
            "__tps_color_interp(CAST(<0> AS DOUBLE), "
            "CAST(<1> AS BIGINT), CAST(<2> AS BIGINT))"
        ),
        5: (
            "__tps_color_interp(CAST(((<0>) - (<1>)) / ((<2>) - (<1>)) "
            "AS DOUBLE), CAST(<3> AS BIGINT), CAST(<4> AS BIGINT))"
        ),
    },
    "bar": {
        4: (
            "__tps_bar(CAST(<0> AS DOUBLE), CAST(<1> AS BIGINT), "
            "CAST(<2> AS BIGINT), CAST(<3> AS BIGINT))"
        )
    },
    "render": {
        1: (
            "CASE WHEN <0> THEN __tps_render('✓', __tps_color('green')) "
            "ELSE __tps_render('✗', __tps_color('red')) END"
        )
    },
}

#: ALTERNATE expansions for names whose Trino overload set spans Spark
#: types one text rewrite can't cover: the PRIMARY mapping fits the
#: common case (cardinality->size over arrays/maps, positional cosine
#: over arrays, minhash-signature setdigest helpers); when a statement
#: fails ANALYSIS under the primary translation, Engine.sql retries once
#: with these bodies for the names present (api.py) — covering the
#: reference's sketch-typed overloads (cardinality(hll), the documented
#: map cosine_similarity, setdigest jaccard/intersection/hash_counts).
_FN_TEMPLATES_ALT: dict[str, dict[int, object]] = {
    "cardinality": {1: "__tps_sketch_cardinality(<0>)"},
    # double-typed state for folds over double inputs with an integer
    # init literal (the primary widens bare integer inits to BIGINT)
    "reduce_agg": {
        4: lambda args: (
            f"aggregate(array_agg({args[0]}), "
            f"CAST({args[1]} AS DOUBLE), {args[2]})"
        )
    },
    "cosine_similarity": {
        2: lambda args: _COS_MAP_BODY.replace("<0>", args[0]).replace(
            "<1>", args[1]
        )
    },
    "jaccard_index": {2: "jaccard_index_sd(<0>, <1>)"},
    "intersection_cardinality": {2: "intersection_cardinality_sd(<0>, <1>)"},
    "hash_counts": {1: "hash_counts_sd(<0>)"},
}


def alt_fns_in(sql: str) -> frozenset:
    """Names from _FN_TEMPLATES_ALT called anywhere in ``sql`` — the
    candidate set for Engine.sql's one-shot analysis retry."""
    return frozenset(
        name
        for name in _FN_TEMPLATES_ALT
        if re.search(rf"\b{name}\s*\(", sql, re.IGNORECASE)
    )


def _wrap_typeof(s: str) -> str:
    """ONE pass (deliberately not a fixpoint template — the wrapper calls
    typeof itself): typeof(x) -> __tps_trino_typename(typeof(x)), mapping
    Spark's type names onto the reference's renderings (typeof(123) ->
    'integer', not 'int'; conversion.rst). Skips already-wrapped calls."""
    pat = re.compile(r"\btypeof\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(s, pos)
        if not m:
            return s
        depth, j = 1, m.end()
        while j < len(s) and depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        repl = f"__tps_trino_typename({s[m.start():j]})"
        s = s[: m.start()] + repl + s[j:]
        pos = m.start() + len(repl)


def _apply_fn_templates(s: str, alt_fns: frozenset = frozenset()) -> str:
    """Expand :data:`_FN_TEMPLATES` macro calls on SHIELDED text (string
    literals are placeholders, so args split safely at top-level commas).
    Balanced-paren argument capture; the replacement is parenthesized so
    operator precedence survives any call site. Names in ``alt_fns`` use
    their :data:`_FN_TEMPLATES_ALT` bodies instead (Engine.sql's
    analysis-retry path)."""
    templates = dict(_FN_TEMPLATES)
    for name in alt_fns:
        templates[name] = _FN_TEMPLATES_ALT[name]
    changed = True
    while changed:
        changed = False
        for name, by_arity in templates.items():
            pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
            pos = 0
            while True:
                m = pat.search(s, pos)
                if not m:
                    break
                depth, j = 1, m.end()
                while j < len(s) and depth:
                    if s[j] == "(":
                        depth += 1
                    elif s[j] == ")":
                        depth -= 1
                    j += 1
                inner = s[m.end() : j - 1]
                args = _split_top_commas(inner) if inner.strip() else []
                tpl = by_arity.get(len(args))
                if tpl is None:
                    pos = j  # arity not covered here: leave the call alone
                    continue
                if callable(tpl):
                    body = tpl(args)
                else:
                    body = tpl
                    for i, a in enumerate(args):
                        body = body.replace(f"<{i}>", a)
                repl = f"({body})"
                s = s[: m.start()] + repl + s[j:]
                pos = m.start() + len(repl)
                changed = True
    return s


def _rewrite_pattern_calls(s: str, restore) -> str:
    """MySQL / Teradata datetime-pattern functions with a LITERAL pattern
    argument (the overwhelmingly common form) -> Spark equivalents with
    the pattern converted python-side (DateTimeFunctions.java date_parse/
    date_format use MySQL %-patterns; TeradataDateFunctions to_char/
    to_timestamp/to_date use Teradata patterns). Operates on shielded
    text: the pattern argument is a literal placeholder, restored,
    converted, and re-emitted inline. Non-literal patterns are left
    untouched (date_parse then fails loudly as unresolvable; date_format
    falls through to Spark's Java-pattern builtin)."""
    from trino_private_spark.functions.registry import (
        _mysql_pattern_to_java,
        _td_pattern_to_java,
    )

    # require: None = always rewrite; str = only when the literal contains
    # the substring; compiled regex = only when it searches. The bare
    # to_date/to_timestamp 2-arg forms are TERADATA-patterned in the
    # reference (teradata.rst `to_date(string, format)`), so a literal
    # carrying Teradata-only tokens (YYYY/DD/HH24/MI) converts — a
    # Java-patterned literal (yyyy-MM-dd) passes through to the Spark
    # builtin untouched.
    td_marker = re.compile(r"YYYY|DD|HH24|MI")
    specs = [
        ("date_parse", "to_timestamp", _mysql_pattern_to_java, None),
        ("date_format", "date_format", _mysql_pattern_to_java, "%"),
        ("to_char", "date_format", _td_pattern_to_java, None),
        ("to_timestamp_td", "to_timestamp", _td_pattern_to_java, None),
        ("to_date_td", "to_date", _td_pattern_to_java, None),
        ("to_timestamp", "to_timestamp", _td_pattern_to_java, td_marker),
        ("to_date", "to_date", _td_pattern_to_java, td_marker),
    ]
    for name, target, conv, require in specs:
        pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
        pos = 0
        while True:
            m = pat.search(s, pos)
            if not m:
                break
            depth, j = 1, m.end()
            while j < len(s) and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            args = _split_top_commas(s[m.end() : j - 1])
            if len(args) != 2 or not re.fullmatch(
                r"\x00\d+\x00", args[1].strip()
            ):
                pos = j
                continue
            lit = restore(args[1].strip())
            body = lit[1:-1].replace("''", "'")
            if isinstance(require, str) and require not in body:
                pos = j
                continue
            if hasattr(require, "search") and not require.search(body):
                pos = j
                continue
            newpat = conv(body).replace("'", "''")
            # stash the converted literal back as a placeholder — inlining
            # raw quoted text into SHIELDED sql desyncs every later
            # balanced-paren scan when the pattern contains '(' or ')'
            lit = f"'{newpat}'"
            token = restore.stash(lit) if hasattr(restore, "stash") else lit
            repl = f"{target}({args[0]}, {token})"
            s = s[: m.start()] + repl + s[j:]
            pos = m.start() + len(repl)
    return s

_UNIT = r"'(millisecond|second|minute|hour|day|week|month|quarter|year)'"


def strip_sql_comments(sql: str, backslash_escapes: bool = False) -> str:
    """Remove ``--``-to-end-of-line and ``/* ... */`` comments, shielding
    quoted regions — the lexer-level skip the reference performs
    (core/trino-parser SqlBase.g4 SIMPLE_COMMENT / BRACKETED_COMMENT ->
    channel(HIDDEN)) done ONCE at statement entry. Every downstream
    regex router (statement dispatch, partition-prune predicate
    extraction, DML/time-travel/recursive lowering) would otherwise see
    commented-out text as live tokens — a commented-out conjunct that
    becomes a partition-prune term silently drops rows. Quoted regions
    are never touched: ``'a--b'`` (with ``''`` escapes), Trino
    double-quoted identifiers, and Spark backtick identifiers all pass
    through verbatim. A line comment keeps its terminating newline; a
    block comment collapses to one space (``a/*x*/b`` -> ``a b``) so
    token boundaries survive. Idempotent.

    ``backslash_escapes``: Trino literals escape quotes ONLY by
    doubling (``''`` — SqlBase.g4 STRING), but Spark's default parser
    also processes backslash escapes (``'a\\'--not a comment'``) — pass
    True for spark-dialect text so a backslashed quote doesn't end the
    shield early and expose literal content to the comment scan."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if backslash_escapes and sql[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif c in ('"', "`"):
            j = sql.find(c, i + 1)
            j = n - 1 if j == -1 else j
            out.append(sql[i : j + 1])
            i = j + 1
        elif c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i + 2)
            i = n if j == -1 else j  # keep the newline itself
        elif c == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i + 2)
            out.append(" ")
            # an unterminated block comment swallows the rest — the
            # reference's lexer errors there; downstream parsing will
            # fail loudly on the truncated statement either way
            i = n if j == -1 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


# Trino string literals escape quotes ONLY by '' doubling (SqlBase.g4
# STRING); Spark's default parser ALSO processes backslash escapes, so a
# spark-dialect literal 'a\'--b' runs past the backslashed quote. The two
# lexing rules as alternates — the shield must match the dialect of the
# text it lexes or literal content leaks into the token stream (the round-9
# wrong-results bug: a mis-lexed literal swallowed an OR branch and its
# remains became a live partition-prune term).
_TRINO_STR = r"'(?:[^']|'')*'"
_SPARK_STR = r"'(?:\\.|''|[^'\\])*'"


def _shield_strings(sql: str, backslash_escapes: bool = False):
    """Replace string literals with placeholders so rewrites can't touch
    their contents; returns (shielded_sql, restore_fn).

    ``backslash_escapes``: lex literals by Spark's rule (backslash escapes
    AND '' doubling) instead of Trino's (doubling only) — pass True for
    spark-dialect text, exactly as :func:`strip_sql_comments` does."""
    literals: list[str] = []

    def stash(m):
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    shielded = re.sub(
        _SPARK_STR if backslash_escapes else _TRINO_STR, stash, sql
    )

    def restore(s: str) -> str:
        return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], s)

    def stash_new(text: str) -> str:
        """Shield NEW literal text produced by a rewrite (round-10 ADVICE:
        splicing a raw quoted literal back into the shielded stream desyncs
        later balanced-paren scans when the literal contains a paren)."""
        literals.append(text)
        return f"\x00{len(literals) - 1}\x00"

    restore.stash = stash_new  # type: ignore[attr-defined]
    return shielded, restore


def _escape_literal_backslashes(s: str) -> str:
    """Double backslashes inside single-quoted literals. Trino's STRING
    token has NO escape processing beyond '' doubling (SqlBase.g4), so
    ``'a\\nb'`` is the four characters a-backslash-n-b; Spark's default
    parser would collapse ``\\n`` to a newline (and die on a trailing
    ``'a\\'``). Run over translate()'s OUTPUT so trino-dialect literals
    keep their literal-character semantics under Spark's lexer (Spark
    still honors '' doubling, so shielded quotes survive unchanged)."""
    return re.sub(
        _TRINO_STR, lambda m: m.group(0).replace("\\", "\\\\"), s
    )


def _rewrite_array_literals(s: str) -> str:
    """ARRAY[...] -> array(...) (SqlBase.g4 arrayConstructor). One pass
    converts outermost occurrences; the caller loops to fixpoint so nested
    ARRAY[ARRAY[..]] literals converge."""
    pat = re.compile(r"\bARRAY\s*\[", re.IGNORECASE)
    out, i = [], 0
    while True:
        m = pat.search(s, i)
        if not m:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i : m.start()])
        out.append("array(")
        depth, j = 1, m.end()
        while j < len(s) and depth:
            if s[j] == "[":
                depth += 1
            elif s[j] == "]":
                depth -= 1
            if depth:
                out.append(s[j])
            j += 1
        out.append(")")
        i = j


def _rewrite_subscripts(s: str) -> str:
    """Postfix subscript base[idx] -> element_at(base, idx): Trino
    subscripts are 1-based (ArraySubscriptOperator) and so is Spark's
    element_at; both throw on out-of-range (Spark under ANSI mode).
    Handles chained a[1][2] and parenthesized bases by re-scanning after
    each rewrite."""
    changed = True
    while changed:
        changed = False
        for m in re.finditer(r"\[", s):
            k = m.start()
            p = k - 1
            while p >= 0 and s[p].isspace():
                p -= 1
            if p < 0:
                continue
            if s[p] == ")":
                depth, q = 1, p - 1
                while q >= 0 and depth:
                    if s[q] == ")":
                        depth += 1
                    elif s[q] == "(":
                        depth -= 1
                    q -= 1
                while q >= 0 and (s[q].isalnum() or s[q] in "_.`"):
                    q -= 1
                base_start = q + 1
            elif s[p].isalnum() or s[p] in "_`":
                q = p
                while q >= 0 and (s[q].isalnum() or s[q] in "_.`"):
                    q -= 1
                base_start = q + 1
            else:
                continue
            base = s[base_start : p + 1]
            depth, j = 1, k + 1
            while j < len(s) and depth:
                if s[j] == "[":
                    depth += 1
                elif s[j] == "]":
                    depth -= 1
                j += 1
            idx = s[k + 1 : j - 1]
            s = f"{s[:base_start]}element_at({base}, {idx}){s[j:]}"
            changed = True
            break
    return s


# Renamed targets whose Spark return type is INT where Trino declares
# BIGINT (StringFunctions.java strpos/length/codepoint return bigint;
# ArrayFunctions cardinality returns bigint). Wrapped in CAST so the
# translated query's schema matches Trino's.
_BIGINT_CALLS = (
    "instr", "size", "ascii", "length", "dayofyear", "weekofyear",
    "dayofmonth",
)


def _cast_calls_bigint(s: str, names=_BIGINT_CALLS) -> str:
    """Wrap name(...) calls in CAST(... AS BIGINT), scanning balanced
    parens so nested arguments survive."""
    for name in names:
        pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
        i = 0
        while True:
            m = pat.search(s, i)
            if not m:
                break
            depth, j = 1, m.end()
            while j < len(s) and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            call = s[m.start() : j]
            wrapped = f"CAST({call} AS BIGINT)"
            s = s[: m.start()] + wrapped + s[j:]
            i = m.start() + len(wrapped)
    return s


_SIMPLE_TYPES = {
    "integer": "INT",
    "int": "INT",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
    "double": "DOUBLE",
    "real": "FLOAT",
    "boolean": "BOOLEAN",
    "varbinary": "BINARY",
    "date": "DATE",
    "json": "STRING",
}


def _type_to_spark(t: str) -> str:
    """Trino type text (SqlBase.g4 ``type``: row(name type, ...),
    array(T), map(K, V), parametric varchar/decimal/timestamp, base names)
    -> Spark DDL type text (STRUCT<name: T>, ARRAY<T>, MAP<K, V>)."""
    t = t.strip()
    low = t.lower()
    if low.startswith("row") and "(" in t:
        inner = t[t.index("(") + 1 : t.rindex(")")]
        fields = []
        for f in _split_top_commas(inner):
            name, _, ftype = f.strip().partition(" ")
            fields.append(f"{name}: {_type_to_spark(ftype)}")
        return f"STRUCT<{', '.join(fields)}>"
    if low.startswith("array") and "(" in t:
        return f"ARRAY<{_type_to_spark(t[t.index('(') + 1 : t.rindex(')')])}>"
    if low.startswith("map") and "(" in t:
        k, v = _split_top_commas(t[t.index("(") + 1 : t.rindex(")")])
        return f"MAP<{_type_to_spark(k)}, {_type_to_spark(v)}>"
    if low.startswith("varchar") or low.startswith("char"):
        return "STRING"
    if low.replace(" ", "") == "doubleprecision":
        return "DOUBLE"
    base = low.split("(")[0].strip()
    if base in _SIMPLE_TYPES and "(" not in t:
        return _SIMPLE_TYPES[base]
    return t  # decimal(p,s), timestamp(p), interval ... pass through


def _rewrite_row_casts(s: str) -> str:
    """``AS row(...)`` / ``AS array(...)`` / ``AS map(...)`` type targets in
    CAST expressions -> Spark DDL types via :func:`_type_to_spark`."""
    pat = re.compile(r"\bAS\s+(row|array|map)\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(s)
        if not m:
            return s
        start = m.start(1)
        depth, j = 1, m.end()
        while j < len(s) and depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        s = s[:start] + _type_to_spark(s[start:j]) + s[j:]


def _rewrite_values_rows(s: str) -> str:
    """Strip the optional ``ROW`` keyword from VALUES row constructors
    (``VALUES ROW(1, 2), ROW(3, 4)`` -> ``VALUES (1, 2), (3, 4)``;
    SqlBase.g4 ``rowConstructor``) so the later scalar ``row( -> struct(``
    rewrite can't corrupt the table constructor."""
    out = []
    pos = 0
    row_head = re.compile(r"\s*row\s*\(", re.IGNORECASE)
    for m in re.finditer(r"\bVALUES\b", s, re.IGNORECASE):
        if m.start() < pos:
            continue
        out.append(s[pos : m.end()])
        i = m.end()
        while True:
            h = row_head.match(s, i)
            depth = 0
            if h:
                # keep leading whitespace, drop the word "row", keep "(" —
                # the item stays balanced, we just start inside its paren.
                ws = s[i : h.end()]
                out.append(ws[: len(ws) - len(ws.lstrip())] + "(")
                i = h.end()
                depth = 1
            # copy the balanced item up to the next top-level comma or the
            # end of the enclosing parenthesis / clause
            j = i
            while j < len(s):
                ch = s[j]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif ch == "," and depth == 0:
                    break
                j += 1
            out.append(s[i:j])
            i = j
            if i < len(s) and s[i] == ",":
                out.append(",")
                i += 1
                continue
            break
        pos = i
    out.append(s[pos:])
    return "".join(out)


_ALIAS_STOPWORDS = {
    "where", "group", "order", "limit", "offset", "fetch", "cross", "join",
    "left", "right", "full", "inner", "outer", "on", "union", "except",
    "intersect", "having", "with", "window", "natural", "using", "lateral",
}


def _split_top_commas(s: str) -> list[str]:
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return [p.strip() for p in parts]


def _rewrite_from_unnest(s: str) -> str:
    """``FROM UNNEST(args) [WITH ORDINALITY] [AS] alias[(cols)]`` as a bare
    relation (SqlBase.g4 ``relationPrimary: UNNEST '(' expression ... ')'``)
    -> a Spark derived table over explode/posexplode/inline(arrays_zip).
    Multi-argument UNNEST null-pads to the longest array (the reference's
    multi-channel unnesters; ``arrays_zip`` has the same semantics); WITH
    ORDINALITY appends a 1-based BIGINT position column. A single-argument
    two-column UNNEST whose expression builds a map (``map_from_arrays`` /
    ``map(...)``) explodes to (key, value)."""
    pat = re.compile(r"\bFROM\s+UNNEST\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(s)
        if not m:
            return s
        depth, j = 1, m.end()
        while j < len(s) and depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        args = _split_top_commas(s[m.end() : j - 1])
        rest = s[j:]
        ordinality = False
        om = re.match(r"\s*WITH\s+ORDINALITY\b", rest, re.IGNORECASE)
        if om:
            ordinality = True
            rest = rest[om.end() :]
        alias, cols = "u0", None
        am = re.match(r"\s*(?:AS\s+)?(\w+)\s*(?:\(\s*([^)]*?)\s*\))?", rest)
        if am and am.group(1).lower() not in _ALIAS_STOPWORDS:
            alias = am.group(1)
            if am.group(2):
                cols = [c.strip() for c in am.group(2).split(",")]
            rest = rest[am.end() :]
        if cols is None:
            n = len(args) + (1 if ordinality else 0)
            cols = ["col"] if n == 1 else [f"c{i}" for i in range(n)]
        if len(args) == 1:
            arg = args[0]
            is_map = bool(re.match(r"\s*map", arg, re.IGNORECASE))
            if ordinality:
                vals = cols[:-1] or ["col"]
                ordn = cols[-1] if len(cols) > 1 else "ord"
                if is_map and len(vals) == 2:
                    inner = f"SELECT posexplode({arg}) AS (pos__, {vals[0]}, {vals[1]})"
                    proj = f"{vals[0]}, {vals[1]}"
                else:
                    inner = f"SELECT posexplode({arg}) AS (pos__, {vals[0]})"
                    proj = vals[0]
                repl = (
                    f"FROM (SELECT {proj}, CAST(pos__ + 1 AS BIGINT) AS {ordn} "
                    f"FROM ({inner})) {alias}"
                )
            elif is_map and len(cols) == 2:
                repl = f"FROM (SELECT explode({arg}) AS ({cols[0]}, {cols[1]})) {alias}"
            else:
                repl = f"FROM (SELECT explode({arg}) AS {cols[0]}) {alias}"
        else:
            zipped = f"arrays_zip({', '.join(args)})"
            if ordinality:
                # index-driven form: robust to arrays_zip field naming.
                vals, ordn = cols[:-1], cols[-1]
                sizes = ", ".join(f"size({a})" for a in args)
                proj = ", ".join(
                    f"try_element_at({a}, CAST(i__ AS INT)) AS {c}"
                    for a, c in zip(args, vals)
                )
                # sequence(1, 0) would DESCEND (see verify skill notes):
                # clamp the upper bound to >=1 and filter the empty case.
                repl = (
                    f"FROM (SELECT {proj}, CAST(i__ AS BIGINT) AS {ordn} "
                    f"FROM (SELECT explode(sequence(1, greatest(1, {sizes}))) AS i__) "
                    f"WHERE i__ <= greatest({sizes})) {alias}"
                )
            else:
                repl = (
                    f"FROM (SELECT inline({zipped}) AS ({', '.join(cols)})) {alias}"
                )
        s = s[: m.start()] + repl + rest


_QUANT_PAT = re.compile(
    r"(?P<expr>\w+(?:\.\w+)*(?:\s*\([^()]*\))?|\x00\d+\x00|-?\d+(?:\.\d+)?)"
    r"\s*(?P<op><>|!=|>=|<=|=|>|<)\s*(?P<q>ALL|ANY|SOME)\s*\(",
    re.IGNORECASE,
)


def _rewrite_quantified(s: str) -> str:
    """Quantified comparisons ``expr op ALL/ANY/SOME (subquery)``
    (SqlBase.g4 ``comparisonQuantifier``; Spark has no ALL/ANY) -> the
    reference planner's own min/max/count rewrite
    (``sql/planner/iterative/rule/TransformQuantifiedComparisonApplyToCorrelatedJoin.java``)
    spelled as scalar subqueries, preserving three-valued logic: FALSE
    beats NULL beats TRUE for ALL (dually for ANY), the empty set is TRUE
    for ALL / FALSE for ANY, and NULL inputs propagate. ``= ANY`` and
    ``<> ALL`` lower to IN / NOT IN. The operand is captured as a simple
    term (column, literal, one call) — the forms the reference's suites
    use. Catalyst's ReuseSubquery dedups the repeated scalar aggregates.
    """
    while True:
        m = _QUANT_PAT.search(s)
        if not m:
            return s
        depth, j = 1, m.end()
        while j < len(s) and depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        q = s[m.end() : j - 1].strip()
        # a bare VALUES body ('hello' = ANY (VALUES 'a', 'b') —
        # comparison.rst) isn't a subquery Spark accepts inside IN/scalar
        # positions — and Trino's scalar VALUES list is one ROW PER
        # EXPRESSION while Spark's is one row of N columns: wrap each
        # un-parenthesized element into its own row, then select from it
        vm = re.match(r"VALUES\s+(.*)$", q, re.IGNORECASE | re.DOTALL)
        if vm:
            rows = []
            for el in _split_top_commas(vm.group(1)):
                el = el.strip()
                rows.append(el if el.startswith("(") else f"({el})")
            # the derived VALUES table needs an alias in Spark's parser
            q = f"SELECT * FROM (VALUES {', '.join(rows)}) AS __qv"
        e = m.group("expr")
        op = m.group("op").replace("!=", "<>")
        kind = m.group("q").upper()
        if kind == "SOME":
            kind = "ANY"
        if op == "=" and kind == "ANY":
            repl = f"{e} IN ({q})"
        elif op == "<>" and kind == "ALL":
            repl = f"{e} NOT IN ({q})"
        else:
            cnt = f"(SELECT count(*) FROM ({q}) __qa)"
            cnt_nn = f"(SELECT count(__v) FROM ({q}) __qb(__v))"
            mn = f"(SELECT min(__v) FROM ({q}) __qc(__v))"
            mx = f"(SELECT max(__v) FROM ({q}) __qd(__v))"
            if kind == "ALL":
                if op in (">", ">="):
                    # FALSE iff some non-null v refutes: e {<=,<} max(v)
                    fopp = {">": "<=", ">=": "<"}[op]
                    refute = f"({e}) {fopp} {mx}"
                elif op in ("<", "<="):
                    fopp = {"<": ">=", "<=": ">"}[op]
                    refute = f"({e}) {fopp} {mn}"
                else:  # = ALL
                    refute = f"(({e}) <> {mn} OR ({e}) <> {mx})"
                repl = (
                    f"(CASE WHEN {cnt} = 0 THEN true "
                    f"WHEN ({e}) IS NULL THEN null "
                    f"WHEN {cnt_nn} > 0 AND {refute} THEN false "
                    f"WHEN {cnt_nn} < {cnt} THEN null "
                    f"ELSE true END)"
                )
            else:  # ANY / SOME
                if op in (">", ">="):
                    # TRUE iff some non-null v satisfies: e op min(v)
                    witness = f"({e}) {op} {mn}"
                elif op in ("<", "<="):
                    witness = f"({e}) {op} {mx}"
                else:  # <> ANY
                    witness = f"({mn} <> ({e}) OR {mx} <> ({e}))"
                repl = (
                    f"(CASE WHEN {cnt} = 0 THEN false "
                    f"WHEN ({e}) IS NULL THEN null "
                    f"WHEN {cnt_nn} > 0 AND {witness} THEN true "
                    f"WHEN {cnt_nn} < {cnt} THEN null "
                    f"ELSE false END)"
                )
        s = s[: m.start()] + repl + s[j:]


def translate(sql: str, alt_fns: frozenset = frozenset()) -> str:
    """Translate a Trino-dialect SQL string into Spark SQL. ``alt_fns``
    selects :data:`_FN_TEMPLATES_ALT` bodies for those names (Engine.sql's
    analysis-retry path for sketch-typed overloads)."""
    # comments out first (Engine.sql already stripped; direct translate()
    # callers get the same lexer-level skip — idempotent either way)
    sql = strip_sql_comments(sql)
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

    # Double-quoted identifiers (SqlBase.g4 quotedIdentifier — in Trino a
    # double-quoted token is ALWAYS an identifier, never a string): quoted
    # function names lose the quotes ("sum"(x) -> sum(x), the form the
    # reference's own TPC-DS corpus uses throughout), other identifiers
    # become Spark backtick-quoted. '' escapes inside are undone to a
    # literal quote inside backticks.
    s = re.sub(r'"([A-Za-z_][A-Za-z0-9_]*)"(\s*\()', r"\1\2", s)
    s = re.sub(
        r'"((?:[^"]|"")+)"',
        lambda m: "`" + m.group(1).replace('""', '"') + "`",
        s,
    )

    # DECIMAL 'x.y' literals (SqlBase.g4 DECIMAL_VALUE): Spark has no
    # typed-literal syntax for decimals -> CAST with the precision/scale
    # implied by the literal text (DecimalParser semantics).
    def _dec_lit(m):
        lit = restore(m.group(1)).strip("'")
        digits = lit.lstrip("+-").replace(".", "")
        scale = len(lit.rsplit(".", 1)[1]) if "." in lit else 0
        return f"CAST('{lit}' AS DECIMAL({max(len(digits), 1)}, {scale}))"

    s = re.sub(r"\bDECIMAL\s+(\x00\d+\x00)", _dec_lit, s, flags=re.IGNORECASE)

    # REAL '1.5' typed literals (SqlBase.g4; Spark has no REAL literal
    # syntax — lower onto an explicit cast of the shielded literal)
    s = re.sub(
        r"\bREAL\s+(\x00\d+\x00)",
        r"CAST(\1 AS FLOAT)",
        s,
        flags=re.IGNORECASE,
    )

    # JSON '...' typed literals: the carrier is canonical JSON text —
    # JSON '[1, 2, 3]' renders '[1,2,3]' (json.rst); __tps_json_canon
    # compacts (lenient: unparseable text passes through)
    s = re.sub(
        r"\bJSON\s+(\x00\d+\x00)",
        r"__tps_json_canon(\1)",
        s,
        flags=re.IGNORECASE,
    )

    # CAST(JSON '...' AS VARCHAR) — the cast DECODES a scalar json value
    # (json.rst: the double quote is gone; JSON 'null' casts to NULL);
    # only the literal form is statically recognizable as json-typed
    s = re.sub(
        r"\bCAST\s*\(\s*(__tps_json_canon\(\x00\d+\x00\))\s+AS\s+"
        r"(?:VARCHAR|STRING)\s*\)",
        r"__tps_json_unquote(\1)",
        s,
        flags=re.IGNORECASE,
    )

    # CAST(x AS JSON) — the JSON ENCODING of the value (a varchar input
    # becomes a quoted JSON string, json.rst): type-generically via
    # to_json over a one-field struct, then the {"v": ... } wrapper
    # stripped (prefix {"v": is 5 chars, suffix } is 1)
    s = re.sub(
        r"\bCAST\s*\(([^()]*(?:\([^()]*\)[^()]*)*?)\s+AS\s+JSON\s*\)",
        r"substring(to_json(named_struct('v', \1)), 6, "
        r"length(to_json(named_struct('v', \1))) - 6)",
        s,
        flags=re.IGNORECASE,
    )

    # U&'...' unicode-escaped literals (SqlBase.g4 UNICODE_STRING:
    # \XXXX and \+XXXXXX escapes) decode at translate time and re-shield
    def _u_lit(m):
        lit = restore(m.group(1))
        body = lit[1:-1].replace("''", "'")
        body = re.sub(
            r"\\\+([0-9A-Fa-f]{6})",
            lambda mm: chr(int(mm.group(1), 16)),
            body,
        )
        body = re.sub(
            r"\\([0-9A-Fa-f]{4})",
            lambda mm: chr(int(mm.group(1), 16)),
            body,
        )
        return restore.stash("'" + body.replace("'", "''") + "'")

    s = re.sub(r"\bU&(\x00\d+\x00)", _u_lit, s)

    # FETCH FIRST n ROWS WITH TIES (SqlBase.g4:203-205; the reference
    # plans it via ImplementLimitWithTies) -> rank()-filter rewrite, since
    # Spark has no WITH TIES. Top-level form only; peer rows of the n-th
    # row survive exactly as in the reference.
    ties = re.search(
        r"\bORDER\s+BY\s+(?P<ob>.+?)\s+FETCH\s+(?:FIRST|NEXT)\s+(?P<n>\d+)\s+ROWS?\s+WITH\s+TIES\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if ties and s[: ties.start()].count("(") == s[: ties.start()].count(")"):
        body, ob, n = s[: ties.start()], ties.group("ob"), ties.group("n")
        s = (
            f"SELECT * EXCEPT (__rk) FROM (SELECT __q.*, rank() OVER (ORDER BY {ob}) AS __rk "
            f"FROM ({body}) __q) WHERE __rk <= {n} ORDER BY {ob}"
        )

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

    # expr op ALL/ANY/SOME (subquery) -> min/max/count 3VL rewrite
    s = _rewrite_quantified(s)

    # TRY(CAST(x AS T)) -> TRY_CAST(x AS T) (TryCastFunction.java)
    s = re.sub(
        r"\bTRY\s*\(\s*CAST\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)\s*\)",
        r"TRY_CAST(\1)",
        s,
        flags=re.IGNORECASE,
    )
    # Trino two-array map constructor MAP(ARRAY[...], ARRAY[...])
    # (MapConstructor.java) -> map_from_arrays; leaves map_from_entries etc.
    # untouched since only the ARRAY-headed form matches.
    s = re.sub(
        r"\bMAP\s*\(\s*ARRAY\b", "map_from_arrays(ARRAY", s, flags=re.IGNORECASE
    )
    # UNNEST as a bare FROM relation (incl. multi-array + WITH ORDINALITY)
    s = _rewrite_from_unnest(s)

    # ROW types and constructors (RowType.java / SqlBase.g4 rowConstructor):
    # CAST targets row/array/map(...) -> Spark DDL types; VALUES ROW(..)
    # table constructors lose the keyword; remaining scalar row( -> struct(.
    s = _rewrite_row_casts(s)
    s = _rewrite_values_rows(s)
    s = re.sub(r"\brow\s*\(", "struct(", s, flags=re.IGNORECASE)

    # CROSS JOIN UNNEST(expr[, expr...]) [AS t(cols)] [WITH ORDINALITY]
    def unnest_repl(m):
        inner, ordinality, alias, cols = (
            m.group("inner"),
            m.group("ord"),
            m.group("alias"),
            m.group("cols"),
        )
        args = _split_top_commas(inner)
        colnames = [c.strip() for c in (cols or "c0").split(",")]
        if ordinality:
            val, ordn = colnames[0], (colnames[1] if len(colnames) > 1 else "ord")
            # first LATERAL VIEW yields the 0-based position; the second
            # exposes the 1-based BIGINT ordinality under its declared name.
            a = alias or "u"
            return (
                f" LATERAL VIEW posexplode({inner}) {a}__p AS __pos_{a}, {val} "
                f"LATERAL VIEW explode(array(CAST(__pos_{a} + 1 AS BIGINT))) {a} AS {ordn} "
            )
        if len(args) > 1:
            # multi-channel unnest: null-padded zip (UnnestOperator.java)
            return (
                f" LATERAL VIEW inline(arrays_zip({inner})) {alias or 'u'} "
                f"AS {', '.join(colnames)} "
            )
        return f" LATERAL VIEW explode({inner}) {alias or 'u'} AS {', '.join(colnames)} "

    s = re.sub(
        r"(?:CROSS\s+JOIN|,)\s*UNNEST\s*\(\s*(?P<inner>[^()]*(?:\([^()]*\)[^()]*)*)\s*\)"
        r"\s*(?P<ord>WITH\s+ORDINALITY)?\s*(?:(?:AS\s+)?(?P<alias>\w+)\s*\(\s*(?P<cols>[^)]*)\s*\))?",
        unnest_repl,
        s,
        flags=re.IGNORECASE,
    )

    # literal-pattern datetime functions (MySQL %-patterns, Teradata
    # patterns) -> Spark equivalents with converted pattern text
    s = _rewrite_pattern_calls(s, restore)

    # type-generic registry functions expand as macros (reachability
    # closure — see _FN_TEMPLATES)
    s = _apply_fn_templates(s, alt_fns)

    # typeof renders the reference's type names (single pass, not a
    # fixpoint template — the wrapper itself calls typeof)
    s = _wrap_typeof(s)

    # function renames at call sites
    for trino_name, spark_name in _FN_RENAMES.items():
        if spark_name in ("&", "!exists") or trino_name == spark_name:
            continue
        s = re.sub(
            rf"\b{trino_name}\s*\(", f"{spark_name}(", s, flags=re.IGNORECASE
        )

    # bigint-returning Trino scalars whose Spark rename returns INT
    s = _cast_calls_bigint(s)

    # ARRAY[..] literals, then 1-based subscripts (order matters: the
    # literal rewrite consumes its brackets so subscript detection only
    # sees genuine postfix access).
    prev = None
    while prev != s:
        prev, s = s, _rewrite_array_literals(s)
    s = _rewrite_subscripts(s)

    # Trino type names in CAST targets (Types.java) -> Spark type names.
    # Unparameterized varchar/char is unbounded in Trino (VarcharType
    # UNBOUNDED_LENGTH) but a parse error in Spark without a length —
    # CAST(x AS VARCHAR) is everywhere in reference SQL.
    s = re.sub(
        r"\bAS\s+(?:varchar|char)\b(?!\s*\()", "AS string", s,
        flags=re.IGNORECASE,
    )
    s = re.sub(r"\bAS\s+varbinary\b", "AS binary", s, flags=re.IGNORECASE)
    s = re.sub(r"\bAS\s+real\b", "AS float", s, flags=re.IGNORECASE)
    s = re.sub(
        r"\bAS\s+double\s+precision\b", "AS double", s, flags=re.IGNORECASE
    )

    # TABLESAMPLE BERNOULLI(p)/SYSTEM(p) -> Spark's percent sampling.
    s = re.sub(
        r"\bTABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(\s*([\d.]+)\s*\)",
        r"TABLESAMPLE (\1 PERCENT)",
        s,
        flags=re.IGNORECASE,
    )

    # Trino delimited identifiers are double-quoted (SqlBase.g4
    # quotedIdentifier); Spark uses backticks. String literals are already
    # shielded, so any remaining double quotes delimit identifiers.
    s = re.sub(r'"([^"]+)"', r"`\1`", s)

    # Trino TRY(expr) -> try-variants can't be inferred generically; map the
    # common arithmetic cases.
    s = re.sub(
        r"\bTRY\s*\(\s*([^()]+?)\s*/\s*([^()]+?)\s*\)",
        r"try_divide(\1, \2)",
        s,
        flags=re.IGNORECASE,
    )

    # expr AT TIME ZONE <shielded literal> -> convert_timezone from the UTC
    # session zone (SqlBase.g4 AT TIME ZONE; scalar/timestamptz/AtTimeZone).
    # String literals are shielded as \x00<n>\x00 placeholders at this point.
    s = re.sub(
        r"(\w+(?:\([^()]*\))?)\s+AT\s+TIME\s+ZONE\s+(\x00\d+\x00)",
        r"convert_timezone('UTC', \2, \1)",
        s,
        flags=re.IGNORECASE,
    )

    s = _spell_null_ordering(s)

    # restore literals, then double any backslash inside them — Trino
    # treats backslash as an ordinary literal character, Spark's default
    # parser as an escape introducer (What's missing #3, round 9)
    return _escape_literal_backslashes(restore(s))


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
