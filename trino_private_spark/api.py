"""User-facing engine facade: what a reference-engine user calls instead of
the coordinator (SURVEY.md §3 entry points).

    from trino_private_spark.api import Engine
    eng = Engine()                        # builds the tuned SparkSession
    eng.attach("/root/testdata/sf0.1")    # register the catalog
    eng.sql("SELECT ... FETCH FIRST 10 ROWS ONLY")   # Trino dialect OK
    eng.explain_analyze("SELECT ...")

The lifecycle the reference spreads over parse -> analyze -> plan ->
optimize -> fragment -> schedule -> execute (SqlQueryExecution.java:394)
collapses to translate() + spark.sql(): Catalyst and the Spark scheduler
are those stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.catalog import register_tables
from trino_private_spark.engine import get_spark
from trino_private_spark.functions import register_all
from trino_private_spark.plans.translate import translate

#: live per-statement pruned views (__icep_*) keyed by SparkSession —
#: SESSION-scoped on purpose: temp views live in the shared session
#: catalog, so the drop discipline must too. Any Engine's next pruning
#: statement sweeps every prior statement's views, including those of
#: Engine instances that were abandoned without another call. WeakKey:
#: a session that ends without another pruning statement must not pin
#: its entry (or its SparkSession) for the process lifetime (round-10
#: ADVICE — the id()-keyed dict accumulated dead-session entries).
import weakref as _weakref

_ICEP_LIVE_BY_SESSION: "_weakref.WeakKeyDictionary[SparkSession, list[str]]" = (
    _weakref.WeakKeyDictionary()
)


class Engine:
    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self._sql_shims = register_all(self.spark)

    def attach(self, sf_dir: str) -> dict[str, DataFrame]:
        """Register the parquet tables of a dataset directory as the catalog
        (the connector-attach step of the reference)."""
        self._sf_dir = sf_dir
        return register_tables(self.spark, sf_dir)

    def sql(self, text: str, dialect: str = "trino") -> DataFrame:
        """Run SQL; ``dialect='trino'`` routes through the translator,
        ``'spark'`` executes verbatim.  ``SELECT * FROM <table>
        MATCH_RECOGNIZE (...)`` statements route to the row-pattern engine
        (Spark has no MATCH_RECOGNIZE; SqlBase.g4 patternRecognition)."""
        import re as _re

        from trino_private_spark.plans.translate import strip_sql_comments

        # comments are stripped ONCE, before ANY regex routing — the
        # reference's lexer skips them (SqlBase.g4 SIMPLE_COMMENT /
        # BRACKETED_COMMENT); without this, commented-out text reaches
        # the statement routers and the partition-prune predicate parser
        # as live tokens (a commented-out conjunct would wrongly prune).
        # Spark-dialect literals may contain backslash-escaped quotes —
        # the stripper honors them so literal content stays shielded.
        text = strip_sql_comments(
            text, backslash_escapes=(dialect == "spark")
        )

        ea = _re.match(
            r"\s*EXPLAIN\s+ANALYZE\s+(.+)$", text, flags=_re.I | _re.S
        )
        if ea:
            plan = self.explain_analyze(ea.group(1), dialect)
            return self.spark.createDataFrame(
                [(plan,)], "`Query Plan` string"
            )
        em = _re.match(
            r"\s*EXPLAIN\s*\(\s*TYPE\s+(LOGICAL|DISTRIBUTED|VALIDATE|IO)\s*\)\s*(.+)$",
            text,
            flags=_re.I | _re.S,
        )
        if em:
            from trino_private_spark.plans.explain import explain_typed

            plan = explain_typed(self.sql(em.group(2), dialect), em.group(1))
            # Trino's EXPLAIN returns a one-column result set ("Query Plan")
            return self.spark.createDataFrame(
                [(plan,)], "`Query Plan` string"
            )
        ss = _re.match(
            r"\s*SHOW\s+STATS\s+FOR\s+([A-Za-z_][\w.]*)\s*$", text, flags=_re.I
        )
        if ss:
            name = ss.group(1).lower()
            if name in getattr(self, "_iceberg_views", {}):
                # the reference serves Iceberg SHOW STATS from manifest
                # metrics + ANALYZE-written NDVs, zero data IO
                # (TableStatisticsReader); so does the shim
                from trino_private_spark.sources.iceberg_stats import (
                    show_stats_frame,
                )

                return show_stats_frame(
                    self.spark, self._iceberg_views[name]
                )
            return self.show_stats(ss.group(1))
        sq = _re.match(
            r"\s*SHOW\s+STATS\s+FOR\s*\((.+)\)\s*$", text, flags=_re.I | _re.S
        )
        if sq:
            return self.show_stats_for_query(sq.group(1), dialect)
        if _re.match(r"\s*SHOW\s+SESSION\s*$", text, flags=_re.I):
            return self.show_session()
        sf = _re.match(
            r"\s*SHOW\s+FUNCTIONS(?:\s+LIKE\s+'([^']*)')?\s*$",
            text,
            flags=_re.I,
        )
        if sf:
            return self.show_functions(sf.group(1))
        cm = _re.match(
            r"\s*CALL\s+([\w.]+)\s*\((.*)\)\s*$", text, flags=_re.I | _re.S
        )
        if cm:
            return self.call(cm.group(1), cm.group(2))
        at = _re.match(
            r"\s*ALTER\s+TABLE\s+([\w.]+)\s+(.+?)\s*;?\s*$",
            text,
            flags=_re.I | _re.S,
        )
        if at and at.group(1).lower() in getattr(self, "_iceberg_views", {}):
            # ALTER TABLE on a registered Iceberg view routes to the
            # Iceberg metadata commits; other tables fall through to
            # Spark's own ALTER handling below
            return self._alter_iceberg_table(at.group(1), at.group(2))
        im = _re.match(
            r"\s*INSERT\s+INTO\s+([\w.]+)\s+(.+?)\s*;?\s*$",
            text,
            flags=_re.I | _re.S,
        )
        if im and im.group(1).lower() in getattr(self, "_iceberg_views", {}):
            # INSERT INTO a registered Iceberg view = append snapshot
            # (IcebergMetadata.beginInsert); other targets fall through
            # to Spark's own INSERT handling
            from trino_private_spark.sources.iceberg import read_iceberg
            from trino_private_spark.sources.iceberg_write import (
                iceberg_append,
            )

            name = im.group(1).lower()
            loc = self._iceberg_views[name]
            if hasattr(self, "_acl") and self._acl.enforce:
                self._acl.check(
                    self._user, self._enabled_roles, "INSERT", name
                )
            body = im.group(2)
            # optional column list — INSERT INTO t (a, b) <query>
            # (SqlBase.g4 insertInto columnAliases): listed columns take
            # the query's outputs positionally, unlisted columns
            # null-fill (iceberg_append's schema alignment). A
            # parenthesized QUERY head ((SELECT ...), (VALUES ...)) is
            # not an identifier list and stays part of the query.
            _ident = r'(?:[A-Za-z_]\w*|"(?:[^"]|"")+"|`[^`]+`)'
            mcols = _re.match(
                rf"\(\s*({_ident}(?:\s*,\s*{_ident})*)\s*\)\s*(.+)$",
                body,
                _re.S,
            )
            target_cols = None
            if mcols:
                raw = _re.findall(_ident, mcols.group(1))
                # keyword guard: a lone UNQUOTED query-head keyword is a
                # parenthesized query only when the remainder is NOT
                # itself a query — `INSERT INTO t (values) SELECT ...`
                # names a column called values (Trino would require it
                # quoted, but the lenient read is unambiguous here),
                # while `INSERT INTO t (VALUES ...)` never matches the
                # identifier-list shape at all
                looks_like_query_head = (
                    len(raw) == 1
                    and raw[0][:1] not in ('"', "`")
                    and raw[0].upper() in ("SELECT", "VALUES", "TABLE", "WITH")
                    and not _re.match(
                        r"\s*(?:SELECT|VALUES|TABLE|WITH)\b|\s*\(",
                        mcols.group(2),
                        _re.I,
                    )
                )
                if not looks_like_query_head:
                    target_cols = [
                        c[1:-1].replace('""', '"')
                        if c[:1] == '"'
                        else c[1:-1] if c[:1] == "`" else c
                        for c in raw
                    ]
                    body = mcols.group(2)
            df = self.sql(body, dialect)
            table_cols = self.spark.table(name).columns
            if target_cols is not None:
                if len(df.columns) != len(target_cols):
                    raise ValueError(
                        f"INSERT column list names {len(target_cols)} "
                        f"columns but the query produces "
                        f"{len(df.columns)}"
                    )
                # unknown names fail loudly inside iceberg_append
                df = df.toDF(*target_cols)
            # SQL INSERT maps columns POSITIONALLY (StatementAnalyzer
            # visitInsert) — rename the query's output to the table's
            # column names when the arity matches, so expression outputs
            # land in the right columns
            elif len(df.columns) == len(table_cols):
                df = df.toDF(*table_cols)
            n = df.count()
            iceberg_append(df, loc)
            read_iceberg(self.spark, loc).createOrReplaceTempView(name)
            return self._rows_result(n)
        cw = _re.match(
            r"\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+"
            r"WITH\s*\((.*?)\)\s*AS\s+(.+?)\s*;?\s*$",
            text,
            flags=_re.I | _re.S,
        )
        if cw:
            return self._ctas_with_properties(
                cw.group(1), cw.group(2), cw.group(3), dialect
            )
        ct = _re.match(
            # plain CREATE TABLE with column definitions, NO AS-query
            # ($ anchors it: any CTAS tail makes this pattern fail and
            # fall through to the CTAS routes)
            r"\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
            r"\((.+?)\)\s*(?:WITH\s*\((.*?)\)\s*)?;?\s*$",
            text,
            flags=_re.I | _re.S,
        )
        if ct and self._paren_balanced(ct.group(3)):
            # the balance check rejects a CTAS with column aliases whose
            # query ends in ')' — e.g. CREATE TABLE t (x) AS SELECT *
            # FROM (VALUES 1) — whose non-greedy capture would otherwise
            # swallow ') AS SELECT ... (' and fail as a bogus column
            # definition; it falls through to the CTAS routes instead
            name = ct.group(2)
            exists = name.lower() in getattr(
                self, "_iceberg_views", {}
            ) or any(
                t.name.lower() == name.lower()
                for t in self.spark.catalog.listTables()
            )
            if exists:
                if ct.group(1):
                    return self._one("CREATE TABLE")  # IF NOT EXISTS no-op
                # the reference raises TABLE_ALREADY_EXISTS
                # (CreateTableTask); silently replacing the registration
                # would drop the existing table's data binding
                raise ValueError(f"Table '{name}' already exists")
            return self._create_table_statement(
                name, ct.group(3), ct.group(4)
            )
        dm = _re.match(
            r"\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
            text,
            flags=_re.I | _re.S,
        )
        if dm:
            return self._delete_statement(dm.group(1), dm.group(2), dialect)
        um = _re.match(
            r"\s*UPDATE\s+([\w.]+)\s+SET\s+(.+?)"
            r"(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
            text,
            flags=_re.I | _re.S,
        )
        if um:
            return self._update_statement(
                um.group(1), um.group(2), um.group(3), dialect
            )
        if _re.search(r"\bFOR\s+(?:VERSION|TIMESTAMP)\s+AS\s+OF\b", text, _re.I):
            # time-travel table references (SqlBase.g4 queryPeriod) lower
            # to temp views over the snapshot read before planning
            text = self._lower_time_travel(text, dialect)
        m = _re.match(
            r"\s*SET\s+SESSION\s+([\w.]+)\s*=\s*(.+?)\s*$", text, flags=_re.I
        )
        if m:
            val = m.group(2)
            if len(val) >= 2 and val[0] == "'" and val[-1] == "'":
                val = val[1:-1]
            self.set_session(m.group(1), val)
            return self._one("SET SESSION")
        m = _re.match(r"\s*RESET\s+SESSION\s+([\w.]+)\s*$", text, flags=_re.I)
        if m:
            self.reset_session(m.group(1))
            return self._one("RESET SESSION")
        m = _re.match(
            r"\s*SET\s+TIME\s+ZONE\s+(LOCAL|'[^']+')\s*$", text, flags=_re.I
        )
        if m:
            z = m.group(1)
            if z.upper() == "LOCAL":
                self.spark.conf.unset("spark.sql.session.timeZone")
            else:
                self.set_time_zone(z[1:-1])
            return self._one("SET TIME ZONE")
        m = _re.match(
            r"\s*PREPARE\s+(\w+)\s+FROM\s+(.+)$", text, flags=_re.I | _re.S
        )
        if m:
            self.prepare(m.group(1), m.group(2), dialect)
            return self._one("PREPARE")
        m = _re.match(
            r"\s*EXECUTE\s+(\w+)(?:\s+USING\s+(.+))?\s*$",
            text,
            flags=_re.I | _re.S,
        )
        if m:
            return self.execute(m.group(1), *self._parse_literals(m.group(2)))
        m = _re.match(
            r"\s*DEALLOCATE\s+PREPARE\s+(\w+)\s*$", text, flags=_re.I
        )
        if m:
            self.deallocate(m.group(1))
            return self._one("DEALLOCATE")
        m = _re.match(r"\s*DESCRIBE\s+INPUT\s+(\w+)\s*$", text, flags=_re.I)
        if m:
            return self.describe_input(m.group(1))
        m = _re.match(r"\s*DESCRIBE\s+OUTPUT\s+(\w+)\s*$", text, flags=_re.I)
        if m:
            return self.describe_output(m.group(1))
        m = _re.match(
            r"\s*SHOW\s+CREATE\s+(?:TABLE|VIEW)\s+([\w.]+)\s*$",
            text,
            flags=_re.I,
        )
        if m:
            return self.show_create_table(m.group(1))
        m = _re.match(
            r"\s*COMMENT\s+ON\s+(TABLE|COLUMN)\s+([\w.]+)\s+IS\s+"
            r"(?:'((?:[^']|'')*)'|(NULL))\s*$",
            text,
            flags=_re.I,
        )
        if m:
            # COMMENT ON TABLE/COLUMN (SqlBase.g4:62-63): session-scoped
            # comment registry (the reference stores these in connector
            # metadata; temp views have no persistent metastore here)
            if not hasattr(self, "_comments"):
                self._comments: dict[str, str] = {}
            key = f"{m.group(1).lower()}:{m.group(2).lower()}"
            if m.group(4):
                self._comments.pop(key, None)
            else:
                self._comments[key] = (m.group(3) or "").replace("''", "'")
            return self._one("COMMENT")
        m = _re.match(
            r"\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$",
            text,
            flags=_re.I,
        )
        if m and (
            m.group(2).lower() in getattr(self, "_iceberg_views", {})
            or m.group(2).lower() in getattr(self, "_cow", {})
        ):
            # DROP TABLE on a registered Iceberg/CoW table: unregister
            # the view and its binding. External-location semantics —
            # the on-disk tree is left in place (the registration, not
            # the storage, is what this catalog owns); Spark's own DROP
            # handles real catalog tables below.
            name = m.group(2).lower()
            if hasattr(self, "_acl") and self._acl.enforce:
                self._acl.check(
                    self._user, self._enabled_roles, "DELETE", name
                )
            getattr(self, "_iceberg_views", {}).pop(name, None)
            getattr(self, "_cow", {}).pop(name, None)
            self.spark.catalog.dropTempView(name)
            if name in getattr(self, "_iceberg_cbo", {}):
                # the ANALYZE-promoted catalog twin goes with the view
                self._iceberg_cbo.pop(name, None)
                self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            return self._one("DROP TABLE")
        m = _re.match(
            r"\s*TRUNCATE\s+TABLE\s+([\w.]+)\s*$", text, flags=_re.I
        )
        if m:
            # TRUNCATE TABLE (SqlBase.g4; the reference's
            # IcebergMetadata.executeDelete-all path): an Iceberg view
            # commits a REPLACE snapshot with zero data files (reads as
            # an empty table; pre-truncate snapshots stay
            # time-travelable), a CoW catalog table rewrites empty.
            name = m.group(1).lower()
            if hasattr(self, "_acl") and self._acl.enforce:
                self._acl.check(
                    self._user, self._enabled_roles, "DELETE", name
                )
            if name in getattr(self, "_iceberg_views", {}):
                from trino_private_spark.sources.iceberg_write import (
                    _commit_snapshot,
                )

                _commit_snapshot(
                    self._iceberg_views[name],
                    [([], 0)],
                    operation="delete",
                    replace=True,
                )
            elif name in getattr(self, "_cow", {}):
                self._rewrite(
                    name,
                    self.spark.table(name).limit(0),
                    operation="truncate",
                )
            else:
                # plain registered view (lazy ctas / attach): re-register
                # it empty — the session-catalog truncate semantics
                self.spark.table(name).limit(0).createOrReplaceTempView(
                    name
                )
            return self._one("TRUNCATE")
        m = _re.match(r"\s*SET\s+PATH\s+(.+?)\s*$", text, flags=_re.I)
        if m:
            self._sql_path = m.group(1)
            return self._one("SET PATH")
        m = _re.match(r"\s*USE\s+([\w.]+)\s*$", text, flags=_re.I)
        if m:
            self.use(m.group(1))
            return self._one("USE")
        mv = self._mview_schema_statement(text, dialect)
        if mv is not None:
            return mv
        sec = self._security_statement(text)
        if sec is not None:
            return sec
        an = _re.match(r"\s*ANALYZE\s+([A-Za-z_][\w.]*)\s*$", text, flags=_re.I)
        if an:
            name = an.group(1).lower()
            if name in getattr(self, "_iceberg_views", {}):
                # ANALYZE on an Iceberg table = one distributed NDV pass
                # committed as a statistics file (TableStatisticsWriter)
                from trino_private_spark.sources.iceberg_stats import (
                    analyze_table,
                )

                analyze_table(self.spark, self._iceberg_views[name])
                # ...and promote a CLEAN table to a stats-bearing
                # catalog table so Catalyst's CBO consumes the stats
                # (the reference's ANALYZE feeds ReorderJoins /
                # DetermineJoinDistributionType the same way)
                self._promote_iceberg_cbo(
                    name, self._iceberg_views[name]
                )
            else:
                self.analyze(an.group(1))
            return self.spark.createDataFrame([(True,)], "`ANALYZE` boolean")
        if getattr(self, "_iceberg_views", None):
            if "$" in text:
                # quoted metadata-table references — SELECT * FROM
                # "t$snapshots" / "t$files" / ... (the reference's
                # TableType suffix syntax, resolved by
                # IcebergMetadata.getTableHandle) — lower to temp views
                # over the metadata tables before any translation
                text = self._lower_metadata_tables(text, dialect)
            # per-query Iceberg re-planning: registered iceberg views are
            # re-resolved fresh, and references governed by THIS
            # statement's WHERE are rewritten to pruned private views
            text = self._reprune_iceberg_views(text, dialect)
        mr = _re.match(
            r"\s*SELECT\s+\*\s+FROM\s+([A-Za-z_][\w.]*)\s+(MATCH_RECOGNIZE\s*\(.*\))\s*(?:AS\s+\w+\s*)?$",
            text,
            flags=_re.I | _re.S,
        )
        if mr:
            from trino_private_spark.operators.row_pattern_sql import (
                sql_match_recognize,
            )

            src = self.spark.table(mr.group(1))
            # MATCH_RECOGNIZE reads its source table like any SELECT —
            # enforce SELECT on it before pattern matching runs
            self._enforce_select(src)
            return sql_match_recognize(src, mr.group(2))
        if _re.search(r"\bMATCH_RECOGNIZE\s*\(", text, flags=_re.I):
            # patternRecognition as a table primary anywhere in the query
            # (SqlBase.g4:339): lower each occurrence to a temp view so it
            # composes under joins, CTEs and subqueries
            text = self._lower_match_recognize(text)
        elif _re.search(
            r"\bPATTERN\s*\(", text, flags=_re.I
        ) and _re.search(r"\b(OVER|WINDOW)\b", text, flags=_re.I):
            # row pattern recognition in WINDOW structures
            # (sql/pattern-recognition-in-window.rst): lower the pattern
            # window to a measure-bearing temp view and rewrite the
            # OVER references onto its columns
            text = self._lower_pattern_windows(text)
        recsub_views: list[str] = []
        if _re.search(r"\(\s*WITH\s+RECURSIVE\b", text, flags=_re.I):
            # WITH RECURSIVE in a NESTED position — a derived table,
            # scalar/IN subquery, or INSERT/CTAS body (the grammar allows
            # the with-clause at any query-expression head,
            # SqlBase.g4:172 queryNoWith): lower each parenthesized
            # recursive subtree to a temp view and splice `(SELECT * FROM
            # <view>)` back in, innermost-first.
            text = self._lower_nested_recursive(text, dialect, recsub_views)
        try:
            if _re.match(r"\s*WITH\s+RECURSIVE\b", text, flags=_re.I):
                # WITH RECURSIVE (SqlBase.g4:172; bounded expansion per
                # StatementAnalyzer.java:1432-1436): lower onto the
                # iterative recursive_cte loop, honoring the
                # max_recursion_depth session property like the reference.
                from trino_private_spark.plans.recursive_sql import (
                    DEFAULT_MAX_RECURSION_DEPTH,
                    lower_recursive,
                )

                depth = int(
                    getattr(self, "_session_props", {}).get(
                        "max_recursion_depth", DEFAULT_MAX_RECURSION_DEPTH
                    )
                )
                xlate = translate if dialect == "trino" else (lambda s: s)
                df = lower_recursive(self.spark, text, xlate, max_depth=depth)
                self._enforce_select(df)
                return df
            if dialect == "trino":
                from pyspark.errors import AnalysisException

                from trino_private_spark.plans.translate import alt_fns_in

                translated = translate(text)
                try:
                    df = self.spark.sql(translated)
                except AnalysisException as primary_err:
                    # sketch-typed overloads (cardinality(hll), map
                    # cosine_similarity, setdigest jaccard/...): the
                    # primary translation fits arrays/maps; when analysis
                    # rejects it and the statement calls an overloadable
                    # name, retry with _FN_TEMPLATES_ALT bodies — singles
                    # first (cardinality(hash_counts(x)) needs ONLY
                    # hash_counts switched while cardinality stays the
                    # map size), then growing combinations. Analysis is
                    # eager in spark.sql, so retries cost milliseconds
                    # and never mask runtime errors. The primary error
                    # reports if every combination fails.
                    from itertools import combinations

                    alts = sorted(alt_fns_in(text))
                    if not alts:
                        raise
                    df = None
                    for r in range(1, len(alts) + 1):
                        for combo in combinations(alts, r):
                            try:
                                df = self.spark.sql(
                                    translate(
                                        text, alt_fns=frozenset(combo)
                                    )
                                )
                                break
                            except Exception:  # noqa: BLE001
                                continue
                        if df is not None:
                            break
                    if df is None:
                        raise primary_err from None
            else:
                df = self.spark.sql(text)
            self._enforce_select(df)
            return df
        finally:
            # temp views lowered for nested recursive subtrees resolve at
            # analysis time (spark.sql above), so dropping them here keeps
            # the returned plan intact while the catalog stays bounded in
            # a long-lived session (lower_recursive drops its own views)
            for v in recsub_views:
                self.spark.catalog.dropTempView(v)

    def _lower_pattern_windows(self, text: str) -> str:
        """Lower row-pattern WINDOW structures (sql/pattern-recognition-
        in-window.rst) onto operators/row_pattern_window.py: the named
        ``WINDOW w AS (... PATTERN ... DEFINE ...)`` form and the inline
        ``expr OVER (... PATTERN ...)`` form. The pattern window's source
        must be a resolvable table/view name (the MATCH_RECOGNIZE lowering
        restriction); measures and window aggregates over the pattern
        window become columns of a temp view, and the query is rewritten
        onto it."""
        import re as _re

        from trino_private_spark.operators.row_pattern_window import (
            parse_window_pattern_spec,
            window_pattern_measures,
        )
        from trino_private_spark.plans.translate import (
            _shield_strings,
            translate,
        )

        shielded, restore = _shield_strings(text)

        def grab_parens(s: str, open_i: int) -> int:
            depth, j = 1, open_i + 1
            while j < len(s) and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError("unbalanced parentheses in window spec")
            return j  # index just past the closing paren

        fm = _re.search(
            r"\bFROM\s+([A-Za-z_][\w.]*)", shielded, flags=_re.I
        )
        # only an ACTUAL pattern window needs the table source — a
        # literal containing 'PATTERN (' must not trip the requirement
        src_name = fm.group(1) if fm else None
        # SQL evaluates WHERE BEFORE window functions: a top-level WHERE
        # must filter the pattern window's input, not just the output
        # rows (the outer WHERE stays in place too — re-filtering the
        # already-filtered view is a no-op)
        src_where = None
        if fm:
            wm0 = _re.match(
                r"\s+WHERE\s+(.+?)(?=\s+(?:GROUP\s+BY|ORDER\s+BY|WINDOW"
                r"|LIMIT|OFFSET)\b|\s*$)",
                shielded[fm.end() :],
                flags=_re.I | _re.S,
            )
            if wm0:
                src_where = restore(wm0.group(1)).strip()
        if not hasattr(self, "_rpw_n"):
            self._rpw_n = 0

        def lower_one(spec_text: str, refs: list[tuple[str, str]]) -> str:
            """Run the operator for one window spec; refs = (output name,
            expression) pairs; returns the registered view name."""
            if src_name is None:
                raise ValueError(
                    "row-pattern window requires a plain table source"
                )
            spec = parse_window_pattern_spec(restore(spec_text))
            measure_names = {alias for _e, alias in spec["measures"]}
            out_cols: list[tuple[str, str]] = []
            for name, expr in refs:
                if expr in measure_names:
                    body = next(
                        e for e, a in spec["measures"] if a == expr
                    )
                    out_cols.append((name, body))
                else:
                    out_cols.append((name, expr))
            src = self.spark.table(src_name)
            self._enforce_select(src)
            if src_where is not None:
                src = self.spark.sql(
                    translate(
                        f"SELECT * FROM {src_name} WHERE {src_where}"
                    )
                )
            self._rpw_n += 1
            vname = f"__rpw_{self._rpw_n}"
            window_pattern_measures(
                src, spec, out_cols
            ).createOrReplaceTempView(vname)
            return vname

        # ---- named WINDOW clause form --------------------------------
        wm = _re.search(
            r"\bWINDOW\s+([A-Za-z_]\w*)\s+AS\s*\(", shielded, flags=_re.I
        )
        if wm:
            close = grab_parens(shielded, wm.end() - 1)
            spec_text = shielded[wm.end() : close - 1]
            if _re.search(r"\bPATTERN\s*\(", spec_text, flags=_re.I):
                wname = wm.group(1)
                refs: list[tuple[str, str]] = []
                out = shielded[: wm.start()] + shielded[close:]

                def repl(m2):
                    expr = m2.group(1).strip()
                    name = (
                        expr
                        if _re.fullmatch(r"[A-Za-z_]\w*", expr)
                        else f"__rpw_c{len(refs)}"
                    )
                    refs.append((name, expr))
                    return name

                out = _re.sub(
                    rf"([A-Za-z_]\w*(?:\s*\([^()]*\))?)\s+OVER\s+{wname}\b",
                    repl,
                    out,
                    flags=_re.I,
                )
                if not refs:
                    raise ValueError(
                        f"pattern window {wname} is never referenced"
                    )
                vname = lower_one(spec_text, refs)
                out = _re.sub(
                    rf"\bFROM\s+{_re.escape(src_name)}\b",
                    f"FROM {vname}",
                    out,
                    count=1,
                    flags=_re.I,
                )
                # drop a dangling comma/WINDOW leftovers around the removed
                # clause (WINDOW was the only clause form removed wholesale)
                return restore(_re.sub(r"\s+$", "", out))

        # ---- inline OVER ( ... PATTERN ... ) form --------------------
        out = shielded
        pos = 0
        pat = _re.compile(
            r"([A-Za-z_]\w*(?:\s*\([^()]*\))?)\s+OVER\s*\(", _re.I
        )
        while True:
            m2 = pat.search(out, pos)
            if not m2:
                break
            close = grab_parens(out, m2.end() - 1)
            spec_text = out[m2.end() : close - 1]
            if not _re.search(r"\bPATTERN\s*\(", spec_text, flags=_re.I):
                pos = close  # a plain window fn — leave it alone
                continue
            expr = m2.group(1).strip()
            name = (
                expr
                if _re.fullmatch(r"[A-Za-z_]\w*", expr)
                else f"__rpw_c{self._rpw_n}"
            )
            vname = lower_one(spec_text, [(name, expr)])
            out = out[: m2.start()] + name + out[close:]
            out = _re.sub(
                rf"\bFROM\s+{_re.escape(src_name)}\b",
                f"FROM {vname}",
                out,
                count=1,
                flags=_re.I,
            )
            src_name = vname  # later pattern windows chain off the view
            pos = m2.start() + len(name)
        return restore(out)

    def _lower_match_recognize(self, text: str) -> str:
        """Rewrite every ``<table> MATCH_RECOGNIZE (...)`` table primary
        into a registered temp view over the row-pattern engine's result,
        so MATCH_RECOGNIZE composes with joins/CTEs/subqueries (the
        reference allows it anywhere a table primary is allowed,
        SqlBase.g4:339 patternRecognition). The source must be a
        resolvable table/view name (a CTE defined in the same statement is
        not visible at lowering time — materialize it as a temp view
        first); ``spark.table`` raises a clear error otherwise."""
        import re as _re

        from trino_private_spark.operators.row_pattern_sql import (
            sql_match_recognize,
        )

        from trino_private_spark.plans.translate import _shield_strings

        pat = _re.compile(
            r"([A-Za-z_][\w.]*)\s+(MATCH_RECOGNIZE)\s*\(", flags=_re.I
        )
        n = 0
        while True:
            # scan SHIELDED text: a string literal containing the
            # keyword ('... MATCH_RECOGNIZE (' as data) must never route
            # a table lookup; offsets map back because placeholders are
            # spliced into the same string we slice
            shielded, restore = _shield_strings(text)
            m = pat.search(shielded)
            if m is None:
                return text
            depth, j = 1, m.end()
            while j < len(shielded) and depth:
                if shielded[j] == "(":
                    depth += 1
                elif shielded[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError("unbalanced MATCH_RECOGNIZE parentheses")
            src = self.spark.table(m.group(1))
            self._enforce_select(src)
            df = sql_match_recognize(src, restore(shielded[m.start(2):j]))
            vname = f"__mr_lowered_{n}"
            n += 1
            df.createOrReplaceTempView(vname)
            text = restore(shielded[: m.start(1)] + vname + shielded[j:])

    # --- roles / grants / transactions (SqlBase.g4:95-123,150-152) -------

    @property
    def acl(self):
        from trino_private_spark.security import AccessControl

        if not hasattr(self, "_acl"):
            self._acl = AccessControl()
            self._user = "user"
            self._enabled_roles: set[str] = set()
            self._tx: dict[str, int] | None = None
        return self._acl

    def set_user(self, user: str) -> None:
        """SET SESSION AUTHORIZATION analogue: switch the session user."""
        self.acl  # init
        self._user = user
        self._enabled_roles = set()

    def enable_enforcement(self, on: bool = True) -> None:
        """Toggle ACL enforcement (Trino: allow-all system access control
        vs a configured file-based one)."""
        self.acl.enforce = on

    def _one(self, label: str):
        return self.spark.createDataFrame([(True,)], f"`{label}` boolean")

    def _mview_schema_statement(self, text: str, dialect: str = "trino"):
        """Route the MATERIALIZED VIEW statement family (sql/create-
        materialized-view.rst and siblings — Spark 4 parses bare CREATE
        MATERIALIZED VIEW as an unsupported pipeline dataset, so these
        must never fall through) plus the schema statements Spark lacks
        (ALTER SCHEMA RENAME, SHOW CREATE SCHEMA) and SHOW ROLE GRANTS.
        Returns a DataFrame or None when ``text`` is none of them."""
        import os as _os
        import re as _re

        t = text.strip().rstrip(";").strip()
        m = _re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+"
            r"(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
            r"(?:WITH\s*\((?P<props>.*?)\)\s*)?AS\s+(?P<q>.+)$",
            t,
            _re.I | _re.S,
        )
        if m:
            name = m.group(1).lower()
            loc = None
            if m.group("props"):
                pm = _re.search(
                    r"location\s*=\s*'([^']+)'", m.group("props"), _re.I
                )
                loc = pm.group(1) if pm else None
            if loc is None:
                wh = self.spark.conf.get(
                    "spark.sql.warehouse.dir", "spark-warehouse"
                ).replace("file:", "")
                loc = _os.path.join(wh, f"__mv_{name}")
            self.create_materialized_view(
                name, m.group("q"), path=loc, dialect=dialect
            )
            return self._one("CREATE MATERIALIZED VIEW")
        m = _re.match(
            r"ALTER\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+RENAME\s+TO\s+"
            r"([\w.]+)$",
            t,
            _re.I,
        )
        if m:
            old, new = m.group(1).lower(), m.group(2).lower()
            mviews = getattr(self, "_mviews", {})
            if old not in mviews:
                raise ValueError(f"Materialized view '{old}' does not exist")
            qtext, path, fmt = mviews.pop(old)
            mviews[new] = (qtext, path, fmt)
            self.spark.table(old).createOrReplaceTempView(new)
            self.spark.catalog.dropTempView(old)
            return self._one("ALTER MATERIALIZED VIEW")
        m = _re.match(
            r"DROP\s+MATERIALIZED\s+VIEW\s+(?:IF\s+EXISTS\s+)?([\w.]+)$",
            t,
            _re.I,
        )
        if m:
            self.drop_materialized_view(m.group(1).lower())
            return self._one("DROP MATERIALIZED VIEW")
        m = _re.match(
            r"REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)$", t, _re.I
        )
        if m:
            self.refresh_materialized_view(m.group(1).lower())
            return self._one("REFRESH MATERIALIZED VIEW")
        m = _re.match(
            r"SHOW\s+CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)$", t, _re.I
        )
        if m:
            name = m.group(1).lower()
            mviews = getattr(self, "_mviews", {})
            if name not in mviews:
                raise ValueError(f"Materialized view '{name}' does not exist")
            qtext, path, fmt = mviews[name]
            ddl = (
                f"CREATE MATERIALIZED VIEW {name} WITH (location = "
                f"'{path}', format = '{fmt.upper()}') AS {qtext}"
            )
            return self.spark.createDataFrame(
                [(ddl,)], "`Create Materialized View` string"
            )
        m = _re.match(
            r"ALTER\s+SCHEMA\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)$", t, _re.I
        )
        if m:
            old, new = m.group(1), m.group(2)
            tables = [
                r
                for r in self.spark.sql(f"SHOW TABLES IN {old}").collect()
                if not r["isTemporary"]
            ]
            if tables:
                # the in-session catalog can't atomically move tables —
                # fail loud rather than half-rename (the reference
                # delegates to the connector's renameSchema)
                raise ValueError(
                    f"Cannot rename non-empty schema '{old}'"
                )
            self.spark.sql(f"CREATE SCHEMA {new}")
            self.spark.sql(f"DROP SCHEMA {old}")
            return self._one("ALTER SCHEMA")
        m = _re.match(r"SHOW\s+CREATE\s+SCHEMA\s+([\w.]+)$", t, _re.I)
        if m:
            name = m.group(1)
            info = {
                r["info_name"]: r["info_value"]
                for r in self.spark.sql(
                    f"DESCRIBE SCHEMA {name}"
                ).collect()
            }
            loc = info.get("Location", "")
            ddl = f"CREATE SCHEMA {name}\nWITH (\n   location = '{loc}'\n)"
            return self.spark.createDataFrame(
                [(ddl,)], "`Create Schema` string"
            )
        if _re.match(r"SHOW\s+ROLE\s+GRANTS$", t, _re.I):
            roles = sorted(self.acl.user_roles(self._user))
            return self.spark.createDataFrame(
                [(r,) for r in roles] or [("",)], "role_grants string"
            ).where("role_grants <> ''")
        return None

    def _security_statement(self, text: str):
        """Parse/execute role, grant and transaction statements; returns a
        result DataFrame or None when ``text`` is not one of them."""
        import re as _re

        t = text.strip().rstrip(";").strip()
        m = _re.match(r"CREATE\s+ROLE\s+(\w+)$", t, _re.I)
        if m:
            self.acl.create_role(m.group(1))
            return self._one("CREATE ROLE")
        m = _re.match(r"DROP\s+ROLE\s+(\w+)$", t, _re.I)
        if m:
            self.acl.drop_role(m.group(1))
            return self._one("DROP ROLE")
        m = _re.match(r"GRANT\s+(\w+)\s+TO\s+USER\s+(\w+)$", t, _re.I)
        if m:
            self.acl.grant_role(m.group(1), m.group(2))
            return self._one("GRANT ROLE")
        m = _re.match(r"REVOKE\s+(\w+)\s+FROM\s+USER\s+(\w+)$", t, _re.I)
        if m:
            self.acl.revoke_role(m.group(1), m.group(2))
            return self._one("REVOKE ROLE")
        m = _re.match(
            r"GRANT\s+([\w\s,]+?)\s+(?:PRIVILEGES\s+)?ON\s+(?:TABLE\s+)?"
            r"([\w.]+)\s+TO\s+(?:(ROLE|USER)\s+)?(\w+)"
            r"(?:\s+WITH\s+GRANT\s+OPTION)?$",
            t, _re.I,
        )
        if m:
            privs = [p.strip() for p in m.group(1).split(",")]
            self.acl.grant(privs, m.group(2), m.group(3) or "USER", m.group(4))
            return self._one("GRANT")
        m = _re.match(
            r"REVOKE\s+([\w\s,]+?)\s+(?:PRIVILEGES\s+)?ON\s+(?:TABLE\s+)?"
            r"([\w.]+)\s+FROM\s+(?:(ROLE|USER)\s+)?(\w+)$",
            t, _re.I,
        )
        if m:
            privs = [p.strip() for p in m.group(1).split(",")]
            self.acl.revoke(privs, m.group(2), m.group(3) or "USER", m.group(4))
            return self._one("REVOKE")
        m = _re.match(r"SET\s+ROLE\s+(\w+)$", t, _re.I)
        if m:
            self.acl  # init
            role = m.group(1)
            if role.upper() == "NONE":
                self._enabled_roles = set()
            elif role.upper() == "ALL":
                self._enabled_roles = self.acl.user_roles(self._user)
            else:
                if role not in self.acl.user_roles(self._user):
                    from trino_private_spark.security import AccessDeniedError

                    raise AccessDeniedError(
                        f"Access Denied: Cannot set role {role}"
                    )
                self._enabled_roles = {role}
            return self._one("SET ROLE")
        if _re.match(r"SHOW\s+ROLES$", t, _re.I):
            rows = [(r,) for r in sorted(self.acl.roles)]
            return self.spark.createDataFrame(rows or [("",)], "role string").where(
                "role <> ''"
            )
        m = _re.match(r"SHOW\s+GRANTS(?:\s+ON\s+(?:TABLE\s+)?([\w.]+))?$", t, _re.I)
        if m:
            rows = self.acl.grants_for(m.group(1))
            return self.spark.createDataFrame(
                rows or [("", "", "")],
                "grantee string, privilege string, table_name string",
            ).where("grantee <> ''")
        if _re.match(r"START\s+TRANSACTION(\s+.*)?$", t, _re.I):
            self.start_transaction()
            return self._one("START TRANSACTION")
        if _re.match(r"COMMIT(\s+WORK)?$", t, _re.I):
            self.commit()
            return self._one("COMMIT")
        if _re.match(r"ROLLBACK(\s+WORK)?$", t, _re.I):
            self.rollback()
            return self._one("ROLLBACK")
        return None

    def _enforce_select(self, df: DataFrame) -> None:
        """Analysis-time SELECT enforcement (AccessControlManager
        analogue): every attached/CoW table referenced by the analyzed
        plan needs a SELECT grant for the session user or an enabled
        role."""
        if not hasattr(self, "_acl") or not self._acl.enforce:
            return
        import re as _re

        known = set(getattr(self, "_cow", {}))
        for tbl in self.spark.catalog.listTables():
            known.add(tbl.name.lower())
        plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
        # catalog tables (post-ANALYZE) appear qualified, e.g.
        # "SubqueryAlias spark_catalog.default.region" — compare the last
        # dotted segment so qualification never fails open
        referenced = {
            m.group(1).split(".")[-1].lower()
            for m in _re.finditer(r"SubqueryAlias ([\w.]+)", plan)
        } & known
        for name in referenced:
            self._acl.check(self._user, self._enabled_roles, "SELECT", name)

    def start_transaction(self) -> None:
        """START TRANSACTION: savepoint every CoW table's current snapshot
        version (see security.py module docstring for the model)."""
        self.acl  # init holder attrs
        cow = getattr(self, "_cow", {})
        self._tx = {name: v for name, (_, _, v) in cow.items()}

    def commit(self) -> None:
        """COMMIT: drop the savepoints — snapshots written during the
        transaction are already durable."""
        self.acl
        self._tx = None

    def rollback(self) -> None:
        """ROLLBACK: repoint every table mutated since START TRANSACTION
        back to its savepointed snapshot (as a new commit — history is
        immutable, Iceberg-style)."""
        self.acl
        if self._tx is None:
            return
        for name, ver in self._tx.items():
            cur = self._cow[name][2]
            if cur != ver:
                self.rollback_to(name, ver)
        self._tx = None

    # --- §2.7 utility surface -------------------------------------------

    def show_tables(self) -> DataFrame:
        return self.spark.sql("SHOW TABLES")

    def describe(self, table: str) -> DataFrame:
        return self.spark.sql(f"DESCRIBE TABLE {table}")

    def analyze(self, name: str, path: str | None = None) -> None:
        """ANALYZE <table> (SqlBase.g4:79): promote the attached temp view
        to an external catalog table over its parquet path and compute
        table + all-column statistics. The stats land in the session
        catalog, so Catalyst's CBO (join reorder, broadcast sizing) reads
        them — the same side effect the reference's ANALYZE has on its
        cost-based optimizer (ReorderJoins consumes connector stats
        written by ANALYZE). The view→table promotion is one-way: the
        stats live on the catalog table, so the temp view is not
        restored — re-attach() to get the plain view back."""
        import os as _os

        if path is None:
            sf_dir = getattr(self, "_sf_dir", None)
            if sf_dir is None:
                raise ValueError(
                    f"ANALYZE {name}: no dataset attached — call "
                    "attach(sf_dir) first or pass an explicit path="
                )
            path = _os.path.join(sf_dir, f"{name}.parquet")
        # the temp view would shadow the catalog table; drop it so
        # subsequent queries resolve to the stats-bearing table
        self.spark.catalog.dropTempView(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        self.spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{path}'")
        self.spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS"
        )

    def show_stats(self, name: str) -> DataFrame:
        """SHOW STATS FOR <table> (SqlBase.g4:138) — the reference's
        result-set shape (ShowStatsRewrite.java:196-202: column_name,
        data_size, distinct_values_count, nulls_fraction, row_count,
        low_value, high_value; per-column rows plus a summary row with
        NULL column_name carrying the row count), filled from the Spark
        catalog's ANALYZE statistics."""
        rows = []
        row_count = None
        for r in self.spark.sql(f"DESC EXTENDED {name}").collect():
            if r["col_name"] == "Statistics":
                # e.g. "12345 bytes, 678 rows"
                import re as _re

                m = _re.search(r"(\d+)\s+rows", r["data_type"] or "")
                if m:
                    row_count = float(m.group(1))
        cols = [
            f.name for f in self.spark.table(name).schema.fields
        ]
        for c in cols:
            info = {
                r["info_name"]: r["info_value"]
                for r in self.spark.sql(
                    f"DESC EXTENDED {name} {c}"
                ).collect()
            }

            def num(key):
                v = info.get(key)
                try:
                    return float(v)
                except (TypeError, ValueError):
                    return None

            nulls = num("num_nulls")
            avg_len = num("avg_col_len")
            rows.append(
                (
                    c,
                    avg_len * row_count
                    if avg_len is not None and row_count
                    else None,
                    num("distinct_count"),
                    nulls / row_count
                    if nulls is not None and row_count
                    else None,
                    None,
                    info.get("min") if info.get("min") != "NULL" else None,
                    info.get("max") if info.get("max") != "NULL" else None,
                )
            )
        rows.append((None, None, None, None, row_count, None, None))
        return self.spark.createDataFrame(
            rows,
            "column_name string, data_size double, "
            "distinct_values_count double, nulls_fraction double, "
            "row_count double, low_value string, high_value string",
        )

    def show_stats_for_query(self, text: str,
                             dialect: str = "trino") -> DataFrame:
        """SHOW STATS FOR (query) (SqlBase.g4:139, ShowStatsRewrite's
        query branch): the same result shape as the table form, computed
        from the query itself in ONE aggregation pass — every column's
        count / distinct / min / max / data-size folds into a single
        .agg(), so the query executes once with partial (map-side)
        aggregation regardless of column count. Distinct counts are exact
        (deterministic, oracle-able); at 100 TB a deployment would flip
        them to approx_count_distinct — same plan shape, sketch merge
        instead of Expand."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = self.sql(text, dialect)
        aggs = [F.count(F.lit(1)).alias("__rc")]
        ordered = {}
        for f in df.schema.fields:
            c, dt = f.name, f.dataType
            aggs.append(F.count(c).alias(f"__cnt__{c}"))
            aggs.append(F.countDistinct(c).alias(f"__ndv__{c}"))
            is_ordered = isinstance(
                dt, (T.NumericType, T.DateType, T.TimestampType,
                     T.TimestampNTZType, T.StringType, T.BooleanType),
            )
            ordered[c] = is_ordered
            if is_ordered:
                aggs.append(F.min(c).cast("string").alias(f"__min__{c}"))
                aggs.append(F.max(c).cast("string").alias(f"__max__{c}"))
            if isinstance(dt, T.StringType):
                aggs.append(
                    F.sum(F.length(c)).cast("double").alias(f"__sz__{c}")
                )
            elif isinstance(dt, T.BinaryType):
                aggs.append(
                    F.sum(F.length(c)).cast("double").alias(f"__sz__{c}")
                )
        r = df.agg(*aggs).collect()[0].asDict()
        rc = float(r["__rc"])
        rows = []
        for f in df.schema.fields:
            c = f.name
            nulls_frac = (rc - r[f"__cnt__{c}"]) / rc if rc else None
            rows.append((
                c,
                r.get(f"__sz__{c}"),
                float(r[f"__ndv__{c}"]),
                nulls_frac,
                None,
                r.get(f"__min__{c}") if ordered[c] else None,
                r.get(f"__max__{c}") if ordered[c] else None,
            ))
        rows.append((None, None, None, None, rc, None, None))
        return self.spark.createDataFrame(
            rows,
            "column_name string, data_size double, "
            "distinct_values_count double, nulls_fraction double, "
            "row_count double, low_value string, high_value string",
        )

    def explain(self, text: str, dialect: str = "trino") -> str:
        from trino_private_spark.plans.explain import explain_str

        return explain_str(self.sql(text, dialect))

    def explain_analyze(self, text: str, dialect: str = "trino") -> str:
        """EXPLAIN ANALYZE: execute, then report the plan with runtime
        metrics (ExplainAnalyzeOperator analogue via the Spark UI metrics)."""
        from trino_private_spark.plans.explain import explain_str

        df = self.sql(text, dialect)
        df.collect()
        return explain_str(df, "cost")

    def ctas(self, name: str, text: str, path: str | None = None,
             fmt: str = "parquet", dialect: str = "trino",
             partition_by: list | None = None) -> None:
        """CREATE TABLE AS (SqlBase.g4:51-54): materialize a query. With
        ``path``, writes files and registers a view over them; without,
        registers the (lazy) query as a temp view. ``partition_by`` (the
        WITH (partitioning = ARRAY[...]) analogue) records a real Iceberg
        partition spec — columns or (column, transform) pairs, transforms
        identity/bucket[N]/truncate[W]/year/month/day/hour."""
        if hasattr(self, "_acl") and self._acl.enforce:
            self._acl.check(self._user, self._enabled_roles, "INSERT", name)
        df = self.sql(text, dialect)
        if path and fmt == "iceberg":
            # CREATE TABLE ... WITH (format = 'ICEBERG') analogue: commit
            # a real Iceberg v2 table and register a view over the shim
            from trino_private_spark.sources.iceberg import read_iceberg
            from trino_private_spark.sources.iceberg_write import (
                iceberg_create,
            )

            iceberg_create(df, path, partition_by=partition_by)
            read_iceberg(self.spark, path).createOrReplaceTempView(name)
            # remember the binding so sql() re-derives partition + metrics
            # pruning (and fresh snapshots) from each query's own WHERE
            if not hasattr(self, "_iceberg_views"):
                self._iceberg_views: dict[str, str] = {}
            self._iceberg_views[name.lower()] = path
        elif path:
            df.write.mode("overwrite").format(fmt).save(path)
            self.spark.read.format(fmt).load(path).createOrReplaceTempView(name)
        else:
            df.createOrReplaceTempView(name)

    def _lower_nested_recursive(
        self, text: str, dialect: str, created: list[str] | None = None
    ) -> str:
        """Replace every parenthesized ``(WITH RECURSIVE ...)`` subtree
        with ``(SELECT * FROM <temp view>)`` holding its lowered result —
        valid wherever a query expression may appear (derived table,
        scalar subquery, IN-list, INSERT/CTAS body). Innermost subtrees
        lower first so nesting converges. String literals are shielded
        before the paren scan (a ')' inside a literal must not close the
        subtree). View names created here are appended to ``created`` so
        the caller can drop them once the statement resolves."""
        import re as _re

        from trino_private_spark.plans.recursive_sql import (
            DEFAULT_MAX_RECURSION_DEPTH,
            lower_recursive,
        )
        from trino_private_spark.plans.translate import (
            _shield_strings,
            translate,
        )

        depth_cap = int(
            getattr(self, "_session_props", {}).get(
                "max_recursion_depth", DEFAULT_MAX_RECURSION_DEPTH
            )
        )
        xlate = translate if dialect == "trino" else (lambda s: s)
        if not hasattr(self, "_recsub_n"):
            self._recsub_n = 0
        pat = _re.compile(r"\(\s*WITH\s+RECURSIVE\b", _re.I)
        while True:
            shielded, restore = _shield_strings(
                text, backslash_escapes=(dialect == "spark")
            )
            candidates = list(pat.finditer(shielded))
            if not candidates:
                return text
            progressed = False
            for m in candidates:
                open_i = m.start()
                depth, j = 1, open_i + 1
                while j < len(shielded) and depth:
                    if shielded[j] == "(":
                        depth += 1
                    elif shielded[j] == ")":
                        depth -= 1
                    j += 1
                if depth:
                    raise ValueError(
                        "unbalanced parentheses around WITH RECURSIVE"
                    )
                inner = shielded[open_i + 1 : j - 1]
                if pat.search(inner):
                    continue  # lower the innermost occurrence first
                df = lower_recursive(
                    self.spark, restore(inner), xlate, max_depth=depth_cap
                )
                self._recsub_n += 1
                vname = f"__recsub_{self._recsub_n}"
                df.createOrReplaceTempView(vname)
                if created is not None:
                    created.append(vname)
                text = (
                    restore(shielded[:open_i])
                    + f"(SELECT * FROM {vname})"
                    + restore(shielded[j:])
                )
                progressed = True
                break
            if not progressed:  # defensive: should be unreachable
                return text

    def _promote_iceberg_cbo(self, name: str, loc: str) -> bool:
        """Promote an ANALYZEd Iceberg view to a stats-bearing catalog
        table so Catalyst's cost-based optimizer (join reorder,
        ndv-based filter selectivity, broadcast sizing) consumes the
        statistics — the side effect the reference's ANALYZE has on its
        CBO (TableStatisticsReader feeds ReorderJoins). Safe ONLY for a
        CLEAN table: no merge-on-read delete files, single schema,
        all-parquet, and the data directory holding EXACTLY the live
        files (a post-OPTIMIZE directory still carries the replaced
        files until remove_orphan_files). Anything else keeps the temp
        view and returns False. The promotion records the table's
        metadata version; _reprune_iceberg_views keeps the catalog
        table only while the version is unchanged, so a write is never
        served stale."""
        import glob as _glob
        import os as _os

        from trino_private_spark.sources.iceberg import IcebergTable

        t = IcebergTable(loc)
        files = t.data_files()
        if (
            any(f.content != 0 for f in files)
            or any(f.file_format != "PARQUET" for f in files)
            or len(t.metadata.get("schemas", [])) > 1
        ):
            return False
        live = {_os.path.abspath(f.path) for f in files}
        data_dir = _os.path.join(loc, "data")
        on_disk = {
            _os.path.abspath(p)
            for p in _glob.glob(_os.path.join(data_dir, "*"))
            if _os.path.isfile(p)
        }
        if not live or live != on_disk:
            return False
        self.spark.catalog.dropTempView(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        self.spark.sql(
            f"CREATE TABLE {name} USING parquet LOCATION '{data_dir}'"
        )
        # Spark's own column stats (ndv/min/max/nulls) — an explicit,
        # user-priced second scan, same pricing as the reference's
        # ANALYZE; the Iceberg statistics file serves SHOW STATS
        self.spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        if not hasattr(self, "_iceberg_cbo"):
            self._iceberg_cbo: dict[str, tuple] = {}
        # record BOTH the metadata version and the data directory's
        # mtime: the promoted table is a DIRECTORY scan, so files that
        # never commit (failed/concurrent writers) would become visible
        # rows with no metadata bump — the mtime is the O(1) tripwire
        # for that divergence (checked per statement, re-verified
        # against the live file set only when it fires)
        self._iceberg_cbo[name.lower()] = (
            t.metadata_key,
            _os.stat(data_dir).st_mtime_ns,
        )
        return True

    def _cbo_promotion_fresh(self, name: str, loc: str, cbo: tuple) -> bool:
        """Serving-side validity check for an ANALYZE-promoted catalog
        table: metadata version unchanged AND the data directory still
        holds exactly the committed file set. The directory check is
        O(1) per statement (dir mtime); a fired tripwire re-verifies
        against the manifests and, if the directory still matches the
        live set (e.g. an atime-only or benign touch), refreshes the
        recorded mtime instead of dropping the promotion."""
        import glob as _glob
        import os as _os

        from trino_private_spark.sources.iceberg import IcebergTable

        mk, dir_mtime = cbo
        t = IcebergTable(loc)
        if t.metadata_key != mk:
            return False
        data_dir = _os.path.join(loc, "data")
        try:
            now_mtime = _os.stat(data_dir).st_mtime_ns
        except OSError:
            return False
        if now_mtime == dir_mtime:
            return True
        live = {_os.path.abspath(f.path) for f in t.data_files()}
        on_disk = {
            _os.path.abspath(p)
            for p in _glob.glob(_os.path.join(data_dir, "*"))
            if _os.path.isfile(p)
        }
        if live and live == on_disk:
            self._iceberg_cbo[name] = (mk, now_mtime)
            return True
        return False

    def _lower_metadata_tables(
        self, text: str, dialect: str = "trino"
    ) -> str:
        """Rewrite ``"name$kind"`` quoted references over registered
        Iceberg views to temp views on the corresponding metadata table
        (SnapshotsTable/FilesTable/... — plugin/trino-iceberg TableType
        suffixes). Unknown names/kinds are left untouched; Spark then
        fails loudly on the unresolvable identifier, like the
        reference's 'Table does not exist'. String literals are
        shielded first — a LITERAL containing "t$files" is data, not a
        table reference."""
        import re as _re

        from trino_private_spark.plans.translate import _shield_strings
        from trino_private_spark.sources.iceberg import (
            _METADATA_TABLE_KINDS,
            read_iceberg,
        )

        def repl(m: "_re.Match[str]") -> str:
            name, kind = m.group(1).lower(), m.group(2).lower()
            loc = self._iceberg_views.get(name)
            if loc is None or kind not in _METADATA_TABLE_KINDS:
                return m.group(0)
            if hasattr(self, "_acl") and self._acl.enforce:
                # reading a table's metadata reveals its data layout and
                # column bounds — the reference gates $-tables behind
                # SELECT on the base table
                self._acl.check(
                    self._user, self._enabled_roles, "SELECT", name
                )
            vname = f"__icemt_{name}_{kind}"
            read_iceberg(
                self.spark, f"{loc}${kind}"
            ).createOrReplaceTempView(vname)
            return vname

        shielded, restore = _shield_strings(
            text, backslash_escapes=(dialect == "spark")
        )
        return restore(
            _re.sub(r'"([A-Za-z_]\w*)\$(\w+)"', repl, shielded)
        )

    def _reprune_iceberg_views(
        self, text: str, dialect: str = "trino"
    ) -> str:
        """Per-statement Iceberg re-planning, the reference's
        PushPredicateIntoTableScan -> applyFilter shape. Two effects:

        1. Every referenced Iceberg view re-registers from a FRESH, FULL
           metadata read — snapshots committed since registration become
           visible, and the shared view name NEVER serves a
           statement-scoped subset (direct ``spark.table(name)`` between
           ``sql()`` calls always sees the whole table).
        2. When the statement is a single query block (exactly one
           depth-0 WHERE, no depth-0 set operation), its WHERE conjuncts
           are split per table alias (parse_qualified_predicate) and each
           depth-0 ``FROM``/``JOIN`` reference with prunable terms is
           REWRITTEN to a private pruned view (``__icep_<name>_<i>``,
           aliased back to its original name) — so a join over two
           Iceberg views prunes BOTH scans, each by its own conjuncts,
           while the public view names stay full. Unqualified conjuncts
           bind only when the block references exactly one table.
           References inside subqueries keep the full read (the outer
           WHERE does not govern them). Pruning is file-level and
           conservative; the statement's own row-level WHERE keeps
           results exact. Returns the (possibly rewritten) text."""
        import re as _re

        from trino_private_spark.plans.translate import _shield_strings
        from trino_private_spark.sources.iceberg import (
            parse_qualified_predicate,
            read_iceberg,
        )

        # drop every PRIOR statement's pruned views in this SparkSession:
        # temp views resolve at analysis time (spark.sql in sql()), so
        # once any statement returned, its __icep_* views are dead weight.
        # The ledger is SESSION-scoped (module-level, keyed by session),
        # not per-Engine — per-Engine tracking let every abandoned Engine
        # instance leak its views into the shared session catalog forever
        # (round-9 What's wrong #2); any engine's next statement now
        # sweeps them all, so a long-lived session's catalog stays
        # bounded no matter how many engines came and went.
        for v in _ICEP_LIVE_BY_SESSION.pop(self.spark, []):
            self.spark.catalog.dropTempView(v)
        self._icep_live: list[str] = []
        shielded, restore = _shield_strings(
            text, backslash_escapes=(dialect == "spark")
        )
        referenced = {
            n: p
            for n, p in self._iceberg_views.items()
            if _re.search(rf"\b{_re.escape(n)}\b", shielded, _re.I)
        }
        if not referenced:
            return text
        for n, p in referenced.items():
            cbo = getattr(self, "_iceberg_cbo", {}).get(n)
            if cbo is not None:
                if self._cbo_promotion_fresh(n, p, cbo):
                    # the ANALYZE-promoted catalog table is still at the
                    # analyzed metadata version AND its data directory
                    # still holds exactly the committed files: keep it
                    # visible (its CBO stats are what the promotion is
                    # FOR) — a temp view would shadow it
                    continue
                # stale: a write landed since ANALYZE, or uncommitted
                # files appeared in data/ (a failed/concurrent writer's
                # leftovers would be visible rows under the directory-
                # scan table) — drop the promotion, fall back to the
                # committed-file-list view
                self._iceberg_cbo.pop(n, None)
                self.spark.sql(f"DROP TABLE IF EXISTS {n}")
            read_iceberg(self.spark, p).createOrReplaceTempView(n)

        # a CTE (or named WINDOW) whose name shadows a registered
        # Iceberg view must keep resolving to the CTE — collect every
        # `name AS (` binder across the WHOLE statement and never
        # rewrite those names (over-collection only costs pruning,
        # never correctness)
        shadowed = {
            m.group(1).lower()
            for m in _re.finditer(
                r"\b([A-Za-z_]\w*)\s*(?:\([^()]*\))?\s+AS\s*\(",
                shielded,
                _re.I,
            )
        }
        referenced = {
            n: p for n, p in referenced.items() if n not in shadowed
        }
        if not referenced:
            return text
        # prune parenthesized subquery blocks (derived tables, CTE
        # bodies, IN/EXISTS/scalar subqueries) innermost-first, then the
        # outermost block itself — each block's own WHERE governs its
        # own FROM references, exactly the reference's
        # PushPredicateIntoTableScan recursion over the plan tree
        text = self._reprune_blocks(text, referenced, dialect)
        return self._reprune_single_block(text, referenced, dialect)

    def _reprune_blocks(
        self, text: str, referenced: dict, dialect: str = "trino"
    ) -> str:
        """Rewrite every balanced ``( SELECT ... )`` group through
        _reprune_single_block, recursing into nested groups first.
        String literals are shielded during the paren scan; each
        fragment is restored before the block rewriter parses it (the
        rewriter re-shields internally)."""
        import re as _re

        from trino_private_spark.plans.translate import _shield_strings

        shielded, restore = _shield_strings(
            text, backslash_escapes=(dialect == "spark")
        )
        pat = _re.compile(r"\(\s*SELECT\b", _re.I)
        out: list[str] = []
        last = 0
        for m in pat.finditer(shielded):
            if m.start() < last:
                continue  # inside a span already rewritten
            depth, j = 1, m.start() + 1
            while j < len(shielded) and depth:
                if shielded[j] == "(":
                    depth += 1
                elif shielded[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                return text  # unbalanced: leave the statement alone
            inner = restore(shielded[m.start() + 1 : j - 1])
            inner = self._reprune_blocks(inner, referenced, dialect)
            inner = self._reprune_single_block(inner, referenced, dialect)
            out.append(restore(shielded[last : m.start() + 1]))
            out.append(inner)
            last = j - 1  # keep the closing paren
        out.append(restore(shielded[last:]))
        return "".join(out)

    def _reprune_single_block(
        self, text: str, referenced: dict, dialect: str = "trino"
    ) -> str:
        """Rewrite ONE query block's depth-0 FROM/JOIN Iceberg
        references to pruned private views when the block has exactly
        one depth-0 WHERE and no depth-0 set operation (see
        _reprune_iceberg_views). Conservative: anything unparseable
        keeps the full read."""
        import re as _re

        from trino_private_spark.plans.translate import _shield_strings
        from trino_private_spark.sources.iceberg import (
            parse_qualified_predicate,
            read_iceberg,
        )

        shielded, restore = _shield_strings(
            text, backslash_escapes=(dialect == "spark")
        )
        # single depth-0 query block?
        depth = 0
        where_at: list[tuple[int, int]] = []  # (kw start, body start)
        setop = False
        joins = 0
        for m in _re.finditer(
            r"[()]|\b(WHERE|UNION|INTERSECT|EXCEPT|JOIN)\b", shielded, _re.I
        ):
            tok = m.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                kw0 = m.group(1).upper()
                if kw0 == "WHERE":
                    where_at.append((m.start(), m.end()))
                elif kw0 == "JOIN":
                    joins += 1
                else:
                    setop = True
        if setop or len(where_at) != 1:
            return text
        body_start = where_at[0][1]
        depth, body_end = 0, len(shielded)
        for m in _re.finditer(
            r"[()]|\b(GROUP|ORDER|LIMIT|OFFSET|HAVING|WINDOW|FETCH)\b",
            shielded[body_start:],
            _re.I,
        ):
            tok = m.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
                if depth < 0:
                    body_end = body_start + m.start()
                    break
            elif depth == 0:
                body_end = body_start + m.start()
                break
        per_alias = parse_qualified_predicate(
            restore(shielded[body_start:body_end]),
            backslash_escapes=(dialect == "spark"),
        )
        if not per_alias:
            return text

        # depth-0 FROM/JOIN table references (derived tables start with a
        # paren and simply don't match; comma-joined tail tables are not
        # matched either — they just keep the full read)
        kw = (
            "ON|WHERE|JOIN|LEFT|RIGHT|FULL|INNER|CROSS|OUTER|USING|GROUP|"
            "ORDER|HAVING|LIMIT|OFFSET|UNION|NATURAL|LATERAL|SEMI|ANTI|"
            "SET|VALUES|SELECT|FETCH|WINDOW|TABLESAMPLE|MATCH_RECOGNIZE"
        )
        ref_pat = _re.compile(
            rf"\b(FROM|JOIN)\s+([A-Za-z_]\w*)"
            rf"(\s+(?:AS\s+)?(?!(?:{kw})\b)([A-Za-z_]\w*))?",
            _re.I,
        )
        refs = [
            m
            for m in ref_pat.finditer(shielded)
            if shielded[: m.start()].count("(")
            == shielded[: m.start()].count(")")
        ]
        # a depth-0 comma between FROM and WHERE = old-style join list:
        # more tables than `refs` saw, so unqualified conjuncts are
        # ambiguous (and any depth-0 JOIN — even against a derived table
        # `refs` can't see — means multi-table)
        multi_table = len(refs) > 1 or joins > 0
        if refs and not multi_table:
            region = shielded[refs[0].start() : where_at[0][0]]
            d = 0
            for ch in region:
                if ch == "(":
                    d += 1
                elif ch == ")":
                    d -= 1
                elif ch == "," and d == 0:
                    multi_table = True
                    break
        out, last = [], 0
        n_pruned = 0
        for m in refs:
            name = m.group(2).lower()
            path = referenced.get(name)
            if path is None or name in getattr(self, "_iceberg_cbo", {}):
                # CBO-promoted tables keep their stats-bearing catalog
                # binding: Spark's parquet min/max pushdown covers the
                # file skipping there, and a rewrite to a pruned view
                # would discard the statistics the promotion exists for
                continue
            alias = (m.group(4) or m.group(2)).lower()
            terms = list(per_alias.get(alias, []))
            if not multi_table:
                terms.extend(per_alias.get(None, []))
            if not terms:
                continue
            n_pruned += 1
            # ENGINE-GLOBAL counter: two blocks of the same statement
            # pruning the same table with different terms must never
            # share a view name (a per-call counter would overwrite the
            # first block's pruned view with the second's terms)
            self._icep_n = getattr(self, "_icep_n", 0) + 1
            vname = f"__icep_{name}_{self._icep_n}"
            read_iceberg(
                self.spark, path, partition_filter=terms
            ).createOrReplaceTempView(vname)
            if not hasattr(self, "_icep_live"):
                self._icep_live = []
            self._icep_live.append(vname)
            # the SESSION ledger is what the sweep reads (see
            # _reprune_iceberg_views) — _icep_live stays as the
            # per-engine record of the current statement's views
            _ICEP_LIVE_BY_SESSION.setdefault(
                self.spark, []
            ).append(vname)
            out.append(shielded[last : m.start(2)])
            out.append(vname if m.group(4) else f"{vname} AS {m.group(2)}")
            last = m.end(2)
        if not n_pruned:
            return text
        out.append(shielded[last:])
        return restore("".join(out))

    def insert_into(self, path: str, text: str, fmt: str = "parquet",
                    dialect: str = "trino", table: str | None = None) -> None:
        """INSERT (append) into a file-backed table. ``table`` names the
        logical table for ACL purposes; defaults to the path's basename
        (sans extension) so INSERT grants are enforced symmetrically with
        DELETE/UPDATE."""
        if hasattr(self, "_acl") and self._acl.enforce:
            import os as _os

            name = table or _os.path.splitext(_os.path.basename(path.rstrip("/")))[0]
            self._acl.check(self._user, self._enabled_roles, "INSERT", name)
        if fmt == "iceberg":
            from trino_private_spark.sources.iceberg_write import (
                iceberg_append,
            )

            iceberg_append(self.sql(text, dialect), path)
            return
        self.sql(text, dialect).write.mode("append").format(fmt).save(path)

    # Trino session properties (SystemSessionProperties.java) with a direct
    # Spark conf twin — the reference's own benchmark matrix toggles these
    # per run (testing/trino-benchto-benchmarks .../tpch.yaml:24-37 via
    # session_set_cbo_flags.sql). Anything unmapped passes through verbatim
    # as a Spark conf key.
    _SESSION_MAP = {
        # join_reordering_strategy: NONE keeps syntactic order;
        # ELIMINATE_CROSS_JOINS / AUTOMATIC enable (cost-based) reordering
        "join_reordering_strategy": lambda v: [
            ("spark.sql.cbo.enabled", str(v.upper() == "AUTOMATIC").lower()),
            (
                "spark.sql.cbo.joinReorder.enabled",
                str(v.upper() == "AUTOMATIC").lower(),
            ),
        ],
        # join_distribution_type: PARTITIONED forbids broadcast (threshold
        # -1); BROADCAST/AUTOMATIC let the planner/AQE choose
        "join_distribution_type": lambda v: [
            (
                "spark.sql.autoBroadcastJoinThreshold",
                "-1" if v.upper() == "PARTITIONED" else "64MB",
            )
        ],
        "hash_partition_count": lambda v: [("spark.sql.shuffle.partitions", v)],
        "enable_dynamic_filtering": lambda v: [
            ("spark.sql.optimizer.runtime.bloomFilter.enabled", v),
            ("spark.sql.optimizer.dynamicPartitionPruning.enabled", v),
        ],
        "spill_enabled": lambda v: [],  # Spark operators always spill
        "query_max_execution_time": lambda v: [],  # no session-level twin
    }

    # SHOW SESSION result rows for the mapped reference properties:
    # (name, default, type, description) — values come from the session
    # (SystemSessionProperties.java defines the reference's full set; the
    # shim lists the mapped subset plus anything SET SESSION touched)
    _SESSION_DEFAULTS = [
        ("join_reordering_strategy", "AUTOMATIC", "varchar",
         "The join reordering strategy to use"),
        ("join_distribution_type", "AUTOMATIC", "varchar",
         "The join method to use. Options are BROADCAST/PARTITIONED/"
         "AUTOMATIC"),
        ("hash_partition_count", "100", "integer",
         "Number of partitions for distributed joins and aggregations"),
        ("enable_dynamic_filtering", "true", "boolean",
         "Enable dynamic filtering"),
        ("spill_enabled", "false", "boolean",
         "Enable spilling"),
        ("query_max_execution_time", "100d", "varchar",
         "Maximum execution time of a query"),
    ]

    def show_session(self) -> DataFrame:
        """SHOW SESSION (SqlBase.g4:146): the reference's result shape —
        Name, Value, Default, Type, Description — for the mapped session
        properties, with current values reflecting earlier SET SESSION
        calls (ShowQueriesRewrite renders SystemSessionProperties the
        same way)."""
        props = getattr(self, "_session_props", {})
        rows = []
        listed = set()
        for name, default, typ, desc in self._SESSION_DEFAULTS:
            listed.add(name)
            rows.append((name, props.get(name, default), default, typ, desc))
        for name in sorted(set(props) - listed):
            rows.append((name, props[name], "", "varchar",
                         "Pass-through Spark configuration property"))
        return self.spark.createDataFrame(
            rows,
            "Name string, Value string, Default string, Type string, "
            "Description string",
        )

    def call(self, procedure: str, args_text: str = "") -> DataFrame:
        """CALL <proc>(...) (SqlBase.g4:94): system procedures. The
        reference's iceberg/hive connectors register e.g.
        rollback_to_snapshot (RollbackToSnapshotProcedure); the shim maps
        the ones with a local analogue and rejects the rest with the
        reference's error wording."""
        import ast
        import re as _re

        name = procedure.lower().split(".")[-1]
        args = []
        for part in _re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", args_text):
            part = part.strip()
            if not part:
                continue
            if "=>" in part:  # named argument: CALL p(x => 1)
                part = part.split("=>", 1)[1].strip()
            try:
                args.append(ast.literal_eval(part))
            except (ValueError, SyntaxError):
                args.append(part)
        def _iceberg_loc(arg: str) -> str | None:
            """Resolve a procedure target to an Iceberg table location:
            a registered iceberg view name, or a path holding an Iceberg
            metadata directory."""
            import os as _os

            loc = getattr(self, "_iceberg_views", {}).get(str(arg).lower())
            if loc:
                return loc
            if _os.path.isdir(_os.path.join(str(arg), "metadata")):
                return str(arg)
            return None

        if name == "rollback_to_snapshot":
            loc = _iceberg_loc(args[0])
            if loc:
                # RollbackToSnapshotProcedure on a real iceberg tree:
                # metadata-only current-snapshot repoint
                from trino_private_spark.sources.iceberg_maintenance import (
                    iceberg_rollback_to_snapshot,
                )

                iceberg_rollback_to_snapshot(loc, int(args[1]))
            else:
                self.rollback_to(str(args[0]), int(args[1]))
            return self._one("CALL")
        if name == "expire_snapshots":
            loc = _iceberg_loc(args[0])
            if loc:
                # ExpireSnapshotsProcedure analogue on a REAL iceberg tree.
                # The reference's parameter is retention_threshold — a
                # DURATION ('7d', INTERVAL '7' DAY): snapshots older than
                # now − duration expire. A plain integer is the shim's
                # keep_last extension (N most recent snapshots survive).
                from trino_private_spark.sources.iceberg_maintenance import (
                    iceberg_expire_snapshots,
                )

                if len(args) > 1:
                    dur_ms = self._duration_ms(args[1])
                    if dur_ms is not None:
                        import time as _time

                        iceberg_expire_snapshots(
                            loc,
                            keep_last=1,
                            older_than_ms=int(_time.time() * 1000) - dur_ms,
                            spark=self.spark,
                        )
                    elif isinstance(args[1], int):
                        iceberg_expire_snapshots(
                            loc, keep_last=args[1], spark=self.spark
                        )
                    else:
                        raise ValueError(
                            "expire_snapshots: retention_threshold must be "
                            f"a duration ('7d') or an integer, got {args[1]!r}"
                        )
                else:
                    iceberg_expire_snapshots(
                        loc, keep_last=1, spark=self.spark
                    )
            else:
                self.vacuum(str(args[0]))
            return self._one("CALL")
        if name == "remove_orphan_files":
            loc = _iceberg_loc(args[0])
            if loc is None:
                raise ValueError(
                    f"remove_orphan_files: {args[0]!r} is not an Iceberg "
                    "table"
                )
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_remove_orphan_files,
            )

            iceberg_remove_orphan_files(loc)
            return self._one("CALL")
        if name == "optimize":
            # the reference spells this ALTER TABLE ... EXECUTE optimize;
            # the shim exposes it as a procedure with the same semantics
            loc = _iceberg_loc(args[0])
            if loc is None:
                raise ValueError(
                    f"optimize: {args[0]!r} is not an Iceberg table"
                )
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_optimize,
            )

            iceberg_optimize(self.spark, loc)
            # a registered view keeps serving fresh snapshots through
            # per-query re-pruning (sql() re-resolves)
            return self._one("CALL")
        if name == "rewrite_manifests":
            # iceberg-core RewriteManifests, registered by the reference
            # as a table procedure: metadata-only manifest compaction
            loc = _iceberg_loc(args[0])
            if loc is None:
                raise ValueError(
                    f"rewrite_manifests: {args[0]!r} is not an Iceberg "
                    "table"
                )
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_rewrite_manifests,
            )

            iceberg_rewrite_manifests(loc, spark=self.spark)
            return self._one("CALL")
        raise ValueError(
            f"Procedure not registered: {procedure}"
        )

    @staticmethod
    def _parse_table_properties(props_text: str):
        """The WITH (k = v, ...) property block of CREATE TABLE [AS]:
        returns (props dict, arr) where ``arr(key)`` resolves an
        ARRAY['a', 'b'] literal property to its string list."""
        import re as _re

        from trino_private_spark.plans.translate import _shield_strings

        shielded, restore = _shield_strings(props_text)
        props: dict[str, str] = {}
        depth, start, parts = 0, 0, []
        for m in _re.finditer(r"[()\[\]]|,", shielded):
            tok = m.group(0)
            if tok in "([":
                depth += 1
            elif tok in ")]":
                depth -= 1
            elif depth == 0:
                parts.append(shielded[start : m.start()])
                start = m.end()
        parts.append(shielded[start:])
        for p in parts:
            pm = _re.fullmatch(r"\s*(\w+)\s*=\s*(.+?)\s*", p, _re.S)
            if pm:
                props[pm.group(1).lower()] = restore(pm.group(2)).strip()

        def arr(key: str) -> list[str] | None:
            v = props.get(key)
            if v is None:
                return None
            am = _re.fullmatch(r"ARRAY\s*\[(.*)\]", v, _re.I | _re.S)
            if not am:
                raise ValueError(f"{key} must be an ARRAY[...] literal")
            return [
                e.strip().strip("'") for e in am.group(1).split(",") if e.strip()
            ]

        return props, arr

    @staticmethod
    def _paren_balanced(text: str) -> bool:
        """True when ``text`` (string-shielded) is paren-balanced and the
        depth never goes negative — the guard that tells a real column
        block apart from a mis-captured CTAS tail like
        ``x) AS SELECT * FROM (VALUES 1``."""
        from trino_private_spark.plans.translate import _shield_strings

        shielded, _ = _shield_strings(text)
        depth = 0
        for ch in shielded:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    return False
        return depth == 0

    def _create_table_statement(
        self, name: str, cols_text: str, props_text: str | None
    ) -> DataFrame:
        """Plain CREATE TABLE name (col type, ...) [WITH (props)]
        (SqlBase.g4:48-50 — the no-AS form the reference supports):
        registers an EMPTY table of that schema. With Iceberg-shaped
        properties (format='ICEBERG' / partitioning / sorted_by) it
        commits a real empty v2 tree (IcebergMetadata.createTable);
        otherwise an empty temp view."""
        import os as _os
        import re as _re

        from trino_private_spark.plans.translate import (
            _split_top_commas,
            _type_to_spark,
        )

        cols = []
        for c in _split_top_commas(cols_text):
            c = _re.sub(r"\s+NOT\s+NULL\s*$", "", c.strip(), flags=_re.I)
            c = _re.sub(
                r"\s+COMMENT\s+'(?:[^']|'')*'\s*$", "", c, flags=_re.I
            )
            m = _re.match(r"\s*\"?([\w]+)\"?\s+(.+?)\s*$", c, _re.S)
            if not m:
                raise ValueError(f"invalid column definition: {c!r}")
            cols.append(f"`{m.group(1)}` {_type_to_spark(m.group(2))}")
        empty = self.spark.createDataFrame([], ", ".join(cols))

        props, arr = self._parse_table_properties(props_text or "")
        fmt = props.get("format", "").strip("'").lower()
        partitioning = arr("partitioning")
        sorted_by = arr("sorted_by")
        location = props.get("location", "").strip("'")
        if fmt == "iceberg" or partitioning or sorted_by:
            if not location:
                location = _os.path.join(
                    "spark-warehouse", "iceberg", name.lower()
                )
            from trino_private_spark.sources.iceberg import read_iceberg
            from trino_private_spark.sources.iceberg_write import (
                iceberg_create,
            )

            iceberg_create(
                empty,
                location,
                partition_by=[
                    self._parse_partitioning_entry(e)
                    for e in (partitioning or [])
                ]
                or None,
                sorted_by=sorted_by,
            )
            read_iceberg(self.spark, location).createOrReplaceTempView(
                name
            )
            if not hasattr(self, "_iceberg_views"):
                self._iceberg_views: dict[str, str] = {}
            self._iceberg_views[name.lower()] = location
        else:
            empty.createOrReplaceTempView(name)
        return self._one("CREATE TABLE")

    def _ctas_with_properties(
        self, name: str, props_text: str, query: str, dialect: str
    ) -> DataFrame:
        """CREATE TABLE t WITH (format = 'ICEBERG', partitioning =
        ARRAY['month(d)'], sorted_by = ARRAY['k'], location = '...') AS
        <query> (SqlBase.g4:51-54 with table properties — the
        reference's Iceberg CTAS surface). format='ICEBERG' (or a
        partitioning/sorted_by property) commits a real Iceberg v2
        table; a plain format property falls back to the file CTAS.
        Without an explicit location the table lands under
        ``spark-warehouse/iceberg/<name>``."""
        import os as _os
        import re as _re

        props, arr = self._parse_table_properties(props_text)

        fmt = props.get("format", "").strip("'").lower()
        partitioning = arr("partitioning")
        sorted_by = arr("sorted_by")
        location = props.get("location", "").strip("'")
        if fmt == "iceberg" or partitioning or sorted_by:
            if not location:
                location = _os.path.join(
                    "spark-warehouse", "iceberg", name.lower()
                )
            from trino_private_spark.sources.iceberg import read_iceberg
            from trino_private_spark.sources.iceberg_write import (
                iceberg_create,
            )

            if hasattr(self, "_acl") and self._acl.enforce:
                self._acl.check(
                    self._user, self._enabled_roles, "INSERT", name
                )
            df = self.sql(query, dialect)
            iceberg_create(
                df,
                location,
                partition_by=[
                    self._parse_partitioning_entry(e)
                    for e in (partitioning or [])
                ]
                or None,
                sorted_by=sorted_by,
            )
            read_iceberg(self.spark, location).createOrReplaceTempView(name)
            if not hasattr(self, "_iceberg_views"):
                self._iceberg_views: dict[str, str] = {}
            self._iceberg_views[name.lower()] = location
            return self._one("CREATE TABLE")
        self.ctas(
            name,
            query,
            path=location or None,
            fmt=fmt or "parquet",
            dialect=dialect,
        )
        return self._one("CREATE TABLE")

    def _rows_result(self, n: int) -> DataFrame:
        """DML result shape: the affected-row count (the reference
        reports it via TableFinishOperator)."""
        return self.spark.createDataFrame([(n,)], "rows bigint")

    def _delete_statement(
        self, name: str, cond: str | None, dialect: str = "trino"
    ) -> DataFrame:
        """DELETE FROM <table> [WHERE ...] (SqlBase.g4:61): Iceberg views
        write position-delete files (merge-on-read, executeDelete
        analogue); CoW tables rewrite their snapshot. Anything else is
        not a mutable table here — loud error, like a connector without
        delete support. A trino-dialect WHERE is translated before Spark
        evaluates it (function renames, quoted identifiers, literal
        backslashes kept literal) — the downstream evaluator is Spark's
        expression parser either way."""
        if cond and dialect == "trino":
            cond = translate(cond)
        cond = (cond or "true").strip()
        loc = getattr(self, "_iceberg_views", {}).get(name.lower())
        if loc is not None:
            if hasattr(self, "_acl") and self._acl.enforce:
                self._acl.check(
                    self._user, self._enabled_roles, "DELETE", name
                )
            from trino_private_spark.sources.iceberg import read_iceberg
            from trino_private_spark.sources.iceberg_write import (
                iceberg_delete,
            )

            n = iceberg_delete(self.spark, loc, cond)
            read_iceberg(self.spark, loc).createOrReplaceTempView(name)
            return self._rows_result(n)
        if name in getattr(self, "_cow", {}):
            return self._rows_result(self.delete_from(name, cond))
        raise ValueError(
            f"DELETE: {name!r} is not a mutable table (not an Iceberg "
            "view or CoW table of this engine)"
        )

    def _update_statement(
        self, name: str, set_clause: str, cond: str | None,
        dialect: str = "trino",
    ) -> DataFrame:
        """UPDATE <table> SET c = expr, ... [WHERE ...]
        (SqlBase.g4:160-162): Iceberg views commit position deletes +
        replacement rows atomically in ONE snapshot (RowDelta); CoW
        tables rewrite. SET expressions split at top-level commas with
        string literals shielded (by the statement dialect's lexing
        rule); trino-dialect SET expressions and WHERE are translated
        before Spark's expression parser evaluates them."""
        import re as _re

        from trino_private_spark.plans.translate import _shield_strings

        shielded, restore = _shield_strings(
            set_clause, backslash_escapes=(dialect == "spark")
        )
        parts, depth, start = [], 0, 0
        for m in _re.finditer(r"[()]|,", shielded):
            tok = m.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                parts.append(shielded[start : m.start()])
                start = m.end()
        parts.append(shielded[start:])
        assignments: dict[str, str] = {}
        for p in parts:
            am = _re.fullmatch(r"\s*(\w+)\s*=\s*(.+?)\s*", p, _re.S)
            if not am:
                raise ValueError(f"UPDATE: bad SET item {restore(p)!r}")
            rhs = restore(am.group(2))
            if dialect == "trino":
                rhs = translate(rhs)
            assignments[am.group(1)] = rhs
        if cond and dialect == "trino":
            cond = translate(cond)
        cond = (cond or "true").strip()
        loc = getattr(self, "_iceberg_views", {}).get(name.lower())
        if loc is not None:
            if hasattr(self, "_acl") and self._acl.enforce:
                self._acl.check(
                    self._user, self._enabled_roles, "UPDATE", name
                )
            from trino_private_spark.sources.iceberg import read_iceberg
            from trino_private_spark.sources.iceberg_write import (
                iceberg_update,
            )

            n = iceberg_update(self.spark, loc, assignments, cond)
            read_iceberg(self.spark, loc).createOrReplaceTempView(name)
            return self._rows_result(n)
        if name in getattr(self, "_cow", {}):
            return self._rows_result(self.update(name, assignments, cond))
        raise ValueError(
            f"UPDATE: {name!r} is not a mutable table (not an Iceberg "
            "view or CoW table of this engine)"
        )

    def _lower_time_travel(self, text: str, dialect: str = "trino") -> str:
        """Rewrite ``<table> FOR VERSION AS OF <n | 'ref'>`` /
        ``<table> FOR TIMESTAMP AS OF TIMESTAMP '...'`` references
        (SqlBase.g4 queryPeriod; the reference resolves them in
        IcebergMetadata.getTableHandle) to temp views over the snapshot
        read — Iceberg views travel by snapshot id, named branch/tag, or
        timestamp; CoW tables by version or timestamp. Unknown tables
        are left untouched."""
        import datetime as _dt
        import re as _re

        from trino_private_spark.plans.translate import _shield_strings

        shielded, restore = _shield_strings(
            text, backslash_escapes=(dialect == "spark")
        )
        pat = _re.compile(
            r"\b([A-Za-z_]\w*)\s+FOR\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
            r"(TIMESTAMP\s+\x00\d+\x00|\x00\d+\x00|\d+)",
            _re.I,
        )
        out, last, n = [], 0, 0
        for m in pat.finditer(shielded):
            name = m.group(1).lower()
            kind = m.group(2).upper()
            lit = restore(m.group(3)).strip()
            loc = getattr(self, "_iceberg_views", {}).get(name)
            is_cow = name in getattr(self, "_cow", {})
            if loc is None and not is_cow:
                continue
            ts_ms = None
            if kind == "TIMESTAMP" or lit.upper().startswith("TIMESTAMP"):
                s = _re.sub(r"^TIMESTAMP\s+", "", lit, flags=_re.I).strip("'")
                dt = _dt.datetime.fromisoformat(s)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=_dt.timezone.utc)
                ts_ms = int(dt.timestamp() * 1000)
            if loc is not None:
                from trino_private_spark.sources.iceberg import read_iceberg

                if ts_ms is not None:
                    df = read_iceberg(self.spark, loc, as_of_ms=ts_ms)
                elif lit.isdigit():
                    df = read_iceberg(
                        self.spark, loc, snapshot_id=int(lit)
                    )
                else:
                    df = read_iceberg(self.spark, loc, ref=lit.strip("'"))
            else:
                if ts_ms is not None:
                    df = self.read_as_of(name, ts_ms)
                elif lit.isdigit():
                    df = self.read_version(name, int(lit))
                else:
                    raise ValueError(
                        f"FOR VERSION AS OF {lit!r}: CoW tables travel "
                        "by integer version or timestamp"
                    )
            n += 1
            vname = f"__tt_{name}_{n}"
            df.createOrReplaceTempView(vname)
            out.append(shielded[last : m.start()])
            # keep an explicit alias only when the query didn't write one
            rest = shielded[m.end() :]
            has_alias = _re.match(
                r"\s+(?:AS\s+)?(?!ON\b|WHERE\b|JOIN\b|LEFT\b|RIGHT\b|"
                r"FULL\b|INNER\b|CROSS\b|OUTER\b|USING\b|GROUP\b|ORDER\b|"
                r"HAVING\b|LIMIT\b|OFFSET\b|UNION\b|FETCH\b|SELECT\b)"
                r"[A-Za-z_]\w*",
                rest,
                _re.I,
            )
            out.append(vname if has_alias else f"{vname} AS {m.group(1)}")
            last = m.end()
        if not n:
            return text
        out.append(shielded[last:])
        return restore("".join(out))

    #: Trino column-type spellings -> iceberg types (ALTER ADD COLUMN)
    _TRINO_TO_ICEBERG = {
        "bigint": "long", "integer": "int", "int": "int",
        "smallint": "int", "tinyint": "int", "varchar": "string",
        "string": "string", "double": "double", "real": "float",
        "float": "float", "boolean": "boolean", "date": "date",
        "varbinary": "binary", "binary": "binary",
        "timestamp": "timestamp",
    }

    def _alter_iceberg_table(self, name: str, rest: str) -> DataFrame:
        """ALTER TABLE <iceberg view> ... (SqlBase.g4:56-79 subset the
        reference's Iceberg connector accepts): ADD/RENAME/DROP COLUMN
        (metadata-only schema commits, iceberg_alter), EXECUTE optimize
        (small-file compaction), and SET PROPERTIES partitioning =
        ARRAY['month(d)', 'bucket(16, k)', 'c'] (partition-spec
        EVOLUTION — new default spec, old files stay prunable under
        theirs). The view re-registers from fresh metadata afterwards."""
        import re as _re

        from trino_private_spark.sources.iceberg import read_iceberg
        from trino_private_spark.sources.iceberg_write import (
            iceberg_alter,
            iceberg_set_partitioning,
        )

        loc = self._iceberg_views[name.lower()]
        r = rest.strip().rstrip(";").strip()
        m = _re.fullmatch(
            r"ADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+"
            r"([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)",
            r,
            _re.I,
        )
        if m:
            t = m.group(2).lower().replace(" ", "")
            ice_t = (
                t
                if t.startswith("decimal") or t.startswith("timestamp")
                else self._TRINO_TO_ICEBERG.get(t)
            )
            if ice_t is None:
                raise ValueError(f"ADD COLUMN: unsupported type {m.group(2)!r}")
            iceberg_alter(loc, add_columns={m.group(1): ice_t})
        elif (
            m := _re.fullmatch(
                r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)", r, _re.I
            )
        ):
            iceberg_alter(loc, rename_columns={m.group(1): m.group(2)})
        elif m := _re.fullmatch(r"DROP\s+COLUMN\s+(\w+)", r, _re.I):
            iceberg_alter(loc, drop_columns=[m.group(1)])
        elif m := _re.fullmatch(
            # the reference's optimize surface: optional
            # file_size_threshold parameter + optional WHERE partition
            # predicate (OptimizeTableProcedure; partial compaction)
            r"EXECUTE\s+optimize\s*"
            r"(?:\(\s*(?:file_size_threshold\s*=>\s*'([^']+)')?\s*\))?"
            r"(?:\s+WHERE\s+(.+))?",
            r,
            _re.I | _re.S,
        ):
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_optimize,
            )

            iceberg_optimize(
                self.spark,
                loc,
                where=m.group(2),
                file_size_threshold_bytes=(
                    self._size_bytes(m.group(1)) if m.group(1) else None
                ),
            )
        elif _re.fullmatch(
            r"EXECUTE\s+rewrite_manifests(?:\s*\(\s*\))?", r, _re.I
        ):
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_rewrite_manifests,
            )

            iceberg_rewrite_manifests(loc, spark=self.spark)
        elif (
            m := _re.fullmatch(
                r"CREATE\s+(BRANCH|TAG)\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)"
                r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?",
                r,
                _re.I,
            )
        ):
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_create_ref,
            )

            iceberg_create_ref(
                loc,
                m.group(2),
                ref_type=m.group(1).lower(),
                snapshot_id=int(m.group(3)) if m.group(3) else None,
            )
        elif (
            m := _re.fullmatch(
                r"DROP\s+(BRANCH|TAG)\s+(?:IF\s+EXISTS\s+)?(\w+)", r, _re.I
            )
        ):
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_drop_ref,
            )

            iceberg_drop_ref(loc, m.group(2))
        elif (
            m := _re.fullmatch(
                r"SET\s+PROPERTIES\s+partitioning\s*=\s*ARRAY\s*"
                r"\[([^\]]*)\]",
                r,
                _re.I,
            )
        ):
            entries = [
                e.strip().strip("'")
                for e in m.group(1).split(",")
                if e.strip()
            ]
            # re-join split transform args: "bucket(16" + "k)" -> one entry
            merged: list[str] = []
            for e in entries:
                if merged and "(" in merged[-1] and ")" not in merged[-1]:
                    merged[-1] += "," + e
                else:
                    merged.append(e)
            spec = [self._parse_partitioning_entry(e) for e in merged]
            iceberg_set_partitioning(loc, spec)
        else:
            raise ValueError(f"unsupported ALTER TABLE action: {rest!r}")
        read_iceberg(self.spark, loc).createOrReplaceTempView(name)
        return self._one("ALTER TABLE")

    @staticmethod
    def _parse_partitioning_entry(e: str):
        """'month(d)' -> ('d', 'month'); 'bucket(16, k)' -> ('k',
        'bucket[16]'); 'truncate(3, s)' -> ('s', 'truncate[3]'); bare
        column -> identity (the reference's partitioning array syntax,
        plugin/trino-iceberg PartitionFields parser)."""
        import re as _re

        e = e.strip().strip("'").strip()
        m = _re.fullmatch(
            r"(year|month|day|hour|void)\s*\(\s*(\w+)\s*\)", e, _re.I
        )
        if m:
            return (m.group(2), m.group(1).lower())
        m = _re.fullmatch(
            r"(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)", e, _re.I
        )
        if m:  # Spark-style arg order: bucket(16, col)
            return (m.group(3), f"{m.group(1).lower()}[{m.group(2)}]")
        m = _re.fullmatch(
            r"(bucket|truncate)\s*\(\s*(\w+)\s*,\s*(\d+)\s*\)", e, _re.I
        )
        if m:  # the reference's arg order: bucket(col, 16)
            return (m.group(2), f"{m.group(1).lower()}[{m.group(3)}]")
        m = _re.fullmatch(r"\w+", e)
        if m:
            return (e, "identity")
        raise ValueError(f"unsupported partitioning entry {e!r}")

    @staticmethod
    def _size_bytes(v: str) -> int:
        """Parse a reference-style DataSize literal — '10MB', '128kB',
        '1GB', '4096B' (io.airlift.units.DataSize spellings) — to
        bytes. Loud on anything else: a mis-parsed threshold would
        silently compact the wrong files."""
        import re as _re

        m = _re.fullmatch(
            r"\s*(\d+(?:\.\d+)?)\s*(B|kB|MB|GB|TB|PB)\s*", v
        )
        if not m:
            raise ValueError(f"invalid file_size_threshold {v!r}")
        mult = {"B": 1, "kB": 1024, "MB": 1024**2, "GB": 1024**3,
                "TB": 1024**4, "PB": 1024**5}[m.group(2)]
        return int(float(m.group(1)) * mult)

    @staticmethod
    def _duration_ms(v) -> int | None:
        """Parse a reference-style duration value — '7d', '12h', '30m',
        '45s', or an ``INTERVAL '7' DAY`` literal — to milliseconds;
        None when ``v`` is not duration-shaped (e.g. a plain integer,
        which CALL treats as the shim's keep_last count)."""
        import re as _re

        if not isinstance(v, str):
            return None
        units = {
            "ms": 1,
            "s": 1000,
            "m": 60_000,
            "h": 3_600_000,
            "d": 86_400_000,
        }
        m = _re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*(ms|[smhd])\s*", v, _re.I)
        if m:
            return int(float(m.group(1)) * units[m.group(2).lower()])
        m = _re.fullmatch(
            r"\s*INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?\s*",
            v,
            _re.I,
        )
        if m:
            per = {"SECOND": 1000, "MINUTE": 60_000,
                   "HOUR": 3_600_000, "DAY": 86_400_000}
            return int(m.group(1)) * per[m.group(2).upper()]
        return None

    def set_session(self, key: str, value: str) -> None:
        """SET SESSION shim (SqlBase.g4:148): reference session property
        names map to their Spark conf twins (see ``_SESSION_MAP``); other
        keys set the Spark conf directly."""
        if not hasattr(self, "_session_props"):
            self._session_props: dict[str, str] = {}
        self._session_props[key] = value
        for conf_key, conf_val in self._SESSION_MAP.get(
            key, lambda v: [(key, v)]
        )(value):
            self.spark.conf.set(conf_key, conf_val)

    def set_time_zone(self, zone: str) -> None:
        """SET TIME ZONE (SqlBase.g4:159) -> Spark session timezone."""
        self.spark.conf.set("spark.sql.session.timeZone", zone)

    # --- prepared statements (SqlBase.g4:153-155) ------------------------

    @staticmethod
    def _needs_engine_lowering(text: str) -> bool:
        """Statements Spark SQL cannot run directly — they re-enter
        Engine.sql() at execute time for iterative/NFA lowering."""
        import re as _re

        return bool(
            _re.match(r"\s*WITH\s+RECURSIVE\b", text, _re.I)
            or _re.search(r"\bMATCH_RECOGNIZE\s*\(", text, _re.I)
        )

    def prepare(self, name: str, text: str, dialect: str = "trino") -> None:
        """PREPARE name FROM <query>. Translation happens once at prepare
        time (the reference analyzes at prepare, binds at execute —
        SqlQueryExecution's prepared-statement path); `?` markers bind
        positionally at execute(). WITH RECURSIVE / MATCH_RECOGNIZE
        statements are stored raw and re-enter Engine.sql() at execute —
        they need the engine's lowering, not a bare spark.sql."""
        if not hasattr(self, "_prepared"):
            self._prepared: dict[str, str] = {}
            self._prepared_engine: dict[str, str] = {}  # name -> dialect
        if self._needs_engine_lowering(text):
            self._prepared[name] = text
            self._prepared_engine[name] = dialect
        else:
            self._prepared.pop(name, None)
            self._prepared_engine.pop(name, None)
            self._prepared[name] = (
                translate(text) if dialect == "trino" else text
            )

    @staticmethod
    def _render_literal(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    def execute(self, name: str, *params) -> DataFrame:
        """EXECUTE name USING p1, p2, ... — positional `?` binding via
        Spark's parameterized sql() (literal-safe: values never splice into
        the SQL text, so no injection and plans cache by text). Engine-
        lowered statements bind by escaped-literal substitution instead
        (their text never reaches spark.sql verbatim)."""
        import re as _re

        text = self._prepared[name]
        eng_dialect = getattr(self, "_prepared_engine", {}).get(name)
        if eng_dialect is not None:
            if params:
                lits = [self._render_literal(p) for p in params]
                it = iter(lits)
                text = _re.sub(
                    r"\?(?=(?:[^']*'[^']*')*[^']*$)",
                    lambda _m: next(it),
                    text,
                )
            return self.sql(text, eng_dialect)
        return self.spark.sql(text, args=list(params)) if params else self.spark.sql(text)

    def deallocate(self, name: str) -> None:
        """DEALLOCATE PREPARE name."""
        self._prepared.pop(name, None)
        getattr(self, "_prepared_engine", {}).pop(name, None)

    def reset_session(self, key: str) -> None:
        """RESET SESSION key (SqlBase.g4:149): restore the property to its
        default — mapped properties re-apply their default through the
        same conf mapping SET SESSION used; pass-through Spark confs are
        unset."""
        props = getattr(self, "_session_props", {})
        props.pop(key, None)
        default = next(
            (d for n, d, _t, _desc in self._SESSION_DEFAULTS if n == key),
            None,
        )
        if default is not None and key in self._SESSION_MAP:
            for conf_key, conf_val in self._SESSION_MAP[key](default):
                self.spark.conf.set(conf_key, conf_val)
        else:
            try:
                self.spark.conf.unset(key)
            except Exception:
                pass

    @staticmethod
    def _parse_literals(args_text):
        """Parse a comma-separated SQL literal list (EXECUTE ... USING /
        CALL arguments): quoted strings, numerics, booleans, NULL."""
        import ast
        import re as _re

        if not args_text:
            return []
        out = []
        for part in _re.split(
            r",(?=(?:[^']*'[^']*')*[^']*$)", args_text
        ):
            part = part.strip()
            if not part:
                continue
            if part.upper() == "NULL":
                out.append(None)
            elif part.upper() in ("TRUE", "FALSE"):
                out.append(part.upper() == "TRUE")
            elif len(part) >= 2 and part[0] == "'" and part[-1] == "'":
                out.append(part[1:-1].replace("''", "'"))
            else:
                try:
                    out.append(ast.literal_eval(part))
                except (ValueError, SyntaxError):
                    out.append(part)
        return out

    @staticmethod
    def _trino_type(dt) -> str:
        """Spark DataType -> reference type name (StandardTypes.java)."""
        from pyspark.sql import types as T

        if isinstance(dt, T.StringType):
            return "varchar"
        if isinstance(dt, T.LongType):
            return "bigint"
        if isinstance(dt, T.IntegerType):
            return "integer"
        if isinstance(dt, T.ShortType):
            return "smallint"
        if isinstance(dt, T.ByteType):
            return "tinyint"
        if isinstance(dt, T.FloatType):
            return "real"
        if isinstance(dt, T.BinaryType):
            return "varbinary"
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision},{dt.scale})"
        if isinstance(dt, T.ArrayType):
            return f"array({Engine._trino_type(dt.elementType)})"
        if isinstance(dt, T.MapType):
            return (
                f"map({Engine._trino_type(dt.keyType)}, "
                f"{Engine._trino_type(dt.valueType)})"
            )
        if isinstance(dt, T.StructType):
            inner = ", ".join(
                f"{f.name} {Engine._trino_type(f.dataType)}" for f in dt
            )
            return f"row({inner})"
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return "timestamp"
        return dt.simpleString()

    def _prepared_schema(self, name: str):
        """Analysis-only schema of a prepared statement; `?` parameter
        markers are typed by substituting NULL (the reference types them
        `unknown` at DESCRIBE time too)."""
        import re as _re

        text = self._prepared[name]
        # replace ? markers outside single-quoted strings with NULL
        text = _re.sub(r"\?(?=(?:[^']*'[^']*')*[^']*$)", "NULL", text)
        eng_dialect = getattr(self, "_prepared_engine", {}).get(name)
        if eng_dialect is not None:
            return self.sql(text, eng_dialect).schema
        return self.spark.sql(text).schema

    def describe_input(self, name: str) -> DataFrame:
        """DESCRIBE INPUT name (SqlBase.g4:156): one row per `?` marker.
        The reference resolves parameter types from analysis; the shim
        reports position with type `unknown` (the reference's own type for
        untyped parameters)."""
        import re as _re

        text = self._prepared[name]
        n = len(_re.findall(r"\?(?=(?:[^']*'[^']*')*[^']*$)", text))
        rows = [(i, "unknown") for i in range(n)]
        return self.spark.createDataFrame(
            rows or [], "`Position` int, `Type` string"
        )

    def describe_output(self, name: str) -> DataFrame:
        """DESCRIBE OUTPUT name (SqlBase.g4:157): the reference's shape —
        Column Name, Catalog, Schema, Table, Type, Type Size, Aliased."""
        schema = self._prepared_schema(name)
        rows = [
            (f.name, "", "", "", self._trino_type(f.dataType), 0, True)
            for f in schema.fields
        ]
        return self.spark.createDataFrame(
            rows,
            "`Column Name` string, `Catalog` string, `Schema` string, "
            "`Table` string, `Type` string, `Type Size` int, "
            "`Aliased` boolean",
        )

    def show_functions(self, like: str | None = None) -> DataFrame:
        """SHOW FUNCTIONS [LIKE pattern] (SqlBase.g4:145): the reference's
        six-column result (ShowQueriesRewrite's SHOW FUNCTIONS shape —
        Function, Return Type, Argument Types, Function Type,
        Deterministic, Description) over the Trino-name registry this
        engine maps onto Spark (functions/registry.py). Return/argument
        types are not tracked by the shim mapping, so those columns render
        empty; Description is the mapping's docstring headline."""
        import fnmatch

        from trino_private_spark.functions.registry import TRINO_FUNCTIONS
        from trino_private_spark.plans.translate import _FN_RENAMES

        catalog: dict[str, str] = {}
        for name, spark_name in _FN_RENAMES.items():
            catalog[name] = f"maps to Spark {spark_name}() via translate()"
        for name in TRINO_FUNCTIONS:
            fn = TRINO_FUNCTIONS[name]
            doc = (getattr(fn, "__doc__", None) or "").strip().splitlines()
            catalog[name] = doc[0] if doc else ""
        try:
            from trino_private_spark.functions.geometry import GEOMETRY_UDFS

            for name in GEOMETRY_UDFS:
                catalog.setdefault(name, "geometry kernel (functions/geometry.py)")
        except ImportError:  # pragma: no cover
            pass
        rows = []
        for name in sorted(catalog):
            if like is not None and not fnmatch.fnmatch(
                name, like.replace("%", "*").replace("_", "?")
            ):
                continue
            rows.append((name, "", "", "scalar", True, catalog[name]))
        return self.spark.createDataFrame(
            rows,
            "`Function` string, `Return Type` string, "
            "`Argument Types` string, `Function Type` string, "
            "`Deterministic` boolean, `Description` string",
        )

    def show_create_table(self, table: str) -> DataFrame:
        """SHOW CREATE TABLE (SqlBase.g4:135): render the reference's
        single-column `Create Table` result from the resolved schema.
        Registered Iceberg views render the reference's WITH property
        block (format / location / partitioning / sorted_by read back
        from the live metadata — the iceberg connector's
        getTableProperties shape)."""
        df = self.spark.table(table)
        cols = ",\n".join(
            f"   {f.name} {self._trino_type(f.dataType)}"
            for f in df.schema.fields
        )
        ddl = f"CREATE TABLE {table} (\n{cols}\n)"
        loc = getattr(self, "_iceberg_views", {}).get(table.lower())
        if loc:
            from trino_private_spark.sources.iceberg import IcebergTable

            import re as _re_mod

            t = IcebergTable(loc)
            md = t.metadata
            props = ["   format = 'ICEBERG'", f"   location = '{loc}'"]
            spec_id = int(md.get("default-spec-id", 0))
            spec = next(
                (
                    s.get("fields", [])
                    for s in md.get("partition-specs", [])
                    if s.get("spec-id") == spec_id
                ),
                [],
            )
            if spec:
                names_by_id = {
                    f["id"]: f["name"]
                    for s in md.get("schemas", [])
                    for f in s.get("fields", [])
                }

                def render(fld) -> str:
                    src = names_by_id.get(fld.get("source-id"), "?")
                    tr = fld.get("transform", "identity")
                    if tr == "identity":
                        return src
                    m = _re_mod.fullmatch(r"(bucket|truncate)\[(\d+)\]", tr)
                    if m:
                        return f"{m.group(1)}({src}, {m.group(2)})"
                    return f"{tr}({src})"

                entries = ", ".join(f"'{render(f)}'" for f in spec)
                props.append(f"   partitioning = ARRAY[{entries}]")
            order_id = int(md.get("default-sort-order-id", 0))
            order = next(
                (
                    o.get("fields", [])
                    for o in md.get("sort-orders", [])
                    if o.get("order-id") == order_id
                ),
                [],
            )
            if order:
                names_by_id = {
                    f["id"]: f["name"]
                    for s in md.get("schemas", [])
                    for f in s.get("fields", [])
                }
                entries = ", ".join(
                    "'{}{}'".format(
                        names_by_id.get(f.get("source-id"), "?"),
                        " DESC" if f.get("direction") == "desc" else "",
                    )
                    for f in order
                )
                props.append(f"   sorted_by = ARRAY[{entries}]")
            ddl += "\nWITH (\n" + ",\n".join(props) + "\n)"
        return self.spark.createDataFrame(
            [(ddl,)], "`Create Table` string"
        )

    def use(self, schema: str) -> None:
        """USE [catalog.]schema (SqlBase.g4:90). Spark's session catalog
        has databases where the reference has schemas; unknown names get
        the reference's error wording."""
        name = schema.split(".")[-1]
        dbs = [d.name for d in self.spark.catalog.listDatabases()]
        if name not in dbs:
            raise ValueError(f"Schema does not exist: {schema}")
        self.spark.catalog.setCurrentDatabase(name)

    # --- DELETE / UPDATE via copy-on-write snapshots (SqlBase.g4:61,160) -

    def create_cow_table(self, name: str, text: str, root: str,
                         fmt: str = "parquet", dialect: str = "trino") -> None:
        """Create a mutable file-backed table as snapshot v0 under ``root``.
        DELETE/UPDATE (grammar SqlBase.g4:61,160-162; Hive ACID deletes via
        OrcDeleteDeltaPageSource in the reference) are realized as
        copy-on-write: each mutation writes a full new snapshot directory
        and atomically repoints the view — readers of the old snapshot are
        never disturbed, exactly the Iceberg/Delta CoW model on plain
        parquet. At 100 TB a real deployment uses a table format that
        rewrites only the files containing matches; the semantics here are
        identical, the rewrite granularity is the table."""
        if not hasattr(self, "_cow"):
            self._cow: dict[str, tuple[str, str, int]] = {}
        df = self.sql(text, dialect)
        df.write.mode("overwrite").format(fmt).save(f"{root}/v0")
        self._cow[name] = (root, fmt, 0)
        self._write_manifest(name, "create", df)
        self._repoint(name)

    def _repoint(self, name: str) -> None:
        root, fmt, v = self._cow[name]
        self.spark.read.format(fmt).load(f"{root}/v{v}").createOrReplaceTempView(
            name
        )

    def _rewrite(self, name: str, df: DataFrame, operation: str = "rewrite") -> None:
        root, fmt, v = self._cow[name]
        df.write.mode("overwrite").format(fmt).save(f"{root}/v{v + 1}")
        self._cow[name] = (root, fmt, v + 1)
        self._write_manifest(name, operation, None)
        self._repoint(name)

    # -- snapshots & time travel (the Iceberg surface the reference ships:
    # -- FOR VERSION AS OF / FOR TIMESTAMP AS OF, snapshot listing,
    # -- rollback_to_snapshot; plugin/trino-iceberg) -----------------------

    def _write_manifest(self, name: str, operation: str, df) -> None:
        import json as _json
        import os
        import time as _time

        root, fmt, v = self._cow[name]
        meta = {
            "version": v,
            "operation": operation,
            "committed_at_ms": int(_time.time() * 1000),
        }
        os.makedirs(f"{root}/v{v}", exist_ok=True)
        with open(f"{root}/v{v}/_manifest.json", "w") as f:
            _json.dump(meta, f)

    def read_version(self, name: str, version: int) -> DataFrame:
        """FOR VERSION AS OF: read snapshot ``version`` of a CoW table —
        old snapshots are immutable directories, so this is just a scan."""
        root, fmt, cur = self._cow[name]
        if not 0 <= version <= cur:
            raise ValueError(f"no snapshot v{version} for {name} (head v{cur})")
        return self.spark.read.format(fmt).load(f"{root}/v{version}")

    def snapshots(self, name: str) -> DataFrame:
        """The $snapshots metadata table: version, operation, commit time."""
        import json as _json

        root, fmt, cur = self._cow[name]
        rows = []
        for v in range(cur + 1):
            try:
                with open(f"{root}/v{v}/_manifest.json") as f:
                    m = _json.load(f)
            except FileNotFoundError:
                continue
            rows.append((m["version"], m["operation"], m["committed_at_ms"], v == cur))
        return self.spark.createDataFrame(
            rows, "version int, operation string, committed_at_ms long, is_current boolean"
        )

    def read_as_of(self, name: str, timestamp_ms: int) -> DataFrame:
        """FOR TIMESTAMP AS OF: the newest snapshot committed at or before
        the given epoch-millis."""
        import json as _json

        root, fmt, cur = self._cow[name]
        best = None
        for v in range(cur + 1):
            try:
                with open(f"{root}/v{v}/_manifest.json") as f:
                    m = _json.load(f)
            except FileNotFoundError:
                continue
            if m["committed_at_ms"] <= timestamp_ms:
                best = v
        if best is None:
            raise ValueError(f"no snapshot of {name} at or before {timestamp_ms}")
        return self.read_version(name, best)

    def rollback_to(self, name: str, version: int) -> None:
        """rollback_to_snapshot: repoint the table to an old snapshot as a
        NEW commit (the old directories stay immutable; history is
        preserved, exactly Iceberg's rollback semantics)."""
        self._rewrite(name, self.read_version(name, version), operation=f"rollback_to_v{version}")

    def delete_from(self, name: str, condition: str) -> int:
        """DELETE FROM name WHERE condition; returns rows deleted (the
        reference reports the same via TableFinishOperator row counts)."""
        from pyspark.sql import functions as F

        if hasattr(self, "_acl") and self._acl.enforce:
            self._acl.check(self._user, self._enabled_roles, "DELETE", name)

        cur = self.spark.table(name)
        cond = F.expr(condition)
        deleted = cur.where(cond).count()
        if deleted:
            self._rewrite(name, cur.where(~F.coalesce(cond, F.lit(False))), operation="delete")
        return deleted

    def update(self, name: str, assignments: dict[str, str],
               condition: str = "true") -> int:
        """UPDATE name SET col = expr, ... WHERE condition; returns rows
        updated. Non-matching rows pass through the rewrite unchanged —
        a single projection, no join."""
        from pyspark.sql import functions as F

        if hasattr(self, "_acl") and self._acl.enforce:
            self._acl.check(self._user, self._enabled_roles, "UPDATE", name)

        cur = self.spark.table(name)
        cond = F.expr(condition)
        updated = cur.where(cond).count()
        if updated:
            matched = F.coalesce(cond, F.lit(False))
            out = cur.select(
                *(
                    (
                        F.when(matched, F.expr(expr))
                        .otherwise(F.col(c))
                        .cast(cur.schema[c].dataType)
                        .alias(c)
                        if c in assignments
                        else F.col(c)
                    )
                    for c, expr in (
                        (c, assignments.get(c, c)) for c in cur.columns
                    )
                )
            )
            self._rewrite(name, out, operation="update")
        return updated

    def vacuum(self, name: str) -> None:
        """Drop superseded snapshots (Iceberg expire_snapshots analogue)."""
        import shutil

        root, _fmt, v = self._cow[name]
        import os

        for d in os.listdir(root):
            if d.startswith("v") and d != f"v{v}":
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    # --- materialized views (SqlBase.g4:80-90) ---------------------------

    def create_materialized_view(self, name: str, text: str, path: str,
                                 fmt: str = "parquet",
                                 dialect: str = "trino") -> None:
        """CREATE MATERIALIZED VIEW: materialize the query to storage and
        register a view over the files. The definition is retained so
        REFRESH can re-run it (the reference stores it in metadata and
        re-executes on RefreshMaterializedViewOperator)."""
        if not hasattr(self, "_mviews"):
            self._mviews: dict[str, tuple[str, str, str]] = {}
        self._mviews[name] = (text, path, fmt)
        self.ctas(name, text, path=path, fmt=fmt, dialect=dialect)

    def refresh_materialized_view(self, name: str) -> None:
        """REFRESH MATERIALIZED VIEW: re-run the stored definition and
        swap the backing files."""
        text, path, fmt = self._mviews[name]
        self.ctas(name, text, path=path, fmt=fmt)

    def drop_materialized_view(self, name: str) -> None:
        self._mviews.pop(name, None)
        self.spark.catalog.dropTempView(name)
