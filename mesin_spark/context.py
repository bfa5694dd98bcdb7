"""ExecutionContext — the engine's single public entry point.

Mirrors the reference's lifecycle (reference src/context.rs:42-56):

    parse -> guard -> plan -> output

but where the reference stops after pretty-printing the logical plan
(src/context.rs:53), we hand the SQL to Catalyst and return a real
DataFrame. Divergences (documented per SURVEY.md §7.3):

- Multi-statement input: the reference silently truncates to ``ast[0]``
  (src/context.rs:49). We raise instead — silent truncation is a bug.
- CTE scope: the reference leaks CTE registrations across statements
  (tmp/select.rs:124 never cleared). Spark scopes CTEs per query; we keep
  Spark's correct behavior.

The reference's 11-dialect knob (src/lib.rs:9-23, default postgres at
main.rs:5) is honored as *accepted configuration*: Spark SQL is a single
dialect, and the reference's planner semantics are dialect-independent, so
every dialect name maps to the same execution path. Unknown dialect names
fall back to generic, exactly like ``get_dialect``'s ``_ =>`` arm
(src/lib.rs:21).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from mesin_spark.catalog import TESTDATA_TABLES, Catalog
from mesin_spark.session import get_session

#: Reference dialect surface (src/lib.rs:9-23).
DIALECTS = frozenset(
    {
        "ansi",
        "bigquery",
        "clickhouse",
        "duckdb",
        "generic",
        "hive",
        "mssql",
        "postgres",
        "redshift",
        "sqlite",
        "snowflake",
    }
)


def get_dialect(name: str) -> str:
    """Dialect selector; unknown names → generic (src/lib.rs:21)."""
    name = name.lower()
    return name if name in DIALECTS else "generic"


#: Dialects whose identifier quote is the double-quote and that support
#: the ``expr::type`` cast shorthand (snowflake shares both idioms).
_PG_LIKE = frozenset(
    {"postgres", "redshift", "duckdb", "sqlite", "generic", "ansi", "snowflake"}
)

#: Dialects whose identifier quote is already Spark's backtick — their
#: common syntax parses unchanged.
_BACKTICK = frozenset({"hive", "bigquery", "clickhouse", "mysql"})


def normalize_dialect(sql: str, dialect: str) -> str:
    """Minimal dialect normalization so the most common per-dialect syntax
    runs on Spark SQL, honoring the reference's 11-dialect knob
    (src/lib.rs:9-23) with actual behavior instead of a no-op:

    - pg-like (postgres/redshift/duckdb/sqlite/snowflake/ansi/generic):
      ``expr::type`` → ``CAST(expr AS type)`` (identifiers, numbers,
      string literals, parenthesized groups) and double-quoted identifiers
      → backticked. Single-quoted string literals are never touched (char
      scanner, not regex-over-everything).
    - mssql: ``SELECT TOP n`` → trailing ``LIMIT n``; ``[bracket]``
      identifiers → backticked.
    - hive/bigquery/clickhouse: backtick identifiers already match Spark —
      passthrough.

    - all dialects: a top-level ``QUALIFY <pred>`` (Teradata-origin;
      duckdb/snowflake/bigquery surface) → wrapped subquery with the
      predicate as an outer WHERE — Spark has no QUALIFY at all, and the
      standard usage filters on a window alias from the select list, which
      the subquery form preserves exactly.

    - all dialects: quantified comparison subqueries (ANSI; Spark lacks
      them). ``= ANY/SOME (sub)`` → ``IN (sub)`` and ``<> ALL (sub)`` →
      ``NOT IN (sub)`` are EXACT rewrites (same three-valued logic).
      Ordering forms rewrite to extremum scalar subqueries (``> ALL`` →
      ``> (SELECT max ...)``, ``> ANY`` → ``> (SELECT min ...)``, and
      mirrored for ``<``/``<=``/``>=``) — exact when the subquery is
      non-empty and null-free; the empty-set edge (ALL over {} is TRUE,
      the extremum form yields NULL) is documented, matching how most
      engines' users encounter these predicates.

    Constructs beyond these surface Spark's parse error unchanged."""
    if re.match(r"\s*(SELECT|WITH|\()", sql, re.I):
        # QUALIFY wraps the statement in SELECT * FROM (...) — only valid
        # for queries; a DML statement containing QUALIFY must reach the
        # DML router intact
        sql = _rewrite_qualify(sql)
    sql = _rewrite_quantified(sql)
    if dialect == "mssql":
        return _normalize_mssql(sql)
    if dialect not in _PG_LIKE:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # string literal: copy verbatim, honoring '' escapes
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif ch == '"':  # quoted identifier -> backticks
            j = sql.find('"', i + 1)
            if j == -1:
                out.append(sql[i:])
                break
            out.append("`" + sql[i + 1 : j] + "`")
            i = j + 1
        elif ch == ":" and i + 1 < n and sql[i + 1] == ":":
            # expr::type — rewrite when the operand is a simple token
            # (identifier, quoted identifier we just emitted, number, or
            # a parenthesized group ending right before the '::')
            k = i + 2
            while k < n and (sql[k].isalnum() or sql[k] in "_("):
                if sql[k] == "(":  # e.g. ::DECIMAL(10,2)
                    depth = 1
                    k += 1
                    while k < n and depth:
                        depth += {"(": 1, ")": -1}.get(sql[k], 0)
                        k += 1
                    break
                k += 1
            typename = sql[i + 2 : k]
            # walk back over the operand in what we've emitted so far
            emitted = "".join(out)
            m = len(emitted)
            if m and emitted[-1] == "'":
                # string-literal operand ('2024-01-01'::date): scan back to
                # the opening quote, honoring '' escapes — the whole literal
                # is the operand
                p = m - 2
                while p >= 0:
                    if emitted[p] == "'":
                        if p > 0 and emitted[p - 1] == "'":
                            p -= 2  # doubled quote inside the literal
                            continue
                        break
                    p -= 1
                operand_start = max(p, 0)
            elif m and emitted[-1] == ")":
                depth = 0
                p = m - 1
                while p >= 0:
                    depth += {")": 1, "(": -1}.get(emitted[p], 0)
                    if depth == 0:
                        break
                    p -= 1
                # include a function name before the parens: fn(x)::T, CAST(..)::T
                while p > 0 and (emitted[p - 1].isalnum() or emitted[p - 1] in "_.`"):
                    p -= 1
                operand_start = p
            elif m and emitted[-1] == "`":
                # backtick-quoted identifier (possibly qualified: t.`my col`)
                p = emitted.rfind("`", 0, m - 1)
                while p > 0 and (emitted[p - 1].isalnum() or emitted[p - 1] in "_.`"):
                    p -= 1
                operand_start = p
            else:
                p = m
                while p > 0 and (emitted[p - 1].isalnum() or emitted[p - 1] in "_.`"):
                    p -= 1
                operand_start = p
            operand = emitted[operand_start:]
            if not operand.strip() or not typename.strip():
                # no identifiable operand/type: emit '::' untouched rather
                # than fabricating CAST( AS T) — Spark's parser gives the
                # honest error
                out.append("::")
                i += 2
                continue
            out = [emitted[:operand_start], f"CAST({operand} AS {typename})"]
            i = k
        else:
            out.append(ch)
            i += 1
    return "".join(out)


#: quantified-comparison rewrite table: (op, quantifier) → how to emit.
#: 'in'/'not_in' are exact; 'max'/'min' pick the extremum scalar subquery.
_QUANT_FORMS = {
    ("=", "ANY"): "in",
    ("=", "SOME"): "in",
    ("<>", "ALL"): "not_in",
    ("!=", "ALL"): "not_in",
    (">", "ALL"): "max",
    (">=", "ALL"): "max",
    ("<", "ALL"): "min",
    ("<=", "ALL"): "min",
    (">", "ANY"): "min",
    (">=", "ANY"): "min",
    ("<", "ANY"): "max",
    ("<=", "ANY"): "max",
    (">", "SOME"): "min",
    (">=", "SOME"): "min",
    ("<", "SOME"): "max",
    ("<=", "SOME"): "max",
}

_QUANT_RE = re.compile(
    r"(=|<>|!=|<=|>=|<|>)\s*(ALL|ANY|SOME)\s*\(", re.IGNORECASE
)


def _rewrite_quantified(sql: str) -> str:
    """Rewrite ANSI quantified comparison subqueries (op ALL/ANY/SOME
    (subquery)) into forms Spark supports — see normalize_dialect's
    docstring for exactness notes. Char-scanner driven: quantifier
    keywords inside string literals never match; the subquery's closing
    paren is found by balanced-paren scan (quote-aware), and rewrites
    re-scan so nested occurrences inside subqueries are handled too."""
    while True:
        # locate the first candidate OUTSIDE string literals
        m = None
        i, n = 0, len(sql)
        while i < n:
            if sql[i] == "'":
                j = i + 1
                while j < n:
                    if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    if sql[j] == "'":
                        break
                    j += 1
                i = j + 1
                continue
            m = _QUANT_RE.match(sql, i)
            if m:
                break
            i += 1
        if not m:
            return sql
        op, quant = m.group(1), m.group(2).upper()
        # combos with no sound rewrite (= ALL, <> ANY/SOME) fall through
        # to the documented contract: the construct surfaces Spark's own
        # parse error unchanged, never a KeyError from this scanner
        form = _QUANT_FORMS.get((op, quant))
        if form is None:
            i2 = m.end()
            return sql[:i2] + _rewrite_quantified(sql[i2:])
        # balanced-paren, quote-aware scan for the subquery body
        depth, j = 1, m.end()
        while j < n and depth:
            ch = sql[j]
            if ch == "'":
                j += 1
                while j < n:
                    if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    if sql[j] == "'":
                        break
                    j += 1
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            j += 1
        sub = sql[m.end() : j - 1]
        # quantified comparisons take a SUBQUERY; anything else (e.g. the
        # any()/some() aggregates over a column) is left untouched
        if not sub.lstrip().upper().startswith(("SELECT", "WITH", "VALUES")):
            i = m.end()
            head, tail = sql[:i], sql[i:]
            rest = _rewrite_quantified(tail)
            return head + rest
        if form == "in":
            repl = f" IN ({sub})"
        elif form == "not_in":
            repl = f" NOT IN ({sub})"
        else:
            repl = f"{op} (SELECT {form}(_qv) FROM ({sub}) _quant(_qv))"
        sql = sql[: m.start()] + repl + sql[j:]


def _rewrite_qualify(sql: str) -> str:
    """Rewrite a TOP-LEVEL ``... QUALIFY <pred> [ORDER BY ...] [LIMIT n]``
    into ``SELECT * FROM (...) _qualify WHERE <pred> [ORDER BY/LIMIT]``.
    Char scanner: QUALIFY inside string literals, quoted identifiers or
    parentheses (subqueries) is left alone — nested QUALIFY would need a
    real parser and surfaces Spark's parse error instead."""
    n = len(sql)
    i, depth = 0, 0
    q_start = q_end = -1
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n:
                if sql[i] == "'" and i + 1 < n and sql[i + 1] == "'":
                    i += 2
                    continue
                if sql[i] == "'":
                    break
                i += 1
            i += 1
        elif ch in "\"`":
            j = sql.find(ch, i + 1)
            i = n if j == -1 else j + 1
        elif ch in "()":
            depth += 1 if ch == "(" else -1
            i += 1
        elif (
            depth == 0
            and sql[i : i + 7].upper() == "QUALIFY"
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
            and (i + 7 == n or not (sql[i + 7].isalnum() or sql[i + 7] == "_"))
        ):
            q_start, q_end = i, i + 7
            break
        else:
            i += 1
    if q_start == -1:
        return sql
    head = sql[:q_start].rstrip().rstrip(";")
    rest = sql[q_end:]
    # the predicate runs until a top-level ORDER BY / LIMIT (those move to
    # the outer query), or the end of the statement
    tail_at = len(rest)
    i, depth = 0, 0
    while i < len(rest):
        ch = rest[i]
        if ch == "'":
            i += 1
            while i < len(rest) and rest[i] != "'":
                i += 1
            i += 1
        elif ch in "()":
            depth += 1 if ch == "(" else -1
            i += 1
        elif depth == 0 and (
            rest[i : i + 8].upper() == "ORDER BY" or rest[i : i + 5].upper() == "LIMIT"
        ):
            tail_at = i
            break
        else:
            i += 1
    pred = rest[:tail_at].strip().rstrip(";")
    tail = rest[tail_at:].strip().rstrip(";")
    return f"SELECT * FROM ({head}) _qualify WHERE {pred}" + (f" {tail}" if tail else "")


def _normalize_mssql(sql: str) -> str:
    """mssql surface: ``[bracket]`` identifiers → backticks and the
    top-level ``SELECT TOP n`` → a trailing ``LIMIT n``. Char scanner so
    brackets/TOP inside string literals are never touched; TOP is only
    rewritten for the outermost SELECT (subquery TOP would need a real
    parser — those surface Spark's parse error unchanged)."""
    out: list[str] = []
    i, n = 0, len(sql)
    limit: str | None = None
    depth = 0
    while i < n:
        ch = sql[i]
        if ch == "'":  # string literal: verbatim, honoring '' escapes
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif ch == "[":  # bracket identifier -> backticks
            j = sql.find("]", i + 1)
            if j == -1:
                out.append(sql[i:])
                break
            out.append("`" + sql[i + 1 : j] + "`")
            i = j + 1
        elif ch in "()":
            depth += 1 if ch == "(" else -1
            out.append(ch)
            i += 1
        elif (
            depth == 0
            and limit is None
            and sql[i : i + 6].upper() == "SELECT"
            and (i + 6 == n or sql[i + 6].isspace())
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
        ):
            j = i + 6
            while j < n and sql[j].isspace():
                j += 1
            if sql[j : j + 3].upper() == "TOP" and j + 3 < n and sql[j + 3].isspace():
                k = j + 3
                while k < n and sql[k].isspace():
                    k += 1
                d = k
                while d < n and sql[d].isdigit():
                    d += 1
                if d > k:
                    limit = sql[k:d]
                    out.append(sql[i : i + 6] + " ")
                    i = d
                    continue
            out.append(sql[i : i + 6])
            i += 6
        else:
            out.append(ch)
            i += 1
    text = "".join(out)
    if limit is not None:
        text = text.rstrip().rstrip(";") + f" LIMIT {limit}"
    return text


class ExecutionContext:
    """SQL-string-in, DataFrame-out engine handle.

    >>> ctx = ExecutionContext()
    >>> ctx.register_dir("/root/testdata/sf0.001")
    >>> ctx.execute("SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1")
    """

    def __init__(self, dialect: str = "postgres", spark: SparkSession | None = None):
        self.dialect = get_dialect(dialect)
        self.spark = spark or get_session()
        self.catalog = Catalog(self.spark)
        self._ddl = None  # lazy DdlSession for the statement dispatcher

    @property
    def ddl(self):
        """DdlSession bound to this context's catalog (created on first
        DML/DDL statement — pure SELECT workloads never pay for it)."""
        if self._ddl is None:
            from mesin_spark.dml import DdlSession

            self._ddl = DdlSession(self.spark, catalog=self.catalog)
        return self._ddl

    # -- registration ------------------------------------------------------
    def register_parquet(self, name: str, path: str) -> DataFrame:
        return self.catalog.register_parquet(name, path)

    def register_dir(self, sf_dir: str, tables=TESTDATA_TABLES) -> None:
        self.catalog.register_dir(sf_dir, tables)

    # -- execution ---------------------------------------------------------
    def execute(self, sql: str) -> DataFrame:
        """Parse + plan + (unlike the reference) actually execute.

        Reference parity: empty input errors (src/context.rs:45-47);
        multi-statement input errors (improvement over the silent ``ast[0]``
        truncation at src/context.rs:49).
        """
        stmts = self._split_statements(sql)
        if not stmts:
            raise ValueError("Empty SQL statement")
        if len(stmts) > 1:
            raise ValueError(
                f"Multi-statement input not supported (got {len(stmts)} statements); "
                "execute them one at a time"
            )
        stmt = normalize_dialect(stmts[0], self.dialect)
        from mesin_spark import sql_dml

        if sql_dml.is_dml(stmt):
            # the dispatcher's non-Query arms (src/planner/mod.rs:21-38):
            # INSERT/UPDATE/DELETE/CREATE/DROP/ALTER route to the managed
            # DML tier; CREATE/DROP VIEW and queries stay on spark.sql
            return sql_dml.dispatch(self.ddl, stmt)
        return self.spark.sql(stmt)

    def execute_script(self, sql: str) -> list[DataFrame]:
        """Run a multi-statement script (';'-separated, quote-aware)
        statement by statement, returning each statement's result frame.
        The single-statement ``execute`` stays strict (the reference
        truncates scripts to ``ast[0]`` silently, src/context.rs:49 — we
        make scripts explicit instead of implicit)."""
        stmts = self._split_statements(sql)
        if not stmts:
            raise ValueError("Empty SQL script")
        return [self.execute(s) for s in stmts]

    def explain(self, sql: str) -> str:
        """The reference's terminal stage was a pretty-printed logical plan
        (src/context.rs:53, tmp/select.rs:625-746 ``format_plan``); ours is
        Catalyst's, which includes the optimized + physical plan."""
        df = self.execute(sql)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "extended"
        )

    def sql(self, sql: str) -> DataFrame:
        return self.execute(sql)

    @staticmethod
    def _split_statements(sql: str) -> list[str]:
        """Split on top-level ';' while respecting quoted strings
        (both '' doubling and backslash escapes — Spark's default parser
        accepts 'don\'t', and a ';' inside such a literal must not
        split the statement)."""
        out, buf, quote = [], [], None
        it = iter(range(len(sql)))
        for i in it:
            ch = sql[i]
            if quote:
                buf.append(ch)
                if ch == "\\" and i + 1 < len(sql):
                    buf.append(sql[i + 1])
                    next(it, None)
                    continue
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
                buf.append(ch)
            elif ch == ";":
                if "".join(buf).strip():
                    out.append("".join(buf).strip())
                buf = []
            else:
                buf.append(ch)
        if "".join(buf).strip():
            out.append("".join(buf).strip())
        return out
