"""ExecutionContext lifecycle parity (reference src/context.rs:42-56) +
dialect surface (src/lib.rs:9-23) + QueryBuilder clause semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mesin_spark.context import DIALECTS, ExecutionContext, get_dialect
from mesin_spark.frame import QueryBuilder, sort_key
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ctx(spark):
    c = ExecutionContext(spark=spark)
    c.register_dir(SF_DIR)
    return c


def test_execute_select(ctx):
    rows = ctx.execute("SELECT count(*) AS n FROM lineitem").collect()
    assert rows[0].n == 6000


def test_empty_sql_errors(ctx):
    # reference guard: empty AST → error (context.rs:45-47)
    with pytest.raises(ValueError, match="Empty SQL"):
        ctx.execute("  ;  ")


def test_multi_statement_errors(ctx):
    # documented divergence: reference silently truncates to ast[0]
    # (context.rs:49); we error (SURVEY.md §7.3)
    with pytest.raises(ValueError, match="Multi-statement"):
        ctx.execute("SELECT 1; SELECT 2")


def test_semicolon_in_literal_not_split(ctx):
    assert ctx.execute("SELECT 'a;b' AS s").collect()[0].s == "a;b"


def test_dialect_surface():
    # 11 dialects incl. generic fallback (src/lib.rs:9-23)
    assert len(DIALECTS) == 11
    assert get_dialect("POSTGRES") == "postgres"
    assert get_dialect("no-such-dialect") == "generic"  # _ => generic arm


def test_explain_produces_plan(ctx):
    text = ctx.explain("SELECT l_returnflag FROM lineitem WHERE l_quantity > 10")
    assert "Parsed Logical Plan" in text and "Physical Plan" in text


def test_events_registered_with_usable_timestamps(ctx):
    # ns-timestamp table must be queryable through the public catalog path
    rows = ctx.execute(
        "SELECT count(*) AS n FROM events WHERE ts >= timestamp'2024-01-01 00:00:00'"
    ).collect()
    assert rows[0].n == 1000


# -- QueryBuilder contract -------------------------------------------------
def test_cross_join_rejects_constraint(spark):
    a, b = spark.range(2), spark.range(2)
    with pytest.raises(ValueError, match="CROSS JOIN"):
        QueryBuilder.from_(a).join(b, on=F.lit(True), how="cross")


def test_limit_requires_literals(spark):
    with pytest.raises(ValueError, match="integer literals"):
        QueryBuilder.from_(spark.range(5)).limit("3")  # type: ignore[arg-type]


def test_natural_join_requires_common_columns(spark):
    a = spark.range(2)
    b = spark.range(2).withColumnRenamed("id", "other")
    with pytest.raises(ValueError, match="no common columns"):
        QueryBuilder.from_(a).natural_join(b)


def test_dialect_normalization_pg_casts_and_quotes(spark):
    from mesin_spark.context import normalize_dialect

    assert (
        normalize_dialect("SELECT a::INT FROM t", "postgres")
        == "SELECT CAST(a AS INT) FROM t"
    )
    assert (
        normalize_dialect('SELECT "my col" FROM "t"', "duckdb")
        == "SELECT `my col` FROM `t`"
    )
    # string literals untouched, even containing :: and quotes
    assert (
        normalize_dialect("SELECT 'a::b \"x\"' FROM t", "postgres")
        == "SELECT 'a::b \"x\"' FROM t"
    )
    # parenthesized operand and parameterized type
    assert (
        normalize_dialect("SELECT (a + b)::DECIMAL(10,2) FROM t", "postgres")
        == "SELECT CAST((a + b) AS DECIMAL(10,2)) FROM t"
    )
    # quoted identifier directly cast
    assert (
        normalize_dialect('SELECT "my col"::INT FROM t', "postgres")
        == "SELECT CAST(`my col` AS INT) FROM t"
    )
    # chained casts
    assert (
        normalize_dialect("SELECT a::INT::STRING FROM t", "postgres")
        == "SELECT CAST(CAST(a AS INT) AS STRING) FROM t"
    )
    # non-pg dialects pass through
    assert normalize_dialect('SELECT "q" FROM t', "hive") == 'SELECT "q" FROM t'


def test_dialect_normalization_end_to_end(spark):
    from mesin_spark import ExecutionContext

    ctx = ExecutionContext(dialect="postgres", spark=spark)
    ctx.register_dir("/root/testdata/sf0.001")
    out = ctx.execute(
        'SELECT n_name AS "nation name", n_nationkey::DOUBLE AS k FROM nation ORDER BY k LIMIT 3'
    )
    rows = out.collect()
    assert out.columns == ["nation name", "k"]
    assert [r.k for r in rows] == [0.0, 1.0, 2.0]


def test_reference_smoke_query_runs(spark):
    """The reference's main.rs smoke (`SELECT email, name FROM users`,
    src/main.rs:5-7) against its hardcoded catalog (src/context.rs:19-34)
    must plan and execute here."""
    from mesin_spark import ExecutionContext

    ctx = ExecutionContext(dialect="postgres", spark=spark)
    ctx.catalog.register_demo_catalog()
    out = ctx.execute("SELECT email, name FROM users")
    assert out.columns == ["email", "name"]
    assert out.count() == 0  # reference catalog has schema only, no rows
    joined = ctx.execute(
        "SELECT u.name, count(*) AS n FROM users u JOIN orders o ON u.id = o.user_id GROUP BY u.name"
    )
    assert joined.columns == ["name", "n"]


def test_sort_key_four_combinations(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    asc_nf = [r.v for r in df.orderBy(sort_key("v", True, True)).collect()]
    asc_nl = [r.v for r in df.orderBy(sort_key("v", True, False)).collect()]
    desc_nf = [r.v for r in df.orderBy(sort_key("v", False, True)).collect()]
    desc_nl = [r.v for r in df.orderBy(sort_key("v", False, False)).collect()]
    assert asc_nf == [None, 1, 3]
    assert asc_nl == [1, 3, None]
    assert desc_nf == [None, 3, 1]
    assert desc_nl == [3, 1, None]


def test_string_literal_casts(spark):
    # the most common postgres cast idiom: a string literal operand —
    # the whole literal (honoring '' escapes) is the CAST operand
    from mesin_spark.context import normalize_dialect as nd

    assert nd("SELECT '2024-01-01'::date", "postgres") == "SELECT CAST('2024-01-01' AS date)"
    assert nd("SELECT 'it''s'::varchar", "postgres") == "SELECT CAST('it''s' AS varchar)"
    assert nd("SELECT ''::string", "postgres") == "SELECT CAST('' AS string)"
    # no identifiable operand/type: '::' passes through instead of CAST( AS T)
    assert nd("SELECT ::int", "postgres") == "SELECT ::int"
    assert nd("SELECT x::", "postgres") == "SELECT x::"


def test_string_literal_cast_executes(spark):
    from mesin_spark import ExecutionContext

    ctx = ExecutionContext(dialect="postgres", spark=spark)
    row = ctx.execute("SELECT '2024-01-15'::date AS d, '42'::int AS n").collect()[0]
    assert str(row.d) == "2024-01-15" and row.n == 42


def test_per_dialect_normalization(spark):
    # one behavior check per reference dialect name (src/lib.rs:9-23)
    from mesin_spark.context import normalize_dialect as nd

    pg = "SELECT a::INT FROM t"
    for d in ("postgres", "redshift", "duckdb", "sqlite", "generic", "ansi", "snowflake"):
        assert nd(pg, d) == "SELECT CAST(a AS INT) FROM t", d
    for d in ("hive", "bigquery", "clickhouse", "mysql"):
        assert nd("SELECT `a col` FROM t", d) == "SELECT `a col` FROM t", d
    assert (
        nd("SELECT TOP 5 [col name] FROM [t] WHERE x = 'TOP 3'", "mssql")
        == "SELECT  `col name` FROM `t` WHERE x = 'TOP 3' LIMIT 5"
    )
    assert nd("SELECT TOP 10 * FROM t;", "mssql") == "SELECT  * FROM t LIMIT 10"
    # TOP in a subquery is out of scope: passes through (Spark raises)
    assert nd("SELECT (SELECT TOP 2 x FROM u) FROM t", "mssql").count("TOP") == 1


def test_mssql_top_executes(spark):
    from mesin_spark import ExecutionContext

    ctx = ExecutionContext(dialect="mssql", spark=spark)
    ctx.register_dir("/root/testdata/sf0.001")
    rows = ctx.execute("SELECT TOP 3 n_nationkey FROM nation ORDER BY n_nationkey").collect()
    assert [r.n_nationkey for r in rows] == [0, 1, 2]


def test_normalize_dialect_properties(spark):
    # hypothesis fuzz of the char scanner: literals survive verbatim,
    # cast-free text is untouched, output is idempotent, and no output
    # ever contains the broken "CAST( AS" shape
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mesin_spark.context import normalize_dialect as nd

    ident = st.text("abcxyz_", min_size=1, max_size=6)
    lit = st.text("ab:'\"`() ,.0", max_size=8).map(lambda s: "'" + s.replace("'", "''") + "'")
    atom = st.one_of(
        ident,
        lit,
        st.integers(0, 999).map(str),
        ident.map(lambda s: f'"{s}"'),
        st.tuples(ident, ident).map(lambda t: f"({t[0]} + {t[1]})"),
    )
    casted = st.tuples(atom, st.sampled_from(["INT", "date", "DECIMAL(10,2)", "STRING"])).map(
        lambda t: f"{t[0]}::{t[1]}"
    )
    term = st.one_of(atom, casted)
    sql = st.lists(term, min_size=1, max_size=5).map(lambda ts: "SELECT " + ", ".join(ts))

    @given(sql)
    @settings(max_examples=300, deadline=None)
    def check(s):
        out = nd(s, "postgres")
        assert "CAST( AS" not in out
        assert "::" not in out.replace("'", "")  or "'" in s  # casts rewritten outside literals
        # idempotent: a second pass over cast-free output changes nothing
        again = nd(out, "postgres")
        assert again == out

    check()


def test_normalize_dialect_untouched_when_plain(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mesin_spark.context import normalize_dialect as nd

    plain = st.text(
        st.characters(blacklist_characters=":\"'`"), max_size=60
    )

    @given(plain)
    @settings(max_examples=200, deadline=None)
    def check(s):
        assert nd(s, "postgres") == s

    check()


class TestQualifyRewrite:
    def test_basic(self):
        from mesin_spark.context import _rewrite_qualify

        out = _rewrite_qualify("SELECT a, rn FROM t QUALIFY rn = 1")
        assert out == "SELECT * FROM (SELECT a, rn FROM t) _qualify WHERE rn = 1"

    def test_order_and_limit_move_outside(self):
        from mesin_spark.context import _rewrite_qualify

        out = _rewrite_qualify(
            "SELECT a, rn FROM t QUALIFY rn <= 2 ORDER BY a LIMIT 5"
        )
        assert out == (
            "SELECT * FROM (SELECT a, rn FROM t) _qualify "
            "WHERE rn <= 2 ORDER BY a LIMIT 5"
        )

    def test_literal_and_identifier_untouched(self):
        from mesin_spark.context import _rewrite_qualify

        s = "SELECT 'we QUALIFY leads' AS tag, \"QUALIFY\" FROM t"
        assert _rewrite_qualify(s) == s

    def test_subquery_qualify_untouched(self):
        from mesin_spark.context import _rewrite_qualify

        s = "SELECT * FROM (SELECT a FROM t QUALIFY rn = 1) x"
        assert _rewrite_qualify(s) == s

    def test_word_boundary(self):
        from mesin_spark.context import _rewrite_qualify

        s = "SELECT qualify_flag FROM t WHERE disqualify = 1"
        assert _rewrite_qualify(s) == s

    def test_end_to_end_execute(self, spark):
        from mesin_spark.context import ExecutionContext
        from tests.conftest import SF_DIR

        ctx = ExecutionContext(dialect="snowflake", spark=spark)
        ctx.register_parquet("orders_q", f"{SF_DIR}/orders.parquet")
        rows = ctx.execute(
            """
            SELECT o_custkey,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC) AS rn
            FROM orders_q
            QUALIFY rn = 1
            """
        ).collect()
        assert rows
        assert all(r["rn"] == 1 for r in rows)
        assert len({r["o_custkey"] for r in rows}) == len(rows)


def test_cluster_conf_profile():
    """The deployment profile stays consistent with the local session's
    scale posture: AQE + skew handling on, UTC, Arrow, dimension-sized
    broadcast threshold; partition counts scale with the core budget."""
    from mesin_spark.session import cluster_conf

    conf = cluster_conf(total_cores=4000)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert int(conf["spark.sql.shuffle.partitions"]) == 8000
    assert int(conf["spark.sql.adaptive.coalescePartitions.initialPartitionNum"]) == 16000
    assert conf["spark.sql.session.timeZone"] == "UTC"
    # a smaller cluster scales the shuffle width down with it
    assert int(cluster_conf(total_cores=400)["spark.sql.shuffle.partitions"]) == 800


def test_quantified_rewrites():
    from mesin_spark.context import _rewrite_quantified as rq

    assert (
        rq("WHERE x > ALL (SELECT y FROM u)")
        == "WHERE x > (SELECT max(_qv) FROM (SELECT y FROM u) _quant(_qv))"
    )
    assert rq("WHERE x < ALL (SELECT y FROM u)").count("min(_qv)") == 1
    assert rq("WHERE x >= ANY (SELECT y FROM u)").count("min(_qv)") == 1
    assert rq("WHERE x = SOME (SELECT y FROM u)").endswith("IN (SELECT y FROM u)")
    assert rq("WHERE x <> ALL (SELECT y FROM u)").rstrip().endswith(
        "NOT IN (SELECT y FROM u)"
    )
    # aggregates named any()/some() over columns are NOT subqueries: untouched
    assert rq("HAVING x = any(flag)") == "HAVING x = any(flag)"
    # keywords inside string literals never match
    s = "SELECT 'x > ALL (nope)' FROM t"
    assert rq(s) == s
