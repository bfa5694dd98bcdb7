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
