"""Planner-parity tests — the reference's 7 unit tests (tmp/crud.txt:859-1010)
re-expressed at execution level, plus plan-shape assertions for the two
semantic lowerings the reference performs (HAVING→Filter-above-Aggregate,
comma-FROM→cross join). Test catalog mirrors create_test_catalog
(tmp/crud.txt:864-869): users(id,name,email), orders(id,user_id,total)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mesin_spark.catalog import CatalogError
from mesin_spark.dml import ColumnDefinition, DdlSession
from mesin_spark.frame import QueryBuilder


@pytest.fixture()
def sess(spark, tmp_path):
    s = DdlSession(spark, base_dir=str(tmp_path))
    s.create_table(
        "users",
        [
            ColumnDefinition("id", "BIGINT", primary_key=True),
            ColumnDefinition("name", "VARCHAR(100)"),
            ColumnDefinition("email", "TEXT"),
        ],
    )
    s.create_table(
        "orders",
        [
            ColumnDefinition("id", "BIGINT", primary_key=True),
            ColumnDefinition("user_id", "BIGINT"),
            ColumnDefinition("total", "DOUBLE"),
        ],
    )
    return s


def test_insert_values(sess):
    # reference test_insert_values (tmp/crud.txt:871-889): multi-row INSERT
    # with column list; missing columns → NULL
    t = sess.table("users")
    t.insert_values([(1, "Alice", "alice@example.com"), (2, "Bob", "bob@example.com")])
    t.insert_values([(3, "Carol")], columns=["id", "name"])
    rows = {r.id: r for r in t.df().collect()}
    assert rows[1].name == "Alice" and rows[2].email == "bob@example.com"
    assert rows[3].email is None


def test_update_with_where(sess):
    # reference test_update_with_where (tmp/crud.txt:891-909)
    t = sess.table("orders")
    t.insert_values([(1, 10, 100.0), (2, 20, 200.0)])
    t.update({"total": "total + 1.0"}, where="user_id = 20")
    rows = {r.id: r.total for r in t.df().collect()}
    assert rows == {1: 100.0, 2: 201.0}


def test_update_without_where_hits_all(sess):
    t = sess.table("orders")
    t.insert_values([(1, 10, 100.0), (2, 20, 200.0)])
    t.update({"total": F.lit(0.0)})
    assert {r.total for r in t.df().collect()} == {0.0}


def test_create_table(sess):
    # reference test_create_table (tmp/crud.txt:911-932): the canonical
    # products DDL — col count, PK flag, NOT NULL captured
    sess.create_table(
        "products",
        [
            ColumnDefinition("id", "INTEGER", primary_key=True),
            ColumnDefinition("name", "VARCHAR(100)", nullable=False),
            ColumnDefinition("price", "FLOAT", default=0.0),
        ],
    )
    cols = sess.catalog.tables["products"].properties["columns"]
    assert len(cols) == 3
    assert cols[0]["primary_key"] is True and cols[0]["nullable"] is False
    assert cols[1]["nullable"] is False
    assert cols[2]["default"] == 0.0
    with pytest.raises(CatalogError):
        sess.create_table("products", [ColumnDefinition("id", "INTEGER")])


def test_create_index(sess):
    # reference test_create_index (tmp/crud.txt:934-953): unique flag,
    # column capture, auto-name fallback idx_{table}_{cols}
    m1 = sess.create_index("users", ["email"], unique=True, name="uniq_email")
    m2 = sess.create_index("users", ["name"])
    assert m1.unique and m1.columns == ["email"]
    assert m2.name == "idx_users_name" and not m2.unique
    with pytest.raises(CatalogError):
        sess.create_index("missing_table", ["x"])


def test_drop_table(sess):
    # reference test_drop_table (tmp/crud.txt:955-972): multi, IF EXISTS,
    # CASCADE over dependent indexes
    sess.create_index("users", ["email"])
    with pytest.raises(CatalogError):
        sess.drop_table("users")  # dependent index, no CASCADE
    sess.drop_table("users", cascade=True)
    assert "users" not in sess.catalog
    assert not sess.catalog.indexes
    with pytest.raises(CatalogError):
        sess.drop_table("users")
    sess.drop_table("users", if_exists=True)  # tolerated


def test_drop_index(sess):
    # reference test_drop_index (tmp/crud.txt:974-991)
    sess.create_index("users", ["email"], name="idx_e")
    sess.drop_index("idx_e")
    assert "idx_e" not in sess.catalog.indexes
    with pytest.raises(CatalogError):
        sess.drop_index("idx_e")
    sess.drop_index("idx_e", if_exists=True)


def test_delete_with_where(sess):
    # reference test_delete_with_where (tmp/crud.txt:993-1009)
    t = sess.table("orders")
    t.insert_values([(1, 10, 50.0), (2, 20, 500.0), (3, 10, 5.0)])
    t.delete("total < 100.0")
    assert sorted(r.id for r in t.df().collect()) == [2]
    t.delete()  # DELETE without WHERE → empty table, schema kept
    assert t.df().count() == 0
    assert t.df().columns == ["id", "user_id", "total"]


# -- plan-shape parity -----------------------------------------------------
def test_having_is_filter_above_aggregate(spark):
    # HAVING lowered to plain Filter above Aggregate (tmp/select.rs:213-220)
    df = spark.range(10).withColumn("k", F.col("id") % 2)
    q = (
        QueryBuilder(df)
        .group_by("k")
        .agg(F.sum("id").alias("s"))
        .having(F.col("s") > 3)
        .to_df()
    )
    analyzed = q._jdf.queryExecution().analyzed().toString()
    assert analyzed.index("Filter") < analyzed.index("Aggregate")


def test_comma_from_becomes_cross_join(spark):
    # FROM a, b → cross join with no constraint (tmp/select.rs:294-303)
    a, b = spark.range(3), spark.range(4).withColumnRenamed("id", "id2")
    q = QueryBuilder.from_(a, b).to_df()
    assert q.count() == 12
    analyzed = q._jdf.queryExecution().analyzed().toString()
    assert "Join Cross" in analyzed


def test_filter_over_cross_optimized_to_real_join(spark):
    # Catalyst pulls the filter into the join condition; the *physical*
    # plan must pick a hash join, not a cartesian product (SURVEY.md §2.3)
    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")
    q = QueryBuilder.from_(a, b).where(F.col("x") == F.col("y")).to_df()
    optimized = q._jdf.queryExecution().optimizedPlan().toString()
    assert "(x#" in optimized and "= y#" in optimized  # condition attached
    physical = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    assert "HashJoin" in physical


def test_update_rhs_sees_pre_update_values(sess):
    # SQL UPDATE semantics: every RHS evaluates against the PRE-update row,
    # so SET user_id=total, total=user_id swaps (sequential withColumn
    # would make total = new user_id = old total — a no-op on total)
    t = sess.table("orders")
    t.insert_values([(1, 10, 100.0), (2, 20, 200.0)])
    t.update({"user_id": "CAST(total AS BIGINT)", "total": "CAST(user_id AS DOUBLE)"})
    rows = {r.id: (r.user_id, r.total) for r in t.df().collect()}
    assert rows == {1: (100, 10.0), 2: (200, 20.0)}


def test_update_unknown_column_errors(sess):
    t = sess.table("orders")
    t.insert_values([(1, 10, 100.0)])
    with pytest.raises(ValueError, match="non-existent"):
        t.update({"nope": "1"})


def test_dml_preserves_table_metadata(sess):
    # INSERT/UPDATE/DELETE must not wipe constraints/properties recorded by
    # CREATE TABLE (TableMeta is mutated, not replaced, on refresh)
    meta = sess.catalog.tables["orders"]
    cols_before = meta.properties["columns"]
    t = sess.table("orders")
    t.insert_values([(1, 10, 100.0), (2, 20, 200.0)])
    t.update({"total": "total * 2"}, where="id = 1")
    t.delete("id = 2")
    meta_after = sess.catalog.tables["orders"]
    assert meta_after.properties["columns"] == cols_before
    assert meta_after.constraints == meta.constraints
