"""Wave 5 — CRUD/DDL as oracle-checked queries (SURVEY.md §2.12).

Each query materializes a scratch copy (never touching /root/testdata),
applies the statement through mesin_spark.dml, and returns the resulting
table state; the oracle expresses the same end-state as pure SQL over the
original views (INSERT → UNION ALL VALUES, UPDATE → CASE, DELETE → negated
WHERE, DDL → VALUES of the expected catalog state).
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from mesin_spark.dml import ColumnDefinition, DdlSession
from mesin_spark.queries import T, query, scratch_dir
from mesin_spark.queries import R  # stable rounding


def _scratch(spark, sf_dir, table) -> tuple[DdlSession, "ManagedTable"]:  # noqa: F821
    base = scratch_dir(prefix=f"mesin_dml_{table}_")
    sess = DdlSession(spark, base_dir=base)
    mt = sess.import_parquet(f"scratch_{table}", os.path.join(sf_dir, f"{table}.parquet"))
    return sess, mt


@query(
    "q_insert",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    UNION ALL
    SELECT * FROM (VALUES (100, 'ATLANTIS', 0), (101, 'ELDORADO', 1)) t(n_nationkey, n_name, n_regionkey)
    """,
)
def q_insert(spark, sf_dir):
    """INSERT VALUES — multi-row, full column list (tmp/crud.txt:178-221;
    reference test test_insert_values :871-889)."""
    _, mt = _scratch(spark, sf_dir, "nation")
    mt.insert_values(
        [(100, "ATLANTIS", 0), (101, "ELDORADO", 1)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    return mt.df().select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_insert_select",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    UNION ALL
    SELECT n_nationkey + 200, CONCAT('COPY-', n_name), n_regionkey
    FROM nation WHERE n_regionkey = 0
    """,
)
def q_insert_select(spark, sf_dir):
    """INSERT ... SELECT with an attached source plan (tmp/crud.txt:192-200)."""
    _, mt = _scratch(spark, sf_dir, "nation")
    src = (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(
            (F.col("n_nationkey") + 200).alias("n_nationkey"),
            F.concat(F.lit("COPY-"), F.col("n_name")).alias("n_name"),
            "n_regionkey",
        )
    )
    mt.insert_select(src)
    return mt.df().select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_update",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_mktsegment = 'BUILDING'
                THEN floor((c_acctbal * 1.1) * 100.0 + 0.5) / 100.0 ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM customer
    """,
)
def q_update(spark, sf_dir):
    """UPDATE SET ... WHERE (tmp/crud.txt:223-279; reference test
    test_update_with_where :891-909). Copy-on-write rewrite + atomic swap."""
    _, mt = _scratch(spark, sf_dir, "customer")
    mt.update(
        {"c_acctbal": "floor((c_acctbal * 1.1) * 100.0 + 0.5) / 100.0"},
        where="c_mktsegment = 'BUILDING'",
    )
    return mt.df().select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


@query(
    "q_delete",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 150000.0)
    """,
)
def q_delete(spark, sf_dir):
    """DELETE WHERE (tmp/crud.txt:480-504; reference test
    test_delete_with_where :993-1009)."""
    _, mt = _scratch(spark, sf_dir, "orders")
    mt.delete("o_orderstatus = 'F' AND o_totalprice < 150000.0")
    return mt.df().select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@query(
    "q_create_table",
    oracle="""
    SELECT * FROM (VALUES
        ('id', 'INTEGER', false, true),
        ('name', 'VARCHAR(100)', false, false),
        ('price', 'FLOAT', true, false)
    ) t(col_name, data_type, nullable, primary_key)
    """,
)
def q_create_table(spark, sf_dir):
    """CREATE TABLE products (id INTEGER PRIMARY KEY, name VARCHAR(100) NOT
    NULL, price FLOAT DEFAULT 0.0) — the reference's canonical DDL fixture
    (tmp/crud.txt:916; test test_create_table :911-932). Returns the
    recorded column metadata."""
    sess = DdlSession(spark, base_dir=scratch_dir("mesin_ddl_"))
    sess.create_table(
        "products",
        [
            ColumnDefinition("id", "INTEGER", primary_key=True),
            ColumnDefinition("name", "VARCHAR(100)", nullable=False),
            ColumnDefinition("price", "FLOAT", default=0.0),
        ],
    )
    cols = sess.catalog.tables["products"].properties["columns"]
    rows = [
        Row(col_name=c["name"], data_type=c["data_type"], nullable=c["nullable"], primary_key=c["primary_key"])
        for c in cols
    ]
    return spark.createDataFrame(rows)


@query(
    "q_create_index",
    oracle="""
    SELECT * FROM (VALUES
        ('idx_scratch_orders_o_custkey', 'scratch_orders', 'o_custkey', false),
        ('uniq_okey', 'scratch_orders', 'o_orderkey', true)
    ) t(index_name, table_name, columns, is_unique)
    """,
)
def q_create_index(spark, sf_dir):
    """CREATE [UNIQUE] INDEX incl. the auto-name fallback
    (tmp/crud.txt:312-347; reference test test_create_index :934-953).
    Metadata + layout advice (table file clustered on the indexed column so
    parquet min/max pruning becomes effective)."""
    sess, _ = _scratch(spark, sf_dir, "orders")
    sess.create_index("scratch_orders", ["o_custkey"], apply_layout=True)
    sess.create_index("scratch_orders", ["o_orderkey"], name="uniq_okey", unique=True)
    rows = [
        Row(index_name=m.name, table_name=m.table, columns=",".join(m.columns), is_unique=m.unique)
        for m in sess.catalog.indexes.values()
    ]
    return spark.createDataFrame(rows)


@query(
    "q_drop_table",
    oracle="SELECT * FROM (VALUES ('t_keep')) t(table_name)",
)
def q_drop_table(spark, sf_dir):
    """DROP TABLE multi / IF EXISTS / CASCADE (tmp/crud.txt:349-371;
    reference test test_drop_table :955-972): t_a + t_b dropped (t_b with a
    dependent index via CASCADE), missing table tolerated by IF EXISTS."""
    sess = DdlSession(spark, base_dir=scratch_dir("mesin_ddl_"))
    for t in ("t_a", "t_b", "t_keep"):
        sess.create_table(t, [ColumnDefinition("id", "BIGINT")])
    sess.create_index("t_b", ["id"])
    sess.drop_table("t_a")
    sess.drop_table("t_b", cascade=True)
    sess.drop_table("t_missing", if_exists=True)
    rows = [Row(table_name=n) for n in sorted(sess.catalog.tables)]
    return spark.createDataFrame(rows)


@query(
    "q_drop_index",
    oracle="SELECT * FROM (VALUES ('idx_keep')) t(index_name)",
)
def q_drop_index(spark, sf_dir):
    """DROP INDEX + IF EXISTS tolerance (tmp/crud.txt:372-383; reference
    test test_drop_index :974-991)."""
    sess = DdlSession(spark, base_dir=scratch_dir("mesin_ddl_"))
    sess.create_table("t_x", [ColumnDefinition("id", "BIGINT"), ColumnDefinition("v", "DOUBLE")])
    sess.create_index("t_x", ["id"], name="idx_gone")
    sess.create_index("t_x", ["v"], name="idx_keep")
    sess.drop_index("idx_gone")
    sess.drop_index("idx_never_existed", if_exists=True)
    rows = [Row(index_name=n) for n in sorted(sess.catalog.indexes)]
    return spark.createDataFrame(rows)


@query(
    "q_sql_script",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'widget', CAST(3 AS BIGINT), 10.5),
        (CAST(2 AS BIGINT), 'gadget', CAST(5 AS BIGINT), 7.25)
    ) t(item_id, item_name, qty, price)
    """,
)
def q_sql_script(spark, sf_dir):
    """The reference's whole statement surface as ONE SQL script through
    ExecutionContext.execute_script (mesin_spark/sql_dml.py dispatcher):
    CREATE TABLE → INSERT VALUES → UPDATE (pre-image semantics) →
    DELETE → final SELECT. The reference can only pretty-print each of
    these plans (src/context.rs:53); here the script executes and the
    final state is oracle-checked against the hand-computed constant
    result. Each mutation is a bounded copy-on-write on a scratch table
    — scan-scaled, never row-at-a-time."""

    from mesin_spark.context import ExecutionContext

    ctx = ExecutionContext(spark=spark)
    ctx._ddl = DdlSession(
        spark, catalog=ctx.catalog, base_dir=scratch_dir(prefix="mesin_script_")
    )
    results = ctx.execute_script(
        """
        CREATE TABLE inventory (
            item_id BIGINT PRIMARY KEY,
            item_name STRING NOT NULL,
            qty BIGINT,
            price DOUBLE
        );
        INSERT INTO inventory VALUES
            (1, 'widget', 2, 10.5),
            (2, 'gadget', 5, 7.25),
            (3, 'doohickey', 0, 99.0);
        UPDATE inventory SET qty = qty + 1 WHERE item_name = 'widget';
        DELETE FROM inventory WHERE qty = 0;
        SELECT item_id, item_name, qty, price FROM inventory ORDER BY item_id
        """
    )
    return results[-1]
