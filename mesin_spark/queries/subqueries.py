"""Wave 4 — CTEs, derived tables, scalar subqueries, nested bodies.

Reference parity: SURVEY.md §2.9 — With/CTE planning (tmp/select.rs:49-52,
246-271), SubqueryAlias (:45-48,346-353,373-376), scalar subquery
(common.rs:64-66, tmp/select.rs:614-619), nested query body (:231-234).

CTE scoping note: the reference leaks cte_tables across statements
(tmp/select.rs:124, never cleared); Spark scopes WITH per query — we keep
the correct behavior (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.context import ExecutionContext
from mesin_spark.queries import T, query, register_views


@query(
    "q_cte",
    oracle="""
    WITH big_cust AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000.0
    )
    SELECT c_name, c_acctbal FROM big_cust WHERE c_acctbal < 9000.0
    """,
)
def q_cte(spark, sf_dir):
    """WITH — planned via the engine's SQL entry point (ExecutionContext.execute
    ≈ reference context.rs:42-56); Spark inlines the CTE during analysis just
    like the reference's clone-inline (tmp/select.rs:345-354)."""
    register_views(spark, sf_dir, "customer")
    ctx = ExecutionContext(spark=spark)
    return ctx.execute(
        """
        WITH big_cust AS (
            SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000.0
        )
        SELECT c_name, c_acctbal FROM big_cust WHERE c_acctbal < 9000.0
        """
    )


@query(
    "q_cte_multi",
    oracle="""
    WITH fr AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1),
         cust_n AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey)
    SELECT fr.n_name, cust_n.n_cust
    FROM fr JOIN cust_n ON fr.n_nationkey = cust_n.c_nationkey
    """,
)
def q_cte_multi(spark, sf_dir):
    """Multiple CTEs in one WITH, planned in order (tmp/select.rs:250-257);
    a later CTE may reference an earlier one."""
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        WITH fr AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1),
             cust_n AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey)
        SELECT fr.n_name, cust_n.n_cust
        FROM fr JOIN cust_n ON fr.n_nationkey = cust_n.c_nationkey
        """
    )


@query(
    "q_derived",
    oracle="""
    SELECT t.seg, t.n FROM (
        SELECT c_mktsegment AS seg, count(*) AS n FROM customer GROUP BY c_mktsegment
    ) t WHERE t.n > 0
    """,
)
def q_derived(spark, sf_dir):
    """Derived table with required alias → SubqueryAlias
    (tmp/select.rs:366-377; alias-missing is an error there — the DataFrame
    API enforces composition instead)."""
    inner = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"))
        .alias("t")
    )
    return inner.filter(F.col("t.n") > 0).select("t.seg", "t.n")


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def q_scalar_subquery(spark, sf_dir):
    """Scalar subquery in a predicate (common.rs:64-66; stored raw by the
    reference with no decorrelation, tmp/select.rs:614-619 — Catalyst's
    RewriteCorrelatedScalarSubquery handles the general case for free)."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """
    )


@query(
    "q_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery (extension — the reference stores
    subqueries raw with no correlation analysis; Catalyst decorrelates into
    an aggregate + join)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o_totalprice > (
            SELECT 2 * AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_nested",
    oracle="""
    SELECT seg, n FROM (
        SELECT seg, count(*) AS n FROM (
            SELECT c_mktsegment AS seg FROM customer WHERE c_acctbal > 0.0
        ) inner1 GROUP BY seg
    ) outer1 WHERE n >= 1
    """,
)
def q_nested(spark, sf_dir):
    """Nested query body — SetExpr::Query recursion (tmp/select.rs:231-234)."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT seg, n FROM (
            SELECT seg, count(*) AS n FROM (
                SELECT c_mktsegment AS seg FROM customer WHERE c_acctbal > 0.0
            ) inner1 GROUP BY seg
        ) outer1 WHERE n >= 1
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def q_in_subquery(spark, sf_dir):
    """IN (subquery) — absent in the reference (Expr arm hits the catch-all
    bail!, tmp/select.rs:621); lowered by Catalyst to a left-semi join."""
    register_views(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )
