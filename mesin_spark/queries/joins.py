"""Wave 2 — joins: the reference's five JoinType variants plus its two
todo!()s (USING, NATURAL) and the semi/anti extension.

Reference parity: SURVEY.md §2.3 — JoinType (common.rs:82-89), AST
conversion (tmp/select.rs:438-447), constraint extraction (:449-471),
left-deep join-tree fold (:273-306).

Scale notes: every dimension side here is broadcast (region/nation are
O(10) rows at any SF; customer/supplier/part grow with SF but remain
dimensions — AQE re-validates broadcastability at runtime). Fact-fact
joins (lineitem↔orders) shuffle on the join key, which is also the
natural co-partitioning key at 100 TB (bucket both by orderkey).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.frame import QueryBuilder
from mesin_spark.queries import T, query
from mesin_spark.queries import R  # stable rounding


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_join_inner(spark, sf_dir):
    """Inner equi-join with arbitrary ON expr (tmp/select.rs:440,456-458)."""
    o = T(spark, sf_dir, "orders").alias("o")
    c = T(spark, sf_dir, "customer").alias("c")
    return (
        QueryBuilder.from_(o)
        .join(F.broadcast(c), F.col("o.o_custkey") == F.col("c.c_custkey"), "inner")
        .where(F.col("c.c_mktsegment") == "BUILDING")
        .select("o.o_orderkey", "o.o_totalprice", "c.c_name", "c.c_mktsegment")
        .to_df()
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON c.c_nationkey = s.s_nationkey AND c.c_acctbal > s.s_acctbal
    """,
)
def q_join_theta(spark, sf_dir):
    """Theta join — predicate is any LogicalExpr (tmp/select.rs:456-458).
    The equi conjunct keeps it a hash join with a residual filter rather
    than a nested-loop join (check the physical plan)."""
    s = T(spark, sf_dir, "supplier").alias("s")
    c = T(spark, sf_dir, "customer").alias("c")
    return s.join(
        c,
        (F.col("c.c_nationkey") == F.col("s.s_nationkey"))
        & (F.col("c.c_acctbal") > F.col("s.s_acctbal")),
    ).select("s.s_suppkey", "c.c_custkey")


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    """,
)
def q_join_left(spark, sf_dir):
    """Left outer join (tmp/select.rs:441) — ON-clause extra predicate to
    produce real null-extension rows."""
    c = T(spark, sf_dir, "customer").alias("c")
    o = T(spark, sf_dir, "orders").alias("o")
    return c.join(
        o,
        (F.col("c.c_custkey") == F.col("o.o_custkey")) & (F.col("o.o_orderstatus") == "F"),
        "left",
    ).select("c.c_custkey", "o.o_orderkey")


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_acctbal
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark, sf_dir):
    """Right outer join (tmp/select.rs:442)."""
    o = T(spark, sf_dir, "orders").alias("o")
    c = T(spark, sf_dir, "customer").alias("c")
    return o.join(c, F.col("o.o_custkey") == F.col("c.c_custkey"), "right").select(
        "o.o_orderkey", "c.c_custkey", "c.c_acctbal"
    )


@query(
    "q_join_full",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk2, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT cn.nk, sn.nk2, cn.n_cust, sn.n_supp
    FROM cn FULL JOIN sn ON cn.nk = sn.nk2
    """,
)
def q_join_full(spark, sf_dir):
    """Full outer join (tmp/select.rs:443) over two aggregated sides so both
    null-extension directions occur."""
    cn = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk2"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.nk == sn.nk2, "full").select("nk", "nk2", "n_cust", "n_supp")


@query(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q_join_cross(spark, sf_dir):
    """Explicit CROSS JOIN, no constraint allowed (tmp/select.rs:444,468)."""
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    return QueryBuilder.from_(r).join(n, how="cross").select("r_name", "n_name").to_df()


@query(
    "q_join_implicit",
    oracle="""
    SELECT c.c_custkey, n.n_name
    FROM customer c, nation n
    WHERE c.c_nationkey = n.n_nationkey
    """,
)
def q_join_implicit(spark, sf_dir):
    """Implicit cross join: FROM a, b folds to Cross with no constraint
    (tmp/select.rs:294-303); the WHERE equi-predicate lets Catalyst rewrite
    filter-over-cross into a real equi-join (verify: physical plan shows
    BroadcastHashJoin, not CartesianProduct)."""
    c = T(spark, sf_dir, "customer").alias("c")
    n = T(spark, sf_dir, "nation").alias("n")
    return (
        QueryBuilder.from_(c, n)
        .where(F.col("c.c_nationkey") == F.col("n.n_nationkey"))
        .select("c.c_custkey", "n.n_name")
        .to_df()
    )


@query(
    "q_join_3way",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_items,
           floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_3way(spark, sf_dir):
    """Left-deep multi-join chain (tmp/select.rs:280-292): lineitem→orders→
    customer, then aggregate. At scale: lineitem↔orders co-partitioned on
    orderkey (one shuffle), customer broadcast."""
    l = T(spark, sf_dir, "lineitem").alias("l")
    o = T(spark, sf_dir, "orders").alias("o")
    c = T(spark, sf_dir, "customer").alias("c")
    return (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(F.broadcast(c), F.col("o.o_custkey") == F.col("c.c_custkey"))
        .groupBy("c.c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            R(F.sum(F.col("l.l_extendedprice") * (1 - F.col("l.l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "q_join_using",
    oracle="""
    SELECT nationkey, n_name, c_name
    FROM (SELECT n_nationkey AS nationkey, n_name FROM nation) a
    JOIN (SELECT c_nationkey AS nationkey, c_name FROM customer) b USING (nationkey)
    """,
)
def q_join_using(spark, sf_dir):
    """JOIN ... USING — finishing the reference's todo! (tmp/select.rs:459-461).
    Spark's list-of-names join emits the USING column once, like SQL."""
    a = T(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"), "n_name")
    b = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"), "c_name")
    return a.join(b, on=["nationkey"]).select("nationkey", "n_name", "c_name")


@query(
    "q_join_natural",
    oracle="""
    SELECT nationkey, n_name, s_name
    FROM (SELECT n_nationkey AS nationkey, n_name FROM nation) a
    NATURAL JOIN (SELECT s_nationkey AS nationkey, s_name FROM supplier) b
    """,
)
def q_join_natural(spark, sf_dir):
    """NATURAL JOIN — finishing the reference's todo! (tmp/select.rs:462-464):
    equi-join on the intersection of column names."""
    a = T(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"), "n_name")
    b = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"), "s_name")
    return (
        QueryBuilder.from_(a).natural_join(b).select("nationkey", "n_name", "s_name").to_df()
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    """,
)
def q_join_semi(spark, sf_dir):
    """Left-semi join (extension beyond the reference, SURVEY.md §2.3 —
    the Spark lowering of EXISTS subqueries)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
)
def q_join_anti(spark, sf_dir):
    """Left-anti join (extension — the Spark lowering of NOT EXISTS):
    customers with no big-ticket order. The price predicate keeps the
    result non-empty at every SF (3/30/308 rows) — in this fixture every
    customer has at least one order, so the bare NOT EXISTS certified a
    vacuous empty result."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")
