"""Wave 1 — scans, projection, filters, predicates, sort, limit, top-k.

Reference parity: SURVEY.md §2.1, §2.2, §2.6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.frame import QueryBuilder, sort_key
from mesin_spark.queries import T, query
from mesin_spark.queries import R  # stable rounding


# -- §2.1 scans ------------------------------------------------------------
@query(
    "q_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan(spark, sf_dir):
    """TableScan (reference logical_plan.rs:13-17; tmp/select.rs:338-364):
    resolve table, emit scan with the full column list."""
    return T(spark, sf_dir, "region")


@query(
    "q_wildcard",
    oracle="SELECT * FROM nation",
)
def q_wildcard(spark, sf_dir):
    """SELECT * (projection wildcard, tmp/select.rs:318-322)."""
    return T(spark, sf_dir, "nation").select("*")


@query(
    "q_qualified_wildcard",
    oracle="""
    SELECT n.* FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    """,
)
def q_qualified_wildcard(spark, sf_dir):
    """SELECT t.* (qualified wildcard, tmp/select.rs:323-331)."""
    n = T(spark, sf_dir, "nation").alias("n")
    r = T(spark, sf_dir, "region").alias("r")
    return (
        n.join(F.broadcast(r), F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .filter(F.col("r.r_name") == "ASIA")
        .select("n.*")
    )


# -- §2.2 projection / filter ---------------------------------------------
@query(
    "q_project",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def q_project(spark, sf_dir):
    """Projection of plain columns (tmp/select.rs:308-336). Catalyst prunes
    the parquet scan to exactly these three columns (check: ReadSchema)."""
    return T(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "q_alias",
    oracle="""
    SELECT o_orderkey AS okey, o_totalprice AS price,
           floor((o_totalprice * 1.1) * 100.0 + 0.5) / 100.0 AS price_with_markup
    FROM orders
    """,
)
def q_alias(spark, sf_dir):
    """Aliased projection expressions (ExprWithAlias, tmp/select.rs:313-317)."""
    return T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        R(F.col("o_totalprice") * 1.1, 2).alias("price_with_markup"),
    )


@query(
    "q_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 25 AND l_discount < 0.05
    """,
)
def q_filter(spark, sf_dir):
    """WHERE → Filter (logical_plan.rs:22-25, tmp/select.rs:192-199).
    Both conjuncts push down into the parquet scan (PushedFilters)."""
    return (
        QueryBuilder.from_(T(spark, sf_dir, "lineitem"))
        .where((F.col("l_quantity") > 25) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .to_df()
    )


@query(
    "q_select_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def q_select_distinct(spark, sf_dir):
    """Query-level SELECT DISTINCT — a DOCUMENTED DIVERGENCE from the
    reference (the global-agg-quirk treatment, SURVEY §2.2): sqlparser
    populates `select.distinct`, but plan_query_body never consults it
    (tmp/select.rs:186-230 builds Projection/Filter/Aggregate only; only
    the aggregate-argument flag `func.distinct` at tmp/select.rs:580 is
    used), so the reference would silently return duplicate rows. We
    implement the standard semantics: projection then dropDuplicates —
    Catalyst plans it as a partial/final HashAggregate on the projected
    columns (map-side dedup before the exchange, the scale-correct
    shape), and the scan reads ONLY the two projected columns."""
    return (
        T(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .dropDuplicates()
    )


@query(
    "q_pred_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice + l_tax AS add_col,
           l_extendedprice - l_discount AS sub_col,
           floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) / 10000.0 AS mul_col,
           floor((l_extendedprice / l_quantity) * 10000.0 + 0.5) / 10000.0 AS div_col,
           l_linenumber % 3 AS mod_col
    FROM lineitem WHERE l_quantity > 0
    """,
)
def q_pred_arith(spark, sf_dir):
    """Binary arithmetic operators +,-,*,/,% — full sqlparser BinaryOperator
    passthrough (common.rs:43-47, tmp/select.rs:531-535)."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 0).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") + F.col("l_tax")).alias("add_col"),
        (F.col("l_extendedprice") - F.col("l_discount")).alias("sub_col"),
        R(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("mul_col"),
        R(F.col("l_extendedprice") / F.col("l_quantity"), 4).alias("div_col"),
        (F.col("l_linenumber") % 3).alias("mod_col"),
    )


@query(
    "q_pred_bool",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_orderstatus = 'O')
      AND NOT (o_totalprice < 1000.0)
      AND o_orderpriority <> '1-URGENT'
    """,
)
def q_pred_bool(spark, sf_dir):
    """Boolean operators AND/OR/NOT, =, <>, comparisons (common.rs:43-47)."""
    o = T(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_orderstatus") == "O"))
        & ~(F.col("o_totalprice") < 1000.0)
        & (F.col("o_orderpriority") != "1-URGENT")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# -- §2.6 sort / limit / top-k --------------------------------------------
@query(
    "q_sort",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST
    """,
)
def q_sort(spark, sf_dir):
    """Sort with per-key asc + nulls_first (logical_plan.rs:37-40,
    SortExpr common.rs:29-34; reference defaults asc=true nulls_first=false,
    spelled out explicitly on both sides per SURVEY.md §2.6)."""
    return (
        QueryBuilder.from_(T(spark, sf_dir, "customer"))
        .select("c_custkey", "c_name", "c_acctbal")
        .order_by(("c_acctbal", False, False), ("c_custkey", True, False))
        .to_df()
    )


@query(
    "q_sort_nulls",
    oracle="""
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    ORDER BY seg ASC NULLS FIRST, c_custkey DESC NULLS FIRST
    """,
)
def q_sort_nulls(spark, sf_dir):
    """Null-ordering matrix: ASC NULLS FIRST + DESC NULLS FIRST on a
    genuinely-nullable expression (nulls manufactured via NULLIF since the
    testdata has none)."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    ).orderBy(sort_key("seg", True, True), sort_key("c_custkey", False, True))


@query(
    "q_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey ASC NULLS LAST LIMIT 100",
)
def q_limit(spark, sf_dir):
    """Limit {skip:None, fetch:100} (logical_plan.rs:32-36). Ordered by the
    unique key so the row *set* is deterministic."""
    return (
        QueryBuilder.from_(T(spark, sf_dir, "orders"))
        .select("o_orderkey", "o_totalprice")
        .order_by(("o_orderkey", True, False))
        .limit(100)
        .to_df()
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey ASC NULLS LAST LIMIT 50 OFFSET 100
    """,
)
def q_limit_offset(spark, sf_dir):
    """LIMIT 50 OFFSET 100 (tmp/select.rs:170-180; literals only)."""
    return (
        QueryBuilder.from_(T(spark, sf_dir, "orders"))
        .select("o_orderkey", "o_totalprice")
        .order_by(("o_orderkey", True, False))
        .limit(50, skip=100)
        .to_df()
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST LIMIT 10
    """,
)
def q_topk(spark, sf_dir):
    """Top-k = Sort→Limit composition (tmp/select.rs:161-180). Catalyst
    fuses this into TakeOrderedAndProject — no full sort at scale: each
    partition keeps a k-heap, the driver merges k·numPartitions rows."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(sort_key("o_totalprice", False, False), sort_key("o_orderkey", True, False))
        .limit(10)
    )
