"""Window functions — entirely absent from the reference (SURVEY.md §2.5:
no OVER handling anywhere; sqlparser's `over` field ignored at
tmp/select.rs:536-613). Implemented as the Spark extension tier.

Scale note: a window over partitionBy(k) shuffles once on k and sorts
within partitions — same cost shape as a groupBy, no extra passes. Avoid
empty partitionBy (single-partition sort) on big data; every window here
partitions on a real key.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mesin_spark.queries import T, query
from mesin_spark.queries import R  # stable rounding


@query(
    "q_row_number",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rn
    FROM customer
    """,
)
def q_row_number(spark, sf_dir):
    """row_number with a unique tie-break so ranks are deterministic."""
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey")
    )
    return T(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", F.row_number().over(w).alias("rn")
    )


@query(
    "q_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC NULLS LAST) AS rk,
           DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC NULLS LAST) AS drk
    FROM lineitem
    """,
)
def q_rank(spark, sf_dir):
    """rank / dense_rank — ties allowed (rank semantics are the point)."""
    w = W.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc_nulls_last())
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@query(
    "q_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
    FROM orders
    """,
)
def q_lag_lead(spark, sf_dir):
    """lag/lead over each customer's order sequence (unique order key)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "q_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           floor((SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_total
    FROM orders
    """,
)
def q_running_sum(spark, sf_dir):
    """Running sum — explicit ROWS frame; deterministic because the ORDER BY
    key is unique (prefix-sum order is fixed, so rounding matches)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(W.unboundedPreceding, 0)
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        R(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q_window_range",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS n_near_qty
    FROM lineitem
    """,
)
def q_window_range(spark, sf_dir):
    """RANGE frame (value-based window) — counts rows within ±5 quantity."""
    w = W.partitionBy("l_suppkey").orderBy(F.col("l_quantity")).rangeBetween(-5, 5)
    return T(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(w).alias("n_near_qty"),
    )


@query(
    "q_window_stats",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           NTILE(4) OVER w AS quartile,
           floor((PERCENT_RANK() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
           floor((CUME_DIST() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS cume,
           FIRST_VALUE(c_custkey) OVER w AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal ASC NULLS LAST, c_custkey ASC NULLS LAST)
    """,
)
def q_window_stats(spark, sf_dir):
    """Distribution window functions — ntile/percent_rank/cume_dist/
    first_value in one window pass (single shuffle on the partition key)."""
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_last(), F.col("c_custkey").asc_nulls_last()
    )
    return T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        R(F.percent_rank().over(w), 6).alias("pct_rank"),
        R(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rn
        FROM customer
    ) t WHERE rn <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """Top-k per group — the canonical OLAP pattern (window + filter).
    At 100 TB this is one shuffle on the group key; AQE handles skewed
    groups. (A groupBy+slice via applyInPandas would be the escape hatch
    for extreme k or heavy payloads.)"""
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey"))
    return (
        T(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )
