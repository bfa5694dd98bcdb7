"""Wave 3 — aggregation: GROUP BY + the reference's five aggregate
functions, DISTINCT flag, HAVING, global aggregates, plus the
rollup/cube/approx extension tier.

Reference parity: SURVEY.md §2.4 — Aggregate node (logical_plan.rs:41-45,
tmp/select.rs:201-211), AggregateFunction enum (common.rs:14-21), distinct
flag (common.rs:54), HAVING as plain Filter above Aggregate
(tmp/select.rs:213-220).

All double-sums are rounded identically on both sides: Spark's partial
(map-side) + final aggregation sums in partition order, DuckDB in its own
order — bit-identical doubles are not guaranteed, rounded ones are.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.frame import QueryBuilder
from mesin_spark.functions import aggregate_function
from mesin_spark.queries import T, query, register_views
from mesin_spark.queries import R  # stable rounding


@query(
    "q_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby(spark, sf_dir):
    """Aggregate {group_expr, aggr_expr} (tmp/select.rs:201-211,395-426).
    Hash aggregation with map-side partial combine — the shuffle moves one
    row per (group × partition), not per input row."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_count",
    oracle="""
    SELECT o_orderstatus,
           count(o_orderkey) AS n_keys,
           count(NULLIF(o_orderpriority, '1-URGENT')) AS n_not_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_count(spark, sf_dir):
    """COUNT(col) — null-skipping semantics exercised via NULLIF
    (common.rs:16; build tmp/select.rs:539-582)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("o_orderkey").alias("n_keys"),
            F.count(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))).alias("n_not_urgent"),
        )
    )


@query(
    "q_count_star",
    oracle="SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
)
def q_count_star(spark, sf_dir):
    """COUNT(*) via the Wildcard argument (tmp/select.rs:557-559)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(aggregate_function("COUNT").alias("n"))
    )


@query(
    "q_sum",
    oracle="""
    SELECT l_returnflag,
           floor((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           floor((SUM(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS sum_net
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_sum(spark, sf_dir):
    """SUM over columns and expressions (common.rs:17)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            R(F.sum("l_quantity"), 2).alias("sum_qty"),
            R(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_net"
            ),
        )
    )


@query(
    "q_min_max",
    oracle="""
    SELECT c_nationkey, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
           MIN(c_name) AS first_name, MAX(c_name) AS last_name
    FROM customer GROUP BY c_nationkey
    """,
)
def q_min_max(spark, sf_dir):
    """MIN/MAX on numeric and string columns (common.rs:18-19). Min/max of
    doubles are order-insensitive — no rounding needed."""
    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.min("c_name").alias("first_name"),
            F.max("c_name").alias("last_name"),
        )
    )


@query(
    "q_avg",
    oracle="""
    SELECT l_linestatus, floor((AVG(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
           floor((AVG(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_avg(spark, sf_dir):
    """AVG (common.rs:20)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            R(F.avg("l_quantity"), 6).alias("avg_qty"),
            R(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           CAST(SUM(DISTINCT l_linenumber) AS BIGINT) AS sum_distinct_ln
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_count_distinct(spark, sf_dir):
    """DISTINCT aggregate flag (common.rs:54, tmp/select.rs:580). At scale
    count-distinct expands to a two-stage dedup-then-count plan; prefer
    q_approx_distinct when exactness isn't required."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.sum_distinct(F.col("l_linenumber").cast("long")).alias("sum_distinct_ln"),
        )
    )


@query(
    "q_global_agg",
    oracle="""
    SELECT count(*) AS n_rows,
           floor((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total,
           floor((AVG(o_totalprice)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders
    """,
)
def q_global_agg(spark, sf_dir):
    """Global aggregate, no GROUP BY — the reference can't reach this shape
    (Aggregate only created when group_by non-empty, tmp/select.rs:201-211);
    we implement it properly and document the divergence (SURVEY.md §2.4)."""
    return (
        QueryBuilder.from_(T(spark, sf_dir, "orders"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            R(F.sum("o_totalprice"), 2).alias("total"),
            R(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .to_df()
    )


@query(
    "q_having",
    oracle="""
    SELECT o_custkey, floor((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_spent, count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING SUM(o_totalprice) > 500000.0
    """,
)
def q_having(spark, sf_dir):
    """HAVING = plain Filter above Aggregate, no agg-ref rewrite
    (tmp/select.rs:213-220) — we filter on a pre-round alias to mirror the
    oracle's HAVING-on-raw-SUM semantics exactly."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("_raw_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("_raw_total") > 500000.0)
        .select(
            "o_custkey",
            R(F.col("_raw_total"), 2).alias("total_spent"),
            "n_orders",
        )
    )


# -- extension tier --------------------------------------------------------
@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n, floor((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    """ROLLUP — beyond the reference ("Complex GROUP BY expressions not
    supported yet", tmp/select.rs:402); Spark computes all grouping sets in
    one pass with a single shuffle (Expand operator)."""
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), R(F.sum("l_quantity"), 2).alias("qty"))
    )


@query(
    "q_stats_agg",
    oracle="""
    SELECT l_returnflag,
           floor((stddev_samp(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS sd_qty,
           floor((var_samp(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS var_qty,
           floor((corr(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS corr_qp,
           floor((covar_samp(l_quantity, l_extendedprice)) * 100.0 + 0.5) / 100.0 AS cov_qp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark, sf_dir):
    """Statistical aggregates — stddev/variance/correlation/covariance in
    one partial/final hash-aggregate pass (extension; the reference's
    aggregate menu stops at COUNT/SUM/MIN/MAX/AVG)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            R(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            R(F.var_samp("l_quantity"), 6).alias("var_qty"),
            R(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            R(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qp"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (extension, SURVEY.md §2.4 — the reference
    bails on any complex GROUP BY). One Expand + one shuffle for all sets."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        """
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, CAST(l_quantity AS DOUBLE) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
    """,
)
def q_unpivot(spark, sf_dir):
    """UNPIVOT/melt — wide measure columns to (metric, val) rows. Spark's
    Unpivot operator is pure map-side Expand: no shuffle, linear scan."""
    li = T(spark, sf_dir, "lineitem")
    casted = li.select(
        "l_orderkey",
        "l_linenumber",
        *[F.col(c).cast("double").alias(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")],
    )
    return casted.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark, sf_dir):
    """CUBE — all 2^k grouping sets in one shuffle (extension, SURVEY.md §2.4)."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("q_approx_distinct")  # rows-only: HLL sketches differ engine-to-engine by design
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB answer to
    count-distinct: one pass, fixed memory, no dedup shuffle. Not
    oracle-hash-comparable (different sketch implementations); accuracy is
    asserted in tests/test_aggregates.py against the exact count."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"))
    )


@query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           floor((median(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS median_price,
           floor((quantile_cont(l_extendedprice, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile(spark, sf_dir):
    """Exact percentiles (extension). Spark's percentile() matches DuckDB's
    quantile_cont (linear interpolation). percentile_approx is the sketch
    variant for 100 TB (not hash-comparable, see q_approx_distinct)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            R(F.percentile(F.col("l_extendedprice"), F.lit(0.5)), 4).alias("median_price"),
            R(F.percentile(F.col("l_extendedprice"), F.lit(0.9)), 4).alias("p90_price"),
        )
    )
