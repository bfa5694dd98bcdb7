"""TPC-H-derived flagship queries (SURVEY.md §5.2 item 3) — end-to-end
join+aggregate coverage on the driver's star schema. Q1 is the flagship in
``__spark_entry__.entry``; here it is oracle-registered alongside Q3
(shipping priority: 3-way join, filter both fact sides, agg, top-k) and
Q5 (local supplier volume: 6-way join through two dimension chains).

Scale notes (the plans these are written to produce):
- dimension sides (region/nation/customer/supplier) broadcast — no
  shuffle of the fact tables for the dim joins;
- date filters sit directly on the parquet scans (PushedFilters);
- aggregates are partial/final HashAggregate pairs;
- Q3's top-10 fuses to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.queries import R, T, query, sr


@query(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sr('sum(l_quantity)', 2)} AS sum_qty,
           {sr('sum(l_extendedprice)', 2)} AS sum_base_price,
           {sr('sum(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
           {sr('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
           {sr('avg(l_quantity)', 6)} AS avg_qty,
           {sr('avg(l_extendedprice)', 6)} AS avg_price,
           {sr('avg(l_discount)', 6)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary — scan, filter, 8 aggregates. Same query as
    the driver flagship (``__spark_entry__.entry``), oracle-registered."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            R(F.sum("l_quantity"), 2).alias("sum_qty"),
            R(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            R(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            R(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            R(F.avg("l_quantity"), 6).alias("avg_qty"),
            R(F.avg("l_extendedprice"), 6).alias("avg_price"),
            R(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sr('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC NULLS LAST, o_date ASC NULLS LAST, l_orderkey ASC NULLS LAST
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority (o_orderpriority stands in for the
    reference schema's o_shippriority). customer is broadcast; both fact
    filters push to the scans; top-10 fuses to TakeOrderedAndProject."""
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            R(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("revenue").desc_nulls_last(),
            F.col("o_date").asc_nulls_last(),
            F.col("l_orderkey").asc_nulls_last(),
        )
        .limit(10)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 order-priority checking — the EXISTS correlated subquery
    planned as a LEFT SEMI join (one shuffle, no decorrelation cost)."""
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q_tpch_q6",
    oracle=f"""
    SELECT {sr('sum(l_extendedprice * l_discount)', 2)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecasting revenue change — pure scan+filter+global agg;
    every predicate must reach PushedFilters (no join, no shuffle beyond
    the final single-row agg)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(R(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sr('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS LAST
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting — 4-way join, dims broadcast,
    top-20 customers by lost revenue fused to TakeOrderedAndProject."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = T(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            R(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("c_custkey").asc_nulls_last())
        .limit(20)
    )


@query(
    "q_tpch_q18",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date,
           {sr('o_totalprice', 2)} AS o_totalprice,
           {sr('sum(l_quantity)', 2)} AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
    LIMIT 100
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customers — the IN over a grouped HAVING
    subquery becomes an aggregate + LEFT SEMI join; quantities re-aggregate
    after the join, top-100 fused."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(R(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            R(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
        )
        .limit(100)
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sr('sum(volume)', 2)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation ASC NULLS LAST, cust_nation ASC NULLS LAST, l_year ASC NULLS LAST
    """,
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume shipping — nation self-joined twice under different
    roles (supplier vs customer side), disjunctive nation-pair filter,
    per-year rollup. Both nation sides and the dims broadcast."""
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # fixture nation names are NATION_0..NATION_24 — the spec's
    # FRANCE/GERMANY pair matched nothing, certifying an empty result
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            R(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(
            F.col("supp_nation").asc_nulls_last(),
            F.col("cust_nation").asc_nulls_last(),
            F.col("l_year").asc_nulls_last(),
        )
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           {sr("sum(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END) / sum(volume)", 6)} AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year ASC NULLS LAST
    """,
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 national market share — 8-way join through two independent
    nation chains (customer's region gate, supplier's nation label) with a
    share-of-total conditional aggregate. One fact shuffle; all seven
    dimension sides broadcast."""
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            R(
                F.sum(F.when(F.col("nation") == "BRAZIL", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy(F.col("o_year").asc_nulls_last())
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer distribution — left join preserving orderless
    customers (count(o_orderkey) skips nulls), then a second aggregation
    over the per-customer counts."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    orders = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc_nulls_last(), F.col("c_count").desc_nulls_last())
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT {sr("100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount))", 6)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion effect — part broadcast into the filtered fact,
    conditional aggregation in one pass."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            R(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sr('sum(l_extendedprice * (1 - l_discount))', 2)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey ASC NULLS LAST
    """,
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 top supplier — the revenue CTE reused for both the join
    and its max (scalar subquery → computed once, broadcast as a 1-row
    cross join)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    # revenue QUANTIZED TO PENNIES before the max-equality pick: the
    # winner selection compares doubles across engines, and summation
    # ulp-jitter could rank near-tied suppliers oppositely (the q11
    # scale-free-cut hardening applied to the argmax form)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        R(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.col("s_suppkey").asc_nulls_last())
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name, {sr('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS LAST
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 local supplier volume — 6-way join: the fact chain
    (lineitem→orders) shuffles on orderkey once; every dimension side
    (customer, supplier, nation, region) broadcasts."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            R(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("n_name").asc_nulls_last())
    )


@query(
    "q_tpch_q17",
    oracle=f"""
    SELECT {sr('sum(l_extendedprice) / 7.0', 2)} AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    ) t ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
      AND l_quantity < qty_thresh
    """,
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 small-quantity-order revenue (adapted: the schema has no
    p_container, so the second part predicate is p_type). The correlated
    scalar subquery (per-part avg quantity) decorrelates to a fact-side
    aggregation joined back on partkey — the plan Spark/Catalyst would
    produce for the subquery form, written explicitly. The part filter is
    applied before BOTH fact passes (semi-join pushdown via broadcast), so
    neither the aggregate nor the probe scans unfiltered lineitem rows at
    scale."""
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    relevant = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    thresh = relevant.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        relevant.withColumnRenamed("l_partkey", "lp")
        .join(F.broadcast(thresh), F.col("lp") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(R(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT {sr('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 discounted revenue (adapted: no p_container/l_shipmode/
    l_shipinstruct columns — the disjunctive-predicate shape is the point).
    The OR-of-ANDs mixes join-side and fact-side columns, so it cannot be
    pushed below the join; part broadcasts and the disjunction evaluates
    in the join's codegen stage — one fact scan, zero shuffles."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disjunct = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(disjunct)
        .agg(
            R(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q22",
    oracle=f"""
    SELECT cntrycode, count(*) AS numcust, {sr('sum(c_acctbal)', 2)} AS totacctbal
    FROM (
        SELECT c_nationkey AS cntrycode, c_acctbal
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c_acctbal > (
              SELECT avg(c_acctbal) FROM customer
              WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          )
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    ) t
    GROUP BY cntrycode
    ORDER BY cntrycode NULLS LAST
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 global sales opportunity (adapted: no c_phone column, so
    the country code is c_nationkey directly; 'has never ordered' becomes
    'has no pending order' because every synthetic customer has orders).
    Pattern coverage: scalar aggregate subquery (broadcast 1-row cross
    join) + NOT EXISTS (left_anti on orders) + final aggregation. The
    anti-join shuffles on custkey; everything else is broadcast or
    map-side."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = T(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            R(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy(F.col("cntrycode").asc_nulls_last())
    )


@query(
    "q_tpch_q2",
    oracle=f"""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    elig AS (
        SELECT l_partkey, l_suppkey, s_name, s_acctbal, n_name, supplycost,
               min(supplycost) OVER (PARTITION BY l_partkey) AS best
        FROM cost
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT {sr('s_acctbal', 2)} AS s_acctbal, s_name, n_name,
           p_partkey, {sr('supplycost', 4)} AS supplycost
    FROM elig JOIN part ON l_partkey = p_partkey
    WHERE supplycost = best AND p_size <= 15 AND p_type = 'SMALL'
    ORDER BY s_acctbal DESC NULLS LAST, n_name ASC NULLS LAST,
             s_name ASC NULLS LAST, p_partkey ASC NULLS LAST
    LIMIT 100
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 minimum-cost supplier (adapted: the schema has no partsupp
    table, so supply cost derives from lineitem as each (part, supplier)
    pair's minimum observed unit price — the correlated-MIN-subquery shape
    is the point and is preserved exactly).

    Scale plan: the (part,supplier) cost table aggregates fact-side (one
    shuffle on the pair key); supplier/nation/region broadcast; the
    per-part minimum is a window over the partkey shuffle (no second
    self-join); only the filtered part slice broadcasts into the probe."""
    from pyspark.sql import Window as W

    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey",
                                             "l_extendedprice", "l_quantity")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    supp = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = (
        T(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    elig = (
        cost.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("best", F.min("supplycost").over(W.partitionBy("l_partkey")))
    )
    return (
        elig.filter(F.col("supplycost") == F.col("best"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            R(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            R(F.col("supplycost"), 4).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc_nulls_last(),
            F.col("n_name").asc_nulls_last(),
            F.col("s_name").asc_nulls_last(),
            F.col("p_partkey").asc_nulls_last(),
        )
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, o_year, {sr('sum(amount)', 2)} AS sum_profit
    FROM (
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    ORDER BY nation ASC NULLS LAST, o_year DESC NULLS LAST
    """,
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 product-type profit (adapted: no partsupp, so unit cost is
    0.6 * p_retailprice instead of ps_supplycost — the LIKE-filtered
    5-way join + nation/year profit rollup shape is unchanged).

    Scale plan: the part LIKE filter cannot push to parquet as a range but
    prunes before the join; part/supplier/nation broadcast; lineitem⋈orders
    is the single fact-fact shuffle; one partial/final agg pair."""
    part = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(R(F.sum(amount), 2).alias("sum_profit"))
        .orderBy(F.col("nation").asc_nulls_last(), F.col("o_year").desc_nulls_last())
    )


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH v AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                        AS BIGINT)) AS pennies
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, pennies / 100.0 AS val
    FROM v
    WHERE pennies * (SELECT count(*) FROM v) > 2 * (SELECT sum(pennies) FROM v)
    ORDER BY val DESC NULLS LAST, ps_partkey ASC NULLS LAST
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 important stock (adapted: no partsupp, so a part's held
    value is the revenue shipped by NATION_7 suppliers; the
    HAVING-against-a-scalar-aggregate subquery is preserved). The cut is
    mean-relative (value > 2x the per-part average) rather than the
    original's fixed fraction of the total, so the selectivity is
    scale-free: a fixed 0.1%%-of-total cut returns 0 rows as soon as the
    part count grows 10x.

    Per-row revenue quantizes to integer pennies (the stable_round
    formula, floor(x*100+0.5)) and aggregates as BIGINT; the comparison
    cross-multiplies (pennies*count > 2*total) so it is integer-exact in
    both engines — a double mean's ulp jitter could otherwise flip rows
    on the boundary.

    Scale plan: supplier/nation broadcast; one shuffle on partkey; the
    grand total is a 1-row re-aggregation of the per-part frame (computed
    once, broadcast into the filter) — not a second fact scan."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey",
                                             "l_extendedprice", "l_discount")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    pennies = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("long")
    v = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(pennies).alias("pennies"))
    )
    thresh = v.agg(
        F.sum("pennies").alias("total_pennies"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        v.crossJoin(F.broadcast(thresh))
        .filter(F.col("pennies") * F.col("n_parts") > 2 * F.col("total_pennies"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (F.col("pennies") / 100.0).alias("val"),
        )
        .orderBy(F.col("val").desc_nulls_last(), F.col("ps_partkey").asc_nulls_last())
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_linestatus AS shipclass,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY shipclass ASC NULLS LAST
    """,
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shipping modes and order priority (adapted: the schema
    has no l_shipmode/l_commitdate/l_receiptdate, so the class column is
    l_linestatus and 'late' means shipped >60 days after the order date —
    the join + dual conditional-count shape is unchanged).

    Scale plan: the shipdate year filter pushes to the parquet scan; the
    late predicate (two-table columns) evaluates in the join stage;
    lineitem⋈orders is the one shuffle (bucketing both on orderkey would
    remove it); counts are map-side partial."""
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate",
                                               "o_orderpriority")
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("shipclass"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy(F.col("shipclass").asc_nulls_last())
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS LAST,
             p_type ASC NULLS LAST, p_size ASC NULLS LAST
    """,
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 parts/supplier relationship (adapted: part-supplier pairs
    come from DISTINCT lineitem instead of partsupp, and the excluded
    suppliers are those with negative balances instead of complaint
    comments — NOT IN + distinct-count-per-attribute shape unchanged).

    Scale plan: the distinct pair projection is the one fact shuffle; the
    exclusion list (filtered supplier) is a broadcast anti-join, never a
    per-row subquery; the filtered part slice broadcasts; count(DISTINCT)
    re-shuffles only the already-deduped pairs."""
    pairs = (
        T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        pairs.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                   "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc_nulls_last(),
            F.col("p_brand").asc_nulls_last(),
            F.col("p_type").asc_nulls_last(),
            F.col("p_size").asc_nulls_last(),
        )
    )


@query(
    "q_tpch_q20",
    oracle=f"""
    WITH q AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
        GROUP BY l_partkey, l_suppkey
    ),
    dominant AS (
        SELECT l_suppkey FROM (
            SELECT l_suppkey, sq,
                   sum(sq) OVER (PARTITION BY l_partkey) AS tq
            FROM q
        ) WHERE sq > 0.5 * tq
    )
    SELECT s_name, {sr('s_acctbal', 2)} AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_name ASC NULLS LAST
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 potential part promotion (adapted: no partsupp/availqty,
    so the threshold test becomes 'this supplier shipped more than half of
    the part's 1996 volume' — nested IN-subqueries over a quantity
    aggregate, as in the original).

    Quantities sum as DECIMAL(18,2) so the 50%-share comparison is exact
    in both engines. Scale plan: the part LIKE slice broadcasts into a
    semi-join BEFORE the quantity aggregation (fact rows for other parts
    never shuffle); the share test is a window over the same partkey
    shuffle; the dominant-supplier set is a broadcast semi-join against
    the supplier dimension."""
    from pyspark.sql import Window as W

    part = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    q = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq")
    )
    dominant = (
        q.withColumn("tq", F.sum("sq").over(W.partitionBy("l_partkey")))
        .filter(F.col("sq") > F.lit(0.5) * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    supp = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .select("s_name", R(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy(F.col("s_name").asc_nulls_last())
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH waiting AS (
        SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
    )
    SELECT s_name, count(*) AS numwait
    FROM waiting
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
    GROUP BY s_name
    ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS LAST
    LIMIT 100
    """,
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 suppliers who kept orders waiting (adapted: 'late' means
    shipped >90 days after the order date instead of receipt-past-commit).
    The oracle keeps the original EXISTS / NOT-EXISTS double self-join;
    the Spark plan is the decorrelated rewrite — per-order supplier count
    and the late-supplier SET computed in one aggregation, then a filter
    (n_supp >= 2 AND exactly one late supplier) — because two correlated
    self-joins of the fact table is exactly the plan that dies at 100 TB.

    Scale plan: lineitem⋈orders('F') is ONE scan and one shuffle on
    orderkey; the late-supplier collect_set is bounded by suppliers-per-
    order (single digits), so the waiting pairs explode out of the same
    aggregate with no second fact pass; supplier/nation/region broadcast
    at the end over the (small) waiting set."""
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supps"),
    )
    waiting = (
        per_order.filter((F.col("n_supp") >= 2) & (F.size("late_supps") == 1))
        .select("l_orderkey", F.explode("late_supps").alias("l_suppkey"))
    )
    supp = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc_nulls_last(), F.col("s_name").asc_nulls_last())
        .limit(100)
    )
