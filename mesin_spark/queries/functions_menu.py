"""Scalar-function menu + expression forms the reference lacks.

Reference parity: SURVEY.md §2.8 — the ScalarFunction passthrough
(common.rs:56-59, tmp/select.rs:583-611) accepts any name; we pin a concrete
menu (string/date/math/conditional) that is builtin in both Spark and
DuckDB, plus the expression forms that fall into the reference's catch-all
bail! (tmp/select.rs:621): CASE, CAST, BETWEEN, IN-list, LIKE, IS NULL.
Array/JSON functions are the beyond-reference tier (Spark ArrayType/JSON
support; reference has no such types, §1.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.functions import scalar_function
from mesin_spark.queries import T, query, sr
from mesin_spark.queries import R  # stable rounding


@query(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS up_name,
           LOWER(c_mktsegment) AS lo_seg,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           TRIM(c_mktsegment) AS trimmed,
           CONCAT(c_name, '-', c_mktsegment) AS tagged,
           REPLACE(c_name, 'Customer', 'Cust') AS short_name
    FROM customer
    """,
)
def q_fn_string(spark, sf_dir):
    """String menu: UPPER LOWER LENGTH SUBSTRING TRIM CONCAT REPLACE — all
    via the engine's ScalarFunction passthrough (functions.scalar_function ≈
    tmp/select.rs:583-611: uppercase name, pass args, resolve in registry)."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        scalar_function("upper", "c_name").alias("up_name"),
        scalar_function("lower", "c_mktsegment").alias("lo_seg"),
        scalar_function("length", "c_name").alias("name_len"),
        scalar_function("substring", F.col("c_name"), F.lit(1), F.lit(8)).alias("name_prefix"),
        scalar_function("trim", "c_mktsegment").alias("trimmed"),
        scalar_function("concat", F.col("c_name"), F.lit("-"), F.col("c_mktsegment")).alias(
            "tagged"
        ),
        scalar_function("replace", F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "short_name"
        ),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           CAST(DAY(o_orderdate) AS INT) AS dy,
           CAST(QUARTER(o_orderdate) AS INT) AS qtr,
           CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate
    FROM orders
    """,
)
def q_fn_date(spark, sf_dir):
    """Date menu: YEAR MONTH DAY QUARTER DATE_TRUNC (+ CAST to DATE — the
    testdata timestamps are ms-precision; DATE output sidesteps precision
    hashing differences, FIXTURES.md oracle caveats)."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        # date values rendered as ISO strings: date-object representations
        # differ across engine→pandas paths and would false-miss the hash
        F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month_start"),
        F.col("o_orderdate").cast("date").cast("string").alias("odate"),
    )


@query(
    "q_fn_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 30000.0) AS abs_dev,
           {sr('l_extendedprice', 1)} AS rounded,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           {sr('SQRT(l_quantity)', 6)} AS qty_sqrt,
           {sr('POWER(1.0 + l_tax, 2)', 6)} AS tax_sq,
           l_linenumber % 4 AS ln_mod
    FROM lineitem
    """,
)
def q_fn_math(spark, sf_dir):
    """Math menu: ABS ROUND CEIL FLOOR SQRT POWER MOD. CEIL/FLOOR results
    cast to BIGINT on both sides (Spark returns LONG, DuckDB DOUBLE)."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("abs_dev"),
        R(F.col("l_extendedprice"), 1).alias("rounded"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.floor(F.col("l_quantity")).cast("long").alias("qty_floor"),
        R(F.sqrt(F.col("l_quantity")), 6).alias("qty_sqrt"),
        R(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_linenumber") % 4).alias("ln_mod"),
    )


@query(
    "q_fn_cond",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'RETAIL-DEFAULT') AS seg_or_default,
           NULLIF(c_nationkey, 0) AS nk_nullable
    FROM customer
    """,
)
def q_fn_cond(spark, sf_dir):
    """Conditional menu: COALESCE + NULLIF (parsed as plain functions by the
    reference's passthrough)."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("RETAIL-DEFAULT")).alias(
            "seg_or_default"
        ),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nullable"),
    )


# -- expression forms beyond the reference's parser coverage ---------------
@query(
    "q_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'big'
                WHEN o_totalprice >= 100000.0 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def q_case(spark, sf_dir):
    """CASE WHEN — hits the reference's catch-all bail! (tmp/select.rs:621);
    Spark: chained F.when().otherwise()."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "big")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


@query(
    "q_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date
    FROM lineitem
    """,
)
def q_cast(spark, sf_dir):
    """CAST across the reference's DDL type menu (common.rs:69-80 →
    BIGINT/DOUBLE/VARCHAR/DATE)."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date"),
    )


@query(
    "q_between",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice BETWEEN 100000.0 AND 200000.0
    """,
)
def q_between(spark, sf_dir):
    """BETWEEN (inclusive both ends)."""
    o = T(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice").between(100000.0, 200000.0)).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "q_in",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_19')
    """,
)
def q_in(spark, sf_dir):
    """IN-list → Column.isin. Literals name real fixture rows (the
    synthetic nations are NATION_0..NATION_24): TPC-H names like
    'CHINA' matched nothing, so the oracle certified a vacuous
    Spark-0 == DuckDB-0 and never compared a value."""
    n = T(spark, sf_dir, "nation")
    return n.filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_19")).select(
        "n_nationkey", "n_name"
    )


@query(
    "q_like",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%steel%' OR p_type LIKE 'SMALL%'
    """,
)
def q_like(spark, sf_dir):
    """LIKE with leading/trailing wildcards."""
    p = T(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%steel%") | F.col("p_type").like("SMALL%")).select(
        "p_partkey", "p_name"
    )


@query(
    "q_isnull",
    oracle="""
    SELECT c_custkey,
           (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS is_building,
           (NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL) AS is_not_building
    FROM customer
    """,
)
def q_isnull(spark, sf_dir):
    """IS NULL / IS NOT NULL (nulls manufactured via NULLIF)."""
    c = T(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg.isNull().alias("is_building"),
        seg.isNotNull().alias("is_not_building"),
    )


# -- array / JSON tier (beyond reference: no array/map/json types, §1.2) ---
@query(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(lang, ''))), '') AS lang_sorted
    FROM documents
    """,
)
def q_fn_array(spark, sf_dir):
    """Array functions over split text: size / array_contains /
    array_sort+distinct (scalar outputs so the value-hash stays
    engine-neutral)."""
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("lang"), ""))), "").alias(
            "lang_sorted"
        ),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_fn_json(spark, sf_dir):
    """JSON extraction from the events.props string column."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_val"),
    )
