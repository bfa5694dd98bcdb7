"""Round-2 SQL-surface widening: EXISTS / NOT EXISTS correlated
predicates, ordered string aggregation, median, the regex function
family, and LATERAL table generation — each with an exact DuckDB oracle.

These extend the reference's SELECT surface (tmp/select.rs handles only
plain predicates; EXISTS/LATERAL never appear) the way a user of a
Postgres-dialect engine would expect; Catalyst plans EXISTS/NOT EXISTS
as semi/anti joins and LATERAL VIEW explode as Generate — the scalable
shapes, no correlated re-execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.queries import T, query, register_views, sr


@query(
    "q_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def q_exists(spark, sf_dir):
    """Correlated EXISTS — planned as a left-semi join (no per-row
    re-execution; one shuffle on the correlation key)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
        )
        """
    )


@query(
    "q_not_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def q_not_exists(spark, sf_dir):
    """Correlated NOT EXISTS (customers with no large order) — planned as
    a left-anti join. The predicate is chosen to return rows at EVERY
    certification scale (every synthetic customer has orders, so the
    bare no-orders form certified an empty result — a broken anti-join
    would have passed)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg(spark, sf_dir):
    """Ordered string aggregation (string_agg/listagg): collect_list →
    array_sort → concat_ws gives the deterministic ORDER BY semantics the
    streaming-aggregate listagg can't guarantee distributed."""
    n = T(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "q_median",
    oracle=f"""
    SELECT l_returnflag, {sr("median(l_quantity)", 6)} AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_median(spark, sf_dir):
    """Exact interpolated median per group (percentile_cont 0.5 under the
    hood — a sort-based aggregate; at scale prefer approx_percentile,
    which q_percentile/q_approx_distinct demonstrate on sketches)."""
    from mesin_spark.functions import stable_round as R

    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        R(F.median("l_quantity"), 6).alias("med_qty")
    )


@query(
    "q_fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
           regexp_matches(p_name, 'widget') AS has_widget
    FROM part
    """,
)
def q_fn_regex(spark, sf_dir):
    """Regex function family: extract (group ref), replace-all, and match
    predicate — all RE2-compatible patterns so both engines agree."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.col("p_name").rlike("widget").alias("has_widget"),
    )


@query(
    "q_window_nav",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           first_value(l_extendedprice) OVER w AS first_price,
           last_value(l_extendedprice) OVER w AS last_price,
           nth_value(l_extendedprice, 2) OVER w AS second_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_nav(spark, sf_dir):
    """Navigation window functions (first/last/nth value) over an explicit
    whole-partition ROWS frame — the default growing frame would make
    last_value the current row; the unique order key makes all three
    deterministic."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return T(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
    )


@query(
    "q_window_dist",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ntile(4) OVER w AS quartile,
           {sr("percent_rank() OVER w", 6)} AS pct_rank,
           {sr("cume_dist() OVER w", 6)} AS cdist
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_quantity, l_orderkey, l_linenumber)
    """,
)
def q_window_dist(spark, sf_dir):
    """Distribution window functions (ntile / percent_rank / cume_dist) —
    the unique order key pins ntile's tie assignment so both engines
    agree exactly."""
    from pyspark.sql import Window as W

    from mesin_spark.functions import stable_round as R

    w = W.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).alias("quartile"),
        R(F.percent_rank().over(w), 6).alias("pct_rank"),
        R(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "q_bit_aggs",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS band,
           bit_or(l_linenumber) AS bor,
           bit_xor(l_linenumber) AS bxor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_bit_aggs(spark, sf_dir):
    """Bitwise aggregates (AND/OR/XOR fold) — order-independent, exact."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("band"),
            F.bit_or("l_linenumber").alias("bor"),
            F.bit_xor("l_linenumber").alias("bxor"),
        )
    )


@query(
    "q_histogram",
    oracle="""
    WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
    SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20.0)) AS BIGINT), 19) AS bucket,
           count(*) AS n
    FROM orders, b
    GROUP BY 1
    """,
)
def q_histogram(spark, sf_dir):
    """Equi-width histogram (20 bins over [min, max]) — the bounds come
    from a 1-row broadcast aggregate, binning is a map-side closed form,
    one grouping shuffle. The profiling companion to q_percentile."""
    o = T(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("long"), F.lit(19)
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_quantiles",
    # DuckDB's quantile_cont needs a constant p → one SELECT per quantile
    oracle="\nUNION ALL\n".join(
        f"SELECT {p} AS p, {sr(f'quantile_cont(o_totalprice, {p})', 4)} AS q FROM orders"
        for p in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    ),
)
def q_quantiles(spark, sf_dir):
    """Exact interpolated quantile table (p10..p99) — one row per
    requested quantile; Spark's percentile ≡ DuckDB's quantile_cont
    (linear interpolation). At 100 TB use approx_percentile
    (q_percentile shows the sketch path); this is the exact companion."""
    from mesin_spark.functions import stable_round as R

    o = T(spark, sf_dir, "orders")
    ps = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    parts = [
        o.agg(
            F.lit(p).alias("p"),
            R(F.expr(f"percentile(o_totalprice, {p})"), 4).alias("q"),
        )
        for p in ps
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.union(df)
    return out


@query(
    "q_argminmax",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
    """,
)
def q_argminmax(spark, sf_dir):
    """arg_max / arg_min (max_by / min_by): keep the key of the extreme
    row per group in one hash aggregate — no self-join or window needed.
    Deterministic here because o_totalprice is tie-free per customer at
    every test scale (verified); with ties, order by a composite."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "q_fn_lambda",
    oracle="""
    SELECT o_orderkey,
           array_to_string(list_transform([1, 2, 3], x -> x * o_orderkey), ',') AS scaled,
           len(list_filter([1, 2, 3, 4, 5, 6], x -> x % 2 = 0)) AS n_even,
           list_reduce([CAST(o_custkey AS BIGINT), 10, 100], (a, b) -> a + b) AS folded
    FROM orders
    """,
)
def q_fn_lambda(spark, sf_dir):
    """SQL higher-order functions (transform / filter / aggregate ≡
    DuckDB list_transform / list_filter / list_reduce) — lambda
    expressions as first-class query surface, all JVM-side."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # The driver's pandas canonicalizer lexsorts every output column and
        # cannot hash a raw list — emit the transformed array as a
        # deterministic CSV string (oracle mirrors with array_to_string).
        F.array_join(
            F.transform(
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                lambda x: (x.cast("long") * F.col("o_orderkey")).cast("string"),
            ),
            ",",
        ).alias("scaled"),
        F.size(
            F.filter(
                F.array(*[F.lit(i) for i in range(1, 7)]), lambda x: x % 2 == 0
            )
        ).alias("n_even"),
        F.aggregate(
            F.array(F.col("o_custkey").cast("long"), F.lit(10).cast("long"), F.lit(100).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("folded"),
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT 1 AS m UNION ALL SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT m, count(o_orderkey) AS n
    FROM months LEFT JOIN orders ON month(o_orderdate) = m
    GROUP BY m
    """,
)
def q_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4's recursive CTE): generate a month spine
    recursively and left-join order counts onto it — iterative expansion
    planned as UnionLoop, no driver-side loop."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT 1 AS m UNION ALL SELECT m + 1 FROM months WHERE m < 12
        )
        SELECT m, count(o_orderkey) AS n
        FROM months LEFT JOIN orders ON month(o_orderdate) = m
        GROUP BY m
        """
    )


@query(
    "q_grouping_fn",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_grouping_fn(spark, sf_dir):
    """GROUPING() indicator columns over ROLLUP — distinguishes a real
    NULL group key from a subtotal row, the standard report-query idiom."""
    li = T(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")


@query(
    "q_posexplode",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
    SELECT p_partkey, CAST(i - 1 AS INT) AS pos, w[CAST(i AS INT)] AS word
    FROM t, unnest(range(1, len(w) + 1)) AS u(i)
    """,
)
def q_posexplode(spark, sf_dir):
    """posexplode (index-preserving row expansion — chunk ids, frame
    numbers); the oracle spells it as a lateral range-unnest since this
    DuckDB build lacks WITH ORDINALITY. Map-side Generate."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@query(
    "q_union_byname",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    UNION ALL BY NAME
    SELECT n_name, n_nationkey + 100 AS n_nationkey FROM nation WHERE n_regionkey = 0
    """,
)
def q_union_byname(spark, sf_dir):
    """UNION ALL BY NAME (column-name-aligned union) — schema-drift-safe
    appends across sources whose column order differs."""
    n = T(spark, sf_dir, "nation")
    a = n.select("n_nationkey", "n_name")
    b = n.filter(F.col("n_regionkey") == 0).select(
        "n_name", (F.col("n_nationkey") + 100).alias("n_nationkey")
    )
    return a.unionByName(b)


@query(
    "q_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 600000000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_no
    FROM gaps
    """,
)
def q_sessionize(spark, sf_dir):
    """Per-event sessionization: label every event with its session number
    (gap > 10 min starts a new one) via lag + running sum — the per-row
    companion to session_window's per-session aggregates (q_session_batch).
    One shuffle on user_id serves both windows."""
    from pyspark.sql import Window as W

    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: a seconds-truncating cast("long") would put a
    # 600.3s gap in the SAME session while exact arithmetic starts a new
    # one (bit us at sf0.01 — 70/10000 rows)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_s = F.when(gap.isNull() | (gap > 600 * 1_000_000), 1).otherwise(0)
    return e.select(
        "event_id",
        "user_id",
        F.sum(new_s).over(w).alias("session_no"),
    )


@query(
    "q_gapfill",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        FROM events
    ),
    hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(floor(epoch(hours.h)) AS BIGINT) AS hour_ts,
           types.event_type,
           coalesce(hourly.n, 0) AS n
    FROM hours CROSS JOIN types
    LEFT JOIN hourly ON hourly.h = hours.h AND hourly.event_type = types.event_type
    """,
)
def q_gapfill(spark, sf_dir):
    """Time-series gap filling: a generated hour spine × the event-type
    dimension, left-joined to hourly counts so silent hours surface as
    explicit zeros — the resample primitive dashboards and downstream
    models need. The spine is sequence()+explode off a 1-row bound
    aggregate (broadcast); the only data-sized shuffle is the hourly
    groupBy."""
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(types))
    return spine.join(hourly, ["h", "event_type"], "left").select(
        F.unix_timestamp("h").alias("hour_ts"),
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
    )


@query(
    "q_profile",
    oracle="""
    SELECT 'l_quantity' AS col, count(*) AS n,
           count(*) - count(l_quantity) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS VARCHAR) AS min_s,
           CAST(max(l_quantity) AS VARCHAR) AS max_s
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
           count(DISTINCT l_linenumber),
           CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
    FROM lineitem
    """,
)
def q_profile(spark, sf_dir):
    """Table profiling (the describe/summarize data-quality primitive):
    per-column row count, null count, distinct count, min/max — one
    aggregate pass per profiled column over a single cached scan, results
    as strings so one schema fits every column type. At scale swap
    count(DISTINCT) for approx_count_distinct; the shape is unchanged."""
    li = T(spark, sf_dir, "lineitem")
    parts = []
    for c in ("l_quantity", "l_returnflag", "l_linenumber"):
        parts.append(
            li.agg(
                F.lit(c).alias("col"),
                F.count(F.lit(1)).alias("n"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_s"),
                F.max(c).cast("string").alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


@query(
    "q_try_cast",
    oracle="""
    SELECT o_orderkey,
           try_cast(o_orderpriority AS BIGINT) AS bad_cast,
           try_cast('12' AS BIGINT) AS good_cast,
           try_cast(o_orderstatus AS DOUBLE) AS status_num
    FROM orders
    """,
)
def q_try_cast(spark, sf_dir):
    """TRY_CAST — NULL instead of error on malformed input, the ingest
    survival tool for dirty columns (identical NULL semantics both
    engines)."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("bigint").alias("bad_cast"),
        F.lit("12").try_cast("bigint").alias("good_cast"),
        F.col("o_orderstatus").try_cast("double").alias("status_num"),
    )


@query(
    "q_interval_arith",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts + INTERVAL 90 MINUTE)) AS BIGINT) AS plus_90m,
           CAST(floor(epoch(ts - INTERVAL 1 DAY)) AS BIGINT) AS minus_1d,
           CAST(floor(date_diff('second', ts, ts + INTERVAL 2 HOUR)) AS BIGINT) AS delta_s
    FROM events
    """,
)
def q_interval_arith(spark, sf_dir):
    """Interval arithmetic on event time (± INTERVAL, timestamp diff) —
    outputs as epoch seconds per the fixture convention (parquet physical
    timestamp units differ across engines)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_timestamp(F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("plus_90m"),
        F.unix_timestamp(F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("minus_1d"),
        (
            F.unix_timestamp(F.col("ts") + F.expr("INTERVAL 2 HOURS"))
            - F.unix_timestamp("ts")
        ).alias("delta_s"),
    )


@query(
    "q_alter_table",
    oracle="""
    SELECT n_nationkey, region_key, upper(n_name) AS display_name, 'active' AS status
    FROM (SELECT n_nationkey, n_regionkey AS region_key, n_name FROM nation)
    """,
)
def q_alter_table(spark, sf_dir):
    """ALTER TABLE extension (the reference rejects ALTER outright,
    src/planner/mod.rs:36): ADD COLUMN with default, RENAME COLUMN, DROP
    COLUMN, then an UPDATE against the evolved schema — each a
    copy-on-write swap (metadata-only under Delta/Iceberg at scale)."""
    from mesin_spark.queries.dml import _scratch

    _, mt = _scratch(spark, sf_dir, "nation")
    mt.alter_add_column("status", "VARCHAR", default="active")
    mt.alter_rename_column("n_regionkey", "region_key")
    mt.alter_add_column("display_name", "VARCHAR")
    mt.update({"display_name": "upper(n_name)"})
    mt.alter_drop_column("n_name")
    return mt.df().select("n_nationkey", "region_key", "display_name", "status")


@query(
    "q_udaf_geomean",
    oracle=f"""
    SELECT l_returnflag, {sr("exp(avg(ln(l_quantity)))", 6)} AS geo_mean_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_geomean(spark, sf_dir):
    """Custom UDAF via applyInPandas (grouped map → one row per group):
    per-group geometric mean computed in Arrow-batched numpy — the
    user-defined-aggregate surface (§2.11). Group data arrives as one
    pandas frame per key; the shuffle is the same single hash partition
    a built-in aggregate needs (no map-side partials — the honest cost
    of an opaque UDAF, which is why the built-in fold tier exists)."""
    import pandas as pd
    import numpy as np

    def geomean(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.log(pdf["l_quantity"].to_numpy(dtype=np.float64))
        g = float(np.exp(v.mean()))
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "geo_mean_qty": [np.floor(g * 1e6 + 0.5) / 1e6],
                "n": [len(pdf)],
            }
        )

    li = T(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return li.groupBy("l_returnflag").applyInPandas(
        geomean, "l_returnflag string, geo_mean_qty double, n long"
    )


def _zorder_sql(cols: list[str], bits: int) -> str:
    """DuckDB text of the same Morton interleave zorder_key computes."""
    k = len(cols)
    # DuckDB's << binds looser than +, so each term is fully parenthesized
    terms = [
        f"(((({c} % {1 << bits}) >> {b}) & 1) << {b * k + j})"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return " + ".join(terms)


@query(
    "q_zorder",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {_zorder_sql(['l_partkey', 'l_suppkey'], 10)} AS z
    FROM lineitem
    """,
)
def q_zorder(spark, sf_dir):
    """Z-order (Morton) layout key over (l_partkey, l_suppkey): the sort
    key for multi-dimensional row-group pruning —
    write_parquet(sort_by=[z]) clusters both dimensions at once. Pure
    codegen'd shift/mask arithmetic, map-side."""
    from mesin_spark.sources import zorder_key

    li = T(spark, sf_dir, "lineitem")
    z = zorder_key(
        [F.pmod(F.col("l_partkey"), F.lit(1 << 10)), F.pmod(F.col("l_suppkey"), F.lit(1 << 10))],
        bits=10,
    )
    return li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", z.alias("z"))


@query(
    "q_lateral",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part
    """,
)
def q_lateral(spark, sf_dir):
    """LATERAL table generation (LATERAL VIEW explode ≡ LATERAL unnest) —
    Catalyst's Generate operator: map-side row expansion, no shuffle."""
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, w.word
        FROM part LATERAL VIEW explode(split(p_name, ' ')) w AS word
        """
    )
