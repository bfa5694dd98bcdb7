"""SQL-surface menu, part 5: linear-regression aggregates, conditional/
boolean aggregates, null-safe equality joins, and NOT IN's three-valued
NULL semantics.

Extension tier (the reference's aggregate menu stops at COUNT/SUM/MIN/
MAX/AVG, tmp/select.rs:333-344; it has no NULL handling at all since it
never executes). All four are oracle-checked; the NULL-bearing inputs
are synthesized with nullif()/CASE because the driver testdata is fully
non-null.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mesin_spark.functions import stable_round as R
from mesin_spark.queries import T, load_events, query, sr


@query(
    "q_regr_aggs",
    oracle=f"""
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n,
           {sr("regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
           {sr("regr_intercept(l_extendedprice, l_quantity)", 4)} AS icept,
           {sr("regr_r2(l_extendedprice, l_quantity)", 6)} AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_regr_aggs(spark, sf_dir):
    """Linear-regression aggregates (ANSI bivariate family): slope,
    intercept and R² of extendedprice ~ quantity per return flag — the
    in-engine replacement for collect-and-numpy trend fitting. One
    partial/final hash agg like any SUM: the regression moments
    (n, Σx, Σy, Σxx, Σxy, Σyy) are algebraic, so the shuffle carries
    six doubles per group at any scale."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        R(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        R(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
        R(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "q_bool_aggs",
    oracle="""
    SELECT o_orderstatus,
           count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
           bool_and(o_totalprice > 900) AS all_over_900,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_bool_aggs(spark, sf_dir):
    """Conditional and boolean aggregates: count_if / bool_and (ANSI
    EVERY) / bool_or — predicate summaries without a CASE pyramid.
    Booleans fold to one byte of aggregate state per group; same
    partial/final shape as COUNT."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 900).alias("all_over_900"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
    )


@query(
    "q_null_safe_join",
    oracle="""
    WITH c AS (
        SELECT c_custkey, nullif(c_nationkey, 5) AS nk FROM customer
    ),
    n AS (
        SELECT nullif(n_nationkey, 5) AS nk, n_name FROM nation
    )
    SELECT coalesce(cast(c.nk AS VARCHAR), 'NULL') AS join_key,
           count(*) AS n_pairs
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
    GROUP BY 1
    """,
)
def q_null_safe_join(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the join you need when NULL
    is a real category (here nation 5 is nulled on both sides and its
    customers still pair up). Spark plans EqualNullSafe as an ordinary
    hash-join key, so the scale story is identical to an equi-join —
    but note every NULL lands in ONE hash bucket, so a NULL-heavy key
    is a skew key: salt it like any other hot value."""
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(5)).alias("nk")
    )
    n = T(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey"), F.lit(5)).alias("nk"), "n_name"
    )
    return (
        c.join(n, c["nk"].eqNullSafe(n["nk"]))
        .groupBy(
            F.coalesce(c["nk"].cast("string"), F.lit("NULL")).alias("join_key")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "q_not_in_nulls",
    oracle="""
    WITH excl AS (
        SELECT nullif(n_nationkey, 3) AS nk FROM nation WHERE n_nationkey < 10
    )
    SELECT 'subquery_has_null' AS variant, count(*) AS n_rows
    FROM customer WHERE c_nationkey NOT IN (SELECT nk FROM excl)
    UNION ALL
    SELECT 'nulls_filtered' AS variant, count(*) AS n_rows
    FROM customer
    WHERE c_nationkey NOT IN (SELECT nk FROM excl WHERE nk IS NOT NULL)
    """,
)
def q_not_in_nulls(spark, sf_dir):
    """NOT IN three-valued logic: one NULL in the subquery makes
    `x NOT IN (...)` UNKNOWN for every row (0 rows survive), while the
    NULL-filtered variant behaves like the anti-join people expect.
    Spark plans the first variant as a null-aware anti join — at scale
    that join degrades to a broadcast of the whole right side, which is
    exactly why pipelines should write `NOT IN (... WHERE k IS NOT
    NULL)` or NOT EXISTS; this query documents both behaviors."""
    c = T(spark, sf_dir, "customer")
    c.createOrReplaceTempView("_nin_customer")
    T(spark, sf_dir, "nation").createOrReplaceTempView("_nin_nation")
    return spark.sql(
        """
        WITH excl AS (
            SELECT nullif(n_nationkey, 3) AS nk FROM _nin_nation
            WHERE n_nationkey < 10
        )
        SELECT 'subquery_has_null' AS variant, count(*) AS n_rows
        FROM _nin_customer WHERE c_nationkey NOT IN (SELECT nk FROM excl)
        UNION ALL
        SELECT 'nulls_filtered' AS variant, count(*) AS n_rows
        FROM _nin_customer
        WHERE c_nationkey NOT IN (SELECT nk FROM excl WHERE nk IS NOT NULL)
        """
    )


@query(
    "q_corr_matrix",
    oracle=f"""
    SELECT
        {sr("corr(l_quantity, l_extendedprice)", 6)} AS qty_price,
        {sr("corr(l_quantity, l_discount)", 6)} AS qty_disc,
        {sr("corr(l_quantity, l_tax)", 6)} AS qty_tax,
        {sr("corr(l_extendedprice, l_discount)", 6)} AS price_disc,
        {sr("corr(l_extendedprice, l_tax)", 6)} AS price_tax,
        {sr("corr(l_discount, l_tax)", 6)} AS disc_tax
    FROM lineitem
    """,
)
def q_corr_matrix(spark, sf_dir):
    """Pairwise correlation matrix of the four lineitem measures in ONE
    aggregate pass — the feature-redundancy profile an ML pipeline
    computes before training. All six corr() aggregates share one scan
    and one partial/final pair; the shuffle carries 6x5 doubles of
    moment state total, at any row count."""
    li = T(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice", "qty_price"),
        ("l_quantity", "l_discount", "qty_disc"),
        ("l_quantity", "l_tax", "qty_tax"),
        ("l_extendedprice", "l_discount", "price_disc"),
        ("l_extendedprice", "l_tax", "price_tax"),
        ("l_discount", "l_tax", "disc_tax"),
    ]
    return li.agg(*[R(F.corr(a, b), 6).alias(n) for a, b, n in pairs])


@query(
    "q_autocorr",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, count(*) AS n
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT n,
               lag(n, 1) OVER (ORDER BY h) AS n_1,
               lag(n, 24) OVER (ORDER BY h) AS n_24
        FROM hourly
    )
    SELECT {sr("corr(n, n_1)", 6)} AS acf_1,
           {sr("corr(n, n_24)", 6)} AS acf_24
    FROM lagged
    """,
)
def q_autocorr(spark, sf_dir):
    """Lag-1 and lag-24 autocorrelation of the hourly event-count series
    — the seasonality detector behind forecasting and anomaly baselines
    (a daily cycle shows up as high acf_24). The series is an aggregate
    (|hours| rows), so the single-partition lag window is over a frame
    that FITS by construction at any raw-event scale; the raw events
    only ever pass through the hour groupBy."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("h")
    lagged = hourly.select(
        "n",
        F.lag("n", 1).over(w).alias("n_1"),
        F.lag("n", 24).over(w).alias("n_24"),
    )
    return lagged.agg(
        R(F.corr("n", "n_1"), 6).alias("acf_1"),
        R(F.corr("n", "n_24"), 6).alias("acf_24"),
    )


@query(
    "q_window_distinct",
    oracle="""
    SELECT user_id, event_id,
           count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS types_so_far
    FROM events
    """,
)
def q_window_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) per user — how many distinct event types
    each user has produced up to each event. Spark rejects DISTINCT
    aggregates over windows; the standard rewrite is
    size(collect_set() OVER w), which is exact and keeps the one window
    shuffle. Scale note: the per-row set state is bounded by the
    DISTINCT-VALUE count of the column (5 types here), NOT the row
    count — the rewrite is only appropriate for low-cardinality
    columns; for high-cardinality use the offline groupBy form."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("types_so_far"),
    )


@query(
    "q_quantified",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > ALL (
        SELECT c_acctbal FROM customer WHERE c_nationkey = 3
    )
    AND c_nationkey = ANY (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 1
    )
    ORDER BY c_custkey
    """,
)
def q_quantified(spark, sf_dir):
    """ANSI quantified comparison subqueries (> ALL / = ANY), which
    Spark's parser rejects outright — the dialect normalizer rewrites
    them (`= ANY` → IN exactly; `> ALL` → max scalar subquery, exact on
    non-empty null-free sets) and the rewritten plan runs as an
    ordinary broadcast-scalar + semi-join composition. DuckDB executes
    the ORIGINAL quantified SQL natively as the oracle, so the rewrite
    itself is what's being certified."""
    from mesin_spark.context import normalize_dialect

    T(spark, sf_dir, "customer").createOrReplaceTempView("_qt_customer")
    T(spark, sf_dir, "nation").createOrReplaceTempView("_qt_nation")
    return spark.sql(
        normalize_dialect(
            """
            SELECT c_custkey, c_acctbal
            FROM _qt_customer
            WHERE c_acctbal > ALL (
                SELECT c_acctbal FROM _qt_customer WHERE c_nationkey = 3
            )
            AND c_nationkey = ANY (
                SELECT n_nationkey FROM _qt_nation WHERE n_regionkey = 1
            )
            ORDER BY c_custkey
            """,
            "ansi",
        )
    )


@query(
    "q_winsorize",
    oracle=f"""
    WITH edges AS (
        SELECT event_type AS et,
               {sr("quantile_cont(value, 0.05)", 4)} AS lo,
               {sr("quantile_cont(value, 0.95)", 4)} AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           {sr("least(greatest(e.value, x.lo), x.hi)", 4)} AS value_w
    FROM events e JOIN edges x ON e.event_type = x.et
    ORDER BY e.event_id
    """,
)
def q_winsorize(spark, sf_dir):
    """Per-group winsorization: values clipped to the [p5, p95] band of
    their event type — outlier limiting that (unlike dropping) keeps the
    row count, the standard robust-stats preprocessing before training.
    One per-group percentile aggregate (|groups| rows, AQE broadcasts it
    back) + a map-side clip; sibling of q_quantile_bins (clip vs
    discretize) and q_outliers (flag vs repair)."""
    ev = load_events(spark, sf_dir)
    edges = ev.groupBy(F.col("event_type").alias("et")).agg(
        R(F.percentile("value", F.lit(0.05)), 4).alias("lo"),
        R(F.percentile("value", F.lit(0.95)), 4).alias("hi"),
    )
    return (
        ev.join(F.broadcast(edges), ev["event_type"] == edges["et"])
        .select(
            "event_id",
            R(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 4).alias(
                "value_w"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "q_temporal_split",
    oracle="""
    WITH cutoff AS (
        SELECT to_timestamp(floor(epoch(min(ts)))
               + CAST(floor((floor(epoch(max(ts))) - floor(epoch(min(ts)))) * 0.8) AS BIGINT))
               AS c
        FROM events
    )
    SELECT CASE WHEN e.ts < x.c THEN 'train' ELSE 'test' END AS split,
           count(*) AS n,
           CAST(floor(epoch(min(e.ts))) AS BIGINT) AS first_epoch,
           CAST(floor(epoch(max(e.ts))) AS BIGINT) AS last_epoch
    FROM events e CROSS JOIN cutoff x
    GROUP BY 1 ORDER BY 1
    """,
)
def q_temporal_split(spark, sf_dir):
    """Temporal train/test split at the 80% point of the observed time
    range: everything before the cutoff trains, everything after tests —
    the leakage-free split time-dependent data REQUIRES (a q_hash_split
    random split would leak future events into training). The cutoff
    derives from a 1-row min/max aggregate (broadcast back), the
    assignment is a map-side comparison, and the summary proves the
    invariant the split exists for: train's last_epoch < test's
    first_epoch."""
    ev = load_events(spark, sf_dir)
    bounds = ev.agg(
        F.unix_timestamp(F.min("ts")).alias("t0"),
        F.unix_timestamp(F.max("ts")).alias("t1"),
    ).select(
        F.to_timestamp(
            F.col("t0") + F.floor((F.col("t1") - F.col("t0")) * 0.8).cast("long")
        ).alias("c")
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("ts") < F.col("c"), F.lit("train"))
            .otherwise(F.lit("test"))
            .alias("split"),
            "ts",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.unix_timestamp(F.min("ts")).alias("first_epoch"),
            F.unix_timestamp(F.max("ts")).alias("last_epoch"),
        )
        .orderBy("split")
    )


@query(
    "q_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT event_type AS et, {sr("quantile_cont(value, 0.5)", 6)} AS m
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, x.m,
               abs(e.value - x.m) AS d
        FROM events e JOIN med x ON e.event_type = x.et
    ),
    mad AS (
        SELECT event_type AS et, {sr("quantile_cont(d, 0.5)", 6)} AS mad
        FROM dev GROUP BY event_type
    )
    SELECT v.event_id, v.event_type,
           {sr("v.value", 4)} AS value,
           {sr("(v.value - v.m) / (1.4826 * y.mad)", 4)} AS robust_z
    FROM dev v JOIN mad y ON v.event_type = y.et
    WHERE abs({sr("(v.value - v.m) / (1.4826 * y.mad)", 4)}) > 3.0
    ORDER BY v.event_id
    """,
)
def q_mad_outliers(spark, sf_dir):
    """Robust outlier detection via median absolute deviation: flag
    events whose |value - median| exceeds 3 scaled MADs of their event
    type (1.4826·MAD ≈ σ under normality) — unlike q_outliers' z-score,
    the threshold itself cannot be dragged by the outliers it hunts.
    Two per-group percentile aggregates (|groups| rows each, broadcast
    back) around one fact scan; the flagging filter is map-side."""
    ev = load_events(spark, sf_dir)
    med = ev.groupBy(F.col("event_type").alias("et")).agg(
        R(F.percentile("value", F.lit(0.5)), 6).alias("m")
    )
    dev = ev.join(F.broadcast(med), ev["event_type"] == med["et"]).select(
        "event_id", "event_type", "value", "m",
        F.abs(F.col("value") - F.col("m")).alias("d"),
    )
    mad = dev.groupBy(F.col("event_type").alias("et2")).agg(
        R(F.percentile("d", F.lit(0.5)), 6).alias("mad")
    )
    rz = R((F.col("value") - F.col("m")) / (F.lit(1.4826) * F.col("mad")), 4)
    return (
        dev.join(F.broadcast(mad), dev["event_type"] == mad["et2"])
        .select(
            "event_id",
            "event_type",
            R(F.col("value"), 4).alias("value"),
            rz.alias("robust_z"),
        )
        .filter(F.abs(F.col("robust_z")) > 3.0)
        .orderBy("event_id")
    )
