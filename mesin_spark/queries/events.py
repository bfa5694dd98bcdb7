"""Event-time windows over the `events` table — batch equivalents of the
streaming tier (SURVEY.md §2.10; the reference has no streaming at all).

The same groupBy(F.window(...)) expressions run unchanged under
readStream — see mesin_spark/ext/streaming.py for the streaming variants
with watermarks. Batch versions are oracle-checkable.

Precision note: events.ts is currently MICROSECOND parquet
(isAdjustedToUTC=false — the driver regenerated it; round 1 shipped ns,
and sources.read_parquet still handles both). All outputs are
floor-epoch-seconds BIGINT so any future precision change can't reach
the value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.queries import T, query
from mesin_spark.queries import R  # stable rounding


@query(
    "q_tumbling_batch",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS win_start,
           event_type,
           count(*) AS n,
           floor((SUM(value)) * 100.0 + 0.5) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling_batch(spark, sf_dir):
    """Tumbling 1-hour windows: F.window(ts, '1 hour') — epoch-aligned in
    both engines. At scale this is a plain hash aggregate; the window
    struct is computed row-side (no shuffle beyond the groupBy)."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), R(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "q_sliding_batch",
    oracle="""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) t(k))
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '15 minutes', ts)
                            - k * INTERVAL '15 minutes')) AS BIGINT) AS win_start,
           count(*) AS n,
           floor((SUM(value)) * 100.0 + 0.5) / 100.0 AS total_value
    FROM events CROSS JOIN offsets
    WHERE ts >= time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
      AND ts <  time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
                + INTERVAL '30 minutes'
    GROUP BY 1
    """,
)
def q_sliding_batch(spark, sf_dir):
    """Sliding windows 30min/15min: each event lands in 2 windows. Spark's
    F.window(ts, '30 minutes', '15 minutes') expands row-side; the oracle
    reconstructs the same assignment with an explicit offset join."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), R(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "n",
            "total_value",
        )
    )


@query(
    "q_session_batch",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_session_batch(spark, sf_dir):
    """Session windows, 10-minute gap, per user — F.session_window in batch
    mode (Spark ≥3.2). Session semantics: an event at exactly start+gap
    opens a NEW session (window end is exclusive); the oracle's lag-cumsum
    reconstruction uses >= gap for the same boundary."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "n_events",
        )
    )


@query(
    "q_asof_join",
    oracle="""
    SELECT e.event_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS last_purchase_epoch
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (charter extension, SURVEY.md §2.3 'absent' row): for each
    event, the latest purchase by the same user at or before it.

    Spark lacks a native as-of join; the scalable technique is the
    union+window method — tag both sides, sort by (ts, side) within each
    user, and carry the last purchase timestamp forward with
    last(ignorenulls). ONE shuffle on user_id, no range explosion, no
    per-group pandas; works at 100 TB wherever a window does. The two
    sides come from ONE events scan: purchase rows map-side explode into
    (reference, probe) twins while everything else stays a single probe
    row — not a scan per side. (DuckDB has a native ASOF JOIN — that's
    the oracle.)
    """
    e = T(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.explode(
            F.when(is_p, F.array(F.lit(0), F.lit(1))).otherwise(
                F.array(F.lit(1))
            )
        ).alias("side"),
    ).withColumn(
        "p_ts", F.when(F.col("side") == 0, F.col("ts")).cast("timestamp")
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("last_p_ts", F.last("p_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            F.unix_timestamp(F.col("last_p_ts")).alias("last_purchase_epoch"),
        )
    )


@query(
    "q_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE try_cast(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    """,
)
def q_json_props(spark, sf_dir):
    """Semi-structured JSON column: extract a typed field from the props
    JSON string (get_json_object — JVM-side Jackson parse, no UDF), filter
    on it, aggregate. The realistic event-payload shape: JSON stays one
    string column, typed extraction happens at query time."""
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@query(
    "q_ewma",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), s AS (
        SELECT user_id, event_id, rn,
               rn % 6000 AS pa, (rn + 3000) % 6000 AS pb,
               SUM(value * pow(0.9, -rn)) OVER
                   (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING) AS srun,
               SUM(value * pow(0.9, -(rn % 6000))) OVER
                   (PARTITION BY user_id ORDER BY rn ROWS 2999 PRECEDING) AS sa,
               SUM(value * pow(0.9, -((rn + 3000) % 6000))) OVER
                   (PARTITION BY user_id ORDER BY rn ROWS 2999 PRECEDING) AS sb,
               FIRST_VALUE(value) OVER
                   (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING) AS v1
        FROM o
    )
    SELECT user_id, event_id,
           floor((CASE WHEN rn <= 3000
                       THEN pow(0.9, rn) * (0.1 * srun + v1)
                       WHEN pa >= 3000 THEN 0.1 * pow(0.9, pa) * sa
                       ELSE 0.1 * pow(0.9, pb) * sb
                  END) * 1000000.0 + 0.5) / 1000000.0 AS ewma
    FROM s
    """,
)
def q_ewma(spark, sf_dir):
    """Exponentially weighted moving average per user (alpha=0.1),
    closed-form over ONE ordered running window: with r=1-alpha,
    ewma_i = r^i·(alpha·Σ v_j·r^(-j) + v_1) ≡ the recursive
    e_i = alpha·v_i + r·e_(i-1). Running-frame sums evaluate in a fixed
    order, so both engines produce bit-identical values — the time-series
    smoothing primitive without a UDF or iteration."""
    from pyspark.sql import Window as W

    e = T(spark, sf_dir, "events")
    w_rn = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id", "event_id", "value", F.row_number().over(w_rn).alias("rn")
    )
    w_run = (
        W.partitionBy("user_id").orderBy("rn").rowsBetween(W.unboundedPreceding, 0)
    )
    # Numeric stability at unbounded history: the closed form's
    # pow(0.9, -rn) overflows past rn ≈ 6700 (0.9^-6700 > DBL_MAX), so it
    # serves only rn ≤ 3000 (where it is exact INCLUDING the init term).
    # Beyond that, contributions older than 3000 events are < 0.9^3000 ≈
    # 5e-138 — invisible at any precision this column reports — so the
    # windowed form ewma_i = 0.1·Σ_{k<3000} 0.9^k·v_{i-k} is used, with
    # the rescaled prefix factored over TWO OFFSET block grids (block
    # 6000, offset 3000): every 3000-row window lies entirely inside one
    # block of one grid, so in-block positions bound every exponent by
    # 0.9^-5999 < DBL_MAX. Both engines evaluate the identical
    # expressions, so values stay bit-equal.
    w_win = W.partitionBy("user_id").orderBy("rn").rowsBetween(-2999, 0)
    pa = F.pmod(F.col("rn"), F.lit(6000))
    pb = F.pmod(F.col("rn") + 3000, F.lit(6000))
    s = o.select(
        "user_id",
        "event_id",
        "rn",
        pa.alias("pa"),
        pb.alias("pb"),
        F.sum(F.col("value") * F.pow(F.lit(0.9), -F.col("rn"))).over(w_run).alias("srun"),
        F.sum(F.col("value") * F.pow(F.lit(0.9), -pa)).over(w_win).alias("sa"),
        F.sum(F.col("value") * F.pow(F.lit(0.9), -pb)).over(w_win).alias("sb"),
        F.first("value").over(w_run).alias("v1"),
    )
    ewma = (
        F.when(
            F.col("rn") <= 3000,
            F.pow(F.lit(0.9), F.col("rn")) * (0.1 * F.col("srun") + F.col("v1")),
        )
        .when(F.col("pa") >= 3000, 0.1 * F.pow(F.lit(0.9), F.col("pa")) * F.col("sa"))
        .otherwise(0.1 * F.pow(F.lit(0.9), F.col("pb")) * F.col("sb"))
    )
    return s.select("user_id", "event_id", R(ewma, 6).alias("ewma"))


@query(
    "q_rollup_daily",
    oracle="""
    WITH q AS (
        SELECT ts, event_type,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS micro
        FROM events
    )
    SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_start,
           event_type,
           count(*) AS n,
           floor((SUM(micro) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_v,
           floor((SUM(micro)::DOUBLE / count(*) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS avg_v
    FROM q GROUP BY 1, 2
    """,
)
def q_rollup_daily(spark, sf_dir):
    """Hypertable-style continuous aggregate (charter op): daily numbers
    answered from an HOURLY rollup table, not raw events — sums/counts
    re-aggregate exactly, avg derived from decomposed state
    (mesin_spark.ext.rollup). The oracle aggregates raw events directly,
    proving the rollup path is lossless.

    Values are quantized to exact integer micro-units BEFORE any
    aggregation (the metrics-store convention): double summation is
    order-dependent, and a sweep under a different partitioning caught a
    6-dp avg flipping a rounding boundary between engines — integer
    sums are order-independent, so every engine and every partitioning
    produces the identical rolled-up numbers."""
    from mesin_spark.ext.rollup import reaggregate, time_rollup

    # decimal(20,0), not long: Spark's sum over LongType wraps silently
    # past 2^63 (ANSI off) while the oracle's HUGEINT promotes — at the
    # 100 TB/day bucket sizes this tier targets, micro-unit sums need the
    # wider exact type (sum over decimal(20,0) yields decimal(30,0))
    e = T(spark, sf_dir, "events").withColumn(
        "value",
        F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("decimal(20,0)"),
    )
    hourly = time_rollup(e, "1 hour", group_cols=["event_type"])
    daily = reaggregate(hourly, "1 day", group_cols=["event_type"])
    return daily.select(
        F.unix_timestamp("bucket_start").alias("day_start"),
        "event_type",
        "n",
        R(F.col("sum_v") / 1000000.0, 2).alias("sum_v"),
        R(F.col("avg_v") / 1000000.0, 6).alias("avg_v"),
    )


@query(
    "q_range_join",
    oracle="""
    WITH campaigns AS (
        SELECT * FROM (VALUES
            ('newyear',   TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-03 00:00:00'),
            ('midmonth',  TIMESTAMP '2024-01-14 12:00:00', TIMESTAMP '2024-01-16 18:30:00'),
            ('closeout',  TIMESTAMP '2024-01-29 00:00:00', TIMESTAMP '2024-01-31 00:00:00')
        ) t(campaign, start_ts, end_ts)
    )
    SELECT c.campaign, count(*) AS n_events,
           floor((SUM(e.value)) * 100.0 + 0.5) / 100.0 AS total_value
    FROM events e JOIN campaigns c
      ON e.ts >= c.start_ts AND e.ts < c.end_ts
    GROUP BY c.campaign
    """,
)
def q_range_join(spark, sf_dir):
    """Interval-containment range join (absent in the reference, SURVEY.md
    §2.3): events matched to overlapping campaign windows via bucket
    expansion — an equi-join on hour bucket + residual range filter instead
    of a nested loop (mesin_spark.ext.intervals.bucketed_range_join)."""
    from mesin_spark.ext.intervals import bucketed_range_join

    e = T(spark, sf_dir, "events")
    campaigns = spark.createDataFrame(
        [
            ("newyear", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
            ("midmonth", "2024-01-14 12:00:00", "2024-01-16 18:30:00"),
            ("closeout", "2024-01-29 00:00:00", "2024-01-31 00:00:00"),
        ],
        "campaign string, start_ts string, end_ts string",
    ).select(
        "campaign",
        F.to_timestamp("start_ts").alias("start_ts"),
        F.to_timestamp("end_ts").alias("end_ts"),
    )
    joined = bucketed_range_join(e, campaigns, bucket_seconds=3600)
    return joined.groupBy("campaign").agg(
        F.count(F.lit(1)).alias("n_events"),
        R(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "q_event_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'view') AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase
    FROM events GROUP BY 1
    """,
)
def q_event_pivot(spark, sf_dir):
    """Pivot (extension): event-type counts per user bucket. Spark pivot
    with an explicit value list = single-pass aggregate, no second scan."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase"])
    )
