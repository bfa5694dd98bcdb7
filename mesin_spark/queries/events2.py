"""Event-analytics operators round 2: funnel analysis, cohort retention,
purchase attribution, linear gap interpolation, and SCD Type-2 state
history. These are the product-analytics queries a TimescaleDB/ClickHouse
user of the reference's event tier would expect (SURVEY.md §2.10 batch
extension; reference has only the logical-plan shell, tmp/select.rs has no
event tier at all).

All five are deterministic closed-form arithmetic over `events`, so each
carries an exact DuckDB oracle. Timestamps are emitted as floor-epoch
seconds (events.ts is TIMESTAMP(NANOS) in parquet; Spark reads µs via
sources.read_parquet, DuckDB keeps ns — epoch seconds compare exactly).

Scale design: every query shuffles on ``user_id`` once (funnel: three
successively-smaller per-user aggregates that AQE broadcasts; retention /
attribution / SCD2: one window or groupBy partitioned by user). No
driver-side loops, no Python UDFs; event-time ordering uses (ts, event_id)
so plans are deterministic under parallel reads.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mesin_spark.queries import R, T, query, sr


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT '1_view' AS step, count(*) AS users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered funnel view -> click -> purchase: a user counts at step N
    only with an event AFTER their step-N-1 time (strict event-time
    sequencing, the semantics ClickHouse's windowFunnel implements).

    Three per-user min-aggregates, each joined to the previous stage:
    one user_id shuffle for the first, then AQE broadcasts the shrinking
    stage frames (distinct users ≤ step-1 survivors) into the filtered
    event scans — no fact-fact shuffle at any step."""
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(df, label):
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(label).alias("step"), "users"
        )

    return (
        step(v, "1_view")
        .unionAll(step(c, "2_click"))
        .unionAll(step(p, "3_purchase"))
    )


@query(
    "q_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT CAST(floor(epoch(f.cohort)) AS BIGINT) AS cohort_week,
           CAST(date_diff('day', f.cohort, a.w) / 7 AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS users
    FROM first_seen f JOIN active a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_retention(spark, sf_dir):
    """Cohort retention: users bucketed by first-seen week, counted in
    each later week they were active — the triangle every growth dashboard
    plots. Both date_trunc('week') engines are ISO-Monday-based.

    One user_id shuffle builds both per-user frames; the cohort×offset
    re-aggregation runs on the already-distinct (user, week) rows. The
    first_seen side is |users| rows → AQE broadcasts it into the join."""
    ev = T(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            F.unix_timestamp("cohort").alias("cohort_week"),
            (F.datediff("w", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("users"))
    )


@query(
    "q_attribution",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts,
               first_value(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS first_touch,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_et
        FROM events
    )
    SELECT first_touch,
           coalesce(prev_et, 'direct') AS last_touch,
           count(*) AS purchases
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def q_attribution(spark, sf_dir):
    """Marketing attribution: every purchase credited to the user's FIRST
    event ever (first-touch) and the event immediately BEFORE the purchase
    (last-touch); purchases with no prior event are 'direct'. Ordering is
    (ts, event_id) so the window is deterministic.

    One window shuffle on user_id computes both touches in a single pass;
    the (first, last) matrix aggregation afterwards is partial-agg'd
    map-side."""
    ev = T(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.first("event_type").over(win).alias("first_touch"),
        F.lag("event_type").over(win).alias("prev_et"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            "first_touch",
            F.coalesce("prev_et", F.lit("direct")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).alias("purchases"))
    )


@query(
    "q_interpolate",
    oracle=f"""
    WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        FROM events WHERE event_type = 'purchase'
    ),
    spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
    hourly AS (
        SELECT date_trunc('hour', ts) AS h, avg(value) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    j AS (
        SELECT spine.h, hourly.v,
               last_value(hourly.v IGNORE NULLS) OVER w AS pv,
               last_value(CASE WHEN hourly.v IS NOT NULL THEN spine.h END
                          IGNORE NULLS) OVER w AS ph,
               first_value(hourly.v IGNORE NULLS) OVER w2 AS nv,
               first_value(CASE WHEN hourly.v IS NOT NULL THEN spine.h END
                           IGNORE NULLS) OVER w2 AS nh
        FROM spine LEFT JOIN hourly ON spine.h = hourly.h
        WINDOW w AS (ORDER BY spine.h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (ORDER BY spine.h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT CAST(floor(epoch(h)) AS BIGINT) AS hour_ts,
           (v IS NOT NULL) AS observed,
           {sr('''CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               ELSE pv + (nv - pv) * (epoch(h) - epoch(ph))
                                   / (epoch(nh) - epoch(ph))
           END''', 6)} AS v_interp
    FROM j
    """,
)
def q_interpolate(spark, sf_dir):
    """Linear interpolation over a gap-filled hourly series: hours with no
    purchases get the time-weighted line between the surrounding observed
    hours (leading/trailing gaps extend the nearest observation) — the
    `interpolate()` resample primitive (reference tier: timeseries; Spark
    has no built-in, composed from ignore-nulls window carries).

    The spine is sequence()+explode off a 1-row bounds aggregate; the only
    data shuffle is the hourly groupBy. The two unbounded carries run in
    one global-window pass each — fine here because the spine is
    hours-sized (tiny), NOT data-sized; at 100 TB the spine stays small
    while the hourly agg does the heavy lifting."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.avg("value").alias("v")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    j = spine.join(hourly, "h", "left")
    wb = W.orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = W.orderBy("h").rowsBetween(W.currentRow, W.unboundedFollowing)
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    j = j.select(
        "h",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wb).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("nh"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.unix_timestamp("h") - F.unix_timestamp("ph"))
            / (F.unix_timestamp("nh") - F.unix_timestamp("ph"))
        )
    )
    return j.select(
        F.unix_timestamp("h").alias("hour_ts"),
        F.col("v").isNotNull().alias("observed"),
        R(interp, 6).alias("v_interp"),
    )


@query(
    "q_scd2",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_et
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type AS state, ts, event_id
        FROM seq WHERE prev_et IS NULL OR prev_et <> event_type
    )
    SELECT user_id, state,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
           CAST(floor(epoch(lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
               AS is_current
    FROM changes
    """,
)
def q_scd2(spark, sf_dir):
    """SCD Type-2 history build: collapse each user's event stream into
    versioned state intervals — a row per run of equal event_type with
    [valid_from, valid_to) validity and an is_current flag. This is the
    standard dimension-history pattern (Kimball type 2) the reference's
    CRUD tier stops short of (tmp/crud.txt has plain UPDATE only).

    Single shuffle: change-point detection (lag), versioning (row_number)
    and interval close (lead) all share the user_id window partitioning,
    so Catalyst plans ONE exchange and three Window ops back-to-back on
    the same sort order."""
    ev = T(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(win).alias("prev_et"),
    )
    changes = seq.filter(
        F.col("prev_et").isNull() | (F.col("prev_et") != F.col("event_type"))
    ).select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    # (ts, event_id): two change rows at an identical timestamp would get
    # nondeterministic version/interval assignment under ts alone
    cwin = W.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.row_number().over(cwin).cast("long").alias("version"),
        F.unix_timestamp("ts").alias("valid_from"),
        F.unix_timestamp(F.lead("ts").over(cwin)).alias("valid_to"),
        F.lead("ts").over(cwin).isNull().alias("is_current"),
    )


@query(
    "q_event_pattern",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(left(event_type, 1), '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n_patterns
    FROM seq
    WHERE len(regexp_extract_all(s, 'vc*p')) > 0
    """,
)
def q_event_pattern(spark, sf_dir):
    """Sequence-pattern matching (MATCH_RECOGNIZE-lite): each user's
    event stream becomes an ordered symbol string (first letter of
    event_type), and the pattern `view (click)* purchase` is counted as
    the regex ``vc*p`` — non-overlapping matches, exactly the
    MATCH_RECOGNIZE ONE ROW PER MATCH semantics for this pattern. One
    groupBy(user) shuffle builds the string; the regex runs map-side.
    At 100 TB per-user sequences are bounded (sessions), so the
    collect_list stays cell-sized — the standard symbolization trick for
    pattern queries Spark lacks natively."""
    ev = T(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
                        )
                    )
                ),
                lambda s: s["c"],
            ),
            "",
        ).alias("s")
    )
    counted = seq.select(
        "user_id", F.regexp_count("s", F.lit("vc*p")).cast("long").alias("n_patterns")
    )
    return counted.filter(F.col("n_patterns") > 0)


@query(
    "q_pit_features",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    with_click AS (
        SELECT p.event_id, p.user_id, p.ts, c.value AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT w.event_id,
           w.last_click_value,
           v.value AS last_view_value
    FROM with_click w
    ASOF LEFT JOIN views v ON w.user_id = v.user_id AND w.ts >= v.ts
    """,
)
def q_pit_features(spark, sf_dir):
    """Point-in-time feature lookup (the feature-store join): for every
    purchase, the value of each feature stream (last click, last view)
    AS OF purchase time — no leakage from the future. The scalable shape
    is N feature streams in ONE union+window pass: tag each stream, sort
    (ts, side) per user, carry every feature forward with
    last(ignorenulls). One user_id shuffle TOTAL, vs one as-of join per
    feature (N shuffles) in the naive plan — at 100 TB with dozens of
    features this is the difference between one sort and a join
    pipeline. And because the streams are disjoint event types, the
    union itself is ONE conditional projection over ONE events scan
    (asserted in tests/test_scale_plans.py) — not a scan per stream.
    The real event_id pins the (ts, side, event_id) window order, so
    same-timestamp feature rows carry deterministically. (DuckDB
    oracle: chained native ASOF joins.)"""
    e = T(spark, sf_dir, "events")
    t = F.col("event_type")
    tagged = e.filter(t.isin("click", "view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(t == "purchase", F.lit(1)).otherwise(F.lit(0)).alias("side"),
        F.when(t == "click", F.col("value")).alias("c_val"),
        F.when(t == "view", F.col("value")).alias("v_val"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn(
            "last_click_value", F.last("c_val", ignorenulls=True).over(w)
        )
        .withColumn("last_view_value", F.last("v_val", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "last_click_value", "last_view_value")
    )


@query(
    "q_time_to_event",
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'purchase' THEN ts END AS p_ts
        FROM events
    ),
    carried AS (
        SELECT event_id, ts,
               min(p_ts) OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS next_p_ts
        FROM tagged
    )
    SELECT event_id,
           CAST(floor(epoch(next_p_ts)) - floor(epoch(ts)) AS BIGINT)
               AS secs_to_purchase
    FROM carried
    """,
)
def q_time_to_event(spark, sf_dir):
    """Time-to-next-event labels (survival / uplift / churn targets):
    for every event, the seconds until the SAME user's next strictly
    later purchase — NULL if they never purchase again (the censored
    case). The forward-looking mirror of q_asof_join: one events scan,
    one user_id window running time-DESCENDING with a 1-PRECEDING
    bound (so an event never labels itself), min-carrying the purchase
    timestamps backward. One shuffle at any scale; label generation
    never joins."""
    e = T(spark, sf_dir, "events")
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return tagged.select(
        "event_id",
        (
            F.unix_timestamp(F.min("p_ts").over(w)) - F.unix_timestamp("ts")
        ).alias("secs_to_purchase"),
    )


@query(
    "q_negative_sampling",
    oracle="""
    WITH interactions AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS item
        FROM events WHERE event_type = 'purchase'
    ),
    items AS (SELECT DISTINCT item FROM interactions),
    buyers AS (SELECT DISTINCT user_id FROM interactions),
    candidates AS (
        SELECT u.user_id, i.item
        FROM buyers u CROSS JOIN items i
        ANTI JOIN interactions s
            ON u.user_id = s.user_id AND i.item = s.item
    )
    SELECT user_id, item AS negative_item
    FROM candidates
    ORDER BY user_id, negative_item
    """,
)
def q_negative_sampling(spark, sf_dir):
    """Negative sampling for contrastive / recommendation training: per
    purchasing user, the catalog items (props.k bucketed to a 20-item
    catalog) they have NEVER purchased — the (user, item) pairs a
    ranking model trains against as negatives. Runs
    ext.pipeline.negative_sample in EXACT mode (k=None): distinct
    interactions (one hash agg), the small catalog broadcast-expanded
    per user, one anti-join keyed on (user, item) — full enumeration is
    the right plan when the catalog is 20 items by construction. At a
    real catalog size the SAME function's ``k=`` path bounds the
    candidate set to k×oversample portable-hash draws per user BEFORE
    the anti-join (tested against a 5000-item catalog in
    tests/test_round3.py), so candidates — never users×items — bound
    the shuffle."""
    from mesin_spark.ext.pipeline import negative_sample

    e = T(spark, sf_dir, "events")
    interactions = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.get_json_object("props", "$.k").cast("long") % 20).alias("item"),
    )
    return (
        negative_sample(interactions, "user_id", "item", k=None)
        .select("user_id", F.col("item").alias("negative_item"))
        .orderBy("user_id", "negative_item")
    )


@query(
    "q_rolling_window",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, count(*) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch, n,
           CAST(sum(n) OVER (ORDER BY h
                RANGE BETWEEN INTERVAL 23 HOURS PRECEDING AND CURRENT ROW)
                AS BIGINT) AS roll_sum_24h,
           {sr(
               "avg(n) OVER (ORDER BY h"
               " RANGE BETWEEN INTERVAL 23 HOURS PRECEDING AND CURRENT ROW)",
               4,
           )} AS roll_avg_24h,
           {sr(
               "n::DOUBLE / max(n) OVER (ORDER BY h RANGE BETWEEN"
               " INTERVAL 24 HOURS PRECEDING AND INTERVAL 24 HOURS PRECEDING)"
               " - 1.0",
               4,
           )} AS pct_vs_prev_day
    FROM hourly
    ORDER BY hour_epoch
    """,
)
def q_rolling_window(spark, sf_dir):
    """Time-INTERVAL rolling window: trailing-24h sum/mean of hourly
    purchase counts (RANGE over event time, so gaps in the series widen
    the frame correctly — a ROWS frame would silently slide past
    missing hours) plus day-over-day percent change via a RANGE lookup
    pinned at exactly h-24h (NULL when yesterday's hour is missing — a
    24-ROW lag would misalign on any gappy series, the very pitfall the
    rolling frame avoids). The
    windows run over the HOURLY AGGREGATE (|hours| rows), never raw
    events — the q_autocorr reduction; the single-partition frame is
    bounded by construction at any event volume."""
    ev = T(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    secs = F.unix_timestamp("h")
    wr = W.orderBy(secs.cast("long")).rangeBetween(-23 * 3600, 0)
    wd = W.orderBy(secs.cast("long")).rangeBetween(-24 * 3600, -24 * 3600)
    return hourly.select(
        F.unix_timestamp("h").alias("hour_epoch"),
        "n",
        F.sum("n").over(wr).cast("long").alias("roll_sum_24h"),
        R(F.avg("n").over(wr), 4).alias("roll_avg_24h"),
        R(F.col("n") / F.max("n").over(wd) - 1.0, 4).alias("pct_vs_prev_day"),
    ).orderBy("hour_epoch")


@query(
    "q_ab_test",
    oracle=f"""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN (CAST((CAST(user_id AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)) % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm
        FROM events
    ),
    converted AS (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        GROUP BY user_id HAVING count(*) >= 14
    ),
    arms AS (
        SELECT a.arm,
               count(*) AS n_users,
               count(c.user_id) AS n_converted
        FROM assigned a LEFT JOIN converted c ON a.user_id = c.user_id
        GROUP BY a.arm
    ),
    wide AS (
        SELECT
            max(CASE WHEN arm = 'A' THEN n_users END) AS na,
            max(CASE WHEN arm = 'A' THEN n_converted END) AS xa,
            max(CASE WHEN arm = 'B' THEN n_users END) AS nb,
            max(CASE WHEN arm = 'B' THEN n_converted END) AS xb
        FROM arms
    )
    SELECT na, xa, nb, xb,
           {sr("xa::DOUBLE / na", 6)} AS rate_a,
           {sr("xb::DOUBLE / nb", 6)} AS rate_b,
           {sr(
               "(xa::DOUBLE / na - xb::DOUBLE / nb)"
               " / nullif(sqrt(((xa + xb)::DOUBLE / (na + nb))"
               "   * (1.0 - (xa + xb)::DOUBLE / (na + nb))"
               "   * (1.0 / na + 1.0 / nb)), 0.0)",
               4,
           )} AS z_stat
    FROM wide
    """,
)
def q_ab_test(spark, sf_dir):
    """In-engine A/B test: users deterministically hash-split into two
    arms (the same portable bucket as q_hash_split; 'conversion' = a\n    heavy-purchaser threshold so the synthetic data has both outcomes — reproducible
    assignment is the experiment-integrity requirement), per-arm
    purchase-conversion rates, and the pooled two-proportion z statistic
    (|z| > 1.96 ≈ 95% significance). Two distinct-user aggregates and a
    4-number driver-free reduction — experiment readouts at any event
    volume for the price of two shuffles."""
    from mesin_spark.ext.pipeline import split_bucket

    ev = T(spark, sf_dir, "events")
    assigned = ev.select("user_id").distinct().select(
        "user_id",
        F.when(split_bucket("user_id", 2) == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("arm"),
    )
    converted = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_p"))
        .filter(F.col("n_p") >= 14)
        .select("user_id", F.lit(1).alias("conv"))
    )
    arms = (
        assigned.join(converted, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("conv").alias("n_converted"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("xa"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("xb"),
    )
    ra, rb = F.col("xa") / F.col("na"), F.col("xb") / F.col("nb")
    pooled = (F.col("xa") + F.col("xb")) / (F.col("na") + F.col("nb"))
    z = (ra - rb) / F.nullif(
        F.sqrt(pooled * (1.0 - pooled) * (1.0 / F.col("na") + 1.0 / F.col("nb"))),
        F.lit(0.0),
    )
    return wide.select(
        "na", "xa", "nb", "xb",
        R(ra, 6).alias("rate_a"),
        R(rb, 6).alias("rate_b"),
        R(z, 4).alias("z_stat"),
    )
