"""Round-2 SQL-surface widening, part 3: aggregate FILTER clause,
map-typed functions, GROUP BY ALL, a Python UDTF (lateral table function),
a mergeable HyperLogLog distinct-count rollup, and a Deequ-style data
quality check suite.

Reference parity: the ScalarFunction passthrough tier (SURVEY.md §2.8,
tmp/select.rs function dispatch) — these are the surfaces a SQL user
expects beyond scalar calls. All but q_hll_rollup carry exact DuckDB
oracles; the HLL sketch estimates are engine-specific (Apache DataSketches
in Spark, different HLL in DuckDB) so that one is rows-only with merge /
accuracy properties asserted in tests/test_sql_menu4.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.queries import T, query, register_views, sr


@query(
    "q_agg_filter",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_deep_discount,
           {sr("coalesce(sum(l_quantity) FILTER (WHERE l_tax < 0.04), 0.0)", 4)}
               AS qty_low_tax,
           count(DISTINCT l_orderkey) FILTER (WHERE l_quantity > 30)
               AS orders_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_filter(spark, sf_dir):
    """Aggregate FILTER clause (SQL:2003): per-aggregate predicates inside
    one grouped pass — the declarative form of conditional aggregation.
    Spark plans all four aggregates (including the filtered DISTINCT) into
    a single partial+final HashAggregate pair over one scan: one shuffle,
    no self-joins."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag,
               count(*) AS n_all,
               count(*) FILTER (WHERE l_discount > 0.05) AS n_deep_discount,
               CAST({sr("coalesce(sum(l_quantity) FILTER (WHERE l_tax < 0.04), 0.0)", 4)}
                   AS DOUBLE) AS qty_low_tax,
               count(DISTINCT l_orderkey) FILTER (WHERE l_quantity > 30)
                   AS orders_bulk
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT n.n_regionkey,
           count(*) AS n_nations,
           max(CASE WHEN n.n_name = 'NATION_7' THEN n.n_nationkey END)
               AS nation7_key,
           min(n.n_name) AS first_key
    FROM nation n
    GROUP BY n.n_regionkey
    """,
)
def q_fn_map(spark, sf_dir):
    """Map-typed column functions: build a name->key map per region with
    map_from_entries over a sorted entry list (array_sort makes the
    collect_list order deterministic), then probe it with element_at /
    map_keys / size. The reference's function tier has no MAP type at all;
    Spark's is first-class. One groupBy shuffle; the map stays a column
    value (never collected)."""
    n = T(spark, sf_dir, "nation")
    # entries dedup'd BY KEY before map_from_entries: Spark's default
    # mapKeyDedupPolicy=EXCEPTION would crash on a duplicate n_name in a
    # region (the oracle's aggregate form handles duplicates fine);
    # keeping each name's minimum (n_name, n_nationkey) entry after the
    # sort makes the kept value deterministic
    entries = F.array_sort(F.collect_list(F.struct("n_name", "n_nationkey")))
    deduped = F.filter(
        entries,
        lambda e, i: (i == 0)
        | (e["n_name"] != F.element_at(entries, i)["n_name"]),
    )
    per_region = n.groupBy("n_regionkey").agg(
        F.map_from_entries(deduped).alias("m")
    )
    return per_region.select(
        "n_regionkey",
        F.size("m").cast("long").alias("n_nations"),
        F.element_at("m", "NATION_7").alias("nation7_key"),
        F.element_at(F.array_sort(F.map_keys("m")), 1).alias("first_key"),
    )


@query(
    "q_groupby_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, min(o_totalprice) AS min_price
    FROM orders
    GROUP BY ALL
    """,
)
def q_groupby_all(spark, sf_dir):
    """GROUP BY ALL (Spark 3.4+/DuckDB dialect sugar): grouping keys
    inferred as every non-aggregate select item. Same physical plan as the
    explicit form — one partial+final aggregate pair."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, min(o_totalprice) AS min_price
        FROM orders
        GROUP BY ALL
        """
    )


@query(
    "q_udtf_split",
    oracle=r"""
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(text, '[.!?]+'),
                                  x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
                   x -> len(x) > 0) AS parts
        FROM documents
        WHERE doc_id < 100
    )
    SELECT s.doc_id,
           CAST(i AS INT) AS part_no,
           s.parts[i] AS part,
           CAST(len(list_filter(string_split_regex(s.parts[i], '\s+'),
                                x -> len(x) > 0)) AS INT) AS n_tokens
    FROM s, unnest(generate_series(1, len(s.parts))) AS t(i)
    """,
)
def q_udtf_split(spark, sf_dir):
    """Python UDTF (Spark 3.5+): a lateral table function exploding each
    document into sentences with position and token count — the
    user-extensible table-function surface (CREATE FUNCTION ... RETURNS
    TABLE). UDTFs run row-at-a-time in Python; this is deliberately the
    API-surface demo on a bounded slice (doc_id < 100) — the SCALE path
    for the same computation is the higher-order split in ext/text.py and
    q_chunk_docs' map-side explode."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="part_no int, part string, n_tokens int")
    class SentenceSplit:
        def eval(self, text: str):
            parts = [
                # ASCII whitespace ONLY: Python's str.strip()/\s are
                # Unicode-aware while the oracle's RE2 \s and the repo's
                # Java-regex tokenizer are ASCII — a U+00A0 would split
                # differently across the three
                p.strip(" \t\n\r\f\v")
                for p in re.split(r"[.!?]+", text or "")
                if p.strip(" \t\n\r\f\v")
            ]
            for i, p in enumerate(parts, 1):
                yield i, p, len([t for t in re.split(r"[ \t\n\r\f\v]+", p) if t])

    spark.udtf.register("sentence_split", SentenceSplit)
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.part_no, s.part, s.n_tokens
        FROM documents d, LATERAL sentence_split(d.text) s
        WHERE d.doc_id < 100
        """
    )


_HLL_EST = (
    "CASE WHEN ((CAST(0.709 AS DOUBLE) * 64 * 64) * 33554432.0) / s_scaled"
    " <= 160.0 AND (64 - n_hit) > 0"
    " THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / (64 - n_hit))"
    " ELSE ((CAST(0.709 AS DOUBLE) * 64 * 64) * 33554432.0) / s_scaled END"
)


@query(
    "q_hll_portable",
    oracle=f"""
    WITH h AS (
        -- key reduced mod P BEFORE the multiply, mirroring the Spark
        -- side: a bare key*A overflows int64 at key ~ 3.5e9
        SELECT date_trunc('week', ts) AS wk,
               ((user_id % 1000000007) * 2654435761 + 104729)
                   % 1000000007 AS hv
        FROM events
    ), br AS (
        SELECT wk, hv % 64 AS b,
               CASE WHEN hv // 64 = 0 THEN 25
                    ELSE 25 - length(bin(hv // 64)) END AS r
        FROM h
    ), regs AS (
        SELECT wk, b, max(r) AS reg FROM br GROUP BY wk, b
    ), agg AS (
        SELECT wk,
               CAST(count(*) AS BIGINT) AS n_hit,
               CAST(CAST(sum(CAST(power(2, 25 - reg) AS BIGINT)) AS BIGINT)
                    + (64 - count(*)) * 33554432 AS BIGINT) AS s_scaled,
               array_to_string(list_transform(
                   list_sort(list(b * 100 + reg)),
                   x -> CAST(x AS VARCHAR)), ',') AS reg_csv
        FROM regs GROUP BY wk
    )
    SELECT CAST(epoch(wk) AS BIGINT) AS week_ts, n_hit, s_scaled, reg_csv,
           {sr(_HLL_EST, 6)} AS users_est
    FROM agg
    """,
)
def q_hll_portable(spark, sf_dir):
    """Weekly distinct-user HLL whose registers are BIT-exact
    cross-engine (ext/sketches.hll_portable) — the HyperLogLog analog of
    q_minhash_portable: portable LCG hash, 64 buckets, integer
    leading-zero ranks via length(bin(w)), the harmonic denominator as
    an exact scaled integer, and the estimate (with the standard
    linear-counting small-range correction) as identical double math on
    identical integers. The engine-native q_hll_rollup stays rows-only
    (DataSketches registers don't cross engines); this closes the last
    rows-only-by-design sketch class without an exactly-verifiable
    portable variant. Same mergeable partial-agg scale shape as
    hll_sketch_agg: one hash shuffle to (week, bucket) partials, one
    ≤64-row-per-week re-aggregation."""
    from mesin_spark.ext.sketches import hll_portable

    ev = T(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").alias("wk"), "user_id"
    )
    return (
        hll_portable(ev, "user_id", ["wk"])
        .select(
            F.unix_timestamp("wk").alias("week_ts"),
            "n_hit", "s_scaled", "reg_csv", "users_est",
        )
        .orderBy("week_ts")
    )


@query("q_hll_rollup")  # rows-only: sketch estimates are engine-specific
def q_hll_rollup(spark, sf_dir):
    """Mergeable distinct-count rollup: per-day DataSketches HLL sketches
    of user_id (hll_sketch_agg), re-merged to weekly uniques with
    hll_union_agg — the pre-aggregation pattern that makes COUNT(DISTINCT)
    composable at 100 TB: daily sketch partials are tiny (≤ 2^12 buckets),
    re-aggregation touches sketches, never raw events, and the same
    sketches roll up to month/quarter without rescanning. Accuracy and
    merge-vs-direct agreement are asserted in tests/test_sql_menu4.py."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("week", "ts").alias("wk"),
        F.date_trunc("day", "ts").alias("d"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("wk")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_est"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            F.unix_timestamp("wk").alias("week_ts"), "users_est", "n_days"
        )
    )


@query(
    "q_quality_checks",
    oracle=f"""
    WITH m AS (
        SELECT count(*) AS n_rows,
               count(o_custkey) AS n_custkey,
               count(DISTINCT o_orderkey) AS n_distinct_key,
               min(o_totalprice) AS min_price,
               count(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END)
                   AS n_valid_status
        FROM orders
    )
    SELECT 'completeness_custkey' AS check_name,
           {sr("n_custkey::DOUBLE / n_rows", 6)} AS metric,
           n_custkey = n_rows AS passed FROM m
    UNION ALL
    SELECT 'uniqueness_orderkey',
           {sr("n_distinct_key::DOUBLE / n_rows", 6)},
           n_distinct_key = n_rows FROM m
    UNION ALL
    SELECT 'min_totalprice_nonneg', {sr("min_price", 6)}, min_price >= 0 FROM m
    UNION ALL
    SELECT 'status_in_domain',
           {sr("n_valid_status::DOUBLE / n_rows", 6)},
           n_valid_status = n_rows FROM m
    UNION ALL
    SELECT 'volume_at_least_100', CAST(n_rows AS DOUBLE), n_rows >= 100 FROM m
    """,
)
def q_quality_checks(spark, sf_dir):
    """Data-quality constraint suite (Deequ-style): completeness,
    key uniqueness, bound, domain membership, and volume checks — ALL
    computed in ONE aggregate pass over the table (a single partial+final
    HashAggregate; the check fan-out afterwards is over one row). This is
    the validation gate a training-data pipeline runs before publishing a
    snapshot; at 100 TB the cost is exactly one scan."""
    from mesin_spark.functions import stable_round as R

    o = T(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.count_distinct("o_orderkey").alias("n_distinct_key"),
        F.min("o_totalprice").alias("min_price"),
        F.count(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("n_valid_status"),
    )

    def check(name, metric, passed):
        return m.select(
            F.lit(name).alias("check_name"),
            R(metric.cast("double"), 6).alias("metric"),
            passed.alias("passed"),
        )

    c = F.col
    return (
        check(
            "completeness_custkey",
            c("n_custkey") / c("n_rows"),
            c("n_custkey") == c("n_rows"),
        )
        .unionAll(
            check(
                "uniqueness_orderkey",
                c("n_distinct_key") / c("n_rows"),
                c("n_distinct_key") == c("n_rows"),
            )
        )
        .unionAll(
            check("min_totalprice_nonneg", c("min_price"), c("min_price") >= 0)
        )
        .unionAll(
            check(
                "status_in_domain",
                c("n_valid_status") / c("n_rows"),
                c("n_valid_status") == c("n_rows"),
            )
        )
        .unionAll(
            check("volume_at_least_100", c("n_rows"), c("n_rows") >= 100)
        )
    )


@query(
    "q_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    QUALIFY rn <= 2
    """,
)
def q_qualify(spark, sf_dir):
    """QUALIFY clause (Teradata/duckdb/snowflake/bigquery dialect): filter
    on a window alias without a subquery. Spark has no QUALIFY; the
    dialect normalizer rewrites the top-level clause into the wrapped
    subquery + outer WHERE (context._rewrite_qualify), which plans to the
    same single window shuffle + filter. The oracle runs DuckDB's NATIVE
    QUALIFY on the identical text — the rewrite must agree with a real
    implementation."""
    from mesin_spark.context import ExecutionContext

    ctx = ExecutionContext(dialect="duckdb", spark=spark)
    ctx.register_parquet("orders", f"{sf_dir}/orders.parquet")
    return ctx.execute(
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
        QUALIFY rn <= 2
        """
    )
