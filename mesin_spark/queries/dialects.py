"""Dialect-specific construct queries — the reference's 11-dialect knob
(src/lib.rs:9-23) exercised with each dialect's signature idiom running
END TO END through ``ExecutionContext.execute(dialect=...)``, not just
accepted-and-ignored:

- clickhouse ``ARRAY JOIN`` → explode subquery (context._rewrite_array_join)
- clickhouse ``countIf/sumIf/avgIf/minIf/maxIf`` → conditional aggregates
- snowflake ``LATERAL FLATTEN(input => …)`` → LATERAL VIEW explode
- bigquery ``SELECT * EXCEPT(cols)`` → native Spark ≥3.4 star-except
- duckdb ``* EXCLUDE (cols)`` → Spark star-except
- postgres ``~`` / ``!~`` / ``~*`` / ``!~*`` regex operators → RLIKE forms
- mssql ``SELECT TOP n`` + ``[bracket]`` identifiers → LIMIT + backticks
- mysql ``GROUP_CONCAT(DISTINCT … ORDER BY … SEPARATOR …)`` →
  array_join over struct-sorted collect_set/collect_list
- hive ``DISTRIBUTE BY`` / ``SORT BY`` executed natively (Spark inherited
  them) — verified, not assumed
- ``EXPLAIN <query>`` → the reference's only output artifact
  (a printed plan, src/context.rs:53) reachable as a SQL statement.
"""

from __future__ import annotations

import os

from mesin_spark.queries import query


def _ctx(spark, sf_dir, dialect, *tables):
    from mesin_spark.context import ExecutionContext

    ctx = ExecutionContext(dialect=dialect, spark=spark)
    for t in tables:
        ctx.register_parquet(t, os.path.join(sf_dir, f"{t}.parquet"))
    return ctx


@query(
    "q_dialect_arrayjoin",
    oracle="""
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_dialect_arrayjoin(spark, sf_dir):
    """ClickHouse's signature idiom, pasted verbatim: bare-column ``ARRAY
    JOIN words`` (the element REPLACES the array column — rewritten to a
    ``SELECT * EXCEPT (words), explode(words) AS words`` subquery, so the
    replacement semantics are exact). Post-join WHERE filters on the
    element, as ClickHouse evaluates it. Scale: explode is a map-side
    generator — rows expand, nothing shuffles until the aggregate."""
    ctx = _ctx(spark, sf_dir, "clickhouse", "documents")
    return ctx.execute(
        "SELECT doc_id, count(*) AS n_tokens"
        " FROM (SELECT doc_id, split(text, ' ') AS words FROM documents) t"
        " ARRAY JOIN words"
        " WHERE words <> ''"
        " GROUP BY doc_id ORDER BY doc_id"
    )


@query(
    "q_dialect_except",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey <= 512 ORDER BY o_orderkey
    """,
)
def q_dialect_except(spark, sf_dir):
    """BigQuery's ``SELECT * EXCEPT(cols)`` pasted verbatim (no space
    before the paren, as BigQuery users write it) — parses natively on
    Spark ≥3.4, verified here end to end rather than assumed. Column
    pruning survives: the excluded columns never reach the scan."""
    ctx = _ctx(spark, sf_dir, "bigquery", "orders")
    return ctx.execute(
        "SELECT * EXCEPT(o_orderpriority, o_orderdate) FROM orders"
        " WHERE o_orderkey <= 512 ORDER BY o_orderkey"
    )


@query(
    "q_dialect_flatten",
    oracle="""
    SELECT doc_id, w AS value
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents WHERE doc_id <= 64)
    WHERE w <> ''
    ORDER BY doc_id, value
    """,
)
def q_dialect_flatten(spark, sf_dir):
    """Snowflake's signature table function pasted verbatim:
    ``FROM t, LATERAL FLATTEN(input => <array>) f`` with the element read
    back as ``f.value`` — rewritten to Spark's ``LATERAL VIEW explode``
    (context._rewrite_flatten), comma-join comma dropped. Same map-side
    generator shape as ARRAY JOIN: rows expand in place, nothing
    shuffles before any downstream aggregate."""
    ctx = _ctx(spark, sf_dir, "snowflake", "documents")
    return ctx.execute(
        "SELECT d.doc_id, f.value"
        " FROM documents d, LATERAL FLATTEN(input => split(d.text, ' ')) f"
        " WHERE d.doc_id <= 64 AND f.value <> ''"
        " ORDER BY d.doc_id, f.value"
    )


@query(
    "q_dialect_combinators",
    oracle="""
    SELECT o_orderstatus,
           count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
           CAST(floor(sum(CASE WHEN o_orderpriority = '1-URGENT'
                               THEN o_totalprice END) * 100.0 + 0.5) / 100.0
                AS DOUBLE) AS urgent_total,
           CAST(floor(avg(CASE WHEN o_custkey % 2 = 0
                               THEN o_totalprice END) * 100.0 + 0.5) / 100.0
                AS DOUBLE) AS even_avg
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q_dialect_combinators(spark, sf_dir):
    """ClickHouse ``-If`` aggregate combinators pasted verbatim
    (``countIf``/``sumIf``/``avgIf``) — rewritten to conditional
    aggregates (context._rewrite_combinators), ClickHouse's exact
    skip-non-matching semantics. Same single grouped-aggregate shuffle
    as the plain forms: the conditionals fold into the partial agg."""
    ctx = _ctx(spark, sf_dir, "clickhouse", "orders")
    return ctx.execute(
        "SELECT o_orderstatus,"
        " countIf(o_totalprice > 100000) AS n_big,"
        " CAST(floor(sumIf(o_totalprice, o_orderpriority = '1-URGENT') * 100.0 + 0.5) / 100.0 AS DOUBLE) AS urgent_total,"
        " CAST(floor(avgIf(o_totalprice, o_custkey % 2 = 0) * 100.0 + 0.5) / 100.0 AS DOUBLE) AS even_avg"
        " FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


@query(
    "q_dialect_exclude",
    oracle="""
    SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey
    """,
)
def q_dialect_exclude(spark, sf_dir):
    """DuckDB's ``* EXCLUDE (cols)`` pasted verbatim — rewritten to
    Spark's ``* EXCEPT`` (context._rewrite_exclude; same semantics,
    different keyword). Column pruning survives: the excluded column
    never reaches the scan."""
    ctx = _ctx(spark, sf_dir, "duckdb", "nation")
    return ctx.execute(
        "SELECT * EXCLUDE (n_regionkey) FROM nation ORDER BY n_nationkey"
    )


@query(
    "q_dialect_regex",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE regexp_matches(n_name, 'NATION_1[0-9]$')
      AND NOT regexp_matches(n_name, '3$')
    ORDER BY n_nationkey
    """,
)
def q_dialect_regex(spark, sf_dir):
    """Postgres's regex-match operators pasted verbatim (``~`` / ``!~``)
    — rewritten to Spark RLIKE / NOT RLIKE (context._rewrite_regex_match,
    negation scoped to the comparison exactly as postgres scopes it).
    The predicate stays a plain filter: pushdown-eligible, no UDF."""
    ctx = _ctx(spark, sf_dir, "postgres", "nation")
    return ctx.execute(
        "SELECT n_nationkey, n_name FROM nation"
        " WHERE n_name ~ 'NATION_1[0-9]$' AND n_name !~ '3$'"
        " ORDER BY n_nationkey"
    )


@query(
    "q_dialect_top",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
    """,
)
def q_dialect_top(spark, sf_dir):
    """T-SQL's signature idiom pasted verbatim: ``SELECT TOP 5`` with
    ``[bracket]`` identifiers — TOP lifts to a trailing LIMIT, brackets
    become backticks (context._normalize_mssql, char scanner so literals
    are safe). The deterministic tiebreak (orderkey) makes the top-5 set
    exact. Plan: LIMIT fuses with the sort into TakeOrderedAndProject —
    no global sort materializes at any scale."""
    ctx = _ctx(spark, sf_dir, "mssql", "orders")
    return ctx.execute(
        "SELECT TOP 5 [o_orderkey], [o_totalprice] FROM orders"
        " ORDER BY [o_totalprice] DESC, [o_orderkey]"
    )


@query(
    "q_dialect_groupconcat",
    oracle="""
    SELECT r_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey ORDER BY r_regionkey
    """,
)
def q_dialect_groupconcat(spark, sf_dir):
    """MySQL's signature aggregate pasted verbatim: ``GROUP_CONCAT(
    DISTINCT n_name ORDER BY n_name SEPARATOR '|')`` — rewritten to
    array_join over a struct-sorted collect_set
    (context._rewrite_group_concat), so the declared ordering actually
    survives the aggregate. The DuckDB oracle is its string_agg ORDER BY
    form (names are unique per region, so DISTINCT is semantically
    transparent on both sides). Single grouped-aggregate shuffle; the
    sort is per-group over the collected array."""
    ctx = _ctx(spark, sf_dir, "mysql", "nation", "region")
    return ctx.execute(
        "SELECT r_regionkey,"
        " GROUP_CONCAT(DISTINCT n_name ORDER BY n_name SEPARATOR '|') AS nations"
        " FROM nation JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY r_regionkey ORDER BY r_regionkey"
    )


@query(
    "q_dialect_clusterby",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    WHERE l_orderkey <= 64
    """,
)
def q_dialect_clusterby(spark, sf_dir):
    """Hive's signature layout clauses pasted verbatim: ``DISTRIBUTE BY``
    hashes rows across partitions, ``SORT BY`` orders within each
    partition — Spark executes both natively (it inherited them from
    Hive), verified end to end through execute(dialect="hive") rather
    than assumed. The row SET equals the plain projection (the clauses
    shape layout, not content) — exactly what the oracle asserts; the
    within-partition ordering property is asserted separately in
    tests/test_context.py. This is the writer-side primitive behind
    clustered table layouts: one hash exchange, per-partition sort,
    no global ordering barrier at any scale."""
    ctx = _ctx(spark, sf_dir, "hive", "lineitem")
    return ctx.execute(
        "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem"
        " WHERE l_orderkey <= 64"
        " DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_partkey"
    )


@query("q_explain")  # rows-only: a plan string has no SQL oracle
def q_explain(spark, sf_dir):
    """``EXPLAIN <query>`` as a statement through execute() — the
    reference's terminal output was exactly this printed plan
    (src/context.rs:53). Returns one row (plan STRING) carrying
    Catalyst's parsed/analyzed/optimized/physical plan; pytest asserts
    the key operators appear (tests/test_context.py)."""
    ctx = _ctx(spark, sf_dir, "postgres", "region", "nation")
    return ctx.execute(
        "EXPLAIN SELECT r.r_name, count(*) AS n FROM region r"
        " JOIN nation n ON n.n_regionkey = r.r_regionkey"
        " GROUP BY r.r_name"
    )
