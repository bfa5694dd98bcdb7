"""Round-2 wave 3 — text-format connectors (CSV, JSON-lines) proven by
round-trip: export a parquet table through the format, read it back with
an explicit schema, and aggregate; the oracle runs the same aggregate on
the original parquet, so any encode/decode/typing drift breaks the hash.

The reference reads exactly one format (CSV via arrow, src/context.rs:
30-40, its only source); parquet is this repo's primary format and CSV /
JSONL are the interchange tier most LLM data tooling speaks. Writes are
distributed (one file per partition, no driver funnel); reads carry an
explicit schema — inference costs an extra full scan at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mesin_spark import sources as S
from mesin_spark.queries import R, T, query, sr, scratch_dir


@query(
    "q_csv_roundtrip",
    oracle=f"""
    SELECT p_brand, count(*) AS n, {sr("sum(p_retailprice)", 2)} AS total_price
    FROM part GROUP BY p_brand
    """,
)
def q_csv_roundtrip(spark, sf_dir):
    """part → CSV files → read back with explicit schema → aggregate.
    Exercises header handling and lossless double round-trip (Spark writes
    shortest-repr doubles, so read-back is bit-exact)."""
    out = os.path.join(scratch_dir(prefix="mesin_csv_"), "part_csv")
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    S.write_csv(p, out)
    back = S.read_csv(
        spark, out, schema="p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE"
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        R(F.sum("p_retailprice"), 2).alias("total_price"),
    )


@query(
    "q_bucketed_join",
    oracle=f"""
    SELECT l.l_orderkey, {sr("sum(l.l_quantity)", 2)} AS qty,
           {sr("max(o.o_totalprice)", 2)} AS price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey
    """,
)
def q_bucketed_join(spark, sf_dir):
    """Co-located fact-fact join via bucketed layout: both tables written
    bucketBy(16, orderkey), so the join needs NO Exchange (verified in
    tests/test_sources.py) and the groupBy on the same key reuses the
    bucket distribution — the layout lever that removes the single
    biggest shuffle of a 100 TB star join. Values identical to the plain
    join (the oracle IS the plain join)."""
    from mesin_spark.sources import write_bucketed

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "q_bkt_li", ["l_orderkey"], num_buckets=16)
    write_bucketed(od, "q_bkt_od", ["o_orderkey"], num_buckets=16)
    j = spark.table("q_bkt_li").join(
        spark.table("q_bkt_od"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return j.groupBy("l_orderkey").agg(
        R(F.sum("l_quantity"), 2).alias("qty"),
        R(F.max("o_totalprice"), 2).alias("price"),
    )


@query(
    "q_jsonl_roundtrip",
    oracle=f"""
    SELECT event_type, count(*) AS n, {sr("sum(value)", 4)} AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_jsonl_roundtrip(spark, sf_dir):
    """events → JSON-lines → read back with explicit schema → aggregate.
    JSONL is the lingua franca of LLM corpus tooling; the round-trip
    proves numeric fidelity through the JSON encoder."""
    out = os.path.join(scratch_dir(prefix="mesin_jsonl_"), "events_jsonl")
    ev = T(spark, sf_dir, "events").select("event_id", "event_type", "value")
    S.write_jsonl(ev, out)
    back = S.read_json(
        spark, out, schema="event_id BIGINT, event_type STRING, value DOUBLE"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        R(F.sum("value"), 4).alias("total_value"),
    )
