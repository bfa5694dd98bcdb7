"""Rollup invariants: re-aggregation is lossless vs raw, and incremental
maintenance (merge_rollup) equals rebuilding from scratch — including
late data landing in already-materialized buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.ext.rollup import merge_rollup, reaggregate, time_rollup
from mesin_spark.queries import load_events
from tests.conftest import SF_DIR


def _canon(df):
    return {
        tuple(r): None for r in df.select(
            F.unix_timestamp("bucket_start").alias("b"),
            "event_type",
            "n",
            F.round("sum_v", 6).alias("s"),
        ).collect()
    }.keys()


def test_incremental_merge_equals_rebuild(spark):
    e = load_events(spark, SF_DIR)
    cutoff = "2024-01-15 00:00:00"
    old = e.filter(F.col("ts") < cutoff)
    new = e.filter(F.col("ts") >= cutoff)
    rebuilt = time_rollup(e, "1 hour", group_cols=["event_type"])
    merged = merge_rollup(
        time_rollup(old, "1 hour", group_cols=["event_type"]),
        new,
        "1 hour",
        group_cols=["event_type"],
    )
    assert set(_canon(merged)) == set(_canon(rebuilt))


def test_merge_handles_late_data_in_same_bucket(spark):
    e = load_events(spark, SF_DIR).limit(2000)
    # split WITHIN buckets (odd/even event ids), not at a time cutoff:
    # every bucket receives "late" rows in the delta
    old = e.filter(F.col("event_id") % 2 == 0)
    late = e.filter(F.col("event_id") % 2 == 1)
    rebuilt = time_rollup(e, "1 hour", group_cols=["event_type"])
    merged = merge_rollup(
        time_rollup(old, "1 hour", group_cols=["event_type"]),
        late,
        "1 hour",
        group_cols=["event_type"],
    )
    assert set(_canon(merged)) == set(_canon(rebuilt))


def test_reaggregate_counts_match_raw(spark):
    e = load_events(spark, SF_DIR)
    hourly = time_rollup(e, "1 hour", group_cols=["event_type"])
    daily = reaggregate(hourly, "1 day", group_cols=["event_type"])
    total_from_rollup = daily.agg(F.sum("n")).first()[0]
    assert total_from_rollup == e.count()
