"""Bucketed range join: must equal the naive cross-join-filter result —
including events in multiple overlapping intervals, interval boundaries
(start inclusive, end exclusive), and intervals shorter than one bucket."""

from __future__ import annotations

from pyspark.sql import functions as F

from mesin_spark.ext.intervals import bucketed_range_join


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).select(
        *[
            F.to_timestamp(c).alias(c) if c.endswith("ts") else F.col(c)
            for c in schema.replace(",", " ").split()[::2]
        ]
    )


def test_matches_naive_range_join(spark):
    events = _ts(
        spark,
        [
            (1, "2024-01-01 00:00:00"),  # boundary: == start -> included
            (2, "2024-01-01 02:30:00"),  # inside two overlapping intervals
            (3, "2024-01-01 05:00:00"),  # boundary: == end -> excluded
            (4, "2024-01-02 00:00:10"),  # inside the sub-bucket interval
            (5, "2024-03-01 00:00:00"),  # matches nothing
        ],
        "event_id long, ts string",
    )
    intervals = _ts(
        spark,
        [
            ("a", "2024-01-01 00:00:00", "2024-01-01 05:00:00"),
            ("b", "2024-01-01 02:00:00", "2024-01-01 03:00:00"),  # overlaps a
            ("c", "2024-01-02 00:00:05", "2024-01-02 00:00:30"),  # < 1 bucket
        ],
        "name string, start_ts string, end_ts string",
    )
    got = {
        (r.event_id, r.name)
        for r in bucketed_range_join(events, intervals, bucket_seconds=3600).collect()
    }
    naive = {
        (r.event_id, r.name)
        for r in events.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .collect()
    }
    assert got == naive
    assert got == {(1, "a"), (2, "a"), (2, "b"), (4, "c")}
