"""Time-bucket rollups (hypertable-style continuous aggregates — absent in
the reference; charter extension).

The pattern: maintain a fine-grained rollup table (e.g. hourly) holding
DECOMPOSED aggregate state — counts and sums, never averages — and answer
coarser-grained queries (daily, weekly) by re-aggregating the rollup
instead of the raw events. Sums and counts are algebraic (sum of sums =
total sum), so the coarse answer is EXACT while scanning bucket-count
rows instead of event-count rows: at 100 TB/day of events, the hourly
rollup is ~5-6 orders of magnitude smaller than raw.

Derived measures (avg = sum/count) are computed at read time from the
decomposed state — storing avg directly would make re-aggregation wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_rollup(
    events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Fine-grained rollup: one row per (bucket, *group_cols) carrying
    decomposed state (n, sum_v). One grouping shuffle over raw events —
    this is the table you materialize and incrementally append to."""
    group_cols = group_cols or []
    return (
        events.groupBy(F.window(ts_col, bucket), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_v"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            *group_cols,
            "n",
            "sum_v",
        )
    )


def merge_rollup(
    existing: DataFrame,
    delta_events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Incremental maintenance: fold a batch of new events into an
    existing rollup. Only the delta is scanned at event granularity; the
    union re-aggregates per (bucket, group) so late data landing in an
    already-materialized bucket merges correctly (decomposed state is
    closed under addition). rollup(all) == merge(rollup(old), new) exactly
    — asserted in tests."""
    group_cols = group_cols or []
    delta = time_rollup(delta_events, bucket, ts_col, group_cols, value_col)
    return (
        existing.unionByName(delta)
        .groupBy("bucket_start", *group_cols)
        .agg(F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v"))
    )


def reaggregate(
    rollup: DataFrame,
    coarser: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Answer a coarser-grained aggregate from the rollup: re-bucket each
    fine bucket's start into the coarser bucket and sum the decomposed
    state. ``coarser`` must be a multiple of the rollup's bucket (an hour
    rollup answers day/week, not 90 minutes). Returns
    (bucket_start, *group_cols, n, sum_v, avg_v) — avg derived at read."""
    group_cols = group_cols or []
    return (
        rollup.groupBy(F.window("bucket_start", coarser), *group_cols)
        .agg(F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v"))
        .select(
            F.col("window.start").alias("bucket_start"),
            *group_cols,
            "n",
            "sum_v",
            (F.col("sum_v") / F.col("n")).alias("avg_v"),
        )
    )
