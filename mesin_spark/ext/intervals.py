"""Range (interval) join — a relational operator the reference lacks
(SURVEY.md §2.3 'Range / as-of / interval joins: absent').

A naive range join is a broadcast-nested-loop: O(events × intervals).
The scale path implemented here is bucket expansion: each interval
explodes to the time buckets it covers, each event maps to its single
bucket, and the match becomes an EQUI-join on bucket plus a residual
range filter — O(events + intervals·span/bucket) through an ordinary
hash join, the same rewrite a range-join hint performs in engines that
have one. Each (event, interval) pair meets exactly once because an
event has exactly one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Match event rows to every interval with start <= ts < end.
    Pick ``bucket_seconds`` near the median interval length: too small
    explodes the interval side, too large fattens the residual filter."""
    ev = events.withColumn(
        "_bkt", (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    )
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long"),
            )
        ),
    )
    return (
        ev.join(iv, "_bkt")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bkt")
    )
