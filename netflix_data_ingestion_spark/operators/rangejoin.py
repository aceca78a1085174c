"""Bucketed range (interval) join — beyond-reference.

Spark has no native range-join optimization: a raw
``points.join(intervals, ts BETWEEN start AND end)`` falls back to a
nested-loop join, quadratic per key.  The standard fix is BUCKETING:
quantize time into fixed buckets, explode each interval to the buckets
it covers, and equi-join points on their (single) bucket — Catalyst then
runs an ordinary hash join whose cost is points + interval-bucket rows,
with the exact BETWEEN predicate applied as a post-filter.  A point
falls in exactly one bucket, so no dedup is needed.

Bucket width tunes the trade-off: ~ the typical interval length keeps
the explode factor near 2 while the residual filter stays selective.
At 100 TB both sides shuffle once on (key, bucket); skew salts like any
other join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_us(col: str) -> Column:
    # works for TIMESTAMP and TIMESTAMP_NTZ alike (pure wall-clock diff)
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: Sequence[str] = ("user_id",),
    bucket_width_s: int = 300,
) -> DataFrame:
    """Inner join: every (point, interval) pair with equal `by` keys and
    point_ts in [start_col, end_col].  Returns all columns of both inputs
    (names must not collide apart from `by`)."""
    by = list(by)
    w_us = int(bucket_width_s) * 1_000_000
    p = points.withColumn("__bucket", F.floor(_epoch_us(point_ts) / w_us))
    iv = (
        intervals.withColumn("__bs", F.floor(_epoch_us(start_col) / w_us))
        .withColumn("__be", F.floor(_epoch_us(end_col) / w_us))
        .withColumn("__bucket", F.explode(F.sequence("__bs", "__be")))
        .drop("__bs", "__be")
    )
    return (
        p.join(iv, [*by, "__bucket"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bucket")
    )
