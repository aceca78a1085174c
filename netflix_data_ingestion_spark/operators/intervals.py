"""Interval union — merge overlapping validity/activity intervals.

The interval twin of sessionization (which groups POINT events by gap):
given per-key intervals (start, end), coalesce every overlapping or
touching run into one covering interval — contract validity windows,
maintenance windows, "customer has an order in flight" periods.

Classic gaps-and-islands over a window:

    prev_max_end(r) = MAX(end) over rows before r (by start order)
    new_island(r)   = start > prev_max_end  (or first row)
    island(r)       = running SUM of new_island
    result          = per (key, island): [MIN(start), MAX(end)]

Touching intervals (start == previous end) MERGE — the output is the
set-union of the input ranges, and closed intervals that share an
endpoint union into one range.

Determinism: island BOUNDARIES depend only on the (start, end)
multiset per key — rows tied on (start, end) compute the same flags in
any order — so the result is partition- and sort-tie-invariant, which
is what lets the DuckDB oracle reproduce it exactly.

Scale shape: ONE shuffle on the key (both windows and the final
groupBy share the partitioning; AQE collapses them onto one exchange).
Per-key data sorts within its partition — same hot-key caveat as every
per-key window (sample.quota_sample's docstring).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """(keys..., period_start, period_end, n_intervals) — the union of
    overlapping-or-touching [start, end] intervals per key."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(
        *keys,
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__new"),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__new").over(
            Window.partitionBy(*keys)
            .orderBy(F.col("__s").asc(), F.col("__e").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy(*keys, "__island")
        .agg(
            F.min("__s").alias("period_start"),
            F.max("__e").alias("period_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        .drop("__island")
    )
