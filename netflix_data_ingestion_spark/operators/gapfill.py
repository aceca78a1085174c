"""Time-bucket rollup with gap filling — beyond-reference (BASELINE.json
north star; the reference's time handling stops at daily calendar joins,
schema.sql:17-40).

The hypertable/timeseries-DB primitive: aggregate events into fixed
buckets per key, then DENSIFY — emit a row for every bucket in each
key's active range, zero-filling counts and carrying the last observed
value forward (locf).  Downstream training pipelines need the dense
form (fixed-length per-key sequences, no phantom "activity" where a
bucket is simply missing).

Plan shape (all shuffles are key-partitioned and map-side combinable):

1. bucket agg:   groupBy(key, window(ts)) — one keyed shuffle;
2. spine:        per-key min/max bucket (groupBy key) -> ``sequence()``
                 + ``explode`` — the dense bucket range is generated
                 DISTRIBUTED, inside each key's row, never on the
                 driver (a driver-side calendar loop is the classic
                 small-data habit that dies at 100 TB key counts);
3. densify:      spine LEFT JOIN buckets on (key, bucket);
4. locf:         ``last(value, ignorenulls=True)`` over the per-key
                 bucket order — same carry construction as
                 operators/ffill.py but bounded to the window because
                 the spine is already per-key contiguous.

Skew note: the spine explode is proportional to each key's active time
range, not its event count, so a hot key densifies to the same row
count as a cold key with equal lifetime — gap filling cannot amplify
event-count skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """(key, bucket_start, n_events, sum_value, locf_value) — dense
    per-key time buckets over each key's [first, last] active range.

    Gap rows carry ``n_events = 0``, ``sum_value = NULL`` (nothing was
    observed — zero would be a lie for a sum), and ``locf_value`` =
    the most recent observed ``sum_value``.  Sums are rounded to 2
    decimals at the bucket level (cross-engine exactness: one rounding
    point, then the carry copies the already-rounded value).
    """
    step = F.expr(f"INTERVAL {bucket}")
    bucketed = (
        df.groupBy(F.col(key_col), F.window(ts_col, bucket).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )
    spine = (
        bucketed.groupBy(key_col)
        .agg(
            F.min("bucket_start").alias("lo"),
            F.max("bucket_start").alias("hi"),
        )
        .select(
            key_col,
            F.explode(F.sequence("lo", "hi", step)).alias("bucket_start"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(bucketed, [key_col, "bucket_start"], "left")
        .select(
            key_col,
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "sum_value",
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
        )
    )
