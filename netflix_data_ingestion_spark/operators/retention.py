"""Cohort retention analysis over an event stream.

Classic product-analytics operator the reference engine cannot express
(its query layer stops at flat GROUP BY views, reference
``schema.sql:131-237``): bucket users into cohorts by their first-ever
activity week, then for each (cohort, weeks-since-cohort) cell count how
many of the cohort's users were active — the retention triangle.

Scale shape (100 TB of events):
  * one shuffle on user_id for the first-activity min (map-side
    combinable MIN — partial aggregation collapses each input split to
    one row per user before the exchange);
  * the (user, week) activity set reuses the same user_id exchange for
    its distinct, then joins first-activity on user_id — co-partitioned,
    AQE merges the exchanges;
  * final shuffle on (cohort_week, weeks_since) — the output is
    O(weeks²) rows, trivially small.
  Nothing depends on event ordering; no windows, no driver state.

Determinism: week bucketing is ``date_trunc('week')`` (ISO Monday in
both Spark and DuckDB); retention_rate is a single int/int double
division, bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_BUCKET_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame, user_col: str, ts_col: str, bucket: str = "week"
) -> DataFrame:
    """(cohort_week, weeks_since, cohort_size, retained, retention_rate).

    ``bucket`` is ``"week"`` (ISO Monday truncation) or ``"day"`` —
    column names keep the week-centric spelling either way; the offset
    unit follows the bucket.  The ``weeks_since = 0`` row is the cohort
    itself, so ``retained == cohort_size`` and ``retention_rate == 1.0``
    there by construction — kept in the output as the anchor row.
    """
    if bucket not in _BUCKET_DAYS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKET_DAYS)}")
    week = F.date_trunc(bucket, F.col(ts_col)).cast("date")

    first = events.groupBy(F.col(user_col).alias("__user")).agg(
        F.min(week).alias("cohort_week")
    )
    active = (
        events.select(
            F.col(user_col).alias("__user"), week.alias("active_week")
        )
        .distinct()
    )
    joined = active.join(first, "__user")

    cells = joined.groupBy(
        "cohort_week",
        (F.datediff("active_week", "cohort_week") / _BUCKET_DAYS[bucket])
        .cast("bigint")
        .alias("weeks_since"),
    ).agg(F.count_distinct("__user").alias("retained"))

    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )

    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "weeks_since",
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        F.col("retained").cast("bigint").alias("retained"),
        (F.col("retained").cast("double") / F.col("cohort_size").cast("double"))
        .alias("retention_rate"),
    )
