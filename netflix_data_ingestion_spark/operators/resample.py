"""Time-bucket OHLC resampling — the hypertable "downsample to bars"
rollup (beyond-reference; the time-series companion to
operators/gapfill.time_bucket_gapfill's densify direction).

Collapses an event stream to one row per (key, bucket) carrying
open / high / low / close / count, the canonical lossy downsample for
dashboards and for time-series feature tables in a training pipeline.

Spark-first shape: ONE map-side-combinable ``groupBy`` — ``min_by`` /
``max_by`` over a (ts, tiebreak) struct select open/close, plain
``min``/``max`` give the extremes.  No window function, therefore no
per-partition sort: every aggregate here is algebraic, so executors
emit one partial row per (key, bucket) and the single exchange carries
bucket-level rows, not events.  At 100 TB that is the difference
between shuffling the stream and shuffling the (much smaller) bar
table; a row_number()-based formulation would sort every partition and
shuffle full event rows.

Values are SELECTED, never arithmetically combined, so float columns
round-trip bit-exactly (the oracle-parity discipline of
operators/rolling.py applies with no fixed-point dance needed).

Determinism: ties on the timestamp are broken by ``tiebreak_col``
(any unique column, e.g. the event id) via struct ordering — the same
tuple comparison both engines implement.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ohlc_resample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """(key..., bucket, open, high, low, close, n_events) — one bar per
    key per ``date_trunc(bucket, ts)``.

    ``bucket`` is a ``date_trunc`` unit (``"hour"``, ``"day"``, ...);
    truncation keeps the bucket math portable to any SQL engine (unlike
    Spark's ``window()`` struct, which has no cross-engine twin).
    NULL timestamps are excluded — a bar cannot be placed for them.
    """
    ord_struct = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            *key_cols, F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
        )
        .agg(
            F.min_by(F.col(value_col), ord_struct).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), ord_struct).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


def time_weighted_average(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "day",
    scale: int = 100,
) -> DataFrame:
    """(key, bucket_ts, n_samples, span_micros, twa_value) — the
    time-weighted average of an irregularly-sampled step signal per
    (key, bucket): each observation holds until the next one, so its
    weight is its HOLD DURATION, not 1 — the mean a plain AVG gets
    wrong whenever sampling is bursty (a sensor reporting 100x/s while
    alarming would otherwise drown its quiet hours).  The
    TimescaleDB ``time_weight('locf')`` shape, windows-only.

    Semantics owned: the integral runs from the bucket's FIRST to its
    LAST observation (no carry across buckets — composing with
    ``ffill`` + ``gapfill`` adds that); a single-observation bucket has
    zero span and NULL average.  Exactness: weights are integer
    microseconds, values fixed-point, the numerator a DECIMAL(38,0)
    sum, ONE final division.  Rows with NULL ts/value are dropped.

    Plan: one (key, bucket) shuffle; the lead() window and the grouped
    sums share its sort.
    """
    mic = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        mic.alias("__t"),
        F.round(F.col(value_col) * scale).cast("long").alias("__v"),
    )
    w = Window.partitionBy(key_col, "bucket_ts").orderBy(
        F.col("__t").asc(), F.col("__v").asc()
    )
    stepped = base.withColumn("__next_t", F.lead("__t").over(w))
    dur = (F.col("__next_t") - F.col("__t")).cast("decimal(38,0)")
    g = stepped.groupBy(key_col, "bucket_ts").agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum(F.when(F.col("__next_t").isNotNull(), F.col("__next_t") - F.col("__t")))
        .cast("decimal(38,0)")
        .alias("__span"),
        F.sum(
            F.when(
                F.col("__next_t").isNotNull(),
                F.col("__v").cast("decimal(18,0)") * dur.cast("decimal(18,0)"),
            )
        )
        .cast("decimal(38,0)")
        .alias("__wsum"),
    )
    return g.select(
        key_col,
        "bucket_ts",
        "n_samples",
        F.coalesce(F.col("__span").cast("long"), F.lit(0)).alias(
            "span_micros"
        ),
        F.when(
            F.col("__span") > 0,
            F.round(
                F.col("__wsum").cast("double") / F.col("__span").cast("double"),
                6,
            ),
        ).alias("twa_value"),
    )
