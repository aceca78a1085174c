"""Trailing event-time range windows — beyond-reference (BASELINE.json
north star; the reference has no window functions at all — its SQL layer
stops at GROUP BY, schema.sql:131-237).

The feature-engineering primitive behind "activity in the last hour"
style model inputs: for EVERY event, aggregate the key's events inside a
trailing event-time span — a RANGE frame, not a ROWS frame, so sparse
and bursty keys get the same time semantics.

Determinism discipline (same as functions/vectors.group_centroids):
double SUM over a window frame is engine- and order-dependent (Spark
accumulates in sort order, DuckDB uses segment trees), so the value is
quantized to a fixed-point integer grid first — ``round(value * scale)``
(HALF_UP, identical in both engines), summed as exact int64 inside the
frame (associative — any evaluation tree gives the same bits), divided
back ONCE at the end.

Plan shape: one shuffle on the key, one sort per partition, then a
single forward pass with a sliding frame — Spark's WindowExec keeps
only the active frame buffered, so memory is bounded by the densest
window, not the partition.  Skewed keys are bounded by per-key event
rate x span, and the shuffle carries (key, ts, int64) — no amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trailing_distinct_daily(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
) -> DataFrame:
    """(day, n_active) — for every calendar day spanned by the input,
    the count of DISTINCT keys observed in the trailing ``window_days``
    days ending at that day inclusive (the WAU/MAU rolling-actives
    metric).

    COUNT(DISTINCT) over a moving RANGE frame has no distributed window
    form (Spark window aggs take no DISTINCT), and the textbook
    day-spine x events range join rescans ``window_days`` days of
    events per spine day.  The scale shape instead:

    1. collapse to distinct (day, key) — one map-side-combinable
       shuffle, output bounded by actives/day not event count;
    2. each (day, key) contributes to ``window_days`` window-ending
       days: explode a literal 0..w-1 offset array (narrow flatMap,
       amplification exactly w — the knob is explicit);
    3. count distinct keys per window day (a key active on several
       days inside one window must still count once) — second keyed
       shuffle, Catalyst's two-phase distinct rewrite applies;
    4. left-join the dense day spine (generated DISTRIBUTED from a
       1-row bounds agg, same discipline as gapfill's per-key spine)
       so quiet days report 0.

    Shuffle volume is w x |distinct (day,key)| id-sized rows — linear
    in actives, independent of per-day event skew.
    """
    day = F.to_date(F.col(ts_col))
    dk = df.select(day.alias("__day"), F.col(key_col).alias("__key")).distinct()
    contrib = (
        dk.select(
            "__key",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(window_days - 1)),
                    lambda off: F.date_add(F.col("__day"), off),
                )
            ).alias("day"),
        )
    )
    counts = contrib.groupBy("day").agg(
        F.countDistinct("__key").alias("n_active")
    )
    spine = (
        dk.agg(F.min("__day").alias("lo"), F.max("__day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return (
        spine.join(counts, "day", "left")
        .select(
            "day",
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
        )
    )


def trailing_range_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    scale: int = 100,
) -> DataFrame:
    """Input columns + (n_trailing, sum_value_trailing) — per-event
    aggregates over the key's trailing ``(t - window, t]`` event-time
    span (half-open: an event exactly ``window`` old has expired).

    ``sum_value_trailing`` sums values quantized to 1/``scale`` units
    (exact int64 arithmetic inside the frame; one double division out).
    """
    span_us = window_seconds * 1_000_000
    # cast handles TIMESTAMP_NTZ inputs (session tz is UTC) — unix_micros
    # only accepts the instant-typed TIMESTAMP
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-(span_us - 1), 0)
    )
    q = F.round(F.col(value_col).cast("double") * scale).cast("long")
    return df.select(
        "*",
        F.count("*").over(w).alias("n_trailing"),
        (F.sum(q).over(w).cast("double") / float(scale)).alias(
            "sum_value_trailing"
        ),
    )


def trailing_ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window: int = 8,
    alpha: float = 0.25,
) -> DataFrame:
    """Input + ``ewma``: the finite-window exponentially weighted moving
    average of the last ``window`` rows per key (the "adjusted" EWMA —
    weights (1-alpha)^j, j=0 at the current row, normalized by the
    weight sum so partial leading windows are unbiased).

    Cross-engine float discipline: the weighted sum AND the normalizer
    are both LEFT FOLDS over the frame in frame order

        acc <- acc * (1-alpha) + x

    (Horner form), so every engine performs the identical IEEE-754
    operation sequence — no reordered summation to diverge by an ulp —
    and the final value is ONE double division of the two folds.  The
    DuckDB oracle is ``list_reduce`` over the identical ``ROWS BETWEEN``
    frame.

    Plan: one keyed window (shuffle on key, sort by order cols); the
    frame is bounded (``window`` rows), so per-row state is O(window)
    regardless of history length — the scalable form of "smooth this
    metric per user" at 100 TB of events.

    Caller contract: ``value_col`` non-NULL within smoothed rows
    (collect_list SKIPS NULLs while DuckDB's list() keeps them, so a
    NULL would silently shrink the frame and diverge engines).
    """
    decay = 1.0 - alpha
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    frame = F.collect_list(F.col(value_col).cast("double")).over(w)
    fold = F.aggregate(
        frame,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(decay) + x,
    )
    norm = F.aggregate(
        frame,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(decay) + F.lit(1.0),
    )
    return df.withColumn("ewma", fold / norm)
