"""Multi-touch attribution — beyond-reference (the reward-assignment
step of conversion modeling: spread each conversion's credit over the
touchpoints that preceded it).

LINEAR attribution: every qualifying touch inside the lookback window
gets equal credit 1/n.  (Last-touch is the degenerate n=1 case and is
already covered by the as-of join, operators/asof — this operator is
the one-to-MANY generalization.)

Spark-first shape: one user-keyed equi join between conversions and
touches with the time predicate as a join filter — per-user fan-out is
(user's conversions x user's touches), fine for human-scale activity;
a pathologically hot user serializes its pairs, for which the bucketed
time-range join (operators/rangejoin) is the drop-in replacement.  The
per-conversion touch count needed for the 1/n weight is an UNORDERED
window over the joined pairs (no sort, no second join).  The weight is
the single division 1/n of exact integers — bit-identical across
engines, the house float discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def linear_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    conversion_type: str = "purchase",
    touch_type: str = "view",
    lookback: str = "INTERVAL 1 DAY",
) -> DataFrame:
    """(conversion_id, touch_id, user, weight) — each conversion's
    credit split equally over the same user's touches in
    ``[conversion_ts - lookback, conversion_ts)``.  Conversions with
    zero in-window touches emit nothing (unattributed; callers wanting
    them anti-join back).  The half-open bound excludes a touch at the
    conversion instant — a same-timestamp view did not *precede* the
    purchase.
    """
    ev = ensure_parallelism(events)
    conv = ev.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
    )
    touch = ev.filter(F.col(type_col) == touch_type).select(
        F.col(id_col).alias("touch_id"),
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
    )
    joined = conv.join(touch, "__u").filter(
        (F.col("__tts") < F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - F.expr(lookback))
    )
    w = Window.partitionBy("conversion_id")
    return joined.select(
        "conversion_id",
        "touch_id",
        F.col("__u").alias(user_col),
        (F.lit(1).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "weight"
        ),
    )
