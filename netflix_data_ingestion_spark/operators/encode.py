"""Categorical feature encoding for model training.

Leave-one-out target encoding: replace a high-cardinality categorical
with the mean of the target over the OTHER rows sharing its value —
the standard trick for feeding categoricals to gradient boosters /
linear models without a one-hot blow-up, with the row's own target
excluded so the encoding does not leak the label it is predicting
(plain per-category means memorize singletons perfectly).

Exactness discipline: the target rides as fixed-point units, per-
category (count, sum) are integer aggregates, and the encoding is ONE
int/int division ``(sum - y) / (n - 1)`` — bit-identical across
engines and partitionings.  Singleton categories (n == 1) have no
"other rows" and encode NULL; downstream imputes with its prior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    scale: int = 100,
    out_col: str = "loo_mean",
) -> DataFrame:
    """Input columns + ``<out_col>`` — the leave-one-out mean of
    ``target_col`` (in fixed-point units) over same-category rows.
    NULL categories form their own group (null-safe join), NULL targets
    are excluded from the statistics and encode NULL themselves.

    Plan: one combinable (count, sum) aggregate per category, joined
    back broadcast (category cardinality is small by the operator's
    premise — that is WHY target encoding beats one-hot), then a
    narrow projection.  The fact is never shuffled.
    """
    y = F.round(F.col(target_col) * scale).cast("long")
    base = df.withColumn("__y", y)
    stats = (
        base.where(F.col("__y").isNotNull())
        .groupBy(F.col(cat_col).alias("__cat"))
        .agg(
            F.count("*").cast("long").alias("__n"),
            F.sum("__y").alias("__sum"),
        )
    )
    joined = base.join(
        F.broadcast(stats),
        F.col(cat_col).eqNullSafe(F.col("__cat")),
        "left",
    )
    return joined.select(
        *df.columns,
        F.when(
            F.col("__y").isNotNull() & (F.col("__n") > 1),
            (F.col("__sum") - F.col("__y")) / (F.col("__n") - 1),
        ).alias(out_col),
    )
