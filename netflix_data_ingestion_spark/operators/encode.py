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


def standardize_by_train(
    df: DataFrame,
    split_col: str,
    value_col: str,
    train_value: str = "train",
    scale: int = 100,
    out_col: str = "value_scaled",
) -> DataFrame:
    """Input columns + ``<out_col>`` — z-score standardization where
    mean and standard deviation are fit on the TRAIN split only and
    applied to every row: the leakage-safe scaler (fitting on the full
    frame leaks test-set statistics into the features — the classic
    preprocessing bug this operator makes structurally impossible).

    Exactness: train moments are integer/DECIMAL(38,0) aggregates;
    sample std is ONE correctly-rounded sqrt of one division, the
    z-score one subtraction and one division, rounded to 6 — both
    engines replay it bit-for-bit.  NULL values, and any frame whose
    train split has < 2 rows or zero variance, scale to NULL.

    Plan: one combinable 1-row aggregate over the train slice,
    broadcast-crossJoined back (the tfidf __n_docs shape) — the fact
    scans once and never shuffles.
    """
    dec = "decimal(38,0)"
    v = F.round(F.col(value_col) * scale).cast("long")
    base = df.withColumn("__v", v)
    stats = (
        base.where(
            (F.col(split_col) == train_value) & F.col("__v").isNotNull()
        )
        .agg(
            F.count("*").cast(dec).alias("__n"),
            F.sum(F.col("__v").cast("decimal(18,0)")).cast(dec).alias("__s"),
            F.sum(
                F.col("__v").cast("decimal(18,0)")
                * F.col("__v").cast("decimal(18,0)")
            )
            .cast(dec)
            .alias("__q"),
        )
    )
    n, s_, q = F.col("__n"), F.col("__s"), F.col("__q")
    var = (n * q - s_ * s_).cast("double") / (n * (n - 1)).cast("double")
    return base.crossJoin(F.broadcast(stats)).select(
        *df.columns,
        F.when(
            F.col("__v").isNotNull() & (n > 1) & ((n * q) > (s_ * s_)),
            F.round(
                (F.col("__v").cast("double") - s_.cast("double") / n.cast("double"))
                / F.sqrt(var),
                6,
            ),
        ).alias(out_col),
    )
