"""Model-evaluation metrics, exact at any scale.

AUC-ROC is THE ranking metric, and the textbook computation (sort all
scores, sum ranks) does not distribute.  The Mann-Whitney identity
does: group by DISTINCT score value — per-score positive/negative
counts are one combinable aggregate — then

    2U = Σ_s  n_pos(s) * (2 * cum_neg_below(s) + n_neg(s))

counts every (positive, negative) pair once (ties contribute half,
hence the factor-2 lattice), and AUC = 2U / (2 * P * N) is ONE final
division of exact integers.  The ordered scan runs over DISTINCT
scores — at 100 TB that is the value domain, not the corpus — and the
whole metric is engine-, partition-, and tie-exact (the decile-lift /
OLS moment discipline applied to ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_roc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    scale: int = 100,
) -> DataFrame:
    """One row: (n_pos, n_neg, auc) — exact area under the ROC curve of
    ``score_col`` (fixed-point at ``scale``) ranking ``label_col``
    (boolean; NULL labels/scores excluded).  Tied scores contribute the
    conventional half-credit.  AUC is NULL when either class is empty
    (no ranking question to score).

    Plan: one combinable per-score aggregate, then the
    cumulative-negatives term as a DISTRIBUTED prefix sum over the
    distinct-score frame (operators/keys.prefix_sum_ranged — range
    partition + local running sum + broadcast offsets; for continuous
    scores the distinct-value domain is data-sized, so no single-task
    ordered pass), one 1-row combine.
    """
    from netflix_data_ingestion_spark.operators.keys import (
        prefix_sum_ranged,
    )

    base = df.select(
        F.col(label_col).cast("boolean").alias("__y"),
        F.round(F.col(score_col) * scale).cast("long").alias("__s"),
    ).where(F.col("__y").isNotNull() & F.col("__s").isNotNull())
    per_score = base.groupBy("__s").agg(
        F.count(F.when(F.col("__y"), 1)).cast("long").alias("__np"),
        F.count(F.when(~F.col("__y"), 1)).cast("long").alias("__nn"),
    )
    pre = prefix_sum_ranged(per_score, ["__s"], "__nn", "__pre_nn")
    contrib = pre.select(
        "__np",
        "__nn",
        (
            F.col("__np").cast("decimal(38,0)")
            * (
                F.lit(2) * F.col("__pre_nn") + F.col("__nn")
            ).cast("decimal(38,0)")
        ).alias("__u2"),
    )
    return contrib.agg(
        F.sum("__np").cast("long").alias("n_pos"),
        F.sum("__nn").cast("long").alias("n_neg"),
        F.when(
            (F.sum("__np") > 0) & (F.sum("__nn") > 0),
            F.round(
                F.sum("__u2").cast("double")
                / (
                    F.lit(2)
                    * F.sum("__np").cast("decimal(38,0)")
                    * F.sum("__nn").cast("decimal(38,0)")
                ).cast("double"),
                6,
            ),
        ).alias("auc"),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
    threshold: float,
    scale: int = 100,
) -> DataFrame:
    """One row: (tp, fp, tn, fn, precision, recall, f1) — the
    thresholded companion of ``auc_roc`` (which scores the RANKING;
    this scores one operating point).  The threshold compares on the
    fixed-point grid (``score*scale >= round(threshold*scale)``) so the
    boundary is integer-decided, and each ratio is one division of
    exact counts, round 6, NULL when its denominator is empty.
    One combinable aggregate — a single pass, nothing shuffles.
    """
    thr = int(round(threshold * scale))
    base = df.select(
        F.col(label_col).cast("boolean").alias("__y"),
        (
            F.round(F.col(score_col) * scale).cast("long") >= F.lit(thr)
        ).alias("__p"),
    ).where(F.col("__y").isNotNull() & F.col("__p").isNotNull())
    g = base.agg(
        F.count(F.when(F.col("__y") & F.col("__p"), 1)).cast("long").alias("tp"),
        F.count(F.when(~F.col("__y") & F.col("__p"), 1)).cast("long").alias("fp"),
        F.count(F.when(~F.col("__y") & ~F.col("__p"), 1)).cast("long").alias("tn"),
        F.count(F.when(F.col("__y") & ~F.col("__p"), 1)).cast("long").alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, F.round(tp / (tp + fp), 6))
    rec = F.when(tp + fn > 0, F.round(tp / (tp + fn), 6))
    return g.select(
        "tp",
        "fp",
        "tn",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            (F.lit(2) * tp + fp + fn) > 0,
            F.round(F.lit(2) * tp / (F.lit(2) * tp + fp + fn), 6),
        ).alias("f1"),
    )
