"""Experiment (A/B) analysis — deterministic assignment + exact moments.

The two halves of online experimentation a lake engine owns: (1)
ASSIGNMENT — hashing the experiment unit with a salted md5 so the
split is stable across days, joins, and engines (the same property
``sample.py``'s md5 samplers and ``customer_pseudonymized`` rely on;
re-salting re-randomizes, which is how you run the next experiment on
the same users); (2) the PER-ARM REPORT — unit and event counts, mean
and sample variance of the metric, computed from exact DECIMAL(38,0)
moments in ONE pass (the ``profile.feature_correlations`` discipline:
integers until a single final double division, round 6), so two
re-runs — or two engines — cannot disagree in the last ulp.

The z/t statistic is one subtraction and sqrt away from these columns;
it is left to the caller because the DECISION threshold is policy, not
data plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_report(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    salt: str = "exp1",
    scale: int = 100,
) -> DataFrame:
    """(arm, n_units, n_events, mean_value, var_value) — two rows; the
    unit's first salted-md5 hex digit's parity picks the arm (stable
    50/50).  Rows with NULL unit or NULL metric are excluded (no arm /
    no contribution).  ``mean_value``/``var_value`` are in fixed-point
    units; ``var_value`` is the SAMPLE variance
    ``(n*Σx² - (Σx)²) / (n*(n-1))``, NULL when an arm has < 2 events.

    Plan: one narrow projection + one combinable grouped aggregate —
    the metric frame is scanned once, nothing shuffles but two
    moment rows.  (DECIMAL(38,0) holds Σx² past 10^13 cent-scaled
    events; beyond that, shard the sum by time and merge — the moments
    are algebraic.)
    """
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(salt), F.col(unit_col).cast("string")
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("int")
        % 2
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    dec = "decimal(38,0)"
    base = (
        df.where(F.col(unit_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            arm.alias("arm"),
            F.col(unit_col).alias("__u"),
            F.round(F.col(value_col) * scale)
            .cast("long")
            .cast("decimal(18,0)")
            .alias("__v"),
        )
    )
    g = base.groupBy("arm").agg(
        F.count_distinct("__u").cast("long").alias("n_units"),
        F.count("*").cast(dec).alias("__n"),
        F.sum("__v").cast(dec).alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).cast(dec).alias("__q"),
    )
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    return g.select(
        "arm",
        "n_units",
        n.cast("long").alias("n_events"),
        F.round(s.cast("double") / n.cast("double"), 6).alias("mean_value"),
        F.when(
            n > 1,
            F.round(
                (n * q - s * s).cast("double")
                / (n * (n - 1)).cast("double"),
                6,
            ),
        ).alias("var_value"),
    )
