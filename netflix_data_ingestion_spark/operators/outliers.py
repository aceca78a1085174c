"""Group-wise z-score outlier detection in exact integer arithmetic.

Flags rows whose value deviates from their group's mean by more than
``z`` population standard deviations — the standard data-quality /
anomaly screen — WITHOUT ever computing a float mean or stddev.  The
inequality

    |x - mean| > z * stddev_pop

is squared and cleared of denominators into pure integer form
(x in fixed-point units, n/s/q the group count / sum / sum-of-squares,
z = z_num/z_den rational):

    (n*x - s)^2 * z_den^2  >  z_num^2 * (n*q - s^2)

(both sides of |x - s/n| > z * sqrt((n*q - s^2)/n^2) multiplied by n^2).

Every quantity is exact DECIMAL(38,0) — effectively int128 with a
runtime overflow check under ANSI mode — so the flag is bit-identical
on any engine and any partitioning (float mean/stddev would make
borderline rows engine-dependent).  The DuckDB oracle runs the same
inequality in HUGEINT.

Scale shape (100 TB): one combinable groupBy for the (n, s, q) moments
(constant bytes per group), one broadcast join of the tiny stats table
back onto the fact rows, then a narrow filter.  Two passes over the
input, zero driver state — the same shape as profile.skew_report.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def moments_build(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """(keys..., __n, __s, __q) — per-group count / sum / sum-of-squares
    of the fixed-point value, all DECIMAL(38,0).

    These moments are ALGEBRAIC: moments of a union are the field-wise
    SUMS of the parts' moments, so partial aggregation combines map-side
    and disjoint batches fold with ``merge.merge_aggregates`` — which is
    what ``streaming.ingest.maintain_moments_stream`` does to keep a
    running anomaly baseline over an unbounded stream in O(keys) state.
    """
    base = df.withColumn(
        "__v", F.round(F.col(value_col) * F.lit(scale)).cast("long")
    )
    # count(__v), not count(*): a NULL value must stay out of ALL three
    # moments or n disagrees with s/q and the sigma inequality skews
    return base.groupBy(*list(key_cols)).agg(
        F.count(F.col("__v")).cast(_DEC).alias("__n"),
        F.sum(F.col("__v").cast("decimal(18,0)")).cast(_DEC).alias("__s"),
        F.sum(
            (F.col("__v").cast("decimal(18,0)") * F.col("__v").cast("decimal(18,0)"))
        )
        .cast(_DEC)
        .alias("__q"),
    )


def zscore_flag(
    df: DataFrame,
    stats: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    z_num: int = 2,
    z_den: int = 1,
    scale: int = 100,
) -> DataFrame:
    """Flag rows of ``df`` against an EXTERNAL moments frame (broadcast)
    — the building block that lets a streaming micro-batch be screened
    against the maintained baseline rather than its own tiny sample."""
    keys = list(key_cols)
    base = df.withColumn(
        "__v", F.round(F.col(value_col) * F.lit(scale)).cast("long")
    )
    joined = base.join(F.broadcast(stats), keys)

    x = F.col("__v").cast(_DEC)
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    d = n * x - s
    lhs = d * d * F.lit(z_den * z_den).cast(_DEC)
    rhs = F.lit(z_num * z_num).cast(_DEC) * (n * q - s * s)

    return (
        joined.where(lhs > rhs)
        .select(
            *df.columns,
            F.col("__v").alias("value_units"),
            n.cast("bigint").alias("group_n"),
            (d > 0).alias("is_high"),
        )
    )


def zscore_outliers(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    z_num: int = 2,
    z_den: int = 1,
    scale: int = 100,
) -> DataFrame:
    """Rows where |x - group mean| > (z_num/z_den) * group stddev_pop.

    ``scale`` converts the (possibly float) value column to fixed-point
    units first (100 = cents for currency).  Output keeps the input
    columns plus ``value_units`` (the fixed-point value), ``group_n``,
    and ``is_high`` (above vs below the mean).
    """
    stats = moments_build(df, key_cols, value_col, scale)
    return zscore_flag(df, stats, key_cols, value_col, z_num, z_den, scale)


def mad_outliers(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    k_num: int = 3,
    k_den: int = 1,
    scale: int = 100,
) -> DataFrame:
    """Robust outlier screen: rows where |x - median| > (k_num/k_den) *
    MAD (median absolute deviation) within their group — the
    breakdown-resistant twin of ``zscore_outliers`` (one wild value
    drags a mean/stddev but not a median/MAD; Hampel's rule).

    Exactness discipline mirrors the z-score path: the value is
    fixed-point, both medians are EXACT lower-nearest-rank picks
    (``profile.exact_quantiles``' definition — real data points, no
    interpolation), and the decision is a strict integer inequality —
    no floats anywhere, so flags are engine- and partition-exact.

    Known caveat (inherent to MAD): a group where >50% of values are
    identical has MAD = 0, and every deviating row is flagged — callers
    screening near-constant groups should pre-filter them.

    Plan: two windowed passes (median of values, then median of
    deviations — the second NEEDS the first, so two keyed sorts is the
    lower bound), each followed by a broadcast stats join; same
    hot-group caveat as exact_quantiles.
    """
    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles,
    )

    keys = list(key_cols)
    base = df.withColumn(
        "__v", F.round(F.col(value_col) * F.lit(scale)).cast("long")
    )
    med = exact_quantiles(base, keys, "__v", qs=(0.5,)).select(
        *keys, F.col("p50").alias("__med")
    )
    with_med = base.join(F.broadcast(med), keys).withColumn(
        "__dev", F.abs(F.col("__v") - F.col("__med"))
    )
    mad = exact_quantiles(with_med, keys, "__dev", qs=(0.5,)).select(
        *keys, F.col("p50").alias("__mad")
    )
    joined = with_med.join(F.broadcast(mad), keys)
    return (
        joined.where(
            F.col("__dev") * F.lit(k_den) > F.lit(k_num) * F.col("__mad")
        )
        .select(
            *df.columns,
            F.col("__v").alias("value_units"),
            F.col("__med").alias("group_median"),
            F.col("__mad").alias("group_mad"),
            (F.col("__v") > F.col("__med")).alias("is_high"),
        )
    )


def winsorize(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
) -> DataFrame:
    """Input + ``<value>_winsorized`` — per-group percentile clipping:
    values below the group's ``lo_q`` quantile (or above ``hi_q``) are
    replaced by that quantile; everything else passes through.  The
    tail-taming transform for training features where ``zscore_flag``/
    ``mad_outliers``' drop semantics would lose the row entirely.

    Quantiles are the EXACT nearest-rank picks of
    ``profile.exact_quantiles`` (real data points, no interpolation —
    so the clipped values are engine-portable selections, never
    arithmetic).  Plan: the quantile pass (one keyed window) plus a
    broadcast join of the per-group bounds; clipping is a narrow
    least/greatest.  NULL values pass through NULL.
    """
    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles,
    )

    bounds = exact_quantiles(df, key_cols, value_col, qs=(lo_q, hi_q))
    lo_name = f"p{int(round(lo_q * 100))}"
    hi_name = f"p{int(round(hi_q * 100))}"
    bounds = bounds.select(
        *key_cols,
        F.col(lo_name).alias("__lo"),
        F.col(hi_name).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), list(key_cols))
        .withColumn(
            f"{value_col}_winsorized",
            F.least(
                F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")
            ),
        )
        .drop("__lo", "__hi")
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """(bucket_ts, dow, hod, cnt, season_median, season_mad, is_high) —
    hours whose event volume deviates from the SEASONAL baseline: each
    hourly count is compared against the median/MAD of all hours
    sharing its (day-of-week, hour-of-day) slot, so "quiet Sunday 3am"
    and "busy Monday 9am" each get their own normal band — the traffic
    anomaly detector a global threshold can't be (a normal Monday peak
    would drown a Sunday-night incident).

    Composition of proven parts: one hourly count aggregate (the
    resample shape), the monday0 day-of-week contract from
    functions/datetime, then ``mad_outliers`` over (dow, hod) groups —
    exact nearest-rank medians, strict integer decision, engine- and
    partition-exact.

    Shape at 100 TB: the raw-event pass is one combinable count to
    ~#hours rows; everything after runs on the tiny hourly frame.  The
    168 seasonal groups are static — no skew hazard.
    """
    from netflix_data_ingestion_spark.functions.datetime import (
        day_of_week_monday0,
    )

    hourly = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "dow", day_of_week_monday0(F.col("bucket_ts")).cast("int")
        )
        .withColumn("hod", F.hour("bucket_ts").cast("int"))
    )
    return mad_outliers(
        hourly, ["dow", "hod"], "cnt", k_num=k_num, k_den=k_den, scale=1
    ).select(
        "bucket_ts",
        "dow",
        "hod",
        "cnt",
        F.col("group_median").alias("season_median"),
        F.col("group_mad").alias("season_mad"),
        "is_high",
    )
