"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition a too-narrow input so downstream wide transforms
    (shingle/token explodes, hash fan-outs) use every core.

    Small dimension-ish tables often arrive as a single parquet file =
    one partition, which serializes any expensive per-row expansion on
    one task.  The fix is one cheap shuffle of the *narrow* input before
    the explosion.  Inputs that are already partitioned near the session
    parallelism (the 100 TB case — thousands of splits) pass through
    untouched, so this never adds a shuffle at scale.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
