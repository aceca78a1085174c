"""Deterministic surrogate-key assignment (SURVEY.md §7.2.3).

The reference lets PostgreSQL assign ``movie_key``/``customer_key`` via
SERIAL (schema.sql:54, 74) and reads the mapping back through the driver
(etl_pipeline_spark.py:924-937, 1038-1047) — nondeterministic, since
distributed insert order is arbitrary.  Here keys are Spark-generated and
deterministic: key = rank of the natural key.  Deterministic keys make
every downstream result reproducible and testable.

Two implementations:

``surrogate_key_small``
    ``row_number()`` over an unpartitioned window.  Exact and simple, but
    the final ordering runs in ONE task — only for dimension-sized inputs
    (up to tens of millions of rows; the reference's dims are 17,770
    movies / 480,189 customers).

``surrogate_key_ranged``
    Scale path: range-repartition by the natural key, number rows within
    each sorted partition, then add per-partition offsets computed from a
    tiny (one row per partition) count aggregate.  No single-task sort;
    fully parallel; exact same numbering as the small variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__sk_pid"
_OFFSET = "__sk_offset"


def surrogate_key_small(
    df: DataFrame, natural_cols: list[str], key_col: str
) -> DataFrame:
    """key = row_number over the natural key (dimension-sized inputs only)."""
    w = Window.orderBy(*natural_cols)
    return df.withColumn(key_col, F.row_number().over(w).cast("int"))


def surrogate_key_ranged(
    df: DataFrame,
    natural_cols: list[str],
    key_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic numbering: range partition + local
    row_number + broadcast per-partition offsets.

    The input is pinned for the two traversals (tiny count pass + main
    pass) so both see identical range-partition boundaries — via an
    EAGER localCheckpoint rather than persist(), so the blocks are freed
    when the caller drops the result instead of leaking a CacheManager
    entry until session end (see ffill.forward_fill_global for the full
    rationale).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *natural_cols)
        .sortWithinPartitions(*natural_cols)
        .withColumn(_PID, F.spark_partition_id())
    ).localCheckpoint(eager=True)

    counts = {r[_PID]: r["cnt"] for r in ranged.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], 0
    for p in range(n):
        offsets.append((p, acc))
        acc += counts.get(p, 0)
    offsets_df = df.sparkSession.createDataFrame(offsets, schema=f"{_PID} int, {_OFFSET} long")

    local = Window.partitionBy(_PID).orderBy(*natural_cols)
    return (
        ranged.join(F.broadcast(offsets_df), _PID)
        .withColumn(key_col, (F.col(_OFFSET) + F.row_number().over(local)).cast("long"))
        .drop(_PID, _OFFSET)
    )
