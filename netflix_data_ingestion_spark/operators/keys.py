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


def prefix_sum_ranged(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``out_col`` = EXCLUSIVE prefix sum of ``value_col`` over the
    global ``order_cols`` order, computed DISTRIBUTED: range partition
    on the order, local running sum per partition, plus per-partition
    base offsets from a tiny (one row per partition) total-sum
    aggregate — the additive generalization of
    ``surrogate_key_ranged``'s numbering (offsets carry SUMS instead
    of COUNTS).  No single-task global window; the only driver state
    is O(#partitions).

    The exclusive convention (row's own value not included; first row
    gets 0) is what offset/layout computations want — e.g. each
    document's absolute token start in a concatenated corpus stream.
    Same eager-localCheckpoint pinning as surrogate_key_ranged so the
    count pass and the main pass see identical boundaries.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    ).localCheckpoint(eager=True)

    sums = {
        r[_PID]: r["s"]
        for r in ranged.groupBy(_PID)
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for p in range(n):
        offsets.append((p, acc))
        acc += int(sums.get(p) or 0)
    offsets_df = df.sparkSession.createDataFrame(
        offsets, schema=f"{_PID} int, {_OFFSET} long"
    )
    local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(offsets_df), _PID)
        .withColumn(
            out_col,
            (
                F.col(_OFFSET)
                + F.coalesce(F.sum(value_col).over(local), F.lit(0))
            ).cast("long"),
        )
        .drop(_PID, _OFFSET)
    )


def ntile_ranged(
    df: DataFrame,
    order_cols: list,
    k: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``out_col`` = EXACT SQL ``ntile(k)`` over the global
    ``order_cols`` order, computed DISTRIBUTED — the scale-safe twin of
    ``F.ntile(k).over(Window.orderBy(...))``, which sorts the world in
    one task.

    Identical semantics to the window form (including tie-splitting:
    ties are separated by their position in the total order, so pass a
    unique tiebreak column exactly as you would to the window): SQL
    NTILE assigns the first ``n mod k`` buckets ``ceil(n/k)`` rows and
    the rest ``floor(n/k)``, which is pure arithmetic on the global
    rank — and the global rank is ``surrogate_key_ranged``'s
    distributed numbering (range partition + local row_number +
    broadcast per-partition offsets; driver state O(#partitions)).
    Integer ceil-division throughout, exact at any rank.

    ``order_cols`` accepts strings or Column expressions (e.g.
    ``F.col("n").desc()``) — they feed repartitionByRange, the local
    sort, and the local window identically.
    """
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
    ).localCheckpoint(eager=True)

    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for p in range(n_part):
        offsets.append((p, acc))
        acc += counts.get(p, 0)
    total = acc
    offsets_df = df.sparkSession.createDataFrame(
        offsets, schema=f"{_PID} int, {_OFFSET} long"
    )
    local = Window.partitionBy(_PID).orderBy(*cols)
    ranked = ranged.join(F.broadcast(offsets_df), _PID).withColumn(
        "__nt_r", F.col(_OFFSET) + F.row_number().over(local)
    )
    q, rem = divmod(total, k)
    if q == 0:
        # fewer rows than buckets: ntile gives each row its own bucket
        bucket = F.col("__nt_r")
    else:
        head = (q + 1) * rem  # rows living in the ceil-sized buckets
        bucket = F.when(
            F.col("__nt_r") <= F.lit(head),
            F.expr(f"(__nt_r + {q}) div {q + 1}"),
        ).otherwise(F.expr(f"{rem} + (__nt_r - {head} + {q - 1}) div {q}"))
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        _PID, _OFFSET, "__nt_r"
    )
