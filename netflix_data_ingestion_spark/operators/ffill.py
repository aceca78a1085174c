"""Forward-fill (LOCF) operators — grouped and global.

The reference's core stateful-parse primitive is
``last(col, ignorenulls=True)`` over a running window
(etl_pipeline_spark.py:1114-1122).  Its distributed form is broken: it
partitions the window by ``int(monotonically_increasing_id/10000)``
(:1097-1098), so any block spanning a 10k-row bucket boundary silently
loses rows (SURVEY.md §4.4).  The operators here implement the intended
semantics — "each row sees the last non-null value at or before it in a
single global order" — correctly and scalably.

``forward_fill_grouped``
    Plain windowed LOCF within key groups.  One shuffle on the group key;
    fully parallel; the right tool when a grouping key exists (e.g.
    per-user event streams).

``forward_fill_global``
    LOCF over ONE global order with no grouping key (the ratings block
    parse).  A naive global window (``Window.orderBy(order)``) sorts
    everything into a single task — unusable at scale.  Instead:

    1. local LOCF within each physical input partition (parallel window,
       no shuffle of the big table);
    2. per-partition "last non-null value" — a tiny aggregate, one row
       per partition;
    3. driver-side running fill over that tiny frame (#partitions rows,
       ~800k rows even at 100 TB / 128 MB splits — a few MB) to compute
       each partition's carry-in;
    4. broadcast the carry-ins back and ``coalesce(local_fill, carry_in)``.

    Net cost: one narrow pass + one tiny collect + one broadcast join.
    No global sort, no single-task stage, exact semantics across
    partition boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PART = "__ffill_part"
_CARRY = "__ffill_carry"


def forward_fill_grouped(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str | Column,
    out_col: str,
) -> DataFrame:
    """LOCF of ``value_col`` within each group, ordered by ``order_cols``."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.withColumn(out_col, F.last(value, ignorenulls=True).over(w))


def forward_fill_global(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    deterministic_source: bool = False,
) -> DataFrame:
    """LOCF of ``value_col`` over the single global order ``order_col``.

    Requires ``order_col`` to be globally monotonic ACROSS physical
    partitions (e.g. ``monotonically_increasing_id()`` on a file scan,
    where partition ids follow split order) — i.e. all rows of partition
    *p* order before all rows of partition *p+1*.

    ``deterministic_source=True`` asserts that ``df`` recomputes with
    IDENTICAL partition contents and order on every traversal — true for
    a frame derived narrowly from a file scan (splits are a pure function
    of file list + maxPartitionBytes; row order within a split is file
    order), false after any shuffle (round-robin repartition, shuffle
    fetch order).  When set, the partition-identity pin below is skipped:
    the carry aggregate simply re-traverses the (cheap, filter-pruned)
    scan instead of pinning the full-width frame in the block manager —
    at 200M-row ingest scale the pin itself was the memory wall.
    """
    tagged = df.withColumn(_PART, F.spark_partition_id())

    if not deterministic_source:
        # deterministic double-traversal hazard: the tiny carry aggregate
        # and the main pass must see identical partition tags.  Pin via an
        # EAGER localCheckpoint, not persist(): checkpoint blocks are
        # GC-scoped (freed when the caller drops the result — no
        # CacheManager entry leaking until session end), and the truncated
        # lineage freezes partition identity outright instead of hoping a
        # recompute after cache eviction repartitions identically.
        # Trade-off: on executor loss the job fails fast instead of
        # recomputing — callers (idempotent staged parquet writes) just
        # re-run the stage.
        tagged = tagged.localCheckpoint(eager=True)

    local_w = (
        Window.partitionBy(_PART)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        out_col, F.last(F.col(value_col), ignorenulls=True).over(local_w)
    )

    # one row per physical partition: the last non-null value it contains
    last_per_part = (
        tagged.filter(F.col(value_col).isNotNull())
        .groupBy(_PART)
        .agg(F.max_by(F.col(value_col), F.col(order_col)).alias("last_val"))
        .collect()
    )
    last_by_part = {r[_PART]: r["last_val"] for r in last_per_part}

    n_parts = tagged.rdd.getNumPartitions()
    carry_rows = []
    running = None
    for p in range(n_parts):
        carry_rows.append((p, running))
        if p in last_by_part:
            running = last_by_part[p]

    spark = df.sparkSession
    value_type = df.schema[value_col].dataType
    carry_df = spark.createDataFrame(
        [(p, v) for p, v in carry_rows],
        schema=f"{_PART} int, {_CARRY} {value_type.simpleString()}",
    )

    out = (
        filled.join(F.broadcast(carry_df), _PART, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col(_CARRY)))
        .drop(_PART, _CARRY)
    )
    return out
