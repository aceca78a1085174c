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
    fetch order).  When set, two scale fixes apply:

    * the partition-identity pin below is skipped — the carry aggregate
      simply re-traverses the (cheap, filter-pruned) scan instead of
      pinning the full-width frame in the block manager (at 200M-row
      ingest scale the pin itself was the memory wall);
    * the local LOCF runs as ONE NARROW Arrow pass (``mapInPandas``
      carrying fill state across batches within each partition, with
      the driver-computed partition carry-ins injected via closure)
      instead of ``Window.partitionBy(spark_partition_id())`` — the
      window form forces a FULL Exchange + Sort of the input because
      Catalyst cannot see that the frame is already partitioned by its
      own partition id (measured: the exchange+sort was the dominant
      stg cost at 200M rows).  This is the sanctioned per-partition
      imperative case: LOCF over an implicit physical order is exactly
      what built-in operators cannot express without that shuffle.
    """
    tagged = df.withColumn(_PART, F.spark_partition_id())

    if deterministic_source:
        _assert_shuffle_free(df)
        return _ffill_arrow_pass(df, tagged, order_col, value_col, out_col)

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


def _assert_shuffle_free(df: DataFrame) -> None:
    """Guard for the ``deterministic_source=True`` contract: the fast
    path traverses ``df`` twice (carry-in aggregate, then the Arrow LOCF
    pass) assuming identical partition contents each time.  A shuffle
    upstream (round-robin repartition, shuffle-fetch order) breaks that
    silently — wrong fills, no error.  Planning the frame is cheap (no
    execution), so check the physical plan for a shuffle Exchange and
    fail loudly instead.  BroadcastExchange is fine: broadcasting a dim
    side does not reorder the streaming side's partitions."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        node = line.lstrip(" +-:*()0123456789")
        if node.startswith("Exchange"):
            raise ValueError(
                "forward_fill_global(deterministic_source=True) requires "
                "a shuffle-free input (narrow lineage from a file scan); "
                "the physical plan contains a shuffle Exchange, so the "
                "two traversals could see different partition contents. "
                "Pass deterministic_source=False for shuffled inputs.\n"
                + plan
            )


def _ffill_arrow_pass(
    df: DataFrame,
    tagged: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """The deterministic-source fast path: per-partition LOCF in one
    narrow ``mapInPandas`` stage.

    Order inside the pass is the PHYSICAL row order — legal because the
    operator contract already requires ``order_col`` to equal physical
    (partition, offset) order for a deterministic scan.  Fill state
    carries across Arrow batches within a partition via the generator's
    local; the cross-PARTITION carry-ins are computed first from a
    filter-pruned re-traversal of the scan (tiny: one row per partition
    that contains any non-null) and enter the stage as a plain closure
    dict, so there is no shuffle, no sort, and no post-join anywhere in
    the plan."""
    # one row per physical partition: the last non-null value it contains
    last_per_part = (
        tagged.filter(F.col(value_col).isNotNull())
        .groupBy(_PART)
        .agg(F.max_by(F.col(value_col), F.col(order_col)).alias("last_val"))
        .collect()
    )
    last_by_part = {r[_PART]: r["last_val"] for r in last_per_part}

    n_parts = tagged.rdd.getNumPartitions()
    carry_in: dict[int, object] = {}
    running = None
    for p in range(n_parts):
        carry_in[p] = running
        if p in last_by_part:
            running = last_by_part[p]

    from pyspark.sql.types import StructField, StructType

    value_type = df.schema[value_col].dataType
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, value_type, True)]
    )
    in_cols = [f.name for f in df.schema.fields]
    # int-with-nulls arrives in pandas as float64; casting that back to
    # an integral Arrow type would turn a residual NaN (a legitimately
    # unfilled leading row) into garbage, not NULL — route through the
    # masked pandas extension dtype instead
    pd_nullable = {
        "tinyint": "Int8",
        "smallint": "Int16",
        "int": "Int32",
        "bigint": "Int64",
        "float": "Float32",
        "double": "Float64",
    }.get(value_type.simpleString())

    def locf(iterator):
        import pandas as pd

        carry = None
        first = True
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if first:
                carry = carry_in.get(int(pdf[_PART].iloc[0]))
                first = False
            filled = pdf[value_col].ffill()
            if carry is not None:
                # after ffill only the LEADING null run remains
                filled = filled.fillna(carry)
            last = filled.iloc[-1]
            if not pd.isna(last):
                carry = last
            out = pdf[in_cols].copy()
            out[out_col] = (
                filled.astype(pd_nullable) if pd_nullable else filled
            )
            yield out

    return tagged.mapInPandas(locf, out_schema)
