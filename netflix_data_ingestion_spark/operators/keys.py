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
_TOTAL = "__sk_total"


def _pin_ranged(df: DataFrame, cols: list, n: int) -> DataFrame:
    """Range-partition + local sort + partition id, pinned ONCE with an
    eager localCheckpoint: the frame is traversed twice (offset
    aggregate + main pass) and both must see identical range-partition
    boundaries."""
    return (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
    ).localCheckpoint(eager=True)


def _offsets_in_plan(
    ranged: DataFrame, agg_expr, with_total: bool = False
) -> DataFrame:
    """(pid, offset[, total]) — per-partition base offsets computed
    IN-PLAN: one combinable per-partition aggregate (#partitions rows)
    plus one exclusive running sum over pid order.

    r12 (guide §5 — the driver does no data work; §1.2 — fewer jobs per
    call): the former collect() + driver loop + createDataFrame round
    trip ran one extra Spark job and one extra plan per helper call at
    BUILD time; chained callers (customer_rfm_segments stacks three
    ntiles) paid it three times.  The running-sum window is a
    #partitions-row frame — model-sized single-task work by
    construction, the broadcast-offsets license this helper always had.
    Empty range partitions are absent from the aggregate, and equally
    absent from every join probe, so the inner join is unchanged.

    The per-partition aggregate is cast to long BEFORE the running sum —
    reproducing the former driver loop exactly, which int()-truncated
    each partition's sum as it accumulated.  For the integral value
    columns every caller passes (counts, token counts, frequencies)
    this is a no-op; for a hypothetical fractional value column it
    keeps the offsets bit-identical to the pre-r12 semantics instead
    of truncating only the final cumulative value."""
    per = ranged.groupBy(_PID).agg(agg_expr.cast("long").alias("__v"))
    excl = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    cols = [
        F.col(_PID),
        F.coalesce(F.sum("__v").over(excl), F.lit(0))
        .cast("long")
        .alias(_OFFSET),
    ]
    if with_total:
        full = Window.orderBy(_PID).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cols.append(F.sum("__v").over(full).cast("long").alias(_TOTAL))
    return per.select(*cols)


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
    ranged = _pin_ranged(df, list(natural_cols), n)
    offsets_df = _offsets_in_plan(ranged, F.count("*"))

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
    of COUNTS).  No single-task global window over the data; the only
    single-task step is the #partitions-row offset cumsum, in-plan.

    The exclusive convention (row's own value not included; first row
    gets 0) is what offset/layout computations want — e.g. each
    document's absolute token start in a concatenated corpus stream.
    Same eager-localCheckpoint pinning as surrogate_key_ranged so the
    count pass and the main pass see identical boundaries.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = _pin_ranged(df, list(order_cols), n)
    # all-NULL partitions aggregate to a NULL sum, which the running sum
    # skips — the same "or 0" the former driver loop applied
    offsets_df = _offsets_in_plan(
        ranged, F.coalesce(F.sum(value_col), F.lit(0))
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
    ranged = _pin_ranged(df, cols, n_part)
    # the total row count rides on the offsets frame (with_total), so the
    # bucket arithmetic below is the same integer NTILE math evaluated
    # in-plan instead of against a driver-side divmod
    offsets_df = _offsets_in_plan(ranged, F.count("*"), with_total=True)
    local = Window.partitionBy(_PID).orderBy(*cols)
    ranked = ranged.join(F.broadcast(offsets_df), _PID).withColumn(
        "__nt_r", F.col(_OFFSET) + F.row_number().over(local)
    )
    # q = total div k, rem = total mod k, head = (q+1)*rem; q == 0 (fewer
    # rows than buckets) gives each row its own bucket.  The q == 0 CASE
    # arm guards the div-by-q arm, which ANSI mode would otherwise reject.
    bucket = F.expr(
        f"CASE WHEN {_TOTAL} div {k} = 0 THEN __nt_r"
        f" WHEN __nt_r <= ({_TOTAL} div {k} + 1) * ({_TOTAL} % {k})"
        f" THEN (__nt_r + {_TOTAL} div {k}) div ({_TOTAL} div {k} + 1)"
        f" ELSE {_TOTAL} % {k}"
        f" + (__nt_r - ({_TOTAL} div {k} + 1) * ({_TOTAL} % {k})"
        f" + {_TOTAL} div {k} - 1) div ({_TOTAL} div {k}) END"
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        _PID, _OFFSET, _TOTAL, "__nt_r"
    )
