"""As-of (time-travel) join — beyond-reference.

The reference has no temporal join; an event/feature pipeline needs one
constantly (attribute each event to the most recent prior state).  Two
implementations with identical semantics:

- `asof_join`: pure DataFrame — tag both sides, union, forward-fill the
  right payload with ``last(ignorenulls)`` over (key, time) ordering,
  keep left rows.  One shuffle on the key, everything JVM-side; ties at
  equal timestamps resolve right-before-left, so a right row AT the left
  timestamp matches (DuckDB/pandas ``backward`` semantics).
- `asof_join_cogrouped`: ``cogroup().applyInPandas`` running
  ``pd.merge_asof`` per key group — the shape to reach for when per-key
  history is long and you want the local two-pointer merge instead of a
  window sort, or when the payload is wide (Arrow columnar transfer).

At 100 TB both shuffle once on the join key; skewed keys salt like any
other join (operators/skew).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _struct_type(df: DataFrame, cols: Sequence[str]) -> T.StructType:
    return T.StructType([df.schema[c] for c in cols])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] | None = None,
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join within the same `by` key (NULLs when no match):

    - ``backward``: right row with the largest `on` <= left.`on`;
    - ``forward``: right row with the smallest `on` >= left.`on`;
    - ``nearest``: whichever of the two is closer in absolute `on`
      distance — backward wins exact ties (pandas ``merge_asof``
      parity, asserted by tests against the cogrouped twin).

    Output: every left column, plus `prefix`-renamed `right_cols`.
    Deterministic under duplicate right timestamps only if (`by`, `on`)
    is unique on the right side (true for nanosecond event streams);
    otherwise the latest right row in (`on`, `right_cols[0]`) order wins.

    Plan shape: one shuffle on `by`; backward/forward are a single
    window pass, nearest sorts the same shuffled partitions twice (one
    exchange, two in-partition sorts).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    right_cols = list(right_cols or [c for c in right.columns if c != on])
    by = list(by)

    # the match struct carries the right row's own `on` ("__rt") so the
    # nearest direction can compare distances; dropped from the output
    r_struct = T.StructType(
        list(_struct_type(right, right_cols)) + [T.StructField("__rt", right.schema[on].dataType, True)]
    )
    l_tagged = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    r_tagged = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(_struct_type(left, left.columns)).alias("__l"),
        F.struct(
            *[F.col(c) for c in right_cols], F.col(on).alias("__rt")
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal time -> inclusive match
    # in BOTH traversal directions
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").desc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        filled = unioned.withColumn(
            "__match", F.last("__r", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        filled = unioned.withColumn(
            "__match", F.last("__r", ignorenulls=True).over(w_fwd)
        )
    else:
        both = unioned.withColumn(
            "__mb", F.last("__r", ignorenulls=True).over(w_back)
        ).withColumn("__mf", F.last("__r", ignorenulls=True).over(w_fwd))

        rt_type = right.schema[on].dataType
        # distances stay in exact integer arithmetic whenever both `on`
        # dtypes allow it: a double mantissa holds 53 bits, so for int64
        # keys above 2^53 (epoch-nanosecond streams) a double round-trip
        # can flip which neighbor is closer and diverge from the exact
        # cogrouped pd.merge_asof twin.  Only fractional `on` columns
        # take the double path.
        _integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        _temporal = (T.TimestampType, T.TimestampNTZType, T.DateType)
        exact = all(
            isinstance(dt, _integral + _temporal)
            for dt in (left.schema[on].dataType, rt_type)
        )

        def as_num(c: F.Column, dtype: T.DataType) -> F.Column:
            # timestamps (incl. TIMESTAMP_NTZ, which ANSI refuses to
            # cast to double) go through exact integer microseconds
            if isinstance(dtype, _temporal):
                micros = F.unix_micros(c.cast("timestamp"))
                return micros if exact else micros.cast("double")
            return c.cast("long") if exact else c.cast("double")

        t_num = as_num(F.col("__t"), left.schema[on].dataType)
        d_back = t_num - as_num(F.col("__mb.__rt"), rt_type)
        d_fwd = as_num(F.col("__mf.__rt"), rt_type) - t_num
        filled = both.withColumn(
            "__match",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(d_back <= d_fwd, F.col("__mb"))  # backward wins ties
            .otherwise(F.col("__mf")),
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return filled.filter(F.col("__is_l") == 1).select(*out_cols)


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] | None = None,
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """`asof_join` semantics via cogrouped ``pd.merge_asof`` per key
    (which supports all three directions natively).

    Keys absent from the right side still yield left rows (NULL matches),
    matching the union implementation and DuckDB's ASOF LEFT JOIN.
    """
    import pandas as pd

    right_cols = list(right_cols or [c for c in right.columns if c != on])
    by = list(by)
    out_schema = T.StructType(
        list(left.schema)
        + [
            T.StructField(f"{prefix}{f.name}", f.dataType, True)
            for f in _struct_type(right, right_cols)
        ]
    )
    left_names = list(left.columns)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema])
        l = l.sort_values(on, kind="mergesort")
        r = (
            r[[on] + right_cols]
            .rename(columns={c: f"{prefix}{c}" for c in right_cols})
            .sort_values(on, kind="mergesort")
        )
        if r.empty:
            out = l.copy()
            for c in right_cols:
                out[f"{prefix}{c}"] = None
            return out
        merged = pd.merge_asof(
            l, r, on=on, direction=direction, suffixes=("", "__r")
        )
        keep = left_names + [f"{prefix}{c}" for c in right_cols]
        return merged[keep]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, out_schema)
    )
