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
    """Left as-of join: each left row gets the right row with the largest
    `on` <= left.`on` within the same `by` key (NULLs when none exists).

    Output: every left column, plus `prefix`-renamed `right_cols`.
    Deterministic under duplicate right timestamps only if (`by`, `on`)
    is unique on the right side (true for nanosecond event streams);
    otherwise the latest right row in (`on`, `right_cols[0]`) order wins.
    """
    if direction != "backward":
        raise NotImplementedError("only backward (most-recent-prior) as-of")
    right_cols = list(right_cols or [c for c in right.columns if c != on])
    by = list(by)

    r_struct = _struct_type(right, right_cols)
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
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal time -> inclusive match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
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
) -> DataFrame:
    """`asof_join` semantics via cogrouped ``pd.merge_asof`` per key.

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
            l, r, on=on, direction="backward", suffixes=("", "__r")
        )
        keep = left_names + [f"{prefix}{c}" for c in right_cols]
        return merged[keep]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, out_schema)
    )
