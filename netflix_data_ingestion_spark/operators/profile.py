"""Column profiling (data-quality observability) — reference parity
surface: the reference's safety validation counts rows and null keys
per table (etl_pipeline_spark.py:1390-1470); this generalizes it to a
per-column completeness/cardinality profile any table can report.

One aggregation pass computes every column's null count and exact
distinct count (Catalyst plans multiple COUNT DISTINCTs as one Expand —
a single scan), then a ``stack`` pivots the 1-row wide result into the
long (column, metrics) form.  The output is |columns| rows — constant-
size observability regardless of table size, which is what a 100 TB
profile has to be.

Exact COUNT DISTINCT is the right default for profiling dimension-ish
tables; for monstrous high-cardinality columns swap
``approx_count_distinct`` (rows-only semantics — the HLL estimate is
not engine-portable, same caveat as approx_distinct_users_daily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct) — one row per profiled
    column, computed in a single aggregation pass."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
    ).select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_nulls",
        "n_distinct",
    )
