"""Skyline (Pareto frontier) — beyond-reference (the multi-criteria
"best trade-offs" query: rows no other row beats on BOTH dimensions;
Börzsönyi et al., ICDE'01).

2-D grouped skyline, sort-free at the row level: dominance in two
dimensions collapses to a prefix-max over the DISTINCT minimize-values
—

  1. per (group, min_val): the best (max) maximize-value at that price
     point — one combinable shuffle;
  2. running max over the per-distinct-value frame ordered by min_val
     (strictly-cheaper best) — a window over #distinct-prices rows per
     group, not over data rows;
  3. join back: a row survives iff it is the best at its own price
     point AND strictly better than every cheaper point's best.

Total cost: one aggregate shuffle + one small window + one join — no
row-level sort, no quadratic self-join.  (For d > 2 dimensions the
prefix-max trick no longer applies; the NOT EXISTS dominance anti-join
— the oracle's formulation — is the general fallback.)  Duplicate
(min, max) rows are mutually non-dominating and BOTH survive, matching
the strict-dominance definition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def skyline_2d(
    df: DataFrame,
    key_cols: Sequence[str],
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Rows of ``df`` on the per-group Pareto frontier: minimize
    ``min_col``, maximize ``max_col``; a row is dominated if some row
    in its group is <= on min_col, >= on max_col, and strictly better
    on at least one.  NULL in either dimension excludes the row
    (NULL is not comparable under dominance).
    """
    base = ensure_parallelism(df).where(
        F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
    )
    per_price = base.groupBy(*key_cols, min_col).agg(
        F.max(max_col).alias("__best_here")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(min_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_price.withColumn(
        "__best_cheaper", F.max("__best_here").over(w)
    )
    joined = base.join(frontier, [*key_cols, min_col])
    survives = (F.col(max_col) == F.col("__best_here")) & (
        F.col("__best_cheaper").isNull()
        | (F.col(max_col) > F.col("__best_cheaper"))
    )
    return joined.where(survives).drop("__best_here", "__best_cheaper")
