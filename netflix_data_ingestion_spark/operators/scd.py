"""Slowly-changing-dimension (Type 2) history — warehouse parity surface.

The reference maintains flat current-state dimension tables
(schema.sql:42-76) and overwrites on change; a warehouse that needs
time travel keeps the SCD Type-2 form instead: one row per (key,
state-run) with a validity interval.  This operator derives that
history from an event/change log in two window passes:

1. change detection: keep a row only where the attribute differs from
   the key's previous value (``lag`` over event time) — consecutive
   duplicates collapse into one run;
2. interval assembly: ``valid_to`` = the next run's ``valid_from``
   (``lead``), NULL while current; ``version`` numbers the runs.

Plan shape: both windows partition on the key — ONE shuffle (Catalyst
reuses the sort/partitioning for every window over the same spec), then
two linear passes.  No joins, no state larger than one key's run list.

Determinism: requires unique (key, ts) per input row (true of any
sane change log; asserted nowhere because verifying uniqueness would
cost a shuffle — the caller owns the contract).  All columns flow
through untyped — no float arithmetic, so cross-engine parity is
structural, not numeric.

NULL states are first-class: change detection is null-safe
(``eqNullSafe``), so a transition to or from a NULL attribute value
opens/closes a run like any other state change, and a key whose first
observed state is NULL still gets its version-1 row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
) -> DataFrame:
    """(key, state, valid_from, valid_to, version, is_current) — Type-2
    history of ``attr_col`` per key, ordered runs of identical values
    collapsed, half-open validity ``[valid_from, valid_to)``."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # NULL-safe change detection: `__prev != attr` is NULL when either
    # side is NULL, which would silently drop transitions to/from a NULL
    # state.  eqNullSafe treats NULL as a comparable value; the first row
    # of each key is detected by row_number (NOT by `__prev IS NULL`,
    # which would wrongly drop a key whose FIRST state is NULL).  Both
    # window functions share the spec, so still one shuffle.
    changed = (
        df.select(F.col(key_col), F.col(ts_col), F.col(attr_col))
        .withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col("__prev").eqNullSafe(F.col(attr_col))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col)
    return changed.select(
        F.col(key_col),
        F.col(attr_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
