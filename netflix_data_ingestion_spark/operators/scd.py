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
    changed = (
        df.select(F.col(key_col), F.col(ts_col), F.col(attr_col))
        .withColumn("__prev", F.lag(attr_col).over(w))
        .filter(
            F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col))
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
