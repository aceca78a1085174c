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


def pit_enrich(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    bucket_width_s: int = 86400,
) -> DataFrame:
    """Point-in-time (as-of-dimension) join: each fact row picks up the
    SCD2 version whose half-open validity [from, to) contains its
    timestamp — the temporal star-join every warehouse needs once a
    dimension is versioned (facts must enrich with the state AT EVENT
    TIME, not today's state).

    Mechanics: the rangejoin.py bucketing trick adapted to validity
    intervals — versions explode into the fixed-width time buckets they
    overlap, facts join on (key, bucket) hash equality, then the exact
    half-open predicate filters within the bucket.  A HASH join, never
    a nested loop; shuffle keys are (key, bucket).

    Open-ended current versions (the 9999-12-31 sentinel) would explode
    into billions of buckets, so validity is first CLAMPED to the max
    fact timestamp + 1us (a 1-row broadcast bound — versions beginning
    after it cannot match and are dropped).  At most one version
    matches per fact by SCD2's non-overlap invariant.
    """
    from netflix_data_ingestion_spark.operators.rangejoin import _epoch_us

    w_us = int(bucket_width_s) * 1_000_000
    bound = facts.agg(
        (F.max(_epoch_us(ts_col)) + F.lit(1)).alias("__cap_us")
    )
    h = (
        history.select(
            F.col(key_col).alias("__k"),
            _epoch_us(from_col).alias("__from_us"),
            _epoch_us(to_col).alias("__to_raw"),
            *payload_cols,
        )
        .crossJoin(F.broadcast(bound))
        .withColumn("__to_us", F.least(F.col("__to_raw"), F.col("__cap_us")))
        .where(F.col("__from_us") < F.col("__to_us"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__from_us") / w_us),
                    F.floor((F.col("__to_us") - 1) / w_us),
                )
            ),
        )
        .select("__k", "__from_us", "__to_us", "__bucket", *payload_cols)
    )
    f = facts.withColumn(
        "__bucket", F.floor(_epoch_us(ts_col) / w_us)
    ).withColumn("__ts_us", _epoch_us(ts_col))
    return (
        f.join(
            h,
            (f["__bucket"] == h["__bucket"])
            & (F.col(key_col) == F.col("__k")),
        )
        .where(
            (F.col("__ts_us") >= F.col("__from_us"))
            & (F.col("__ts_us") < F.col("__to_us"))
        )
        .select(*facts.columns, *payload_cols)
    )
