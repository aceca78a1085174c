"""Event-transition matrix (first-order user journeys) —
beyond-reference (BASELINE.json north star; the reference aggregates
event COUNTS, never event ORDER).

For each key, consecutive event pairs in event-time order form the
bigram (from_type -> to_type); the global count table is the empirical
first-order Markov transition matrix — the standard "user journey"
analytics primitive (and, over token streams, the same shape as bigram
language-model counts).

Plan: one key shuffle for the lag window (consecutive-pair formation is
per-key and order-local — no self-join on time), then a map-side-
combinable groupBy on (from, to) whose cardinality is |event types|² —
tiny regardless of corpus size.  The row-probability denominator comes
from a window over the counts table (|types|² rows), not a second pass
over the events.

Determinism: transition probability is ONE double division of exact
int64 counts (cross-engine bit parity); pair formation needs unique
(key, ts) — same caller contract as operators/scd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """(from_type, to_type, n_transitions, p) — global consecutive-pair
    counts and row-normalized probabilities (p sums to 1 per from_type)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    pairs = (
        df.select(
            F.col(key_col),
            F.col(ts_col),
            F.col(type_col).alias("to_type"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wrow).cast("double")
        ).alias("p"),
    )
