"""Burst collapse — drop rapid-fire repeats, keep the first of each run.

Ingest cleaning for instrumented clients: double-clicks, retry storms,
and at-least-once delivery produce runs of near-simultaneous identical
events that inflate every downstream count.  Collapsing a run to its
FIRST event (plus the run size, so nothing is silently lost) is the
batch twin of streaming ``dedup_events``-with-watermark, but keyed by
GAP rather than a fixed window: events chain into one burst while each
follows its predecessor within ``gap_seconds`` (the sessionization
rule applied at dedup granularity).

Determinism: ordering is (ts, tiebreak) with microsecond arithmetic
(``unix_micros``), so equal-timestamp events still order totally and
both engines draw identical burst boundaries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_bursts(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int = 300,
) -> DataFrame:
    """Input columns + ``burst_size`` — only the first event of every
    burst survives, carrying how many it collapsed.  A burst is a
    maximal chain per key where each event follows the previous one
    STRICTLY within ``gap_seconds`` (a gap of exactly ``gap_seconds``
    starts a new burst — the session_window half-open convention).
    Rows with NULL ``ts_col`` are dropped (no position in event time).

    Plan: ONE key shuffle; the island flag, island id, in-burst rank
    and burst size are all windows over the same (key, time) sort —
    AQE folds them onto one exchange.  Same hot-key caveat as every
    per-key window.
    """
    keys = list(key_cols)
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    # testdata timestamps are TIMESTAMP_NTZ; the session runs UTC, so the
    # cast is a tagging no-op and unix_micros matches DuckDB's epoch_us
    mic = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_mic = F.lag(mic).over(w)
    flagged = df.where(F.col(ts_col).isNotNull()).withColumn(
        "__new",
        F.when(
            prev_mic.isNull()
            | (mic - prev_mic >= F.lit(gap_seconds * 1_000_000)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islanded = flagged.withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wi = Window.partitionBy(*keys, "__island")
    ranked = islanded.withColumn(
        "__rn", F.row_number().over(wi.orderBy(*order))
    ).withColumn("burst_size", F.count("*").over(wi).cast("long"))
    return ranked.filter(F.col("__rn") == 1).drop(
        "__new", "__island", "__rn"
    )
