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


def cooldown_throttle(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int = 300,
) -> DataFrame:
    """Admitted rows only — the COOL-DOWN rate limiter: an event is
    admitted iff at least ``gap_seconds`` passed since the last
    ADMITTED event of its key (each admission resets the clock) — the
    notification/alerting dedup policy.  Contrast with
    ``collapse_bursts`` (island semantics: chains by gap to the
    previous EVENT, so a slow drizzle collapses into one burst) — under
    cool-down that same drizzle re-admits every ``gap_seconds``.
    Greedy admission is ORDER-dependent, hence the (ts, tiebreak)
    total order; rows with NULL ts are dropped.  ``tiebreak_col`` must
    be an integral column unique per key (it keys the admitted set
    back to rows) — a non-integral type raises ValueError.

    Plan: sequential-per-key by nature (each decision depends on prior
    admissions), expressed as a JVM-side fold — per key, the sorted
    event array runs through ONE ``F.aggregate`` lambda carrying
    (last_admitted, kept) — no Python stage, no window cascade; one
    key shuffle + a semi-join back to the rows.  Hot-key caveat: a
    key's whole history folds in one task (quota_sample's documented
    trade) — pre-split by time for pathological keys.
    """
    keys = list(key_cols)
    gap_us = gap_seconds * 1_000_000
    # The admitted set is keyed back to rows by (keys, tiebreak) value, so
    # the tiebreak must be an integral column whose values are unique per
    # key (a string would cast to NULL under ANSI try-semantics and the
    # semi-join would silently return nothing; a duplicated value would
    # admit extra rows).  Fail loudly instead.
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    tb_type = df.schema[tiebreak_col].dataType
    if not isinstance(tb_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"cooldown_throttle: tiebreak column {tiebreak_col!r} must be "
            f"an integral type unique per key, got {tb_type.simpleString()}"
        )
    mic = F.unix_micros(F.col(ts_col).cast("timestamp"))
    evs = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        mic.alias("t"),
                        F.col(tiebreak_col).cast("long").alias("tb"),
                    )
                )
            ).alias("__evs")
        )
    )
    init = F.struct(
        F.lit(-(2**62)).cast("long").alias("last"),
        F.array().cast("array<bigint>").alias("kept"),
    )
    folded = evs.select(
        *keys,
        F.aggregate(
            "__evs",
            init,
            lambda acc, x: F.when(
                x["t"] - acc["last"] >= F.lit(gap_us),
                F.struct(
                    x["t"].alias("last"),
                    F.concat(acc["kept"], F.array(x["tb"])).alias("kept"),
                ),
            ).otherwise(acc),
        )["kept"].alias("__kept"),
    )
    # Alias the admitted frame's key columns before joining back onto the
    # frame it derives from — a bare df[k] == admitted[k] is the classic
    # self-join ambiguity (Spark's "trivially true equals predicate"
    # warning) that can degrade silently under refactoring.
    admitted = folded.select(
        *[F.col(k).alias(f"__adm_{k}") for k in keys],
        F.explode("__kept").alias("__tb"),
    )
    return df.join(
        admitted,
        [df[k] == admitted[f"__adm_{k}"] for k in keys]
        + [df[tiebreak_col].cast("long") == admitted["__tb"]],
        "left_semi",
    )
