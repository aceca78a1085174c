"""Distribution drift report — the PSI/monitoring shape, integer-exact.

Production ML monitoring compares a feature's CURRENT distribution
against a REFERENCE window (training data, last stable week) over a
fixed binning derived from the reference — the Population Stability
Index recipe.  PSI's log-ratio is a float portability hazard, so this
report stays upstream of it: per-bin counts and shares in exact
parts-per-million (integer division), plus the absolute share delta —
everything an alerting rule thresholds on, engine- and
partition-exact.  (Sum delta_ppm/2 is total-variation distance in ppm;
callers wanting literal PSI can apply ln on the returned shares.)

Binning: equi-depth cut points from the reference side (exact
nearest-rank quantiles — real data points, no interpolation), bin(v) =
1 + #cuts strictly below-or-equal... strictly exceeded by v, so ties
land deterministically in the lower bin on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """(bin, lo_units, ref_n, cur_n, ref_ppm, cur_ppm, delta_ppm) — one
    row per reference-derived equi-depth bin; ``lo_units`` is the bin's
    exclusive lower cut in fixed-point units (NULL for bin 1).  Bins
    emptied on one side still appear (outer join, zero-coalesced) —
    mass vanishing from a bin IS the drift signal.

    Plan: the cut-point derivation is one global ordered window over
    the REFERENCE only (the sanctioned global-quantile shape); both
    sides then bin via a broadcast cut array (narrow map — no shuffle
    beyond one combinable count per bin) and the report is a
    bins-sized frame.  ppm shares use integer division — exact at any
    count the engines can hold.
    """
    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles_ranged,
    )

    qs = tuple(i / bins for i in range(1, bins))
    refv = ref.select(
        F.round(F.col(value_col) * scale).cast("long").alias("__v")
    ).where(F.col("__v").isNotNull())
    curv = cur.select(
        F.round(F.col(value_col) * scale).cast("long").alias("__v")
    ).where(F.col("__v").isNotNull())
    # distributed global quantiles (range partition + broadcast offsets)
    # — no single-task sort of the reference side at any scale
    cutrow = exact_quantiles_ranged(refv, "__v", qs=qs)
    cuts = cutrow.select(
        F.array(
            *[F.col(f"p{int(round(q * 100))}") for q in qs]
        ).alias("__cuts")
    )

    def binned(side: DataFrame, out: str) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(cuts))
            .select(
                (
                    F.aggregate(
                        "__cuts",
                        F.lit(0),
                        lambda acc, c: acc
                        + F.when(F.col("__v") > c, 1).otherwise(0),
                    )
                    + 1
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count("*").cast("long").alias(out))
        )

    rb = binned(refv, "ref_n")
    cb = binned(curv, "cur_n")
    joined = (
        rb.join(cb, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    totals = joined.agg(
        F.sum("ref_n").alias("__rt"), F.sum("cur_n").alias("__ct")
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(cuts))
        .select(
            "bin",
            F.when(F.col("bin") > 1, F.element_at("__cuts", F.col("bin") - 1))
            .alias("lo_units"),
            "ref_n",
            "cur_n",
            # div guarded: an EMPTY side (total 0) yields NULL shares, not
            # an ANSI divide-by-zero crash (the dedup_lsh_recall lesson)
            F.expr(
                "CASE WHEN __rt > 0 THEN (ref_n * 1000000) div __rt END"
            ).alias("ref_ppm"),
            F.expr(
                "CASE WHEN __ct > 0 THEN (cur_n * 1000000) div __ct END"
            ).alias("cur_ppm"),
            F.abs(
                F.expr(
                    "CASE WHEN __rt > 0 THEN (ref_n * 1000000) div __rt END"
                )
                - F.expr(
                    "CASE WHEN __ct > 0 THEN (cur_n * 1000000) div __ct END"
                )
            ).alias("delta_ppm"),
        )
    )
