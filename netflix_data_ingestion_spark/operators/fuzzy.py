"""Blocked edit-distance fuzzy matching (entity resolution).

The data-cleaning operator the reference's exact-key model cannot
express: find pairs of strings within Levenshtein distance ``k`` —
near-identical product names, misspelled merchants — without the
all-pairs cross join.

Blocking: Levenshtein(a, b) <= k implies ``|len(a) - len(b)| <= k``,
so strings are bucketed into length bands of width ``k+1`` and each
probe row is emitted into its own band ± 1 (a 3x narrow fan-out of the
DISTINCT name space, not the corpus).  Two strings within the length
bound always land in the same or adjacent band, and the three emitted
bands are distinct, so every candidate pair is generated EXACTLY once
— the blocking is lossless and duplicate-free, which is what lets the
DuckDB oracle be the pure predicate ``levenshtein <= k`` with no
blocking logic at all.

Verification uses Spark's thresholded ``levenshtein(l, r, k)`` (early
exit past ``k`` — O(k * min_len) per pair instead of O(len^2)).

Scale shape: names are first made DISTINCT (one shuffle — the name
space is usually orders of magnitude smaller than the corpus), the
band join shuffles (band, name) pairs only, and the edit-distance
verify is a narrow JVM expression.  Within-band skew (every string the
same length) degrades toward all-pairs — the inherent worst case of
length blocking; add a lossy prefix/q-gram block on top when the name
space itself is huge (documented recall trade, not implemented here to
keep the contract exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def fuzzy_name_pairs(
    df: DataFrame, text_col: str, max_dist: int = 2
) -> DataFrame:
    """(name_a, name_b, dist) — distinct-value pairs with
    0 < Levenshtein(name_a, name_b) <= max_dist, name_a < name_b."""
    bandw = max_dist + 1
    names = (
        ensure_parallelism(df)
        .select(F.col(text_col).cast("string").alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
    )
    left = names.select(
        F.col("name").alias("name_a"),
        (F.length("name") / bandw).cast("long").alias("__band"),
    )
    band_b = (F.length("name") / bandw).cast("long")
    right = names.select(
        F.col("name").alias("name_b"),
        F.explode(
            F.array(band_b - 1, band_b, band_b + 1)
        ).alias("__band"),
    )
    cand = left.join(right, "__band").where(
        (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b"))
            <= F.lit(max_dist)
        )
    )
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist").between(1, max_dist))
        .select("name_a", "name_b", F.col("dist").cast("bigint").alias("dist"))
    )
