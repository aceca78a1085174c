"""Deterministic hash-based dataset splitting — beyond-reference.

Train/validation/test splits for a training-data pipeline must be
STABLE: re-running the pipeline, adding files, or changing partitioning
must never move a document across splits.  Random sampling
(``df.sample``/TABLESAMPLE) is seed- and partitioning-dependent; the
portable discipline is to hash the document id with a salt and cut
[0, 1) into bands:

    frac(id) = int(md5(salt|id)[:8], 16) / 2^32

md5 keeps the assignment reproducible in ANY engine (same rule is one
SQL expression in the DuckDB oracle) and the salt versions the split —
bump it to reshuffle, keep it to guarantee stability.  Changing split
RATIOS only moves documents across adjacent bands (monotone cut
points), never between train and test arbitrarily.

Scale: a narrow map — no shuffle, no state, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_32 = float(2**32)


def split_fraction(id_col: Column, salt: str = "v1") -> Column:
    """Deterministic uniform [0, 1) fraction from (salt, id)."""
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), id_col.cast("string"))), 1, 8
    )
    return F.conv(h, 16, 10).cast("double") / F.lit(TWO_32)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Adds a `split` column assigning each row to a named band.

    `splits` maps name -> weight (normalized); band order is the given
    dict order, so {"train": .9, "test": .1} puts frac < 0.9 in train.
    """
    splits = splits or {"train": 0.9, "test": 0.1}
    total = sum(splits.values())
    frac = split_fraction(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name] / total
        cond = frac < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def kfold_assign(
    df: DataFrame, id_col: str, k: int = 5, salt: str = "v1"
) -> DataFrame:
    """Adds a ``fold`` column in [0, k) — deterministic k-fold
    cross-validation assignment: ``pmod(int(md5(salt|id)[:8]), k)``.
    Same stability contract as `hash_split` (re-runs, repartitioning,
    and corpus growth never move a row between folds; bump the salt to
    reshuffle), uniform across folds by md5.  Narrow map, no shuffle.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn("fold", F.pmod(h, F.lit(k)).cast("int"))


def time_split(
    df: DataFrame,
    ts_col: str,
    cutoffs: dict[str, str],
) -> DataFrame:
    """Adds a ``split`` column by TIME: each row goes to the first named
    band whose cutoff its timestamp is strictly below; rows at/after
    the last cutoff get the final band.  The leakage-safe split for
    forecasting / churn / next-event models, where `hash_split`'s
    uniform routing would leak future observations of an entity into
    training.  ``cutoffs`` maps band name -> upper bound timestamp
    string, in increasing order; the LAST entry's bound is ignored
    (it is the catch-all), e.g. ``{"train": "2024-03-01", "val":
    "2024-04-01", "test": "9999-01-01"}``.

    Narrow map, no shuffle, trivially portable (one CASE expression).
    NULL timestamps get NULL split — route or drop them explicitly.
    """
    names = list(cutoffs)
    expr: Column | None = None
    for name in names[:-1]:
        cond = F.col(ts_col) < F.lit(cutoffs[name]).cast("timestamp")
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    full = last if expr is None else expr.otherwise(last)
    return df.withColumn(
        "split", F.when(F.col(ts_col).isNotNull(), full)
    )
