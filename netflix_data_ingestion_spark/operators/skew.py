"""Skew-handling operators: salted joins and two-phase aggregations.

At 100 TB, hot keys (a blockbuster movie's ratings block, a bot user's
events) overload single reduce tasks.  AQE's skew-join split
(spark.sql.adaptive.skewJoin, enabled by the session factory) handles
sort-merge joins automatically; these utilities cover the cases AQE
does not:

- ``salted_join``: replicate the small side across N salt values and
  scatter the big side's hot keys, for non-broadcastable-but-small-ish
  build sides.
- ``salted_agg``: classic two-phase (partial on (key, salt) -> final on
  key) for algebraic aggregates, spreading a hot key over N reducers.

Salts derive from ``xxhash64`` of the big side's row (mod N):
deterministic for a given row content, uniformly spread, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Attach a deterministic salt in [0, n_salts) from a row-content hash."""
    cols = cols or df.columns
    return df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resistant to hot keys on the big side.

    The small side is replicated n_salts times (size * n_salts must still
    be shuffle-affordable); the big side's rows scatter across salts, so
    one hot key occupies n_salts reduce tasks instead of one.
    """
    big_salted = with_salt(big, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    small_replicated = small.select(F.col("*"), salts)
    out = big_salted.join(small_replicated, [on, _SALT], how)
    return out.drop(_SALT)


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation: partial on (key, salt), final on key.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}.  (avg = sum+count composed by the caller;
    count-distinct is not algebraic — use groupBy or approx_count_distinct.)
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out_col, (in_col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(in_col).alias(out_col))
            final_exprs.append(F.sum(out_col).alias(out_col))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(in_col).alias(out_col))
            final_exprs.append(getattr(F, fn)(out_col).alias(out_col))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")

    partial = with_salt(df, n_salts).groupBy(*key_cols, _SALT).agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salt_advisor(
    df: DataFrame,
    key_cols: list[str],
    target_rows_per_task: int = 1_000_000,
    min_factor: int = 2,
) -> DataFrame:
    """(keys..., n, salt_factor) — the keys that need salting before a
    keyed shuffle, each with the factor that brings its heaviest task
    under ``target_rows_per_task``: ``ceil(n / target)`` in exact
    integer arithmetic.  Closes the loop from diagnosis
    (``profile.skew_report``) to remedy (``with_salt``/``salted_agg``):
    feed a returned factor straight into ``with_salt(df, factor)``.
    Keys already under ``min_factor`` are omitted — salting uniform
    keys only adds a second shuffle.

    One combinable count per key, then a narrow filter — the advisor
    costs one aggregation of the frame it protects.  (``target`` is
    capacity policy: rows one task should own given executor memory —
    tune per cluster; the default suits multi-GB executors with
    ~100-byte rows.)
    """
    keys = list(key_cols)
    t = F.lit(target_rows_per_task)
    counts = df.groupBy(*keys).agg(F.count("*").cast("long").alias("n"))
    factor = F.floor((F.col("n") + t - 1) / t).cast("int")
    return (
        counts.withColumn("salt_factor", factor)
        .filter(F.col("salt_factor") >= min_factor)
        .select(*keys, "n", "salt_factor")
    )
