"""Declared schemas and CHECK-style validators for the star schema.

Mirrors the reference warehouse DDL (schema.sql:28-124) and the explicit
casts in its PySpark transforms (etl_pipeline_spark.py:776-795, 895-906,
1129-1133).  The reference enforces ranges with PostgreSQL CHECK
constraints; Spark storage has no CHECKs, so the same predicates live here
as validation filters applied at build time (invalid rows are dropped with
accounting, matching the reference's drop-and-log discipline at
etl_pipeline_spark.py:1163-1172).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Star-schema StructTypes (reference DDL: schema.sql:28-124)
# ---------------------------------------------------------------------------

DIM_DATE_SCHEMA = T.StructType(
    [
        T.StructField("date_key", T.IntegerType(), False),  # YYYYMMDD
        T.StructField("date_actual", T.DateType(), False),
        T.StructField("year", T.ShortType(), False),
        T.StructField("month", T.ShortType(), False),
        T.StructField("day", T.ShortType(), False),
        T.StructField("quarter", T.ShortType(), False),
        # contract: 0=Monday .. 6=Sunday (schema.sql:47 comment; the
        # reference code's dayofweek-2 maps Sunday to -1 — a bug we do
        # NOT inherit, see SURVEY.md §1.4)
        T.StructField("day_of_week", T.ShortType(), False),
        T.StructField("month_name", T.StringType(), False),
        T.StructField("is_weekend", T.BooleanType(), False),
    ]
)

DIM_MOVIE_SCHEMA = T.StructType(
    [
        T.StructField("movie_key", T.IntegerType(), False),  # deterministic, §7.3
        T.StructField("movie_id", T.IntegerType(), False),
        T.StructField("title", T.StringType(), False),  # truncated to 500
        T.StructField("release_year", T.ShortType(), True),  # NULL tolerated
    ]
)

DIM_CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("customer_key", T.IntegerType(), False),
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("first_rating_date", T.DateType(), True),
        T.StructField("last_rating_date", T.DateType(), True),
        T.StructField("total_ratings", T.LongType(), True),
    ]
)

FACT_RATINGS_SCHEMA = T.StructType(
    [
        T.StructField("customer_key", T.IntegerType(), False),
        T.StructField("movie_key", T.IntegerType(), False),
        T.StructField("date_key", T.IntegerType(), False),
        T.StructField("rating", T.ShortType(), False),  # CHECK 1..5
        T.StructField("rating_timestamp", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# CHECK-constraint predicates (schema.sql:32-35, 57, 100)
# ---------------------------------------------------------------------------

def checks() -> dict[str, dict[str, Column]]:
    """CHECK predicates per table (built lazily — Columns need a live session)."""
    return {
        "dim_date": {
            "month_range": F.col("month").between(1, 12),
            "day_range": F.col("day").between(1, 31),
            "quarter_range": F.col("quarter").between(1, 4),
            "day_of_week_range": F.col("day_of_week").between(0, 6),
        },
        "dim_movie": {
            # release_year BETWEEN 1890 AND 2010, NULL allowed (schema.sql:57)
            "release_year_range": F.col("release_year").isNull()
            | F.col("release_year").between(1890, 2010),
        },
        "fact_ratings": {
            "rating_range": F.col("rating").between(1, 5),
        },
    }


def validate(df: DataFrame, table: str) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (valid, invalid) per the table's CHECK predicates.

    Spark-native replacement for the reference's DB-side CHECK constraints:
    callers keep the valid side and account for the invalid side, the same
    way the reference logs dropped rows (etl_pipeline_spark.py:1163-1172).
    """
    table_checks = checks().get(table, {})
    if not table_checks:
        return df, df.limit(0)
    pred = None
    for c in table_checks.values():
        pred = c if pred is None else (pred & c)
    # three-valued logic: a NULL-evaluating predicate (e.g. NULL rating
    # against BETWEEN) is excluded by BOTH filter(pred) and filter(~pred);
    # coalesce to FALSE so such rows land on the invalid side and the
    # drop accounting stays exact (valid + invalid == input)
    return df.filter(pred), df.filter(~F.coalesce(pred, F.lit(False)))


def check_report(df: DataFrame, table: str) -> DataFrame:
    """Per-rule CHECK-violation counts: one row per rule with
    ``(rule, violations, rows_scanned)``.

    ``validate`` answers "which rows pass ALL checks"; this answers the
    operational question the reference's DB-side CHECKs answer via error
    logs — WHICH constraint is being violated and how often — without
    aborting the load.  NULL-evaluating predicates count as violations
    (same three-valued-logic posture as ``validate``, so the two reports
    reconcile).

    Plan shape: ONE aggregation pass over the frame (all rules fused
    into a single map-side-combinable agg — no per-rule scans), then a
    constant-height ``stack`` to long form.  Scales as a single global
    aggregate regardless of rule count."""
    table_checks = checks().get(table, {})
    if not table_checks:
        raise ValueError(f"no CHECK rules declared for table {table!r}")
    wide = df.agg(
        F.count(F.lit(1)).alias("__rows__"),
        *[
            F.sum((~F.coalesce(c, F.lit(False))).cast("long")).alias(name)
            for name, c in table_checks.items()
        ],
    )
    pairs = ", ".join(f"'{n}', coalesce({n}, 0L)" for n in table_checks)
    return wide.selectExpr(
        f"stack({len(table_checks)}, {pairs}) AS (rule, violations)",
        "__rows__ AS rows_scanned",
    )
