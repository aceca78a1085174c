"""Calendar/date derivation functions.

The reference derives these columns in its date-dimension builder
(etl_pipeline_spark.py:757-811).  Semantics preserved exactly per
SURVEY.md §1.4:

- ``date_key``      int YYYYMMDD (etl_pipeline_spark.py:776-779)
- ``day_of_week``   0=Monday .. 6=Sunday — the DOCUMENTED contract
  (schema.sql:47).  The reference code computes ``dayofweek(d)-2`` which
  maps Sunday to -1, violating its own CHECK constraint; we implement the
  documented contract ``(dayofweek(d)+5) % 7`` instead (SURVEY.md §4.4.3).
- ``is_weekend``    Saturday or Sunday (etl_pipeline_spark.py:788-795)
- ``month_name``    full English month name, date_format 'MMMM' (:787)

All derivations are built-in column expressions — they stay inside
whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_key(d: Column) -> Column:
    """YYYYMMDD integer surrogate key (etl_pipeline_spark.py:776-779)."""
    return F.date_format(d, "yyyyMMdd").cast("int")


def day_of_week_monday0(d: Column) -> Column:
    """0=Monday .. 6=Sunday (documented contract, schema.sql:47).

    Spark's ``dayofweek`` is 1=Sunday..7=Saturday.
    """
    return ((F.dayofweek(d) + 5) % 7).cast("smallint")


def is_weekend(d: Column) -> Column:
    """True on Saturday/Sunday (etl_pipeline_spark.py:788-795)."""
    return F.dayofweek(d).isin(1, 7)


def month_name(d: Column) -> Column:
    """Full English month name ('January'..) — date_format 'MMMM' (:787)."""
    return F.date_format(d, "MMMM")


def with_date_dim_columns(df: DataFrame, date_col: str = "date_actual") -> DataFrame:
    """Attach the full dim_date derivation set to a date column.

    Column set and casts mirror etl_pipeline_spark.py:775-809 /
    schema.sql:28-37 (ShortType for calendar parts).
    """
    d = F.col(date_col)
    return (
        df.withColumn("date_key", date_key(d))
        .withColumn("year", F.year(d).cast("smallint"))
        .withColumn("month", F.month(d).cast("smallint"))
        .withColumn("day", F.dayofmonth(d).cast("smallint"))
        .withColumn("quarter", F.quarter(d).cast("smallint"))
        .withColumn("day_of_week", day_of_week_monday0(d))
        .withColumn("month_name", month_name(d))
        .withColumn("is_weekend", is_weekend(d))
    )
