"""Movie-title parser — comma-limited CSV (SURVEY.md §2.1 S3).

The reference input ``movie_titles.csv`` is NOT RFC-4180: lines are
``movie_id,release_year,title`` where the title may itself contain commas
and is never quoted.  A CSV reader with quote handling would corrupt such
titles, so the parse splits on the first two commas only
(reference: etl_pipeline_spark.py:884-909).

Semantics preserved exactly (SURVEY.md §1.4):
- 3-limited split; title keeps embedded commas (:895-898)
- if a line has only two fields, title falls back to field 2 (:900-905)
- title truncated to 500 chars (:906)
- rows with non-integer movie_id dropped (:908)
- release_year cast failure tolerated → NULL (:899)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_movie_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """``value:string`` lines → (movie_id int, release_year smallint?, title)."""
    parts = F.split(F.col(value_col), ",", 3)
    title_with_extra = F.get(parts, 2)
    release_year_str = F.get(parts, 1)
    return (
        lines.withColumn("movie_id", F.get(parts, 0).try_cast("int"))
        .withColumn("release_year", release_year_str.try_cast("smallint"))
        .withColumn(
            "title",
            F.substring(
                F.when(title_with_extra.isNull(), release_year_str).otherwise(
                    title_with_extra
                ),
                1,
                500,
            ),
        )
        .filter(F.col("movie_id").isNotNull())
        .select("movie_id", "title", "release_year")
    )
