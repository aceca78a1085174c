"""Ratings block parser — stateful header/detail text format (SURVEY.md §2.1 S2).

Input format (documented at reference etl_pipeline_spark.py:1082-1090):

    1:                      <- header: "{movie_id}:"
    1488844,3,2005-09-06    <- detail: "{customer_id},{rating},{date}"
    822109,5,2005-05-13
    2:
    ...

Each detail line belongs to the NEAREST PRECEDING header in file order.
The reference implements this with a forward-fill window partitioned into
10k-row buckets (etl_pipeline_spark.py:1097-1122), which silently drops
the tail of any block spanning a bucket boundary (SURVEY.md §4.4).  This
implementation uses the exact global forward-fill operator instead
(operators/ffill.forward_fill_global) — correct across partition/bucket
boundaries and fully parallel.

Ordering: ``monotonically_increasing_id()`` on a text-file scan is
globally monotonic in (partition, offset) order, and file-split partitions
enumerate in file/offset order — the property forward_fill_global needs.

Parse semantics preserved from the reference (SURVEY.md §1.4):
- header lines end with ``:``; movie id extracted by ``^(\\d+):`` (:978,
  :1106-1111)
- detail split: customer_id int, rating smallint, date string (:1128-1133)
- rows with null customer_id or rating dropped (:1136-1137)
- detail rows with no attributable header (file-leading orphans) dropped
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.ffill import forward_fill_global

_ORD = "__line_ord"


def parse_rating_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """``value:string`` lines → (movie_id, customer_id, rating, date_str).

    ``lines`` must come straight from a file scan (ordering requirement
    above).  Blocks may not span input files — true for the reference
    format, where every file begins with a header line.
    """
    v = F.col(value_col)
    tagged = (
        lines.withColumn(_ORD, F.monotonically_increasing_id())
        .withColumn("__is_header", v.endswith(":"))
        .withColumn(
            "__header_movie_id",
            F.when(
                F.col("__is_header"),
                F.regexp_extract(v, r"^(\d+):", 1).try_cast("int"),
            ),
        )
    )

    # deterministic_source: `lines` comes straight from a file scan (the
    # documented contract above), so both ffill traversals see identical
    # splits — no block-manager pin of the full-width raw lines needed.
    attributed = forward_fill_global(
        tagged,
        order_col=_ORD,
        value_col="__header_movie_id",
        out_col="movie_id",
        deterministic_source=True,
    )

    parts = F.split(v, ",")
    details = (
        attributed.filter(~F.col("__is_header"))
        .withColumn("customer_id", F.get(parts, 0).try_cast("int"))
        .withColumn("rating", F.get(parts, 1).try_cast("smallint"))
        .withColumn("date_str", F.get(parts, 2))
        .filter(
            F.col("customer_id").isNotNull()
            & F.col("rating").isNotNull()
            & F.col("movie_id").isNotNull()
        )
        .select("movie_id", "customer_id", "rating", "date_str")
    )
    return details


def read_and_parse(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Text scan + block parse in one call."""
    return parse_rating_lines(spark.read.text(paths))
