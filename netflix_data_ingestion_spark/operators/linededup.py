"""Corpus-level common-segment removal (line-level dedup).

The standard web-corpus cleaning step (RefinedWeb / CCNet style): split
every document into segments (lines for real web text), count how many
distinct documents each exact segment appears in, and strip segments
whose document frequency crosses a threshold — navigation bars, cookie
banners, boilerplate headers — while preserving the original order of
the surviving segments.

Beyond-reference operator (BASELINE.json north star); the reference
(`etl_pipeline_spark.py`) has no corpus-level text surgery at all — its
text handling stops at per-row parsing (reference
``etl_pipeline_spark.py:700-800``).

Scale shape (100 TB):
  * one shuffle on the segment value for the document-frequency count
    (map-side partial ``count_distinct`` keeps it combinable);
  * the resulting "common segments" table is tiny by construction
    (only segments repeated across >= min_docs documents survive the
    HAVING), so the removal join is a **broadcast anti-join** — no
    shuffle of the exploded corpus;
  * one shuffle on doc_id to reassemble survivors in order.
  The explode itself is narrow.  Nothing is ever collected to the
  driver.

Determinism: exact string equality end to end — no hashing, no floats —
so the DuckDB oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def segment_doc_frequency(
    df: DataFrame, id_col: str, text_col: str, delim: str = "\n"
) -> DataFrame:
    """(segment, doc_freq) — distinct-document frequency of every exact segment.

    ``delim`` is a literal delimiter (regex-escaped before the split).
    """
    segs = df.select(
        F.col(id_col),
        F.explode(_split_literal(text_col, delim)).alias("segment"),
    )
    return segs.groupBy("segment").agg(
        F.count_distinct(id_col).alias("doc_freq")
    )


def remove_common_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_docs: int = 10,
) -> DataFrame:
    """Strip segments appearing in >= min_docs distinct documents.

    Returns (id_col, clean_text, n_segments, n_removed) with the
    surviving segments re-joined by ``delim`` in their original order.
    Documents whose every segment is boilerplate come back with
    ``clean_text = ''`` (they are kept, not dropped — dropping is a
    separate policy decision for the caller).
    """
    df = ensure_parallelism(df)
    segs = df.select(
        F.col(id_col),
        F.posexplode(_split_literal(text_col, delim)).alias("pos", "segment"),
    )
    common = (
        segs.groupBy("segment")
        .agg(F.count_distinct(id_col).alias("doc_freq"))
        .where(F.col("doc_freq") >= F.lit(min_docs))
        .select("segment")
    )
    # `common` holds only segments repeated across >= min_docs docs — a
    # boilerplate dictionary, small at any corpus scale: broadcast it so
    # the exploded corpus is never shuffled for the removal.
    kept = segs.join(F.broadcast(common), "segment", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "segment"))),
                lambda s: s["segment"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_segments").cast("bigint").alias("n_segments"),
            (F.col("n_segments") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def _split_literal(text_col: str, delim: str):
    # F.split takes a regex; quote the delimiter so "." or "|" behave
    # as literals exactly like the oracle's literal string_split.
    import re

    return F.split(F.col(text_col), re.escape(delim))
