"""Trailing-context assembly — model-input featurization.

The last step before a sequence model sees event data: for every event,
assemble the ordered trailing window of the last ``n`` tokens/events
per key into one context string ("what did this user just do").  The
batch twin of what a serving system keeps in a per-key ring buffer.

One keyed window with a BOUNDED rows frame — per-row state is O(n)
regardless of history length, the only shape that survives unbounded
histories (an unbounded collect_list would OOM the window buffer at
100 TB).  No Python, no explode: collect over the frame stays JVM-side
and the join into a string is ``concat_ws``.

Caller contract: the token column non-NULL within assembled rows
(collect_list skips NULLs, DuckDB's list() keeps them — the
trailing_ewma caveat).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trailing_context(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    token_col: str,
    n: int = 5,
    sep: str = " ",
) -> DataFrame:
    """Input + ``context``: the last ``n`` token values per key (frame
    order, current row last), joined by ``sep``."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn(
        "context",
        F.concat_ws(sep, F.collect_list(F.col(token_col)).over(w)),
    )


def pad_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_len: int = 16,
    pad: str = "<pad>",
) -> DataFrame:
    """(id, tokens, attention_mask, n_tokens) — fixed-length model
    input assembly: tokenize, TRUNCATE to ``max_len``, right-pad with
    ``pad``, and emit the 1/0 attention mask — the last hop before a
    training loader, where ragged documents become rectangular
    batches.  ``n_tokens`` is the pre-padding (post-truncation) length.

    Pure narrow map (token split + two array concats per row), no
    shuffle — at 100 TB this runs at scan speed and writes straight to
    `sources/writers.write_balanced` shards.
    """
    from netflix_data_ingestion_spark.operators.dedup import tokens

    tok = F.slice(tokens(F.col(text_col)), 1, max_len)
    n = F.size(tok)
    fill = F.lit(max_len) - n
    return df.select(
        F.col(id_col),
        F.concat(tok, F.array_repeat(F.lit(pad), fill)).alias("tokens"),
        F.concat(
            F.array_repeat(F.lit(1), n), F.array_repeat(F.lit(0), fill)
        ).alias("attention_mask"),
        n.cast("long").alias("n_tokens"),
    )
