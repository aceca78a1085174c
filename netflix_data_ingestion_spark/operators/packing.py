"""Cross-document fixed-window packing — beyond-reference (the
GPT-style pretraining layout: the corpus is ONE concatenated token
stream cut into fixed-size windows, with documents flowing across
window boundaries; Brown et al. 2020 §2.3).

This differs from ``sample.pack_chunks`` (greedy per-doc chunking —
documents never split a chunk): here windows are EXACTLY ``window``
tokens, so a document can straddle windows and a window can hold many
document tails — zero padding waste, which at 100 TB of training
tokens is the difference between paying for real tokens and paying
for pads.

Spark-first shape: per-doc token counts are a narrow map; each doc's
absolute start offset in the stream comes from the DISTRIBUTED
exclusive prefix sum (operators/keys.prefix_sum_ranged — range
partition + local running sum + O(#partitions) driver offsets, no
global single-task window); the doc→window span table is then pure
integer arithmetic + one bounded explode (a doc spans at most
n_tok/window + 1 windows).  Everything is exact int64, so the layout
is bit-reproducible and SQL-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.dedup import tokens
from netflix_data_ingestion_spark.operators.keys import prefix_sum_ranged
from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def pack_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 512,
) -> DataFrame:
    """(window_id, doc, doc_start_tok, n_toks) — which slice of which
    document fills each fixed-``window``-token block of the
    concatenated (id-ordered) corpus stream.  A loader materializes
    window w by concatenating its rows' token slices
    ``[doc_start_tok, doc_start_tok + n_toks)`` in doc order; every
    window is exactly full except the corpus tail.  Token-free
    documents are skipped (they occupy no stream positions).
    """
    counted = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).cast("long").alias("__n_tok"),
        )
        .where(F.col("__n_tok") > 0)
    )
    placed = prefix_sum_ranged(counted, [id_col], "__n_tok", "__start")
    spans = placed.select(
        F.col(id_col),
        "__n_tok",
        "__start",
        (F.col("__start") + F.col("__n_tok")).alias("__end"),
        F.explode(
            F.sequence(
                F.expr(f"__start div {window}"),
                F.expr(f"(__start + __n_tok - 1) div {window}"),
            )
        ).alias("window_id"),
    )
    w_lo = F.col("window_id") * window
    w_hi = (F.col("window_id") + 1) * window
    take_from = F.greatest(F.col("__start"), w_lo)
    take_to = F.least(F.col("__end"), w_hi)
    return spans.select(
        "window_id",
        F.col(id_col),
        (take_from - F.col("__start")).cast("long").alias("doc_start_tok"),
        (take_to - take_from).cast("long").alias("n_toks"),
    )
