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


def build_vocab(
    df: DataFrame, text_col: str, vocab_size: int = 1024
) -> DataFrame:
    """(token, token_id) — the top-``vocab_size - 1`` corpus tokens by
    frequency (ties broken alphabetically), ids 1..V-1; id 0 is
    reserved for OOV/padding.  One combinable count shuffle + a
    vocab-sized window rank (model-sized frame)."""
    from pyspark.sql import Window as W

    from netflix_data_ingestion_spark.operators.dedup import tokens

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("__cnt"))
    )
    w = W.orderBy(F.col("__cnt").desc(), F.col("token").asc())
    return (
        counts.withColumn("token_id", F.row_number().over(w).cast("int"))
        .where(F.col("token_id") <= vocab_size - 1)
        .select("token", "token_id")
    )


def tokens_to_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    max_len: int = 16,
) -> DataFrame:
    """(id, pos, token_id) — the final text-to-tensor hop: tokenize,
    truncate to ``max_len``, map through the BROADCAST vocabulary
    (out-of-vocabulary -> 0, matching `build_vocab`'s reserved id),
    long format for loaders and oracles alike.  Composes the whole
    assembly line: build_vocab -> tokens_to_ids -> (pad_tokens /
    pack_windows) — documents leave as integer tensors.
    """
    from netflix_data_ingestion_spark.operators.dedup import tokens

    tok = F.slice(tokens(F.col(text_col)), 1, max_len)
    long = df.select(
        F.col(id_col), F.posexplode(tok).alias("pos", "token")
    )
    return (
        long.join(F.broadcast(vocab), "token", "left")
        .select(
            id_col,
            F.col("pos").cast("int").alias("pos"),
            F.coalesce("token_id", F.lit(0)).cast("int").alias("token_id"),
        )
    )


def length_bucket_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 64,
    batch_size: int = 8,
    salt: str = "v1",
) -> DataFrame:
    """(id, n_tokens, bucket, pad_to, batch_id, seq_in_batch) — the
    padding-efficient batching plan: documents group into fixed-width
    token-length buckets, each bucket's docs shuffle deterministically
    (md5 order — quota_sample's portable coin) and pack into
    ``batch_size``-row batches, so every batch pads to its bucket's
    ceiling (``pad_to``) and per-doc padding waste is bounded by
    ``bucket_width - 1`` tokens — the standard dynamic-padding batch
    sampler, as a reproducible plan.

    Scale shape: NO per-bucket window (a hot bucket would concentrate
    its sort in one task) — the in-bucket rank comes from
    ``keys.prefix_sum_ranged`` over the global (bucket, hash, id)
    order (range-partitioned distributed sort, O(#partitions) driver
    state) minus each bucket's broadcast base offset (one tiny
    groupBy).  NULL text counts as 0 tokens (bucket 0), matching the
    oracle.
    """
    from netflix_data_ingestion_spark.operators.dedup import tokens
    from netflix_data_ingestion_spark.operators.keys import prefix_sum_ranged
    from netflix_data_ingestion_spark.operators.util import (
        ensure_parallelism,
    )

    base = ensure_parallelism(df).select(
        F.col(id_col),
        F.coalesce(
            F.size(tokens(F.col(text_col))).cast("long"), F.lit(0)
        ).alias("n_tokens"),
    )
    sized = (
        base.withColumn(
            "bucket", F.expr(f"n_tokens DIV {int(bucket_width)}").cast("int")
        )
        .withColumn(
            "__h",
            F.md5(
                F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
            ),
        )
        .withColumn("__one", F.lit(1).cast("long"))
    )
    pos = prefix_sum_ranged(
        sized, ["bucket", "__h", id_col], "__one", "__pos"
    )
    bucket_base = pos.groupBy("bucket").agg(
        F.min("__pos").alias("__base")
    )
    return (
        pos.join(F.broadcast(bucket_base), "bucket")
        .withColumn("__rk", F.col("__pos") - F.col("__base"))
        .select(
            id_col,
            "n_tokens",
            "bucket",
            ((F.col("bucket") + 1) * bucket_width).cast("int").alias("pad_to"),
            # integer DIV, not floor(double /) — pack_chunks' precision
            # discipline
            F.expr(f"__rk DIV {int(batch_size)}").cast("int").alias(
                "batch_id"
            ),
            F.pmod("__rk", F.lit(batch_size)).cast("int").alias(
                "seq_in_batch"
            ),
        )
    )
