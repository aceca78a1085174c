"""Deterministic data augmentation for text corpora.

The augmentation family every contrastive / denoising training recipe
needs (char-level noise, BERT-style token masking), made
PARTITION-INVARIANT and engine-portable: every random choice is an
md5-derived decision keyed on (salt, id, position) — the same
convention as operators/sample.py — so an augmented corpus is exactly
reproducible on any partitioning, any engine, any retry.  That matters
operationally: a resumed 100 TB augmentation job must not produce a
different corpus for the shards it re-runs.

Plan shape: both operators are ONE narrow map (per-position JVM
expressions — sequence/transform/filter folds and md5), zero shuffle,
zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.textstats import (
    bpe_pretokenize,
)
from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def _hash_mod(salt: str, id_col: Column, pos: Column, mod: int) -> Column:
    """First 8 md5 hex digits of 'salt|id|pos' as int64, mod `mod` —
    the portable per-position coin (DuckDB twin:
    ('0x' || substr(md5(...), 1, 8))::BIGINT % mod)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(salt),
                        id_col.cast("string"),
                        pos.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def char_dropout(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_den: int = 13,
    salt: str = "aug1",
    out_col: str = "aug_text",
) -> DataFrame:
    """Input + ``out_col``: the text with ~1/``drop_den`` of its
    characters deterministically removed (position p drops iff the
    md5 coin on (salt, id, p) lands on 0 mod drop_den).  1-based
    positions, char-semantics substring — identical in Spark and
    DuckDB for the ASCII corpus contract."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.length(txt)),
            lambda p: F.when(
                _hash_mod(salt, F.col(id_col), p, drop_den) != 0,
                txt.substr(p, F.lit(1)),
            ),
        ),
        lambda c: c.isNotNull(),
    )
    return ensure_parallelism(df).withColumn(
        out_col, F.array_join(kept, "")
    )


def token_mask(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_den: int = 8,
    salt: str = "mask1",
    mask_token: str = "<mask>",
    out_col: str = "masked_tokens",
) -> DataFrame:
    """Input + ``out_col`` (array<string>) + ``n_masked``: BERT-style
    deterministic masking over the BPE pretokenization — token i is
    replaced by ``mask_token`` iff the md5 coin on (salt, id, i) lands
    on 0 mod mask_den (~12.5% at the default).  Masking is keyed on
    the token POSITION, not content, so identical texts under
    different ids mask differently — the property MLM batching wants."""
    toks = bpe_pretokenize(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    masked = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, p: F.when(
            t.isNotNull()
            & (_hash_mod(salt, F.col(id_col), p, mask_den) == 0),
            F.lit(mask_token),
        ).otherwise(t),
    )
    # zip_with pads the shorter side with NULL tokens when size==0;
    # filter them so empty docs yield empty arrays
    masked = F.filter(masked, lambda t: t.isNotNull())
    out = ensure_parallelism(df).withColumn(out_col, masked)
    return out.withColumn(
        "n_masked",
        F.size(
            F.filter(F.col(out_col), lambda t: t == F.lit(mask_token))
        ).cast("long"),
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_den: int = 2,
    salt: str = "fim-v1",
    pre_tok: str = "<PRE>",
    suf_tok: str = "<SUF>",
    mid_tok: str = "<MID>",
) -> DataFrame:
    """(id, is_fim, out_text) — the fill-in-the-middle transform
    (Bavarian et al. 2022, "Efficient Training of Language Models to
    Fill in the Middle"): a deterministic 1/``rate_den`` fraction of
    documents is rearranged PSM-style — ``<PRE>prefix<SUF>suffix<MID>
    middle`` — so an autoregressive model learns infilling from plain
    left-to-right loss; the rest pass through unchanged (the standard
    ~50% FIM rate at rate_den=2).

    Everything is the md5 coin discipline (char_dropout's portability
    contract): the gate is hash(salt|gate|id) % rate_den == 0 and the
    two cut points are independent hashes mod len+1 (so empty
    prefix/middle/suffix are all reachable, including cuts at the very
    end), making the output a pure function of (id, text) — identical
    on any engine, partitioning, or retry.  Docs shorter than 2 chars
    (or NULL) never transform.  Pure narrow projection: substrings +
    concat, whole-stage codegen, no shuffle."""
    text = F.col(text_col)
    n = F.length(text)

    def coin(tag: str, mod: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(f"{salt}|{tag}"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, mod)

    gate = coin("gate", F.lit(int(rate_den))) == 0
    # cut points in 1..n+1: substring positions, both ends inclusive
    a = (coin("a", (n + 1).cast("long")) + 1).cast("int")
    b = (coin("b", (n + 1).cast("long")) + 1).cast("int")
    lo, hi = F.least(a, b), F.greatest(a, b)
    fim = F.concat(
        F.lit(pre_tok),
        F.substring(text, F.lit(1), lo - 1),
        F.lit(suf_tok),
        F.substring(text, hi, n - hi + 1),
        F.lit(mid_tok),
        F.substring(text, lo, hi - lo),
    )
    is_fim = text.isNotNull() & (n >= 2) & gate
    return ensure_parallelism(df).select(
        F.col(id_col),
        is_fim.alias("is_fim"),
        F.when(is_fim, fim).otherwise(text).alias("out_text"),
    )


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_pct: int = 15,
    salt: str = "t5-v1",
) -> DataFrame:
    """(id, n_spans, inputs, targets) — T5-style span corruption
    (Raffel et al. 2020): each word token is masked by an independent
    md5 coin at ``mask_pct``%; CONSECUTIVE masked tokens collapse into
    one sentinel, inputs replace each span with ``<extra_id_k>`` and
    targets spell the masked spans out as ``<extra_id_k> tok tok ...``
    — the denoising pair a seq2seq pretraining run consumes.  With
    fim_transform this completes the objective family: FIM for
    autoregressive infilling, span corruption for encoder-decoder
    denoising.

    Spark-first shape: the whole span walk is ONE ``F.aggregate`` fold
    over the token array inside whole-stage codegen — per-document
    sequential state (previous-token-masked, span counter) without
    exploding the token table, so there is NO shuffle and no Python
    anywhere (the oracle twin uses ordinary window SQL instead; it
    only has to be correct, not fast).  Coins hash (salt, id, token
    index), so the output is a pure function of (id, text) — identical
    on any engine, partitioning, or retry.  NULL text passes through
    as NULL rows; token-free docs yield empty strings and 0 spans.
    """
    from netflix_data_ingestion_spark.operators.dedup import tokens

    text = F.col(text_col)
    toks = tokens(text)
    indexed = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )

    def masked(i: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(salt),
                        F.col(id_col).cast("string"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(100)) < mask_pct

    def sentinel(k: Column) -> Column:
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    init = F.struct(
        F.lit("").alias("inp"),
        F.lit("").alias("tgt"),
        F.lit(False).alias("prev"),
        F.lit(0).alias("k"),
    )

    def step(acc: Column, x: Column) -> Column:
        m = masked(x["i"])
        return (
            F.when(
                m & acc["prev"],
                F.struct(
                    acc["inp"].alias("inp"),
                    F.concat(acc["tgt"], F.lit(" "), x["t"]).alias("tgt"),
                    F.lit(True).alias("prev"),
                    acc["k"].alias("k"),
                ),
            )
            .when(
                m,
                F.struct(
                    F.concat(
                        acc["inp"], F.lit(" "), sentinel(acc["k"])
                    ).alias("inp"),
                    F.concat(
                        acc["tgt"],
                        F.lit(" "),
                        sentinel(acc["k"]),
                        F.lit(" "),
                        x["t"],
                    ).alias("tgt"),
                    F.lit(True).alias("prev"),
                    (acc["k"] + 1).alias("k"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["inp"], F.lit(" "), x["t"]).alias("inp"),
                    acc["tgt"].alias("tgt"),
                    F.lit(False).alias("prev"),
                    acc["k"].alias("k"),
                )
            )
        )

    folded = F.aggregate(indexed, init, step)
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.when(text.isNotNull(), folded["k"].cast("int")).alias("n_spans"),
        F.when(text.isNotNull(), F.ltrim(folded["inp"])).alias("inputs"),
        F.when(text.isNotNull(), F.ltrim(folded["tgt"])).alias("targets"),
    )
