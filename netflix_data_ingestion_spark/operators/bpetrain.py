"""Distributed BPE merge training (Sennrich, Haddow & Birch, ACL 2016).

The trainer the ``bpe_pretokenize`` segmentation feeds: learn the merge
table itself from the corpus.  The classic algorithm iterates over the
WORD-FREQUENCY table, not the corpus — one corpus pass builds
(pretoken, count), and every merge round then runs on that vocab-sized
frame: count adjacent symbol pairs weighted by word frequency
(combinable groupBy), pick the max pair (deterministic argmax:
highest count, then lexicographic — a 1-row collect, the same
model-sized parameter-server license as kmeans' centroid update), and
apply the merge to every word's symbol array with a greedy
left-to-right fold (one narrow pass, no Python).

Scale shape: corpus is touched ONCE; each of the ``num_merges`` rounds
costs one explode+groupBy over |vocab| rows (bounded by distinct
pretokens, not corpus size) plus a 1-row collect.  State between
rounds is the symbol-array column, eager-checkpointed per round
(lineage would otherwise stack num_merges folds deep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.textstats import (
    bpe_pretokenize,
)
from netflix_data_ingestion_spark.operators.util import ensure_parallelism

#: end-of-word marker (the paper's </w>): distinguishes "est" inside
#: "estimate" from the suffix in "newest"
EOW = "</w>"


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(symbols array<string>, cnt) — distinct pretokens with corpus
    frequencies, split to characters with the end-of-word marker
    appended (lowercased: BPE case-folding is a modeling choice; this
    trainer's contract is the lowercase variant)."""
    words = (
        ensure_parallelism(df)
        .select(F.explode(bpe_pretokenize(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return words.select(
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(EOW))
        ).alias("symbols"),
        "cnt",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, total) — adjacent-symbol pair counts weighted by word
    frequency, one combinable shuffle over the vocab frame."""
    pairs = F.when(
        F.size("symbols") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at("symbols", i).alias("a"),
                F.element_at("symbols", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("total"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    into a||b inside every symbol array — one F.aggregate fold, JVM-side."""
    la, lb = F.lit(a), F.lit(b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        merged = acc["pend"].eqNullSafe(la) & (s == lb)
        return F.struct(
            F.when(
                merged, F.concat(acc["out"], F.array(F.concat(la, lb)))
            )
            .when(
                acc["pend"].isNull(), acc["out"]
            )
            .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
            .alias("out"),
            F.when(merged, F.lit(None).cast("string"))
            .otherwise(s)
            .alias("pend"),
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return vocab.select(
        F.aggregate("symbols", init, step, finish).alias("symbols"), "cnt"
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
    with_counts: bool = False,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """The learned merge table: ``num_merges`` (a, b) pairs in training
    order (``with_counts=True`` appends each chosen pair's exact corpus
    count: (a, b, total)).  Stops early when no pair reaches
    ``min_pair_count`` (merging singleton pairs memorizes the corpus).
    Deterministic: ties break lexicographically on (a, b), and every
    count is exact integer arithmetic — the same corpus always learns
    the same table, on any partitioning.
    """
    vocab = _word_table(df, text_col).localCheckpoint(eager=True)
    merges: list = []
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append(
            (a, b, int(top[0]["total"])) if with_counts else (a, b)
        )
        vocab = _apply_merge(vocab, a, b).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — segment each
    document with a learned merge table: pretokenize, split pretokens
    to characters + EOW, then apply every merge in training order
    (the standard BPE apply; each merge is one narrow fold, so the
    whole segmentation is a chain of JVM expressions over one pass).
    """
    syms = F.transform(
        bpe_pretokenize(F.lower(F.col(text_col))),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
    )
    out = ensure_parallelism(df).select(F.col(id_col), syms.alias("__ws"))
    for a, b in merges:

        def make(a=a, b=b):
            la, lb = F.lit(a), F.lit(b)
            init = F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(None).cast("string").alias("pend"),
            )

            def step(acc, s):
                merged = acc["pend"].eqNullSafe(la) & (s == lb)
                return F.struct(
                    F.when(
                        merged,
                        F.concat(acc["out"], F.array(F.concat(la, lb))),
                    )
                    .when(acc["pend"].isNull(), acc["out"])
                    .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
                    .alias("out"),
                    F.when(merged, F.lit(None).cast("string"))
                    .otherwise(s)
                    .alias("pend"),
                )

            def finish(acc):
                return F.when(
                    acc["pend"].isNull(), acc["out"]
                ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

            return lambda w: F.aggregate(w, init, step, finish)

        fold = make()
        out = out.select(
            id_col,
            F.transform("__ws", fold).alias("__ws"),
        )
    return out.select(
        id_col,
        F.flatten("__ws").alias("bpe_tokens"),
        F.size(F.flatten("__ws")).cast("long").alias("n_bpe_tokens"),
    )
