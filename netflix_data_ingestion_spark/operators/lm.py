"""Per-document perplexity scoring under the corpus bigram LM.

The CCNet recipe (Wenzek et al., LREC 2020): score every document's
perplexity under a language model and filter/bucket by it — documents
whose perplexity is extreme (boilerplate at the low end, noise at the
high end) are dropped or down-weighted before training.  Here the LM is
the corpus's own bigram count table (textstats.bigram_lm_counts — the
Kneser-Ney ingredients) with absolute discounting (Chen & Goodman 1998):

    P(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 .)
             + (D * |succ(w1)| / c(w1 .)) * P_cont(w2)
    P_cont(w2) = cont(w2) / |distinct bigram types|

with D = 0.75.  Unseen contexts back off to P_cont; unseen
continuations to the uniform floor 1 / (V + 1).

Cross-engine determinism: every probability is an exact integer
rational scaled to 1e-9 units before the single ln(); the per-bigram
log is rounded to 6 decimals and summed as exact integer micro-nats, so
partition order can never flip a score (the group_centroids
discipline).  Perplexity = exp(-mean log-prob), one float at the end.

Scale shape: the model is a |bigram types| count table (data-derived
but vocabulary-sized); scoring joins each document's bigrams against
it — one combinable (w1, w2) shuffle of (doc, bigram) pairs, one
doc-keyed combine.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.dedup import bigram_pairs
from netflix_data_ingestion_spark.operators.textstats import (
    bigram_lm_counts,
    tokens,
)
from netflix_data_ingestion_spark.operators.util import ensure_parallelism

#: absolute discount, in 1e-2 units (0.75) — integer so the rational
#: probability arithmetic stays exact
_D_CENTI = 75


def doc_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, sum_logprob_micro, perplexity) — per-document
    perplexity under the absolute-discount bigram model.  ``lm``
    defaults to the count table trained on ``df`` itself (the CCNet
    shape trains on a reference corpus and scores the target — pass
    that table in); documents with < 2 tokens carry NULL perplexity
    (no bigram evidence).
    """
    if lm is None:
        lm = bigram_lm_counts(df, id_col, text_col)
    lm = lm.localCheckpoint(eager=True)  # referenced by stats + the score join

    # model-level constants: distinct bigram types, |succ(w1)| table,
    # vocabulary size (distinct w2)
    succ = lm.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("n_succ"),
        F.max("ctx_total").alias("ctx_total"),
    )
    stats = lm.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.count_distinct("w2").cast("long").alias("v_size"),
    )

    pairs = bigram_pairs(tokens(F.col(text_col)))
    doc_bg = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(pairs).alias("bg"))
        .select(
            id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
    )
    cont = lm.groupBy("w2").agg(F.max("cont_w2").alias("cont_w2"))
    scored = (
        doc_bg.join(lm.select("w1", "w2", "cnt"), ["w1", "w2"], "left")
        .join(F.broadcast(succ), "w1", "left")
        .join(F.broadcast(cont), "w2", "left")
        .crossJoin(F.broadcast(stats))
    )
    # exact rational in 1e-9 units:
    #   seen ctx: (100*max(cnt-0.75,0)*n_types*... ) — assemble as
    #   num/den with integer terms, ONE division into double at 1e-9
    d = F.lit(_D_CENTI)
    cnt = F.coalesce(F.col("cnt"), F.lit(0))
    ctx = F.col("ctx_total")
    # discounted = max(100*cnt - 75, 0) in centi-units
    disc = F.greatest(cnt * 100 - d, F.lit(0))
    # P_cont in 1e-9: cont_w2 * 1e9 / n_types (exact integer div is too
    # lossy at 1e9 scale? cont*1e9 fits long for cont <= 9.2e9 types)
    pcont_n = F.coalesce(F.col("cont_w2"), F.lit(0)) * F.lit(1_000_000_000)
    pcont = (pcont_n / F.col("n_types")).cast("double") / 1e9
    floor = F.lit(1.0) / (F.col("v_size").cast("double") + 1.0)
    pcont_or_floor = F.when(
        F.coalesce(F.col("cont_w2"), F.lit(0)) > 0, pcont
    ).otherwise(floor)
    p_seen_ctx = (
        disc.cast("double") / (ctx.cast("double") * 100.0)
        + (d.cast("double") * F.col("n_succ").cast("double"))
        / (ctx.cast("double") * 100.0)
        * pcont_or_floor
    )
    p = F.when(ctx.isNotNull(), p_seen_ctx).otherwise(pcont_or_floor)
    # per-bigram log in exact integer micro-nats (round-6 kills any
    # last-ulp ln() divergence across engines)
    log_micro = F.round(F.log(p) * 1e6).cast("long")
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(log_micro).cast("long").alias("sum_logprob_micro"),
    )
    # docs with no bigrams (short/empty) re-enter with NULLs
    all_ids = df.select(id_col).distinct()
    out = all_ids.join(per_doc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        "sum_logprob_micro",
        F.when(
            F.col("n_bigrams") > 0,
            F.round(
                F.exp(
                    -(F.col("sum_logprob_micro").cast("double") / 1e6)
                    / F.col("n_bigrams").cast("double")
                ),
                6,
            ),
        ).alias("perplexity"),
    )
