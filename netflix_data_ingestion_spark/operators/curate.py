"""End-to-end corpus curation — the composition the individual operators
exist FOR (BASELINE.json north star; no reference analog — the reference
pipeline stops at star-schema loading).

A training-data curation run is a fixed ladder, each rung an operator
this package already proves in isolation:

    metadata gate  ->  quality gate   ->  near-dup cluster keep
    (lang column)      (textstats)        (graph.dedup_clusters)
        ->  per-source quota  ->  token counts  ->  chunk packing
            (sample.quota_sample)  (textstats.tokens) (sample.pack_chunks)

This module wires them into one lazy plan (plus the bounded iterative
CC step inside dedup_clusters).  Composing them is not free glue: each
stage's filter shrinks the frame the next stage shuffles, and the
composition keeps every intermediate partitioned — nothing funnels
through the driver at any stage, so the whole ladder inherits the
100 TB posture of its rungs.

Shuffle budget (in corpus passes): quality gate is narrow; dedup is the
MinHash band pipeline on the SURVIVORS only; quota + packing are two
keyed window shuffles on the sampled subset.  The expensive stages run
on monotonically smaller data — the order of the ladder IS the
optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators import graph, sample, textstats
from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    lang: str = "en",
    min_quality: float = 0.64,
    dedup_threshold: float = 0.8,
    cap: int = 15,
    budget: int = 512,
    ngram: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, source, quality_score, n_tokens, chunk_id, chunk_offset) —
    the curated, deduplicated, quota-capped corpus packed into
    per-source token-budget chunks.

    The quality threshold compares a bit-exact single-division score
    (textstats.quality_score), so the gate is deterministic across
    engines; chunk assignment is pure integer window math.

    ``ngram``/``num_hashes``/``bands`` plumb through to the MinHash-LSH
    candidate stage inside graph.dedup_clusters — the recall/cost knob
    per corpus.  More hashes sharpen the Jaccard estimate; more bands
    (smaller rows-per-band) raise candidate recall at the cost of more
    bucket-join pairs to verify.  100 TB defaults: keep num_hashes at
    16-24 and bands at num_hashes/4 so a band carries >=4 hashes —
    coarser bands (2-hash) at web scale generate candidate floods that
    dominate the verify shuffle; raise bands only for short-document
    corpora where shingle sets are small and collisions cheap.
    """
    # r13 (guide §2.4 — share the scan+tokenize subtree): the ladder used
    # to tokenize three times — the quality gate, the MinHash shingle
    # stages inside dedup_clusters, and the final token count.  Now ONE
    # token array is computed per lang-filtered doc, the gate reads it
    # (quality_score_expr — the exact operator expression, shared), and
    # the pinned base carries it so the MinHash banding, the
    # candidate-verify shingles AND n_tokens are all derived from the
    # checkpointed array with zero re-tokenization.  The token
    # definition is identical everywhere, so results are unchanged.
    # the filter+tokenize is the expensive narrow pass and the former
    # quality join's exchange is gone, so spread the (often one-split)
    # scan BEFORE tokenizing or the whole pass and the pinned base
    # serialize on one task
    flt = ensure_parallelism(docs.filter(F.col(lang_col) == lang)).select(
        F.col(id_col),
        F.col(source_col),
        F.col(text_col),
        textstats.tokens(F.col(text_col)).alias("__toks"),
    )
    base = (
        flt.withColumn(
            "quality_score",
            textstats.quality_score_expr(F.col(text_col), F.col("__toks")),
        )
        .filter(F.col("quality_score") >= min_quality)
        .select(id_col, source_col, "quality_score", "__toks")
    ).localCheckpoint(eager=True)
    clusters = graph.dedup_clusters(
        base,
        id_col,
        text_col,
        n=ngram,
        threshold=dedup_threshold,
        num_hashes=num_hashes,
        bands=bands,
        tokens_col="__toks",
    )
    keep = clusters.filter("keep").select(F.col("doc_id").alias(id_col))
    deduped = base.join(keep, id_col)
    sampled = sample.quota_sample(deduped, source_col, id_col, cap=cap)
    with_tok = sampled.withColumn(
        "n_tokens", F.size(F.col("__toks")).cast("long")
    )
    packed = sample.pack_chunks(
        with_tok, source_col, id_col, "n_tokens", budget
    )
    return packed.select(
        id_col,
        source_col,
        "quality_score",
        "n_tokens",
        "chunk_id",
        "chunk_offset",
    )
