"""Physical-plan audit over every contract query.

Prints one line per registry query with the plan smells that matter at
100 TB, and a summary table:

  PY      Python evaluation nodes (BatchEvalPython / ArrowEvalPython /
          mapInPandas...) — every one should be a deliberate,
          documented Arrow batch stage, never a row-at-a-time UDF
  1PART   'Exchange SinglePartition' or a no-partition WindowExec —
          fine on model-sized frames (stats rows, distinct values),
          fatal on data-sized ones; listed so each can be eyeballed
  CARTES  CartesianProduct / BroadcastNestedLoopJoin — legitimate only
          for deliberate all-pairs audits and tiny-side topk
  COLLECT is not visible in plans — grep-audited separately in
          VERDICT.md (kmeans/ffill/keys are the sanctioned ones)

Usage: python tools/audit_plans.py [sf_dir]   (default sf0.001 — plan
shape, not wall time, is what's being audited)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(spark, sf_dir: str) -> dict[str, list[str]]:
    """Build every registry query's physical plan and return
    {query_name: [smell, ...]} for the plans with at least one smell.
    Importable so the test suite can gate on it (test_plan_quality.py)."""
    from netflix_data_ingestion_spark.plans.contract import REGISTRY

    flagged: dict[str, list[str]] = {}
    for name, (fn, _oracle) in REGISTRY.items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # surface, keep auditing
            flagged[name] = [f"ERROR {type(exc).__name__}"]
            continue
        smells = []
        py = sum(
            plan.count(t)
            for t in ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow")
        ) + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        if py:
            smells.append(f"PY x{py}")
        single = plan.count("Exchange SinglePartition")
        if single:
            smells.append(f"1PART x{single}")
        cartes = plan.count("CartesianProduct") + plan.count(
            "BroadcastNestedLoopJoin"
        )
        if cartes:
            smells.append(f"CARTES x{cartes}")
        if smells:
            flagged[name] = smells
    return flagged


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from netflix_data_ingestion_spark.plans.contract import REGISTRY
    from netflix_data_ingestion_spark.session import build_session

    spark = build_session(app_name="plan-audit")
    flagged = audit(spark, sf_dir)
    clean = len(REGISTRY) - len(flagged)
    print(f"\n{clean}/{len(REGISTRY)} contract plans smell-free")
    for name, smells in sorted(flagged.items()):
        note = SANCTIONED.get(name, "!! UNREVIEWED — justify or fix")
        print(f"  {name:32s} {', '.join(smells):22s} {note}")
    unreviewed = sorted(set(flagged) - set(SANCTIONED))
    if unreviewed:
        print(f"\nUNREVIEWED smells: {unreviewed}")
        return 1
    print("\nevery flagged plan is a reviewed, bounded exception")
    return 0


#: every flagged plan must carry a reviewed justification; a new smell
#: fails the audit until it is either fixed or sanctioned here
SANCTIONED: dict[str, str] = {
    "ann_ivf_topk": "bNLJ: query-rows x centroid table, both model-sized",
    "ann_ivf_topk_staged": (
        "same bNLJ as ann_ivf_topk (query-rows x centroid table, both "
        "model-sized); the centroids come from a pre-staged parquet "
        "model instead of in-plan training — the search path alone"
    ),
    "ann_ivf_recall": (
        "composes embedding_cosine_topk (bNLJ exact baseline) + "
        "ann_ivf_topk (sanctioned above); final 1-row metric crossJoin "
        "(dedup_lsh_recall shape)"
    ),
    "ann_pq_recall": (
        "composes embedding_cosine_topk + ann_pq_topk paths; final "
        "1-row metric crossJoin (dedup_lsh_recall shape)"
    ),
    "ann_lsh_recall": (
        "composes embedding_cosine_topk + ann_lsh_topk paths; final "
        "1-row metric crossJoin (dedup_lsh_recall shape)"
    ),
    "ann_multiprobe_recall": (
        "composes embedding_cosine_topk + ann_multiprobe_topk paths; "
        "final 1-row metric crossJoin (dedup_lsh_recall shape)"
    ),
    "calendar_dim": "1-task date-spine generator, 2.4k rows by design",
    # r12: keys._offsets_in_plan replaced the per-call driver collect
    # with an in-plan exclusive cumsum over the per-partition offset
    # frame — #partitions rows (<= shuffle partitions) through one
    # single-task window, model-sized by construction; the data itself
    # stays range-partitioned and parallel
    "customer_balance_quartiles": (
        "1PART = #partitions-row offset cumsum (keys._offsets_in_plan), "
        "model-sized, doc'd"
    ),
    "customer_rfm_segments": (
        "1PART x3 = one #partitions-row offset cumsum per ntile "
        "(keys._offsets_in_plan), model-sized, doc'd"
    ),
    "user_decile_lift": (
        "1PART = #partitions-row offset cumsum (keys._offsets_in_plan), "
        "model-sized, doc'd"
    ),
    "doc_pack_windows": (
        "1PART = #partitions-row offset cumsum (keys._offsets_in_plan), "
        "model-sized, doc'd"
    ),
    "doc_length_batches": (
        "1PART = #partitions-row offset cumsum (keys._offsets_in_plan), "
        "model-sized, doc'd"
    ),
    "customer_part_negatives": "1-row n_items broadcast crossJoin, doc'd",
    "doc_class_balance": "1-row target-size broadcast crossJoin, doc'd",
    "user_churn_labels": "1-row label-horizon broadcast crossJoin, doc'd",
    "corpus_vocab_growth": "cumsum over the curve-sized bucket frame, doc'd",
    "orders_lineitem_join_size": "final MIN over a depth-row frame, model-sized",
    "part_cooccurrence": "1-row n_baskets broadcast crossJoin, doc'd",
    "doc_model_scores": "Arrow-batched model-inference stage, doc'd",
    "doc_bm25_search": "1-row corpus-stats broadcast crossJoin, doc'd",
    "dedup_lsh_recall": "1-row metric counts crossJoined; audit slice bounded at 200 docs",
    "dedup_cosine_scale": "Arrow verify stage (doc'd); 1-row plan stats",
    "dedup_embedding_cosine": "AUDIT twin: driver block-matrix, doc'd",
    "dedup_semantic": "Arrow verify stage shared with cosine_scale",
    "doc_inverted_index": "1-row corpus-total broadcast (max_df cut)",
    "doc_tfidf_top_terms": "1-row n_docs broadcast, doc'd",
    "doc_source_mixture": (
        "1-row corpus-totals broadcast crossJoin onto the "
        "source-cardinality frame (bm25/tfidf corpus-stats shape)"
    ),
    "doc_mixture_realized": (
        "inherits doc_source_mixture's 1-row totals crossJoin inside "
        "the broadcast plan side; the corpus side is one narrow "
        "explode, no shuffle"
    ),
    "embedding_cosine_topk": "bNLJ: 5 query rows x corpus, exact baseline",
    "label_hard_negatives": "bNLJ: |labels| centroid rows x corpus (broadcast model side), linear in corpus",
    "events_pit_state": "1-row validity-cap bound broadcast, doc'd",
    "join_drop_accounting": "global 1-row audit aggregate",
    "lineitem_skew_report": "1-row total broadcast only; top-k rank now DISTRIBUTED (global_rank over counts)",
    "lineitem_feature_corr": "single 1-row moment aggregate, constant output",
    "price_quantity_ols": "single 1-row moment aggregate, constant output",
    "multimodal_frame_sample": "Arrow 1-to-many frame stub, doc'd",
    "multimodal_audio_stats": (
        "two narrow Arrow stages (WAV synthesize + real decode), no "
        "shuffle before the display orderBy; codec round-trip is the "
        "point of the query"
    ),
    "multimodal_gif_frames": (
        "two narrow Arrow stages (GIF synthesize + real decode with "
        "in-batch frame fan-out), no shuffle before the display "
        "orderBy; codec round-trip is the point of the query"
    ),
    "multimodal_audio_resample": (
        "three narrow Arrow stages (WAV synthesize + resample + "
        "decode), no shuffle before the display orderBy; triple codec "
        "round-trip is the point of the query"
    ),
    "multimodal_avi_frames": (
        "two narrow Arrow stages (AVI synthesize + real decode with "
        "in-batch frame fan-out), no shuffle before the display "
        "orderBy; codec round-trip is the point of the query"
    ),
    "multimodal_mp4_frames": (
        "two narrow Arrow stages (ISO BMFF synthesize + real sample-"
        "table demux/decode with in-batch frame fan-out), no shuffle "
        "before the display orderBy; container round-trip is the "
        "point of the query"
    ),
    "multimodal_jpeg_progressive": (
        "two narrow Arrow stages (progressive SOF2 synthesize + real "
        "multi-scan decode), no shuffle before the display orderBy; "
        "codec round-trip is the point of the query (gif/avi/mp4 shape)"
    ),
    "multimodal_jpeg_12bit": (
        "two narrow Arrow stages (12-bit SOF1 synthesize + real "
        "extended-sequential decode), no shuffle before the display "
        "orderBy; codec round-trip is the point of the query "
        "(jpeg_progressive shape)"
    ),
    "multimodal_jpeg_lossless": (
        "two narrow Arrow stages (SOF3 DPCM synthesize + real "
        "lossless decode, bit-exact), no shuffle before the display "
        "orderBy; codec round-trip is the point of the query "
        "(jpeg_progressive shape)"
    ),
    "multimodal_jpeg_prog12": (
        "two narrow Arrow stages (12-bit SOF2 synthesize + real "
        "multi-scan 12-bit decode), no shuffle before the display "
        "orderBy; codec round-trip is the point of the query "
        "(jpeg_progressive shape)"
    ),
    "order_price_equidepth": "1-row total broadcast; rank offsets now DISTRIBUTED (prefix_sum_ranged inside global_rank)",
    "orders_expectations": "1-row report aggregates (constant output)",
    "ratings_dead_letters": (
        "1-row report aggregates crossJoined (constant output, "
        "orders_expectations shape); the CSV render/scan legs are "
        "distributed"
    ),
    "calendar_check_report": (
        "single global agg exchange on the fused per-rule counts "
        "(map-side combined; constant 4-row output via stack)"
    ),
    "orders_profile": "single 1-row profile aggregate, constant output",
    "orders_zorder_key": "1-row min/max bounds broadcast, doc'd",
    "orphan_lineitems": "global 1-row audit aggregate",
    "running_event_total": (
        "cumsum over the DAILY-counts frame, which is CALENDAR-sized "
        "(1 row/day after the keyed groupBy — ~365 rows/yr, ~36.5k/century "
        "even at 100 TB), not data-sized; the keyed pre-aggregation is the "
        "distributed pass.  prefix_sum_ranged would trade a bounded "
        "model-sized window for a range-exchange + offset-collect constant "
        "— wrong trade on a frame this small (corpus_vocab_growth shape)"
    ),
    "table_counts": "8 x 1-row count aggregates unioned",
    "user_forget_audit": "4 x 1-row audit aggregates unioned (table_counts shape)",
    "orders_price_drift": "1-row cut/total/picks frames broadcast-crossJoined (bm25 shape); ref quantiles now DISTRIBUTED (exact_quantiles_ranged)",
    "order_price_auc": "final 1-row AUC combine (global agg shape); cumulative-negatives term now DISTRIBUTED (prefix_sum_ranged)",
    "lineitem_table_digest": "final 1-row combine of the digest aggregate (global agg shape)",
    "orders_price_standardized": "1-row train-moments frame broadcast-crossJoined (tfidf __n_docs shape)",
    "order_class_report": "single 1-row confusion aggregate, constant output (orders_profile shape)",
    "part_abc_classes": "1-row grand-total broadcast crossJoin; cumulative revenue now DISTRIBUTED (prefix_sum_ranged)",
    "weekly_active_users": "date-spine min/max 1-row frame",
    "doc_bpe_segmented": (
        "Arrow broadcast-model tokenizer apply (bpe_segment): one "
        "mapInPandas, merges-table-sized model, memoized per distinct "
        "pretoken — replaced the O(num_merges) fold-chain codegen"
    ),
    # (doc_bpe_encode carries the same Arrow bpe_segment stage, but its
    # eager localCheckpoint cuts the lineage, so the audited plan never
    # shows it — no sanction entry needed or allowed here)
    "doc_lm_perplexity": (
        "1-row LM stats (n_types/v_size) broadcast crossJoin (bm25 "
        "corpus-stats shape); succ/cont sides are vocabulary-sized "
        "broadcasts; the (doc, bigram) shuffle is the distributed pass"
    ),
    # (corpus_unigram_vocab runs its Arrow Viterbi E-step and its
    # seed-vocab-sized collects DRIVER-side while building the model;
    # the returned frame is the final local vocabulary, so the audited
    # plan is a clean LocalTableScan — no sanction entry needed or
    # allowed here, the doc_bpe_encode precedent)
    "doc_unigram_segmented": (
        "Arrow broadcast-model tokenizer apply (unigram_segment): one "
        "mapInPandas over one corpus pass, DP memoized per distinct "
        "word — the bpe_segment license"
    ),
    "doc_unigram_encode": (
        "same Arrow tokenizer-apply stage as doc_unigram_segmented "
        "(unigram_encode); the pruned-vocab training collects are "
        "driver-side and seed-vocab-sized"
    ),
}


if __name__ == "__main__":
    raise SystemExit(main())
