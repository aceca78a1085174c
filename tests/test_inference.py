"""Batched model-inference plumbing: batch cap, determinism, range."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.inference import score_documents


def test_score_documents_batch_cap_and_determinism(spark):
    rows = [(i, f"document number {i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = score_documents(df, batch_rows=4).collect()
    assert len(got) == 300
    # the Arrow batch cap actually bit: with a 4-row cap, every task
    # holding more than 4 rows sees multiple batches (ensure_parallelism
    # spreads 300 rows over the default parallelism, ~10 per task)
    assert max(r["n_batches"] for r in got) >= 2
    assert all(0.0 <= r["score"] < 1.0 for r in got)
    # scores are a pure function of text: independent of partitioning
    # and batch size
    again = {
        r["doc_id"]: r["score"]
        for r in score_documents(df.repartition(7), batch_rows=16).collect()
    }
    assert all(again[r["doc_id"]] == r["score"] for r in got)
