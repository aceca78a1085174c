"""source_mixture_plan: the temperature-scaled data-mixture table."""

from __future__ import annotations

import math

from netflix_data_ingestion_spark.operators.sample import source_mixture_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_weights_and_epochs_exact(spark):
    # source a: 4 docs x 4 tokens = 16 tokens; b: 1 doc x 4 = 4 tokens
    rows = [(i, "a", "w x y z") for i in range(4)] + [(99, "b", "p q r s")]
    out = {
        r["source"]: r
        for r in source_mixture_plan(_docs(spark, rows)).collect()
    }
    assert out["a"]["tokens"] == 16 and out["b"]["tokens"] == 4
    # sqrt temperature: w(a)=4e6, w(b)=2e6 -> shares 2/3 and 1/3
    assert out["a"]["weight_ppm"] == 666_666
    assert out["b"]["weight_ppm"] == 333_333
    # budget = 20 tokens total.
    # a: ceil((2/3)*20/16) = ceil(0.833) = 1 epoch
    # b: ceil((1/3)*20/4)  = ceil(1.667) = 2 epochs -> small source upsamples
    assert out["a"]["n_epochs"] == 1
    assert out["b"]["n_epochs"] == 2


def test_mixture_small_source_upsamples_more_at_lower_share(spark):
    rows = [(i, "big", "a b c d e f g h") for i in range(64)] + [
        (900, "tiny", "a b")
    ]
    out = {
        r["source"]: r
        for r in source_mixture_plan(_docs(spark, rows)).collect()
    }
    big, tiny = out["big"], out["tiny"]
    assert big["tokens"] == 512 and tiny["tokens"] == 2
    # sqrt flattening: tiny's weight share far exceeds its token share
    assert tiny["weight_ppm"] / 1e6 > tiny["tokens"] / (512 + 2)
    assert tiny["n_epochs"] > big["n_epochs"]
    # epochs match the closed form
    w_big = round(math.sqrt(512) * 1e6)
    w_tiny = round(math.sqrt(2) * 1e6)
    tot, budget = w_big + w_tiny, 514
    assert big["n_epochs"] == math.ceil(w_big * budget / (tot * 512))
    assert tiny["n_epochs"] == min(10, math.ceil(w_tiny * budget / (tot * 2)))


def test_mixture_epoch_cap_and_zero_tokens(spark):
    rows = [(1, "huge", " ".join(["t"] * 1000)), (2, "dot", "x"), (3, "empty", "")]
    out = {
        r["source"]: r
        for r in source_mixture_plan(
            _docs(spark, rows), max_epochs=5
        ).collect()
    }
    assert out["dot"]["n_epochs"] == 5  # capped (raw ceil would exceed)
    assert out["empty"]["tokens"] == 0 and out["empty"]["n_epochs"] == 0


def test_apply_mixture_replicates_per_epoch(spark):
    from netflix_data_ingestion_spark.operators.sample import apply_mixture

    rows = [(i, "a", "x y z w") for i in range(4)] + [(99, "b", "p q")]
    docs = _docs(spark, rows)
    plan = source_mixture_plan(docs)
    out = apply_mixture(docs, plan).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    n_epochs = {
        r["source"]: r["n_epochs"] for r in plan.collect()
    }
    for i in range(4):
        assert sorted(by_doc[i]) == list(range(1, n_epochs["a"] + 1))
    assert sorted(by_doc[99]) == list(range(1, n_epochs["b"] + 1))


def test_apply_mixture_zero_epoch_source_drops(spark):
    from netflix_data_ingestion_spark.operators.sample import apply_mixture

    docs = _docs(spark, [(1, "a", "x y"), (2, "z", "")])
    plan = source_mixture_plan(docs)
    out = apply_mixture(docs, plan)
    assert [r["doc_id"] for r in out.collect() if r["source"] == "z"] == []


def test_mixture_explicit_budget(spark):
    rows = [(1, "a", "x y z w"), (2, "b", "x y z w")]
    out = {
        r["source"]: r["n_epochs"]
        for r in source_mixture_plan(
            _docs(spark, rows), budget_tokens=80
        ).collect()
    }
    # equal sources split an 80-token budget: 40 each over 4 tokens -> 10
    assert out == {"a": 10, "b": 10}


def test_length_bucket_batches_plan(spark):
    """Bucket membership, dense batch fill, and the padding bound;
    NULL text lands in bucket 0; deterministic across partitioning."""
    from collections import Counter

    from netflix_data_ingestion_spark.operators.context import (
        length_bucket_batches,
    )

    rows = [(i, " ".join(["tok"] * (i % 200))) for i in range(120)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = length_bucket_batches(df, batch_size=4).collect()
    assert len(out) == 121
    for r in out:
        assert r["bucket"] == r["n_tokens"] // 64
        assert r["pad_to"] == (r["bucket"] + 1) * 64
        assert 0 < r["pad_to"] - r["n_tokens"] <= 64  # padding bound
        assert 0 <= r["seq_in_batch"] < 4
    null_row = next(r for r in out if r["doc_id"] == 999)
    assert null_row["n_tokens"] == 0 and null_row["bucket"] == 0
    # batches fill densely: within a bucket, every batch except possibly
    # the last is full, and seq numbers are exactly 0..len-1
    per_batch = Counter((r["bucket"], r["batch_id"]) for r in out)
    per_bucket_batches: dict[int, list] = {}
    for (b, bid), n in per_batch.items():
        per_bucket_batches.setdefault(b, []).append((bid, n))
    for b, batches in per_bucket_batches.items():
        batches.sort()
        assert [bid for bid, _ in batches] == list(range(len(batches)))
        assert all(n == 4 for _, n in batches[:-1]), (b, batches)
    # deterministic under repartitioning
    again = {
        r["doc_id"]: (r["batch_id"], r["seq_in_batch"])
        for r in length_bucket_batches(
            df.repartition(7), batch_size=4
        ).collect()
    }
    assert again == {
        r["doc_id"]: (r["batch_id"], r["seq_in_batch"]) for r in out
    }
