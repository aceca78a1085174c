from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.context import trailing_context
from netflix_data_ingestion_spark.operators.sample import (
    pps_systematic_sample,
)


def _docs(spark, parts=None):
    rows = [("s", i, 10) for i in range(50)] + [("s", 100, 10_000)]
    rows += [("t", 200 + i, 1) for i in range(30)]
    df = spark.createDataFrame(rows, ["src", "doc_id", "w"])
    return df.repartition(parts) if parts else df


def test_pps_bounds_and_heavy_row_multiplicity(spark):
    out = {
        r["doc_id"]: r["n_hits"]
        for r in pps_systematic_sample(
            _docs(spark), "src", "doc_id", "w", k=5
        ).where("src = 's'").collect()
    }
    # total=10500, step=2100; the 10k-weight doc spans >= 4 multiples
    assert out[100] >= 4
    # per-group total hits == floor(total/step) == 5
    assert sum(out.values()) == 5
    # selected row count can never exceed k
    assert len(out) <= 5


def test_pps_zero_weight_never_selected(spark):
    df = spark.createDataFrame(
        [("s", 1, 0), ("s", 2, 0), ("s", 3, 7)], ["src", "doc_id", "w"]
    )
    out = pps_systematic_sample(df, "src", "doc_id", "w", k=2).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_pps_partition_invariant(spark):
    a = sorted(
        (r["doc_id"], r["n_hits"])
        for r in pps_systematic_sample(
            _docs(spark, parts=1), "src", "doc_id", "w", k=7
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_hits"])
        for r in pps_systematic_sample(
            _docs(spark, parts=13), "src", "doc_id", "w", k=7
        ).collect()
    )
    assert a == b and a


def test_trailing_context_order_and_partial_head(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, "u", t(0), "view"),
            (2, "u", t(1), "click"),
            (3, "u", t(2), "purchase"),
            (4, "v", t(0), "view"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    out = {
        r["event_id"]: r["context"]
        for r in trailing_context(
            df, ["user_id"], ["ts", "event_id"], "event_type", n=2
        ).collect()
    }
    assert out == {
        1: "view",
        2: "view click",
        3: "click purchase",
        4: "view",
    }


def test_trailing_context_plan_is_one_exchange_no_python(spark):
    df = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1), "view")],
        ["event_id", "user_id", "ts", "event_type"],
    )
    plan = (
        trailing_context(df, ["user_id"], ["ts", "event_id"], "event_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_pad_tokens_truncate_pad_mask(spark):
    from netflix_data_ingestion_spark.operators.context import pad_tokens

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pad_tokens(
        df, "doc_id", "text", max_len=4, pad="<p>").collect()}
    assert got[1]["tokens"] == ["a", "b", "c", "<p>"]
    assert got[1]["attention_mask"] == [1, 1, 1, 0]
    assert got[1]["n_tokens"] == 3
    # empty doc: all padding, zero mask
    assert got[2]["tokens"] == ["<p>"] * 4 and got[2]["attention_mask"] == [0] * 4
    # long doc: truncated to max_len, full mask
    assert got[3]["tokens"] == ["w0", "w1", "w2", "w3"]
    assert got[3]["attention_mask"] == [1] * 4 and got[3]["n_tokens"] == 4


def test_kfold_stable_and_balanced(spark):
    from netflix_data_ingestion_spark.operators.split import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    got = {r["doc_id"]: r["fold"] for r in kfold_assign(df, "doc_id", k=5).collect()}
    assert set(got.values()) == {0, 1, 2, 3, 4}
    sizes = [sum(1 for f in got.values() if f == i) for i in range(5)]
    assert all(120 <= s <= 280 for s in sizes)  # md5-uniform, loose band
    # growth stability: assignments of existing ids never move
    grown = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    got2 = {r["doc_id"]: r["fold"] for r in kfold_assign(grown, "doc_id", k=5).collect()}
    assert all(got2[i] == got[i] for i in range(1000))


def test_quantize_int8_roundtrip_error_bound(spark):
    import random

    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.functions.vectors import quantize_int8

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(16)]) for i in range(50)]
    rows.append((99, [0.0] * 16))  # zero vector: NULL codes
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    s, codes = quantize_int8(F.col("embedding"))
    got = df.select("vec_id", s.alias("s"), codes.alias("c"),
                    "embedding").collect()
    for r in got:
        if r["vec_id"] == 99:
            assert r["c"] is None
            continue
        assert all(-127 <= c <= 127 for c in r["c"])
        # dequantization error bounded by half a quantization step
        step = r["s"] / 127.0
        for x, c in zip(r["embedding"], r["c"]):
            assert abs(c * step - x) <= step / 2 + 1e-9


def test_tokens_to_ids_vocab_and_oov(spark):
    from netflix_data_ingestion_spark.operators.context import (
        build_vocab,
        tokens_to_ids,
    )

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b rare a")],
        "doc_id long, text string",
    )
    vocab = {r["token"]: r["token_id"] for r in build_vocab(
        df, "text", vocab_size=3).collect()}
    # top-2 tokens only (ids 1..2): a (4x) then b (3x); c/rare are OOV
    assert vocab == {"a": 1, "b": 2}
    ids = {(r["doc_id"], r["pos"]): r["token_id"] for r in tokens_to_ids(
        df, "doc_id", "text",
        build_vocab(df, "text", vocab_size=3), max_len=4).collect()}
    # doc 1 truncated to 4 tokens: a a a b
    assert [ids[(1, p)] for p in range(4)] == [1, 1, 1, 2]
    # doc 2: b rare a -> 2, OOV 0, 1
    assert [ids[(2, p)] for p in range(3)] == [2, 0, 1]
