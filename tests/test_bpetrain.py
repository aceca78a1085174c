"""Distributed BPE merge training (operators/bpetrain.py)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.bpetrain import (
    EOW,
    bpe_segment,
    bpe_train,
)


def _corpus(spark, words: dict[str, int]):
    rows = []
    i = 0
    for w, n in words.items():
        for _ in range(n):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bpe_train_matches_reference_example(spark):
    """The Sennrich et al. worked example: corpus {low:5, lower:2,
    newest:6, widest:3} — the first learned merges must be
    (e,s) -> (es,t) -> (est,</w>) [t+EOW dominates via newest+widest],
    matching a single-node reference implementation."""
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(_corpus(spark, words), num_merges=4)

    # single-node oracle
    vocab = {tuple(list(w) + [EOW]): n for w, n in words.items()}
    want = []
    for _ in range(4):
        pc: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] = pc.get((x, y), 0) + n
        # deterministic tie-break: count desc, then (a, b) asc
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if top[1] < 2:
            break
        (a, b), _n = top
        want.append((a, b))
        nv = {}
        for syms, n in vocab.items():
            out, pend = [], None
            for s in syms:
                if pend == a and s == b:
                    out.append(a + b)
                    pend = None
                elif pend is None:
                    pend = s
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    assert merges == want
    assert merges[0] == ("e", "s") and merges[1] == ("es", "t")


def test_bpe_segment_applies_merges_in_order(spark):
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = bpe_train(df, num_merges=6)
    seg = bpe_segment(
        _corpus(spark, {"lowest": 1}), merges
    ).collect()[0]
    toks = seg["bpe_tokens"]
    # 'est</w>' must have fused (learned from newest/widest) and apply
    # to the unseen word 'lowest'
    assert "est" + EOW in toks or ("est" in toks)
    assert seg["n_bpe_tokens"] == len(toks)
    # reconstruction: concatenating tokens minus EOW markers gives the word
    assert "".join(toks).replace(EOW, "") == "lowest"


def test_bpe_train_is_partition_invariant(spark):
    df = _corpus(spark, {"aaab": 4, "abab": 3, "bbba": 2})
    m1 = bpe_train(df.repartition(1), num_merges=5)
    m2 = bpe_train(df.repartition(13), num_merges=5)
    assert m1 == m2


def test_bpe_train_min_count_stops_early(spark):
    df = _corpus(spark, {"xy": 1})
    assert bpe_train(df, num_merges=10, min_pair_count=2) == []
    # min_pair_count=1 (the oracle-parity contract setting) keeps
    # merging singleton pairs until no adjacent pairs remain
    all_merges = bpe_train(df, num_merges=10, min_pair_count=1)
    assert all_merges == [("x", "y"), ("xy", EOW)]


def test_bpe_local_and_distributed_paths_agree(spark):
    """The in-process merge loop (vocab under driver_vocab_cap) and the
    distributed round path (cap=0 forces it) must learn the identical
    table, counts included."""
    words = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3,
        "aaab": 4, "abab": 3, "bbba": 2, "zq": 1,
    }
    df = _corpus(spark, words)
    local = bpe_train(df, num_merges=12, min_pair_count=1, with_counts=True)
    dist = bpe_train(
        df,
        num_merges=12,
        min_pair_count=1,
        with_counts=True,
        driver_vocab_cap=0,
    )
    assert local == dist
    assert len(local) >= 8  # the corpus supports a real merge sequence


def test_bpe_train_job_count_does_not_scale_with_merges(spark):
    """num_merges=50 on an in-cap vocab must run exactly ONE Spark
    action (the corpus pass + vocab collect) — the merge loop is
    in-process, so scheduling cost is O(1) in num_merges."""
    df = _corpus(
        spark, {f"w{i}ab{i % 7}xy": i % 5 + 1 for i in range(200)}
    )
    # patch the concrete class (Spark 4: pyspark.sql.classic.DataFrame,
    # not the abstract pyspark.sql.DataFrame base)
    cls = type(df)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    cls.collect = counting
    try:
        merges = bpe_train(df, num_merges=50, min_pair_count=1)
    finally:
        cls.collect = orig
    assert calls["n"] == 1
    assert len(merges) >= 40  # the loop really ran ~50 rounds
