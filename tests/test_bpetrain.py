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
