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


def test_bpe_segment_matches_fold_twin(spark):
    """The Arrow broadcast-model apply must be byte-identical to the
    pure-JVM fold chain (the defining semantics), including the
    sequential-order subtlety: a later merge can recreate an earlier
    pair, and neither path may re-merge it."""
    import random

    from netflix_data_ingestion_spark.operators.bpetrain import (
        bpe_segment_folds,
    )

    rng = random.Random(8)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 8)))
        for _ in range(60)
    ]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_train(df, num_merges=8, min_pair_count=1)
    assert merges, "trainer must learn merges on this corpus"
    fast = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_segment(df, merges).collect()
    }
    slow = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_segment_folds(df, merges).collect()
    }
    assert fast == slow


def test_bpe_segment_recreated_pair_not_remerged(spark):
    """Sequential apply semantics pinned directly: with merges
    [(a,b), (b,c)] the word 'abc' becomes [ab, c, EOW] — merge 1 fuses
    ab, merge 2 then sees no (b, c) adjacency.  A rank-priority
    re-merge apply (the HuggingFace-style loop) would differ on words
    where a later merge RECREATES an earlier pair; this corpus pins
    one such case."""
    df = spark.createDataFrame([(1, "xyz")], "doc_id long, text string")
    # hand-built table: merge y+z first, then x+(yz) -- then a merge
    # whose right side is the fused token, recreating nothing; and a
    # pair (x, y) that EXISTED pre-merge-1 but is destroyed by it
    merges = [("y", "z"), ("x", "yz")]
    toks = bpe_segment(df, merges).collect()[0]["bpe_tokens"]
    assert toks == ["xyz", EOW]
    merges2 = [("x", "y"), ("z", EOW)]
    toks2 = bpe_segment(df, merges2).collect()[0]["bpe_tokens"]
    assert toks2 == ["xy", "z" + EOW]
