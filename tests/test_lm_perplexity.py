"""Per-document perplexity under the bigram LM (operators/lm.py)."""

from __future__ import annotations

import math

from netflix_data_ingestion_spark.operators.lm import doc_perplexity


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _oracle(texts):
    """Single-node absolute-discount bigram model, mirroring lm.py."""
    from collections import Counter, defaultdict

    def toks(t):
        import re

        return re.findall(r"[a-z0-9']+", t.lower())

    bg = Counter()
    for t in texts:
        ws = toks(t)
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
    ctx_total = defaultdict(int)
    succ = defaultdict(int)
    cont = defaultdict(int)
    for (a, b), c in bg.items():
        ctx_total[a] += c
        succ[a] += 1
        cont[b] += 1
    n_types = len(bg)
    v_size = len(cont)

    def p(a, b):
        def pcont_or_floor():
            if cont.get(b, 0) > 0:
                num = cont[b] * 1_000_000_000
                return (num / n_types) / 1e9
            return 1.0 / (v_size + 1.0)

        if a in ctx_total:
            disc = max(100 * bg.get((a, b), 0) - 75, 0)
            return disc / (ctx_total[a] * 100.0) + (
                75.0 * succ[a]
            ) / (ctx_total[a] * 100.0) * pcont_or_floor()
        return pcont_or_floor()

    out = {}
    for i, t in enumerate(texts):
        ws = toks(t)
        logs = [
            int(round(math.log(p(a, b)) * 1e6))
            for a, b in zip(ws, ws[1:])
        ]
        if logs:
            out[i] = (
                len(logs),
                sum(logs),
                round(math.exp(-(sum(logs) / 1e6) / len(logs)), 6),
            )
        else:
            out[i] = (0, None, None)
    return out


def test_perplexity_matches_single_node_oracle(spark):
    texts = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "a completely different sentence with rare words",
        "the the the the",
        "single",
        "",
    ]
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["sum_logprob_micro"],
            r["perplexity"],
        )
        for r in doc_perplexity(_docs(spark, texts)).collect()
    }
    assert got == _oracle(texts)


def test_repetitive_text_scores_lower_perplexity(spark):
    """CCNet's operating principle: under a self-trained LM, heavily
    repetitive text is more predictable than diverse text."""
    texts = [
        "spam spam spam spam spam spam spam spam",
        "quarterly revenue grew while churn declined across regions",
    ] * 3
    rows = {
        r["doc_id"]: r["perplexity"]
        for r in doc_perplexity(_docs(spark, texts)).collect()
    }
    assert rows[0] < rows[1]


def test_perplexity_partition_invariant(spark):
    texts = ["the cat sat on the mat", "the dog ran", "cats and dogs"] * 5
    df1 = _docs(spark, texts).repartition(1)
    df2 = _docs(spark, texts).repartition(17)
    r1 = {r["doc_id"]: r["sum_logprob_micro"] for r in doc_perplexity(df1).collect()}
    r2 = {r["doc_id"]: r["sum_logprob_micro"] for r in doc_perplexity(df2).collect()}
    assert r1 == r2


def test_reference_corpus_scoring(spark):
    """The CCNet shape: train the LM on a reference corpus, score a
    different target — unseen-context bigrams back off, never NULL."""
    from netflix_data_ingestion_spark.operators.textstats import (
        bigram_lm_counts,
    )

    ref = _docs(spark, ["the cat sat on the mat"] * 4)
    lm = bigram_lm_counts(ref, "doc_id", "text")
    target = _docs(spark, ["the cat sat", "entirely novel words here"])
    rows = {
        r["doc_id"]: r["perplexity"]
        for r in doc_perplexity(target, lm=lm).collect()
    }
    assert rows[0] is not None and rows[1] is not None
    assert rows[0] < rows[1]  # in-domain text is more predictable
