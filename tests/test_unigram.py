"""Unigram-LM tokenizer (operators/unigram.py): the Viterbi DP against
a brute-force path enumeration (the oracle's exact semantics),
seed-coverage reachability, partition invariance, and the end-to-end
train/segment contracts on a hand-checked corpus."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from netflix_data_ingestion_spark.operators.unigram import (
    MAX_PIECE_LEN,
    mnat_scores,
    seed_vocab,
    unigram_encode,
    unigram_seed_scores,
    unigram_segment,
    unigram_train,
    viterbi_segment,
    word_counts,
)


def _enumerate_best(
    w: str, score: dict[str, int], max_piece_len: int
) -> tuple[list[str], int] | None:
    """Brute force: every segmentation path, argmax by the oracle's
    (score, boundary-mask) lexicographic key."""
    best = None

    def rec(pos: int, total: int, mask: int, pieces: list[str]):
        nonlocal best
        if pos == len(w):
            key = (total, mask)
            if best is None or key > best[0]:
                best = (key, list(pieces))
            return
        for ln in range(1, min(max_piece_len, len(w) - pos) + 1):
            p = w[pos : pos + ln]
            s = score.get(p)
            if s is None:
                continue
            rec(
                pos + ln,
                total + s,
                mask | (1 << pos) if pos else mask,
                pieces + [p],
            )

    rec(0, 0, 0, [])
    if best is None:
        return None
    return best[1], best[0][0]


@settings(max_examples=300, deadline=None)
@given(
    w=st.text(alphabet="abc", min_size=1, max_size=10),
    multis=st.lists(
        st.text(alphabet="abc", min_size=2, max_size=4), max_size=8
    ),
    scores=st.data(),
)
def test_viterbi_matches_enumeration(w, multis, scores):
    """The linear-time DP and the exponential enumeration agree on
    pieces AND total score for every word/vocab — including score ties,
    where the (score, boundary-mask) key decides."""
    vocab = sorted(set("abc") | set(multis))
    # small score range forces frequent ties, stressing the mask order
    score = {
        p: scores.draw(st.integers(min_value=-3, max_value=0), label=p)
        for p in vocab
    }
    got = viterbi_segment(w, score, 4)
    want = _enumerate_best(w, score, 4)
    assert got == want
    assert got is not None
    pieces, total = got
    assert "".join(pieces) == w
    assert total == sum(score[p] for p in pieces)


def test_viterbi_unreachable_and_tiebreak():
    assert viterbi_segment("ab", {"a": 0}, MAX_PIECE_LEN) is None
    # "ab" as one piece vs two: equal total -> larger mask (the split)
    pieces, total = viterbi_segment(
        "ab", {"a": -1, "b": -1, "ab": -2}, MAX_PIECE_LEN
    )
    assert pieces == ["a", "b"] and total == -2
    # strictly better single piece wins regardless of mask
    pieces, _ = viterbi_segment(
        "ab", {"a": -1, "b": -1, "ab": -1}, MAX_PIECE_LEN
    )
    assert pieces == ["ab"]


def test_seed_guarantees_reachability(spark):
    """Every modeled word segments under the seed vocabulary: all its
    characters are seed pieces by construction."""
    df = spark.createDataFrame(
        [(0, "zebra quokka xylophone!!"), (1, "zzz @@@")],
        ["doc_id", "text"],
    )
    words = word_counts(df)
    seed = seed_vocab(words, seed_multis=4)
    score = mnat_scores(
        spark, seed, 0, float(sum(c for _, c in seed))
    )
    for (w,) in words.select("w").collect():
        assert viterbi_segment(w, score) is not None


def test_train_partition_invariant(spark):
    rows = [
        (i, t)
        for i, t in enumerate(
            ["the cat sat", "the bat sat on the mat", "cat cat mat"] * 7
        )
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = unigram_train(df, vocab_size=12, seed_multis=8)
    b = unigram_train(df.repartition(7), vocab_size=12, seed_multis=8)
    key = ["score_mnat", "piece"]
    assert sorted(map(tuple, a.collect()), key=lambda r: (r[3], r[0])) == (
        sorted(map(tuple, b.collect()), key=lambda r: (r[3], r[0]))
    ), key


def test_train_hand_checked(spark):
    """vocab_size budget: every char survives; the multi budget goes to
    the most-USED pieces, not the most-frequent substrings."""
    df = spark.createDataFrame(
        [(0, "aaab aaab aaab ab")], ["doc_id", "text"]
    )
    v = unigram_train(df, vocab_size=3, seed_multis=8)
    rows = {r["piece"]: r for r in v.collect()}
    # chars always kept
    assert "a" in rows and "b" in rows
    assert len(rows) == 3
    multi = next(p for p in rows if len(p) >= 2)
    # the kept multi must be one Viterbi actually used
    assert rows[multi]["used_cnt"] > 0
    # scores are add-one smoothed micro-nats over the kept set
    tot = sum(r["used_cnt"] for r in rows.values()) + len(rows)
    import math

    for p, r in rows.items():
        want = round(math.log((r["used_cnt"] + 1) / tot) * 1e6)
        assert r["score_mnat"] == want


def test_segment_contract(spark):
    """Every input doc yields a row; empty/unmodeled docs score zero;
    totals are exact integer sums of the per-word DP results."""
    df = spark.createDataFrame(
        [(0, "the cat"), (1, ""), (2, None), (3, "x" * 25)],
        ["doc_id", "text"],
    )
    score = unigram_seed_scores(df, seed_multis=4)
    out = {
        r["doc_id"]: r
        for r in unigram_segment(df, score).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for d in (1, 2, 3):  # empty, null, over-length word
        assert out[d]["n_words"] == 0
        assert out[d]["n_pieces"] == 0
        assert out[d]["score_mnat"] == 0
    r0 = out[0]
    assert r0["n_words"] == 2
    want_pieces = 0
    want_score = 0
    distinct: set[str] = set()
    for w in ("the", "cat"):
        pieces, s = viterbi_segment(w, score)
        want_pieces += len(pieces)
        want_score += s
        distinct.update(pieces)
    assert r0["n_pieces"] == want_pieces
    assert r0["score_mnat"] == want_score
    assert r0["n_distinct_pieces"] == len(distinct)


def test_encode_contract(spark):
    """The id sequence preserves word order within the doc and piece
    order within words, under the pruned vocabulary's (score DESC,
    piece ASC) ranking; unreachable-by-cap and empty docs encode to
    the empty sequence."""
    df = spark.createDataFrame(
        [(0, "the cat the"), (1, ""), (2, "y" * 25)],
        ["doc_id", "text"],
    )
    vocab = sorted(
        unigram_train(df, vocab_size=8, seed_multis=4).collect(),
        key=lambda r: (-r["score_mnat"], r["piece"]),
    )
    score = {r["piece"]: r["score_mnat"] for r in vocab}
    ids = {r["piece"]: i for i, r in enumerate(vocab)}
    out = {
        r["doc_id"]: r for r in unigram_encode(df, score, ids).collect()
    }
    want: list[str] = []
    for w in ("the", "cat", "the"):
        pieces, _ = viterbi_segment(w, score)
        want.extend(str(ids[p]) for p in pieces)
    assert out[0]["ids"] == " ".join(want)
    assert out[0]["n_tokens"] == len(want)
    for d in (1, 2):
        assert out[d]["ids"] == "" and out[d]["n_tokens"] == 0
