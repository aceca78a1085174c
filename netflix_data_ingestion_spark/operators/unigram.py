"""SentencePiece-style unigram-LM tokenizer (Kudo, ACL 2018) — hard-EM.

The second real subword tokenizer family next to ``bpetrain`` (BPE):
where BPE grows a vocabulary bottom-up by merging frequent pairs, the
unigram model starts from an over-complete seed vocabulary of frequent
substrings, scores each piece by log-probability, segments every word
with Viterbi under those scores, and prunes the vocabulary to size by
how much each piece is actually USED in the optimal segmentations
(one hard-EM round: Viterbi E-step, count-and-prune M-step).

Scale shape (the bpetrain discipline throughout):

- The corpus is touched ONCE to build the (word, count) frequency
  table — a combinable groupBy keyed on the pretoken, the same first
  pass every production tokenizer trainer runs.
- Candidate pieces are every substring (length <= ``max_piece_len``)
  of the DISTINCT word table — a bounded JVM-side explode over the
  vocab-sized frame, never over corpus rows.
- The seed vocabulary is MODEL-sized (every single character + the
  top ``seed_multis`` multi-char substrings), so collecting it is the
  same parameter-server license as kmeans' centroid frame and DSIR's
  bucket-count frame.
- The Viterbi E-step runs as ONE Arrow ``mapInPandas`` stage over the
  distinct-word frame with the broadcast score dict, memoized per
  word — O(len x max_piece_len) per DISTINCT word, zero shuffle
  beyond the final piece-count groupBy (itself seed-vocab-sized).
- Tokenizer-apply (``unigram_segment``) is the bpe_segment shape: one
  Arrow stage over one corpus pass, pretokenization kept JVM-side
  (the exact ``bpe_pretokenize`` expression the trainer uses), per-doc
  work independent of corpus size, embarrassingly parallel.

Determinism contract (what makes the DuckDB oracle hash-check exact):

- Piece scores are integer micro-nats: ``round(1e6 * ln(p))`` computed
  ON SPARK (JVM ln + HALF_UP round) — the lm.py / DSIR round-6 pin
  that kills last-ulp ln() divergence across engines.
- Viterbi maximizes the lexicographic key ``(total_score,
  boundary_mask)`` where bit j of the mask marks a split before
  character j.  Score ties therefore break toward the LARGEST
  boundary bitmask — a total order an enumeration oracle replicates
  exactly, and one with optimal substructure: candidate prefixes to
  position j differ only in mask bits < j while any common extension
  adds only bits >= j, so integer comparison of the final masks
  reduces to comparison at j.
- Words longer than ``max_word_len`` characters are outside the
  modeled contract (excluded from training counts and from
  segmentation stats) — bounds the oracle's path enumeration.

Reference parity: the reference pipeline (etl_pipeline_spark.py) has
no tokenizer; this family is beyond-reference LLM-pipeline surface,
held to the same oracle bar as the BPE rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.textstats import (
    bpe_pretokenize,
)
from netflix_data_ingestion_spark.operators.util import ensure_parallelism

#: words longer than this are outside the modeled contract: excluded
#: from training counts AND from segmentation stats.  Real pretokens
#: above 20 chars are URLs/hashes/DNA — noise to a subword model —
#: and the cap bounds the oracle's per-word path enumeration.
MAX_WORD_LEN = 20

#: longest candidate piece the seed vocabulary considers.
MAX_PIECE_LEN = 6


def word_counts(
    df: DataFrame, text_col: str = "text", max_word_len: int = MAX_WORD_LEN
) -> DataFrame:
    """(w, cnt) — distinct modeled pretokens with corpus frequencies
    (lowercased, length-capped).  One corpus pass, combinable groupBy."""
    return (
        ensure_parallelism(df)
        .select(
            F.explode(bpe_pretokenize(F.lower(F.col(text_col)))).alias("w")
        )
        .where(F.length("w") <= max_word_len)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def piece_counts(
    words: DataFrame, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(piece, cnt) — every substring occurrence of length 1 ..
    ``max_piece_len`` across the word table, duplicates kept, weighted
    by word frequency.  JVM-side nested transform + one combinable
    groupBy; the inner lambda re-reads only plain attributes (``w``,
    ``length(w)``), not a recomputed expression, so the dedup.bind_once
    hazard does not apply."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("w") - i + 1),
                ),
                lambda l: F.col("w").substr(i, l),
            ),
        )
    )
    return (
        words.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def seed_vocab(
    words: DataFrame,
    seed_multis: int = 64,
    max_piece_len: int = MAX_PIECE_LEN,
) -> list[tuple[str, int]]:
    """[(piece, cnt)] — the over-complete seed: EVERY single character
    (guarantees Viterbi reachability for every modeled word) plus the
    ``seed_multis`` most frequent multi-char substrings (ties broken
    lexicographically — Python str compare is code-point order, which
    UTF-8 binary ORDER BY in Spark/DuckDB preserves).  ONE model-sized
    collect: the char branch and the top-k multi branch are unioned so
    the piece-count frame is scanned once (row order across the union
    is plan-dependent; selection is what matters, and callers treat
    the result as a set)."""
    pc = piece_counts(words, max_piece_len)
    chars = pc.where(F.length("piece") == 1)
    multis = (
        pc.where(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_multis)
    )
    return sorted(
        (r["piece"], int(r["cnt"]))
        for r in chars.unionAll(multis).collect()
    )


def mnat_scores(
    spark: SparkSession,
    pieces: list[tuple[str, int]],
    add: int,
    denom: float,
) -> dict[str, int]:
    """{piece: round(1e6 * ln((cnt + add) / denom))} — integer
    micro-nat log-probabilities computed ON SPARK over the model-sized
    piece frame (JVM ln + HALF_UP round, the lm.py cross-engine pin)."""
    frame = spark.createDataFrame(pieces, "piece string, cnt long").select(
        "piece",
        F.round(
            F.log((F.col("cnt") + add) / F.lit(float(denom))) * 1e6
        )
        .cast("long")
        .alias("s"),
    )
    return {r["piece"]: int(r["s"]) for r in frame.collect()}


def viterbi_segment(
    w: str, score: dict[str, int], max_piece_len: int = MAX_PIECE_LEN
) -> tuple[list[str], int] | None:
    """(pieces, total_score_mnat) — the max-score segmentation of ``w``
    under the unigram scores; ``None`` when unreachable (cannot happen
    when every character of ``w`` is in the vocabulary, which
    ``seed_vocab`` guarantees for modeled words).

    The DP key is ``(score, boundary_mask)`` compared lexicographically
    — see the module docstring for why that tie-break has optimal
    substructure and is exactly replicable by path enumeration."""
    n = len(w)
    dp: list[tuple[int, int] | None] = [None] * (n + 1)
    dp[0] = (0, 0)
    for i in range(1, n + 1):
        best: tuple[int, int] | None = None
        for j in range(max(0, i - max_piece_len), i):
            prev = dp[j]
            if prev is None:
                continue
            s = score.get(w[j:i])
            if s is None:
                continue
            cand = (prev[0] + s, prev[1] | (1 << j) if j else prev[1])
            if best is None or cand > best:
                best = cand
        dp[i] = best
    final = dp[n]
    if final is None:
        return None
    total, mask = final
    bounds = [0] + [j for j in range(1, n) if (mask >> j) & 1] + [n]
    pieces = [w[bounds[k] : bounds[k + 1]] for k in range(len(bounds) - 1)]
    return pieces, total


def _used_counts(
    words: DataFrame, score: dict[str, int], max_piece_len: int
) -> DataFrame:
    """(piece, used) — how often each piece appears in the Viterbi
    segmentations across the corpus (weighted by word frequency): the
    hard-EM E-step.  ONE Arrow stage over the distinct-word frame with
    the broadcast score dict, pre-aggregated per batch, then one
    seed-vocab-sized groupBy."""

    def batches(it):
        import pandas as pd

        memo: dict = {}
        for pdf in it:
            agg: dict[str, int] = {}
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = viterbi_segment(w, score, max_piece_len)
                if got is None:
                    continue
                for p in got[0]:
                    agg[p] = agg.get(p, 0) + int(cnt)
            if agg:
                yield pd.DataFrame(
                    {"piece": list(agg.keys()), "used": list(agg.values())}
                ).astype({"used": "int64"})

    return (
        words.mapInPandas(batches, "piece string, used long")
        .groupBy("piece")
        .agg(F.sum("used").cast("long").alias("used"))
    )


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 40,
    seed_multis: int = 64,
    max_piece_len: int = MAX_PIECE_LEN,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """(piece, piece_len, used_cnt, score_mnat) — the pruned unigram
    vocabulary after one hard-EM round: seed -> Viterbi E-step ->
    keep every single character plus the ``vocab_size - n_chars``
    most-used multi-char pieces (ties lexicographic) -> re-score with
    add-one smoothing over the kept set (characters never chosen by
    Viterbi survive with the smoothed floor score, preserving full
    coverage for unseen words at apply time)."""
    spark = df.sparkSession
    words = word_counts(df, text_col, max_word_len).localCheckpoint(
        eager=True
    )
    seed = seed_vocab(words, seed_multis, max_piece_len)
    seed_tot = float(sum(c for _, c in seed))
    seed_scores = mnat_scores(spark, seed, 0, seed_tot)
    used = {
        r["piece"]: int(r["used"])
        for r in _used_counts(words, seed_scores, max_piece_len).collect()
    }
    chars = sorted(p for p, _ in seed if len(p) == 1)
    multis = [(p, used.get(p, 0)) for p, _ in seed if len(p) >= 2]
    multis.sort(key=lambda t: (-t[1], t[0]))
    kept = [(p, used.get(p, 0)) for p in chars] + multis[
        : max(0, vocab_size - len(chars))
    ]
    denom = float(sum(c for _, c in kept) + len(kept))
    final_scores = mnat_scores(spark, kept, 1, denom)
    return spark.createDataFrame(
        [(p, len(p), c, final_scores[p]) for p, c in kept],
        "piece string, piece_len long, used_cnt long, score_mnat long",
    )


def unigram_seed_scores(
    df: DataFrame,
    text_col: str = "text",
    seed_multis: int = 64,
    max_piece_len: int = MAX_PIECE_LEN,
    max_word_len: int = MAX_WORD_LEN,
) -> dict[str, int]:
    """{piece: score_mnat} under the UNPRUNED seed vocabulary — the
    E-step model, exposed so tokenizer-apply can run against the seed
    directly (the segmentation contract the doc-level oracle checks)."""
    words = word_counts(df, text_col, max_word_len)
    seed = seed_vocab(words, seed_multis, max_piece_len)
    return mnat_scores(
        df.sparkSession, seed, 0, float(sum(c for _, c in seed))
    )


def unigram_segment(
    df: DataFrame,
    score: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """(id, n_words, n_pieces, n_distinct_pieces, score_mnat) — per-doc
    Viterbi tokenization stats under a broadcast unigram model:
    modeled-word count, total piece count, distinct pieces used, and
    the document's total segmentation score in exact integer
    micro-nats (the unigram-LM log-likelihood — the data-quality /
    domain-fit signal this tokenizer family feeds).  Every input doc
    yields a row; docs with no modeled words score zero.

    The bpe_segment shape: pretokenization and the length cap stay
    JVM-side (the trainer's exact expressions), the DP runs in one
    Arrow ``mapInPandas`` stage memoized per distinct word, no
    shuffle, no join."""
    pre = ensure_parallelism(df).select(
        F.col(id_col),
        F.filter(
            bpe_pretokenize(F.lower(F.col(text_col))),
            lambda w: F.length(w) <= max_word_len,
        ).alias("__ws"),
    )
    id_field = df.schema[id_col]

    def batches(it):
        import pandas as pd

        memo: dict = {}
        for pdf in it:
            ids, nw, npc, ndp, sc = [], [], [], [], []
            for doc_id, ws in zip(pdf[id_col], pdf["__ws"]):
                n_words = n_pieces = total = 0
                distinct: set[str] = set()
                # NULL text -> NULL pretoken array (Arrow None)
                for w in ws if ws is not None else ():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = viterbi_segment(
                            w, score, max_piece_len
                        )
                    if got is None:
                        continue
                    pieces, s = got
                    n_words += 1
                    n_pieces += len(pieces)
                    total += s
                    distinct.update(pieces)
                ids.append(doc_id)
                nw.append(n_words)
                npc.append(n_pieces)
                ndp.append(len(distinct))
                sc.append(total)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": nw,
                    "n_pieces": npc,
                    "n_distinct_pieces": ndp,
                    "score_mnat": sc,
                }
            ).astype(
                {
                    "n_words": "int64",
                    "n_pieces": "int64",
                    "n_distinct_pieces": "int64",
                    "score_mnat": "int64",
                }
            )

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("n_words", LongType()),
            StructField("n_pieces", LongType()),
            StructField("n_distinct_pieces", LongType()),
            StructField("score_mnat", LongType()),
        ]
    )
    return pre.mapInPandas(batches, schema)


def unigram_encode(
    df: DataFrame,
    score: dict[str, int],
    ids: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """(id, n_tokens, ids) — each document as its space-joined
    token-id sequence under a (typically pruned) unigram vocabulary:
    Viterbi-segment every modeled word with ``score``, then map each
    piece through the ``ids`` table (piece -> integer id).  The
    doc_bpe_encode twin for this tokenizer family; the downstream
    contract hashes ``ids``, so the sequence itself (piece order
    within words, word order within the doc) is what's pinned.

    Same shape as ``unigram_segment``: one Arrow stage, DP memoized
    per distinct word, no shuffle."""
    pre = ensure_parallelism(df).select(
        F.col(id_col),
        F.filter(
            bpe_pretokenize(F.lower(F.col(text_col))),
            lambda w: F.length(w) <= max_word_len,
        ).alias("__ws"),
    )
    id_field = df.schema[id_col]

    def batches(it):
        import pandas as pd

        memo: dict = {}
        for pdf in it:
            out_ids, nts, strs = [], [], []
            for doc_id, ws in zip(pdf[id_col], pdf["__ws"]):
                toks: list[str] = []
                for w in ws if ws is not None else ():
                    got = memo.get(w)
                    if got is None:
                        seg = viterbi_segment(w, score, max_piece_len)
                        got = memo[w] = (
                            None
                            if seg is None
                            else [str(ids[p]) for p in seg[0]]
                        )
                    if got is None:
                        continue
                    toks.extend(got)
                out_ids.append(doc_id)
                nts.append(len(toks))
                strs.append(" ".join(toks))
            yield pd.DataFrame(
                {id_col: out_ids, "n_tokens": nts, "ids": strs}
            ).astype({"n_tokens": "int64"})

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("n_tokens", LongType()),
            StructField("ids", StringType()),
        ]
    )
    return pre.mapInPandas(batches, schema)
