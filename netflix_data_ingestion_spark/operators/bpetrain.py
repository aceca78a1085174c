"""Distributed BPE merge training (Sennrich, Haddow & Birch, ACL 2016).

The trainer the ``bpe_pretokenize`` segmentation feeds: learn the merge
table itself from the corpus.  The classic algorithm iterates over the
WORD-FREQUENCY table, not the corpus — one corpus pass builds
(pretoken, count), and every merge round then runs on that vocab-sized
frame: count adjacent symbol pairs weighted by word frequency
(combinable groupBy), pick the max pair (deterministic argmax:
highest count, then lexicographic — a 1-row collect, the same
model-sized parameter-server license as kmeans' centroid update), and
apply the merge to every word's symbol array with a greedy
left-to-right fold (one narrow pass, no Python).

Scale shape: corpus is touched ONCE; the word-frequency table is
MODEL-sized (bounded by distinct pretokens, not corpus rows), so after
that single pass the merge loop itself needs no cluster.  A real
tokenizer trains 30k-50k merges — running each round as a Spark job
would be O(num_merges) scheduling (hours of pure overhead on ANY
corpus) — so when the vocab fits ``driver_vocab_cap`` the trainer
collects it once and runs every round in-process with incremental
pair-count maintenance (the subword-nmt discipline: only words
containing the merged pair are touched per round).  Only when the
vocab exceeds the cap does it fall back to the distributed round path:
per round one explode+groupBy over the vocab frame plus a 1-row argmax
collect, symbol arrays eager-checkpointed between rounds (lineage
would otherwise stack num_merges folds deep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.textstats import (
    bpe_pretokenize,
)
from netflix_data_ingestion_spark.operators.util import ensure_parallelism

#: end-of-word marker (the paper's </w>): distinguishes "est" inside
#: "estimate" from the suffix in "newest"
EOW = "</w>"


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(symbols array<string>, cnt) — distinct pretokens with corpus
    frequencies, split to characters with the end-of-word marker
    appended (lowercased: BPE case-folding is a modeling choice; this
    trainer's contract is the lowercase variant)."""
    words = (
        ensure_parallelism(df)
        .select(F.explode(bpe_pretokenize(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return words.select(
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(EOW))
        ).alias("symbols"),
        "cnt",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, total) — adjacent-symbol pair counts weighted by word
    frequency, one combinable shuffle over the vocab frame."""
    pairs = F.when(
        F.size("symbols") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at("symbols", i).alias("a"),
                F.element_at("symbols", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("total"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    into a||b inside every symbol array — one F.aggregate fold, JVM-side."""
    la, lb = F.lit(a), F.lit(b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        merged = acc["pend"].eqNullSafe(la) & (s == lb)
        return F.struct(
            F.when(
                merged, F.concat(acc["out"], F.array(F.concat(la, lb)))
            )
            .when(
                acc["pend"].isNull(), acc["out"]
            )
            .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
            .alias("out"),
            F.when(merged, F.lit(None).cast("string"))
            .otherwise(s)
            .alias("pend"),
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return vocab.select(
        F.aggregate("symbols", init, step, finish).alias("symbols"), "cnt"
    )


#: distinct-pretoken count under which the merge loop runs in-process.
#: 2M words x ~60 bytes of symbols is ~120 MB of driver heap — far
#: under any real driver budget, and real-corpus vocabularies (even
#: web-scale, after pretokenization) sit in the single-digit millions.
DRIVER_VOCAB_CAP = 2_000_000


def _merge_word(
    syms: list[str], a: str, b: str, ab: str
) -> list[str]:
    """Greedy left-to-right non-overlapping (a, b) -> ab: the exact
    pend-fold semantics of _apply_merge, in-process."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _count_pairs(syms: list[str], cnt: int, into: dict) -> None:
    for i in range(len(syms) - 1):
        k = (syms[i], syms[i + 1])
        into[k] = into.get(k, 0) + cnt


def _train_local(
    words: list[tuple[list[str], int]],
    num_merges: int,
    min_pair_count: int,
    with_counts: bool,
) -> list:
    """All ``num_merges`` rounds over the collected word-frequency
    table: ZERO Spark jobs.  Incremental maintenance (subword-nmt):
    a pair->word-set index means each round touches only the words
    that contain the chosen pair, so total work is proportional to
    actual merge activity, not rounds x vocab."""
    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, cnt) in enumerate(words):
        for i in range(len(syms) - 1):
            k = (syms[i], syms[i + 1])
            counts[k] = counts.get(k, 0) + cnt
            index.setdefault(k, set()).add(wi)
    merges: list = []
    for _ in range(num_merges):
        if not counts:
            break
        # deterministic argmax: highest total, then lexicographic
        # (a, b) — Python's str compare is code-point order, which
        # UTF-8 binary order (Spark/DuckDB ORDER BY) preserves
        (a, b), total = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if total < min_pair_count:
            break
        merges.append((a, b, total) if with_counts else (a, b))
        ab = a + b
        for wi in sorted(index.get((a, b), ())):
            syms, cnt = words[wi]
            merged = _merge_word(syms, a, b, ab)
            if merged == syms:
                continue
            old: dict = {}
            new: dict = {}
            _count_pairs(syms, cnt, old)
            _count_pairs(merged, cnt, new)
            words[wi] = (merged, cnt)
            for k, c in old.items():
                left = counts.get(k, 0) - c
                if left > 0:
                    counts[k] = left
                else:
                    counts.pop(k, None)
                s = index.get(k)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del index[k]
            for k, c in new.items():
                counts[k] = counts.get(k, 0) + c
                index.setdefault(k, set()).add(wi)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
    with_counts: bool = False,
    driver_vocab_cap: int = DRIVER_VOCAB_CAP,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """The learned merge table: ``num_merges`` (a, b) pairs in training
    order (``with_counts=True`` appends each chosen pair's exact corpus
    count: (a, b, total)).  Stops early when no pair reaches
    ``min_pair_count`` (merging singleton pairs memorizes the corpus).
    Deterministic: ties break lexicographically on (a, b), and every
    count is exact integer arithmetic — the same corpus always learns
    the same table, on any partitioning, on EITHER execution path:

    - vocab <= ``driver_vocab_cap`` distinct pretokens: ONE Spark
      action total (the corpus pass + vocab collect); the whole merge
      loop runs in-process (_train_local), so job count does not
      scale with ``num_merges``.
    - above the cap (or ``driver_vocab_cap=0``): the distributed
      round path — per round a combinable pair-count groupBy over the
      vocab frame and a 1-row argmax collect (the same model-sized
      parameter-server license as kmeans' centroid update).
    """
    vocab_src = _word_table(df, text_col)
    if driver_vocab_cap:
        head = vocab_src.limit(driver_vocab_cap + 1).collect()
        if len(head) <= driver_vocab_cap:
            words = [
                (list(r["symbols"]), int(r["cnt"])) for r in head
            ]
            return _train_local(
                words, num_merges, min_pair_count, with_counts
            )
    vocab = vocab_src.localCheckpoint(eager=True)
    merges: list = []
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append(
            (a, b, int(top[0]["total"])) if with_counts else (a, b)
        )
        vocab = _apply_merge(vocab, a, b).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — segment each
    document with a learned merge table: the broadcast-model
    tokenizer-apply, ONE Arrow ``mapInPandas`` stage over one corpus
    pass, no shuffle, no join.

    Pretokenization and the character split stay JVM-side (the exact
    expressions the trainer's ``_word_table`` uses, so train and apply
    can never disagree on segmentation boundaries); the merge
    application runs in the Arrow batch loop via ``_merge_word`` — the
    in-process twin of ``_apply_merge`` already proven identical to
    the JVM fold by the local/distributed trainer agreement test —
    applied in training order (sequential semantics, NOT rank-priority
    re-merge: a later merge can recreate an earlier pair, and
    sequential apply must leave it unmerged) and memoized per distinct
    symbol sequence, so each task pays O(num_merges x len) once per
    DISTINCT pretoken and a dict hit per repeat.

    Scale shape: this replaced a chain of ``num_merges`` nested
    ``F.aggregate`` folds whose generated code compiled in
    O(num_merges) (22s cold at 5 merges; a real 30k-merge table would
    never JIT).  The broadcast model is merges-table-sized (the same
    parameter-server license as the trainer's collect), per-doc work
    is independent of corpus size, and the stage is embarrassingly
    parallel — the shape every production tokenizer-apply uses.

    ``bpe_segment_folds`` keeps the pure-JVM fold chain as the
    equivalence twin (property-tested identical)."""
    pre = ensure_parallelism(df).select(
        F.col(id_col),
        F.transform(
            bpe_pretokenize(F.lower(F.col(text_col))),
            lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
        ).alias("__syms"),
    )
    merge_ops = [(a, b, a + b) for a, b in merges]
    id_field = df.schema[id_col]

    def batches(it):
        import pandas as pd

        memo: dict = {}

        def seg(word_syms) -> list:
            key = tuple(word_syms)
            got = memo.get(key)
            if got is None:
                syms = list(word_syms)
                for a, b, ab in merge_ops:
                    syms = _merge_word(syms, a, b, ab)
                memo[key] = got = syms
            return got

        for pdf in it:
            ids, toks, ns = [], [], []
            for doc_id, words in zip(pdf[id_col], pdf["__syms"]):
                flat: list = []
                for w in words:
                    flat.extend(seg(w))
                ids.append(doc_id)
                toks.append(flat)
                ns.append(len(flat))
            yield pd.DataFrame(
                {id_col: ids, "bpe_tokens": toks, "n_bpe_tokens": ns}
            ).astype({"n_bpe_tokens": "int64"})

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", LongType()),
        ]
    )
    return pre.mapInPandas(batches, schema)


def bpe_segment_folds(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The pure-JVM fold-chain segmentation: pretokenize, split
    pretokens to characters + EOW, then apply every merge in training
    order as one narrow ``F.aggregate`` fold each.  Semantically THE
    definition ``bpe_segment`` must match (property-tested); kept out
    of the hot path because the generated code for the chained folds
    compiles in O(num_merges) — prohibitive cold-start at real merge
    counts."""
    syms = F.transform(
        bpe_pretokenize(F.lower(F.col(text_col))),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
    )
    out = ensure_parallelism(df).select(F.col(id_col), syms.alias("__ws"))
    for a, b in merges:

        def make(a=a, b=b):
            la, lb = F.lit(a), F.lit(b)
            init = F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(None).cast("string").alias("pend"),
            )

            def step(acc, s):
                merged = acc["pend"].eqNullSafe(la) & (s == lb)
                return F.struct(
                    F.when(
                        merged,
                        F.concat(acc["out"], F.array(F.concat(la, lb))),
                    )
                    .when(acc["pend"].isNull(), acc["out"])
                    .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
                    .alias("out"),
                    F.when(merged, F.lit(None).cast("string"))
                    .otherwise(s)
                    .alias("pend"),
                )

            def finish(acc):
                return F.when(
                    acc["pend"].isNull(), acc["out"]
                ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

            return lambda w: F.aggregate(w, init, step, finish)

        fold = make()
        out = out.select(
            id_col,
            F.transform("__ws", fold).alias("__ws"),
        )
    return out.select(
        id_col,
        F.flatten("__ws").alias("bpe_tokens"),
        F.size(F.flatten("__ws")).cast("long").alias("n_bpe_tokens"),
    )
