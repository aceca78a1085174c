"""Text analysis operators — beyond-reference (BASELINE.json north star).

Language-ID, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` corpus.  Every
operator is built-in-expression composition (whole-stage codegen; no
UDFs), and every hash is md5 so the DuckDB oracle reproduces results
exactly.

At 100 TB all of these are narrow per-row transforms except the
fingerprint winnowing (a per-doc window over shingle positions — keyed
shuffle on doc_id) and the lang-ID lexicon join (broadcast: the lexicon
is tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.dedup import (
    bigram_pairs,
    bind_once,
    shingles,
    tokens,
    word_ngrams,
)
from netflix_data_ingestion_spark.operators.util import ensure_parallelism

# tiny stopword lexicons for the languages present in the corpus;
# lang-ID here is a frequency heuristic, not a model
LEXICON: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "los"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "dans"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"),
}

STOPWORDS_EN = LEXICON["en"]


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len) — whitespace/punct tokenization."""
    tok = tokens(F.col(text_col))
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.size(tok).cast("bigint").alias("n_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        # single int/int double division — bit-identical in any engine
        (
            F.aggregate(
                tok, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.size(tok).cast("double")
        ).alias("avg_token_len"),
    )


def quality_score_expr(t, tok) -> "F.Column":
    """The quality-score expression over a text column ``t`` and its
    token array ``tok`` — shared by :func:`quality_score` and callers
    that already hold the token array (curate.curate_corpus pins ONE
    token frame and feeds the gate, the MinHash shingles and the token
    counts from it — guide §2.4 shared-subtree discipline), so the
    fused path cannot drift from the operator.

    score = 0.4*alpha_ratio + 0.3*stopword_ratio + 0.3*(1 - special_ratio)
    computed as ONE double division of exact integer counts (common
    denominator) — bit-identical in any engine.
    """
    n = F.length(t).cast("long")
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("long")
    space = F.length(F.regexp_replace(t, "[^ ]", "")).cast("long")
    special = n - alpha - digit - space
    n_tokens = F.size(tok).cast("long")
    n_stop = F.size(
        F.filter(tok, lambda x: x.isin(*STOPWORDS_EN))
    ).cast("long")
    # score = [4*alpha*ntok + 3*nstop*n + 3*ntok*(n - special)] / (10*n*ntok)
    numer = (
        4 * alpha * n_tokens + 3 * n_stop * n + 3 * n_tokens * (n - special)
    ).cast("double")
    denom = (10 * n * n_tokens).cast("double")
    nz = (n > 0) & (n_tokens > 0)
    return F.when(nz, numer / denom)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality: character-class ratios + stopword ratio.

    score = 0.4*alpha_ratio + 0.3*stopword_ratio + 0.3*(1 - special_ratio).

    Numeric discipline: every output is ONE double division of exact
    integer counts (the composite score uses a common denominator), so
    any engine computes bit-identical results — no intermediate float
    rounding that could straddle a decimal boundary differently across
    engines.
    """
    t = F.col(text_col)
    n = F.length(t).cast("long")
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("long")
    space = F.length(F.regexp_replace(t, "[^ ]", "")).cast("long")
    special = n - alpha - digit - space

    tok = tokens(t)
    n_tokens = F.size(tok).cast("long")
    n_stop = F.size(F.filter(tok, lambda x: x.isin(*STOPWORDS_EN))).cast("long")

    # empty / token-free documents yield NULL ratios instead of an ANSI
    # divide-by-zero error (ANSI mode turns x/0 into a hard failure)
    nz = (n > 0) & (n_tokens > 0)
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.when(nz, alpha.cast("double") / n.cast("double")).alias(
            "alpha_ratio"
        ),
        F.when(nz, special.cast("double") / n.cast("double")).alias(
            "special_ratio"
        ),
        F.when(nz, n_stop.cast("double") / n_tokens.cast("double")).alias(
            "stopword_ratio"
        ),
        quality_score_expr(t, tok).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, predicted_lang) — argmax of stopword-lexicon hits; 'und' if none.

    Implemented as pure per-row array expressions — per-language hit
    counts via ``F.filter`` over the token array, argmax via
    ``array_min`` over (-hits, lang) structs.  NO explode, NO join, NO
    shuffle: a narrow map over the corpus, which is the shape you want
    when scoring 100 TB of documents against a fixed lexicon.
    Tie-break is lexicographic on language code.
    """
    tok = tokens(F.col(text_col))
    langs = sorted(LEXICON)
    hit_cols = {
        lang: F.size(F.filter(tok, lambda x: x.isin(*LEXICON[lang]))).cast(
            "long"
        )
        for lang in langs
    }
    candidates = F.array(
        *[
            F.struct((-hit_cols[lang]).alias("nh"), F.lit(lang).alias("lang"))
            for lang in langs
        ]
    )
    best = F.array_min(candidates)
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.when(best.getField("nh") == 0, F.lit("und"))
        .otherwise(best.getField("lang"))
        .alias("predicted_lang"),
    )


def repetition_ratio(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, n_grams, n_distinct_grams, dup_ratio) — intra-document
    repetition: the fraction of word n-grams that are repeats of an
    earlier n-gram in the same document.  High dup_ratio flags templated
    / boilerplate / looping text — a standard LLM training-data quality
    signal (the inter-document analog is the dedup module).

    Pure narrow map (array expressions, one 1-row Generate, no shuffle):
    the right shape for scoring 100 TB.  dup_ratio is ONE double division
    of exact integer counts, so any engine computes it bit-identically.
    Documents shorter than `n` tokens (zero n-grams) are dropped rather
    than emitting a 0/0 row.

    r12 plan shape (guide §1.2 per-task work): the former two-column
    projection evaluated the full tokenize+n-gram chain THREE times per
    row — once per size() alias (aggregate-style duplication under
    CollapseProject) and a third time when PushDownPredicates substituted
    the ``n_grams > 0`` filter below the parallelizing repartition, where
    it ran on the source's single input partition.  Both sizes are now
    computed inside ONE let-bound struct (``bind_once``) behind an
    ``explode(array(...))`` Generate: the Generate is a projection
    barrier, so the chain evaluates exactly once per row and the filter
    stays above the repartition.  Measured 5.29 s -> see
    OPTIMIZATION_r12.md; byte-identical output (oracle hash-check).
    """
    tok = tokens(F.col(text_col))
    grams = word_ngrams(tok, n)
    stats = bind_once(
        grams,
        lambda g: F.struct(
            F.size(g).cast("long").alias("n_grams"),
            F.size(F.array_distinct(g)).cast("long").alias(
                "n_distinct_grams"
            ),
        ),
    )
    return (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(F.array(stats)).alias("__st"),
        )
        .filter(F.col("__st.n_grams") > 0)
        .select(
            F.col(id_col),
            F.col("__st.n_grams").alias("n_grams"),
            F.col("__st.n_distinct_grams").alias("n_distinct_grams"),
            (
                (F.col("__st.n_grams") - F.col("__st.n_distinct_grams"))
                .cast("double")
                / F.col("__st.n_grams").cast("double")
            ).alias("dup_ratio"),
        )
    )


def contamination(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """(id, n_overlap_grams, contaminated) — benchmark decontamination:
    for each corpus document, how many of its DISTINCT word n-grams
    appear anywhere in the benchmark set `bench` (same text column).

    The standard pre-training hygiene pass: documents overlapping an
    evaluation benchmark must be found (and usually dropped) before
    training.  Long n-grams (n=5..13) make coincidental overlap rare.

    Plan shape: the benchmark's distinct gram set is tiny relative to
    the corpus — broadcast it; the corpus side explodes its distinct
    grams (narrow) and inner-joins without shuffling the corpus.  The
    per-doc overlap count then aggregates on id.  Docs with zero overlap
    are restored with a left join against the (pre-aggregated, small)
    overlap table, so the output has one row per input document.
    """
    bench_grams = (
        ensure_parallelism(bench)
        .select(F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram"))
        .distinct()
    )
    corpus_grams = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram"),
    )
    overlap = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap_grams"))
    )
    return (
        df.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlap_grams"), F.lit(0)).cast("long").alias(
                "n_overlap_grams"
            ),
        )
        .withColumn("contaminated", F.col("n_overlap_grams") > 0)
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, term, tf, df, score, rank) — each document's `k` most
    characteristic terms by a tf-idf-style specificity score.

    score = tf * N / df computed as ONE multiply of exact integers
    followed by ONE double division — no log(), whose libm rounding can
    differ across engines; the ordering (and therefore the top-k cut) is
    identical to log-idf ranking per fixed tf because x -> N/x is
    monotone.  Ties break lexicographically on the term.

    Plan shape (three keyed shuffles, all map-side combinable):
    explode tokens (narrow) -> groupBy (doc, term) for tf -> groupBy
    term for df (then joined back; Catalyst broadcasts the df table
    when small, and at 100 TB it is still ~vocabulary-sized, far
    smaller than the corpus) -> per-doc window for the top-k cut.
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size as a broadcast 1-row frame, not a driver .first() —
    # the whole operator stays one lazy plan
    n = df.agg(F.countDistinct(id_col).alias("__n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * F.col("__n_docs")).cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def winnow_fingerprint(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprint (local-min sampling of k-gram hashes).

    For each position p, hash the word n-gram starting there (md5); take
    the min hash over each sliding window of `window` consecutive
    positions; the distinct set of those minima is the fingerprint.
    Returns (id, n_fingerprints, fp_digest) where fp_digest is md5 of the
    sorted minima joined by '|'.
    """
    tok = tokens(F.col(text_col))
    grams = ensure_parallelism(df).select(
        F.col(id_col),
        F.posexplode(word_ngrams(tok, n)).alias("pos", "gram"),
    ).withColumn("h", F.md5("gram"))

    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    mins = (
        grams.withColumn("win_min", F.min("h").over(w))
        .withColumn("max_pos", F.max("pos").over(Window.partitionBy(id_col)))
        .filter(F.col("pos") <= F.col("max_pos") - (window - 1))
        .select(F.col(id_col), F.col("win_min"))
        .distinct()
    )
    return mins.groupBy(id_col).agg(
        F.count("*").alias("n_fingerprints"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("win_min")), "|")
        ).alias("fp_digest"),
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_text) — overlapping
    token-window chunks: windows of ``chunk_tokens`` tokens starting
    every ``chunk_tokens - overlap`` tokens (the RAG/context-window
    chunker; operators/sample.pack_chunks is the complementary
    concatenate-then-split packer).

    Plan: tokenize once in a projection, explode the window-start
    sequence (the start list is computed from the token COUNT, not by
    re-tokenizing — dodging the Generate double-eval trap), then each
    chunk is a ``slice`` + ``array_join`` over the riding token array.
    Pure narrow flatMap; output rows ≈ corpus_tokens / stride
    regardless of document boundaries.  Zero-token documents produce
    zero chunks (an empty sequence, not a NULL row).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toked = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tok")
    )
    # sequence(1, 0) throws in ANSI Spark, so zero-token documents must
    # short-circuit to an empty start list (explode of [] emits no rows,
    # which is the documented "zero chunks" contract)
    starts = F.when(
        F.size("__tok") > 0,
        F.sequence(F.lit(1), F.size("__tok"), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    started = toked.select(
        id_col,
        "__tok",
        F.explode(starts).alias("__start"),
    )
    chunk = F.slice(F.col("__tok"), F.col("__start"), chunk_tokens)
    return started.select(
        F.col(id_col),
        ((F.col("__start") - 1) / stride).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """(term, doc_freq, postings) — the search-index build: every term
    mapped to its sorted posting list (comma-joined doc ids) and
    document frequency.

    Plan: narrow tokenize + explode, per-doc distinct folded into the
    same term shuffle (count_distinct + collect_set are one grouped
    pass), then the posting list is sorted per term — deterministic on
    any partitioning.

    100 TB honesty: per-term posting lists are the scale hazard — a
    stopword's list is the whole corpus.  ``max_df_ratio`` drops terms
    whose doc_freq exceeds that fraction of the corpus (the classic
    stopword cut, same broadcast-total pattern as skew_report); real
    deployments additionally shard postings by doc-id range, which is a
    storage layout concern downstream of this operator.
    """
    pairs = ensure_parallelism(df).select(
        F.col(id_col).alias("__doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    grouped = pairs.groupBy("term").agg(
        F.count_distinct("__doc").cast("bigint").alias("doc_freq"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("__doc")),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    out = grouped.where(F.col("doc_freq") >= F.lit(min_df))
    if max_df_ratio is not None:
        total = df.agg(
            F.count_distinct(F.col(id_col)).cast("double").alias("__n_docs")
        )
        out = out.crossJoin(F.broadcast(total)).where(
            F.col("doc_freq").cast("double")
            <= F.col("__n_docs") * F.lit(max_df_ratio)
        ).drop("__n_docs")
    return out


#: GPT-2-flavored pretokenizer, restricted to constructs whose semantics
#: are identical in Java regex and RE2 (ASCII classes, no \p{} unicode
#: properties — RE2's [[:alpha:]] and Java's \p{Alpha} don't port):
#: contraction tails, letter runs, digit runs, symbol runs.
BPE_PRETOKEN_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_pretokenize(text):
    """Array of BPE-style pretokens (the segmentation a byte-pair
    tokenizer refines; whitespace dropped, punctuation kept as runs) —
    the token-budget estimator that tracks real tokenizer counts far
    closer than whitespace splitting (which fuses 'word,' into one
    token and undercounts punctuation-heavy text)."""
    from pyspark.sql import functions as _F

    return _F.regexp_extract_all(text, _F.lit(BPE_PRETOKEN_PATTERN), 0)


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_word, n_number, n_symbol) under the BPE-style
    pretokenization — one narrow map, no shuffle, no Python."""
    tok = bpe_pretokenize(F.col(text_col))
    is_word = lambda t: t.rlike("^'?[A-Za-z]")  # noqa: E731
    is_num = lambda t: t.rlike("^[0-9]")  # noqa: E731
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.size(tok).cast("bigint").alias("n_tokens"),
        F.size(F.filter(tok, is_word)).cast("bigint").alias("n_word"),
        F.size(F.filter(tok, is_num)).cast("bigint").alias("n_number"),
        (
            F.size(tok)
            - F.size(F.filter(tok, is_word))
            - F.size(F.filter(tok, is_num))
        )
        .cast("bigint")
        .alias("n_symbol"),
    )


def bigram_lm_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(w1, w2, cnt, ctx_total, cont_w2) — corpus bigram language-model
    count table with the Kneser-Ney ingredients (Kneser & Ney 1995;
    Chen & Goodman 1998): raw bigram count, the left context's total
    outgoing mass ``ctx_total = Σ_x c(w1 x)``, and the right word's
    continuation breadth ``cont_w2 = |{x : c(x w2) > 0}|``.  From these
    a consumer computes absolute-discount / KN probabilities without
    another corpus pass — the count table IS the trained model, which
    is what n-gram quality scoring and perplexity-based data filtering
    need at corpus scale.

    Shape: ONE corpus pass (narrow token/pair explode) into one
    combinable (w1, w2) groupBy; ctx_total and cont_w2 are then
    UNORDERED window aggregates over the bigram-count table itself —
    two exchanges of the (much smaller) count table, no sort (a
    whole-partition window), and no second scan of the corpus.
    cont_w2 is COUNT(*) per w2 over the count table — one row per
    distinct (w1, w2) makes that exactly the distinct-context count.
    """
    pairs = bigram_pairs(tokens(F.col(text_col)))
    counts = (
        ensure_parallelism(df)
        .select(F.explode(pairs).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w_ctx = Window.partitionBy("w1")
    w_cont = Window.partitionBy("w2")
    return counts.withColumn(
        "ctx_total", F.sum("cnt").over(w_ctx).cast("long")
    ).withColumn("cont_w2", F.count(F.lit(1)).over(w_cont).cast("long"))


def vocab_growth(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_size: int = 100,
) -> DataFrame:
    """(bucket, new_terms, vocab_size) — the corpus vocabulary-growth
    (Heaps-law) curve sampled at ``bucket_size``-document boundaries:
    how many NEVER-SEEN-BEFORE terms each id-ordered document block
    introduces, and the running distinct-vocabulary total.  The
    diagnostic behind tokenizer-coverage and dedup-health checks (a
    corpus whose curve stays linear is accreting boilerplate variants;
    a healthy crawl flattens).

    Distributed shape: "running distinct" without any per-doc global
    window — each term's FIRST document (one combinable min shuffle
    over the term space), counts per bucket (combinable), then ONE
    ordered cumulative sum over the #buckets-row frame.  Buckets are
    the scale valve: the only unpartitioned window runs over
    n_docs / bucket_size rows (a plottable curve is at most a few
    thousand points no matter the corpus), never over documents.
    Empty buckets in id-range gaps are absent from the output (the
    curve is sampled at occupied blocks; gap-fill composes via
    operators/gapfill if a dense axis is wanted).
    """
    first_seen = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias(
                "__term"
            ),
        )
        .groupBy("__term")
        .agg(F.min(id_col).alias("__first_doc"))
    )
    per_bucket = first_seen.groupBy(
        (F.col("__first_doc") - F.pmod("__first_doc", F.lit(bucket_size)))
        .alias("bucket")
    ).agg(F.count("*").cast("long").alias("new_terms"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.withColumn(
        "vocab_size", F.sum("new_terms").over(w).cast("long")
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 1_000_000,
) -> DataFrame:
    """(id, score_micro) — BM25 relevance of each document to a bag of
    query terms (Robertson & Spärck Jones; the retrieval scorer behind
    RAG candidate selection), in exact micro-units.

    Cross-engine float discipline: each per-term contribution
    ``idf_t · tf_norm`` is ONE fixed arithmetic tree (identical op
    order in both engines), quantized to int64 micro-units
    (``round(x · scale)``) BEFORE the per-doc sum — so the sum is
    exact integer arithmetic and immune to FP addition-order
    divergence across partitionings and engines.  The idf is the
    LOG-FREE portable variant ``(N - df + 0.5) / (df + 0.5)`` (same
    document ordering as the log form for df < N/2; ``ln`` differs in
    ulps across engines, so it stays out — the tfidf_top_terms
    precedent).

    Shape: corpus stats ride a broadcast 1-row aggregate; per-term
    document frequencies are a |terms|-row broadcast; the only
    data-sized shuffle is the (doc, term) tf groupBy over rows
    containing query terms.  Documents matching no term are absent
    (score 0 — callers left-join if they need the zeros).
    """
    terms = [t.lower() for t in query_terms]
    base = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    )
    stats = base.agg(
        F.count("*").cast("long").alias("__n_docs"),
        F.sum(F.size("__tk")).cast("long").alias("__total_tok"),
    )
    lengths = base.select(
        F.col(id_col), F.size("__tk").cast("long").alias("__dl")
    )
    hits = (
        base.select(F.col(id_col), F.explode("__tk").alias("__term"))
        .where(F.col("__term").isin(*terms))
        .groupBy(id_col, "__term")
        .agg(F.count("*").cast("long").alias("__tf"))
    )
    dfreq = hits.groupBy("__term").agg(
        F.count("*").cast("long").alias("__df")
    )
    joined = (
        hits.join(F.broadcast(dfreq), "__term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("__total_tok").cast("double") / F.col("__n_docs")
    idf = (F.col("__n_docs").cast("double") - F.col("__df") + 0.5) / (
        F.col("__df").cast("double") + 0.5
    )
    tf = F.col("__tf").cast("double")
    tf_norm = (tf * (k1 + 1.0)) / (
        tf + k1 * (1.0 - b + b * (F.col("__dl").cast("double") / avgdl))
    )
    partial = F.round(idf * tf_norm * scale).cast("long")
    return (
        joined.withColumn("__p", partial)
        .groupBy(id_col)
        .agg(F.sum("__p").cast("long").alias("score_micro"))
    )


def dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens) — maximal runs of
    tokens (0-based inclusive positions) that appear verbatim in at
    least ``min_docs`` DISTINCT documents — the exact-substring
    training-data dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): boilerplate headers,
    license blocks, and quoted passages surface as spans to cut, where
    whole-document Jaccard sees only mildly-similar docs.

    Mechanics: every n-gram is keyed by its md5 digest (the shuffle
    carries 32-byte digests, not 10-token strings), grams occurring in
    >= min_docs distinct docs mark their start positions, and each
    doc's marked positions fold into maximal spans via the
    gaps-and-islands interval union (``intervals.merge_intervals`` on
    half-open [pos, pos+n) ranges, so overlapping AND abutting runs
    merge).  A phrase repeated only WITHIN one document does not
    qualify (that is ``repetition_ratio``'s job) — the distinct-doc
    count is the cross-document contract.

    Shape at 100 TB: one combinable distinct-doc count per digest, one
    digest-keyed join back, one doc-keyed window — the same three
    shuffles as tf-idf, all on narrow keys.  Stopword-ish common grams
    are exactly the signal here, so there is no fan-out hazard: the
    join is doc-side, never gram-pair-side.
    """
    toked = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tok")
    )
    grams = toked.select(
        F.col(id_col),
        F.posexplode(word_ngrams(F.col("__tok"), n)).alias("pos", "__g"),
    ).select(F.col(id_col), "pos", F.md5("__g").alias("__d"))
    dup = (
        grams.groupBy("__d")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__d")
    )
    hits = grams.join(dup, "__d").select(
        F.col(id_col), F.col("pos").cast("long").alias("pos")
    )
    from netflix_data_ingestion_spark.operators.intervals import (
        merge_intervals,
    )

    spans = merge_intervals(
        hits.withColumn("__e", F.col("pos") + F.lit(n)), [id_col], "pos", "__e"
    )
    return spans.select(
        F.col(id_col),
        F.col("period_start").cast("long").alias("span_start"),
        (F.col("period_end") - 1).cast("long").alias("span_end"),
        (F.col("period_end") - F.col("period_start"))
        .cast("long")
        .alias("span_tokens"),
    )


def remove_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, clean_text, n_tokens_removed) — the curation ACTION for
    ``dup_spans``: every cross-document duplicated run is cut and the
    survivors rejoined, per Lee et al. 2022's span-cut (not whole-doc
    drop) policy — a doc quoting one boilerplate license keeps its
    original prose.  ``clean_text`` is the TOKENIZED reconstruction
    (lowercased, punctuation folded to single spaces — the same
    canonical form every dedup operator here keys on), not the raw
    input with holes.

    Plan: span ranges explode to exact covered positions (total rows
    bounded by corpus tokens), one equi ANTI join kills covered
    tokens — no inequality join, no nested loop — then a per-doc
    ordered rejoin.  Docs with nothing removed pass through; docs cut
    to nothing yield an empty string (and their token count as
    ``n_tokens_removed``).
    """
    spans = dup_spans(df, id_col, text_col, n=n, min_docs=min_docs)
    toked = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tok")
    )
    base = toked.select(
        F.col(id_col), F.size("__tok").cast("long").alias("__orig_n")
    )
    tpos = toked.select(
        F.col(id_col), F.posexplode("__tok").alias("pos", "__t")
    ).select(F.col(id_col), F.col("pos").cast("long").alias("pos"), "__t")
    cover = spans.select(
        F.col(id_col),
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    )
    kept = tpos.join(cover, [id_col, "pos"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("__t")))
                ),
                lambda s: s["__t"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("long").alias("__kept_n"),
    )
    return base.join(clean, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        (F.col("__orig_n") - F.coalesce(F.col("__kept_n"), F.lit(0)))
        .cast("long")
        .alias("n_tokens_removed"),
    )
