"""Deduplication operators — beyond-reference (BASELINE.json north star).

The reference's only dedup is union+distinct over customer ids
(etl_pipeline_spark.py:988-994).  A training-data pipeline needs document
dedup at corpus scale; this module provides the standard ladder:

- exact dedup          hash-groupBy (one shuffle on the digest)
- n-gram Jaccard       shingle self-join — exact pairwise, quadratic in
                       docs sharing a shingle; the verification stage
- MinHash + LSH        the scale path: per-doc signatures via min-hashing,
                       banding, bucket self-join — candidate generation is
                       linear in corpus size + bucket-local joins
- SimHash              64-bit fingerprints for hamming-style near-dup

Determinism discipline: every hash is ``md5`` over explicit strings, so
an external SQL engine (the DuckDB oracle) reproduces results bit-for-bit
— no engine-specific hash functions (Spark's ``hash()``/``xxhash64`` are
murmur-based and unportable).  A minhash here is the lexicographic MIN of
``md5(seed || '|' || shingle)`` hex strings — md5 is uniform, so the hex
min is a valid minwise sample.

Scale notes (100 TB posture):
- shingle explosion is a flatMap (narrow); the only shuffles are the
  groupBys on (doc, seed) / (band, band_key) — both key-partitioned and
  combinable map-side;
- LSH bucket joins are self-joins on band_key: bounded by bucket size,
  resistant to corpus growth (tune bands/rows to the target similarity);
- the exact Jaccard verifier should only run on LSH candidates at scale
  (compose: lsh_candidate_pairs -> join shingle sets); the standalone
  all-pairs form here is the small-corpus / correctness baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism

HEX = "0123456789abcdef"


def tokens(text: Column) -> Column:
    """Lowercase word tokens, empty strings removed (portable regex)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def bind_once(expr: Column, build) -> Column:
    """Evaluate ``expr`` ONCE per row and pass it to ``build`` as a bound
    lambda variable.

    A higher-order-function lambda re-evaluates any OUTER expression it
    captures once PER ELEMENT, so an expression like ``tokens(text)``
    referenced inside a per-element lambda is re-tokenized for every
    element — O(G) regex splits per row instead of 1 (measured 13-20x on
    sf0.1 documents).  Wrapping it in a single-element ``transform``
    let-binds it: the bound variable is a plain attribute inside
    ``build``'s lambdas.  Costs one 1-element array per row.
    """
    return F.element_at(F.transform(F.array(expr), build), 1)


def attach_pair_arrays(cand: DataFrame, arrs: DataFrame) -> DataFrame:
    """(id_a, id_b, arr_a, arr_b) — attach a per-id array payload to both
    sides of a candidate pair frame with two plain equi-joins against ONE
    (jid, sh_arr) payload frame.

    ``arrs`` MUST be pinned (localCheckpoint) — or derive from a pinned
    frame — when its projection is expensive: a lazy frame referenced by
    both joins plans its subtree twice.  Against a pinned frame the two
    joins are rescans, and this shape beats the former explode-to-long +
    min_by/max_by regroup, which paid a Sort plus two SortAggregates
    carrying the full arrays per pair just to undo its own explode
    (guide §2.4; measured on dedup_prefix_jaccard / dedup_containment /
    dedup_clusters at sf0.1 — see OPTIMIZATION_r12.md).
    """
    a = arrs.select(F.col("jid").alias("id_a"), F.col("sh_arr").alias("arr_a"))
    b = arrs.select(F.col("jid").alias("id_b"), F.col("sh_arr").alias("arr_b"))
    return cand.join(a, "id_a").join(b, "id_b")


def pair_overlap_stats(paired: DataFrame) -> DataFrame:
    """(id_a, id_b, __v struct<i, sa, sb, u>) — per-pair intersection
    size, side sizes and union size, with ``array_intersect`` evaluated
    EXACTLY ONCE per pair.

    The naive filter-then-project form re-evaluates the intersection 3-4x
    per pair (CollapseProject substitution into the threshold filter and
    again into the score projection).  Here the intersection is let-bound
    (``bind_once``) inside one struct behind an ``explode(array(...))``
    Generate: the Generate is a projection barrier, so downstream
    filters/projections referencing ``__v`` fields stay above it
    (the doc_repetition_ratio pattern, guide §1.2/§7.2).
    """
    inter = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
    sa = F.size("arr_a").cast("long")
    sb = F.size("arr_b").cast("long")
    st = bind_once(
        inter,
        lambda i: F.struct(
            i.alias("i"),
            sa.alias("sa"),
            sb.alias("sb"),
            (sa + sb - i).alias("u"),
        ),
    )
    return paired.select(
        "id_a", "id_b", F.explode(F.array(st)).alias("__v")
    )


def word_ngrams(tok: Column, n: int) -> Column:
    """ALL word n-grams (space-joined, duplicates kept) from a token array.

    ``tok`` is let-bound (see ``bind_once``) so an inline ``tokens(text)``
    argument is evaluated once per row, not once per gram.
    """

    def from_bound(t: Column) -> Column:
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tok, from_bound)


def bigram_pairs(tok: Column) -> Column:
    """Adjacent token pairs as array<struct<w1,w2>> (duplicates kept).

    Shared by the bigram-LM builders (textstats.cooccur / lm.perplexity);
    ``tok`` is let-bound (see ``bind_once``) because the per-pair lambda
    references it twice per element.
    """

    def from_bound(t: Column) -> Column:
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    return bind_once(tok, from_bound)


def shingles(tok: Column, n: int) -> Column:
    """Distinct word n-gram shingles (space-joined) from a token array."""
    return F.array_distinct(word_ngrams(tok, n))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Assign each row to its exact-duplicate group.

    Returns (id, content_hash, canonical_id, group_size): canonical is the
    min id sharing the md5 digest.  One shuffle on the digest.
    """
    hashed = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    groups = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("group_size"),
    )
    return hashed.join(groups, "content_hash").select(
        id_col, "content_hash", "canonical_id", "group_size"
    )


def shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, shingle) — exploded distinct n-gram shingles per doc.

    ``tokens_col`` names a PRE-TOKENIZED array column to shingle from
    (guide §2.4 shared subtrees: a caller that already pinned one token
    frame — curate_corpus — feeds every consumer from it instead of
    re-running the tokenizer); ``tokens(text_col)`` otherwise.  The
    token definition is identical either way, so results are unchanged.
    """
    df = ensure_parallelism(df)
    tok = F.col(tokens_col) if tokens_col else tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.explode(shingles(tok, n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard similarity >= threshold.

    Self-join on shingle -> intersection counts; Jaccard from per-doc
    distinct-shingle sizes.  All-pairs exact form (baseline); at corpus
    scale run it only on LSH candidates.
    """
    # NOTE two Catalyst traps shaped this plan, measured at sf0.1:
    # (1) putting size(sh_arr) in the same projection as explode(sh_arr)
    #     collapses into the Generate operator and re-evaluates the whole
    #     shingle expression PER EXPLODED ROW (~150x per doc: 0.7s -> 7s);
    #     sizes therefore come from a separate narrow projection joined
    #     back by id (5k-row broadcast build, cheap);
    # (2) the exploded side looks tiny to the size estimator (source
    #     parquet bytes), so Catalyst broadcast-hashes 260k exploded rows
    #     through the driver — the shuffle_hash hint keeps the pair join
    #     executor-side.
    sh = shingle_table(df, id_col, text_col, n)
    # ensure_parallelism matters here too: this narrow projection pays the
    # full interpreted shingle evaluation per row (~1ms/doc) and the
    # testdata parquet arrives as ONE partition
    sizes = ensure_parallelism(df).select(
        F.col(id_col),
        F.size(shingles(tokens(F.col(text_col)), n))
        .cast("long")
        .alias("n_shingles"),
    ).filter(F.col("n_shingles") > 0)
    # pin before the self-join: the shingle explode would otherwise run
    # once per side (audit twin, but no reason to pay 2x)
    sh = sh.join(F.broadcast(sizes), id_col).localCheckpoint(eager=True)

    # LENGTH FILTER inside the pair join: jaccard >= t forces
    # min(|A|,|B|) >= t * max(|A|,|B|), so size-incompatible pairs are
    # pruned before the pair shuffle (the standard similarity-join
    # prefilter; at corpus scale it also tempers hot-shingle skew)
    a = sh.alias("a")
    b = sh.hint("shuffle_hash").alias("b")
    thr = F.lit(float(threshold))
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.n_shingles") >= thr * F.col("b.n_shingles"))
            & (F.col("b.n_shingles") >= thr * F.col("a.n_shingles")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.count("*").alias("intersection"),
            F.first("a.n_shingles").alias("size_a"),
            F.first("b.n_shingles").alias("size_b"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "intersection", "jaccard")
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, band, band_key) — LSH banding of md5-minhash signatures.

    Hash family: md5(seed || '|' || shingle) split into 4 independent
    8-hex-char chunks — md5's avalanche makes the chunks independent
    uniform hashes, so ONE md5 per (seed, shingle) yields up to FOUR
    minhash functions (4x less hashing than one md5 per hash function).
    Band b's key is the md5 of its rows_per_band chunk-minima; bands
    needing more than 4 rows draw extra chunks from md5('seed#j|' ||
    shingle) continuations (the default 16/4 layout — one md5, four
    chunks per band — is unchanged, and the SQL oracle mirrors it).

    ``num_hashes`` must divide evenly into ``bands`` rows-per-band.
    """
    rows_per_band = num_hashes // bands
    if num_hashes % bands or rows_per_band < 1:
        raise ValueError("num_hashes must be a positive multiple of bands")
    sh = shingle_table(df, id_col, text_col, n, tokens_col=tokens_col)
    # all (band x chunk) minima as aggregation expressions over the
    # shingle rows directly — the seed explode would put `bands` copies
    # of every shingle row through the shuffle to reach the same minima;
    # md5 count is identical, shuffle volume is 1/bands
    aggs = []
    for seed in range(bands):
        for c in range(rows_per_band):
            j, chunk = divmod(c, 4)
            tag = f"{seed}|" if j == 0 else f"{seed}#{j}|"
            h = F.md5(F.concat(F.lit(tag), F.col("shingle")))
            aggs.append(
                F.min(F.substring(h, 1 + 8 * chunk, 8)).alias(f"m_{seed}_{c}")
            )
    mins = sh.groupBy(id_col).agg(*aggs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(seed).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[f"m_{seed}_{c}" for c in range(rows_per_band)]
                    )
                ).alias("band_key"),
            )
            for seed in range(bands)
        ]
    )
    return mins.select(
        F.col(id_col), F.explode(band_structs).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """Distinct candidate near-dup pairs: docs sharing >= 1 LSH band
    bucket.  The band table (shingling + num_hashes min-hashes — the
    expensive projection) is PINNED before the self-join: a self-join
    on a lazy frame plans its subtree once per side, running the
    minhash pass twice."""
    bt = minhash_band_table(
        df, id_col, text_col, n, num_hashes, bands, tokens_col=tokens_col
    ).localCheckpoint(eager=True)
    a = bt.alias("a")
    b = bt.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per doc, returned as a 16-char hex string.

    Token hash = first 16 hex chars of md5(token) (64 bits); contributions
    are weighted by token frequency.  Bit j of output digit i is the sign
    of the weighted sum of bit j of digit i across token hashes.  Pure
    integer arithmetic over hex-digit values -> portable to any SQL engine.
    """
    tok = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    # r12 (guide §2.4 — remove shuffles outright): frequency weighting
    # needs NO distinct-token count pass — Σ_distinct cnt·(2bit−1) is
    # identically Σ_instances (2bit−1), so the former
    # groupBy(id, token).count() exchange is gone and md5 runs per
    # token instance straight into the one remaining aggregation.
    #
    # r13 digit extraction (guide §1.2 per-task work): parse the 16 hex
    # chars into TWO 32-bit words with conv() — 2 string parses per row
    # instead of 16 substring+instr lookups; every digit is then an
    # integer shift+mask of a word.  conv of 8 lowercase hex chars is
    # exact (< 2^32 fits a long), so digit values are identical.
    hashed = tok.select(F.col(id_col), F.md5("token").alias("h"))
    words = hashed.select(
        F.col(id_col),
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long").alias("w1"),
        F.conv(F.substring("h", 9, 8), 16, 10).cast("long").alias("w2"),
    )

    def digit(i: int) -> Column:
        # hex digit i (1-based, most-significant first) of the 16-char
        # prefix: digits 1-8 live in w1, 9-16 in w2
        w, off = ("w1", (8 - i) * 4) if i <= 8 else ("w2", (16 - i) * 4)
        return F.shiftright(F.col(w), off).bitwiseAND(F.lit(15))

    # all 64 bit-sums as aggregation expressions over the token
    # instance rows directly — the naive form explodes 16 digit
    # positions per token (16x the shuffle) to reach the same sums;
    # integer sums are order-independent, so results (and the SQL
    # oracle) are unchanged.  Bit extraction is an integer shift+mask —
    # identical to floor(d / 2^j) % 2 for the non-negative digit
    # values, without the double division the floor form pays per row
    # per expression.
    #
    # r13 packing (guide §1.2): TWO bit-sums ride in ONE long aggregate
    # — bit j+2's running sum in the high 32 bits, bit j's in the low
    # 32 (no carry can cross the boundary while the per-doc instance
    # count stays below 2^31, i.e. any document under two billion
    # tokens).  Σ_instances(2·bit−1) = 2·Σbit − n, so each sign test
    # becomes 2·field > n against the one extra count — 32 aggregate
    # children + count instead of 64, and the agg buffer halves.
    def packed_sum(i: int, j: int) -> Column:
        d = digit(i)
        hi_bit = F.shiftright(d, j + 2).bitwiseAND(F.lit(1)).cast("long")
        lo_bit = F.shiftright(d, j).bitwiseAND(F.lit(1)).cast("long")
        return F.sum(F.shiftleft(hi_bit, 32) + lo_bit).alias(f"p_{i}_{j}")

    sums = words.groupBy(id_col).agg(
        *[packed_sum(i, j) for i in range(1, 17) for j in (0, 1)],
        F.count(F.lit(1)).alias("__n"),
    )

    def digit_char(i: int) -> Column:
        # field layout: p_i_0 = (Σbit2 << 32) + Σbit0, p_i_1 likewise
        # for bits 3/1; sign of Σ(2·bit−1) is 2·Σbit > n
        n = F.col("__n")
        mask = F.lit(4294967295)  # 2^32 - 1
        b0 = 2 * F.col(f"p_{i}_0").bitwiseAND(mask) > n
        b2 = 2 * F.shiftright(F.col(f"p_{i}_0"), 32) > n
        b1 = 2 * F.col(f"p_{i}_1").bitwiseAND(mask) > n
        b3 = 2 * F.shiftright(F.col(f"p_{i}_1"), 32) > n
        v = (
            b3.cast("int") * 8
            + b2.cast("int") * 4
            + b1.cast("int") * 2
            + b0.cast("int")
        )
        return F.substring(F.lit(HEX), 1, 16).substr(v + 1, F.lit(1))

    return sums.select(
        F.col(id_col),
        F.concat(*[digit_char(i) for i in range(1, 17)]).alias("simhash64"),
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """(id_a, id_b, cosine_sim) — embedding near-dup pairs above `threshold`.

    Exact all-pairs cosine over an ``array<float>`` embedding column: the
    semantic-dedup analog of `ngram_jaccard_pairs` (the reference has no
    embedding surface; beyond-reference north star).

    Execution is a block matrix product, the shape that survives scale:
    the corpus matrix is shipped to every task like the build side of a
    broadcast join; each task scores its Arrow batch of rows against the
    whole matrix in numpy.  The accumulation is DIM-SEQUENTIAL
    (``acc += outer(A[:, i], M[:, i])`` for i in 0..dim), so every pair's
    dot product has the exact left-associative order of the scalar fold —
    bit-identical to the SQL oracle, unlike a BLAS matmul which reorders
    the summation.  Raw (unrounded) cosines leave Python with 1e-6 slack
    below the threshold; ROUND-then-compare happens JVM-side so the final
    cut uses Spark's exact HALF_UP semantics, matching the oracle.

    Scale path: the broadcast side must fit in task memory (~1e6 x 1e3
    dims = 4 GB ceiling).  This is the AUDIT twin (exact all-pairs, small
    corpora); the production path is `cosine_near_dup_pairs_at_scale`
    below — multi-table LSH candidates + JVM-side verify, no driver
    collect — exactly mirroring the Jaccard/MinHash split.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    spark = df.sparkSession
    pdf = df.select(id_col, vec_col).toPandas()
    ids_all = pdf[id_col].to_numpy()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    n, d = M.shape
    # dim-sequential norms (same fold order as functions.vectors.norm)
    sq = np.zeros(n)
    for i in range(d):
        sq += M[:, i] * M[:, i]
    nrm_all = np.sqrt(sq)
    bc = spark.sparkContext.broadcast((ids_all, M, nrm_all))
    slack = float(threshold) - 1e-6

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_m, b_nrm = bc.value
        for pin in batches:
            a_ids = pin[id_col].to_numpy()
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pin[vec_col]])
            acc = np.zeros((len(a_ids), len(b_ids)))
            for i in range(A.shape[1]):
                acc += np.outer(A[:, i], b_m[:, i])
            asq = np.zeros(len(a_ids))
            for i in range(A.shape[1]):
                asq += A[:, i] * A[:, i]
            cos = acc / np.outer(np.sqrt(asq), b_nrm)
            keep = (a_ids[:, None] < b_ids[None, :]) & (cos >= slack)
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": b_ids[bj],
                    "raw_cos": cos[ai, bj],
                }
            )

    out_schema = (
        f"id_a {df.schema[id_col].dataType.simpleString()}, "
        f"id_b {df.schema[id_col].dataType.simpleString()}, raw_cos double"
    )
    return (
        ensure_parallelism(df.select(id_col, vec_col))
        .mapInPandas(score, out_schema)
        .withColumn("cosine_sim", F.round(F.col("raw_cos"), 6))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine_sim")
    )


def cosine_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs sharing a random-hyperplane LSH bucket in
    >= 1 of `tables` independent hash tables (OR-amplification).

    One hyperplane table alone has recall (1-θ/π)^planes per pair — ~4%
    at cosine 0.5 with 8 planes — useless for dedup; OR-ing `tables`
    independent tables amplifies to 1-(1-p)^tables (~52% at cosine 0.5
    with 6x8; push planes up / tables up for tighter thresholds or
    bigger corpora — 2^planes is the bucket count, so planes must grow
    with log(n) to keep bucket-local joins bounded).

    Plan shape: ONE pass computes all `tables` buckets per row — with
    ``dim`` given, a vectorized Arrow batch stage
    (similarity.bucket_table_batch: the tables×planes interpreted JVM
    folds measured 2.6 ms/row at 48×64 and dominated the candidate
    stage; the batch fold is dim-sequential, so buckets are
    bit-identical — guide §4.2); without ``dim``, the narrow
    array-of-structs projection (no scalar expressions beside the
    explode, dodging the Generate double-eval trap).  Then a
    bucket-local self-join on (table, bucket).  Shuffle carries only
    (id, table, bucket) rows — never the vectors.
    """
    from netflix_data_ingestion_spark.operators import similarity

    if dim is not None:
        bt = similarity.bucket_table_batch(
            ensure_parallelism(df), id_col, vec_col, planes, tables, dim
        ).localCheckpoint(eager=True)  # once, not per join side
    else:
        table_structs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    similarity.bucket_expr(
                        F.col(vec_col), planes, dim, plane_offset=t * planes
                    ).alias("bucket"),
                )
                for t in range(tables)
            ]
        )
        bt = (
            ensure_parallelism(df)
            .select(F.col(id_col), F.explode(table_structs).alias("tb"))
            .select(
                id_col,
                F.col("tb.tbl").alias("tbl"),
                F.col("tb.bucket").alias("bucket"),
            )
            .filter(F.col("bucket").isNotNull())
        ).localCheckpoint(eager=True)  # hyperplane folds x tables: once, not per join side
    a = bt.alias("a")
    b = bt.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def cosine_near_dup_pairs_at_scale(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    planes: int = 6,
    tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """The production semantic-dedup path: multi-table LSH candidate
    generation -> exact cosine verification on candidates only.

    Same output schema as `cosine_near_dup_pairs` (the all-pairs audit
    twin), but nothing ever funnels through the driver: buckets are a
    narrow projection, the candidate join shuffles ids only, and the
    verify stage joins the embeddings back and scores each Arrow batch
    of candidate pairs vectorized in numpy — whole plan is
    scan -> narrow map -> key-partitioned joins -> mapInPandas, the only
    shape that survives a 100 TB embedding corpus.  Recall is the
    OR-amplified LSH probability (see `cosine_lsh_candidate_pairs`);
    the all-pairs twin is the audit tool.

    Scoring parity: accumulation is DIM-SEQUENTIAL
    (``acc += A[:, d] * B[:, d]``), the exact left-associative order of
    the scalar fold, so cosines are bit-identical to the JVM expression
    and the SQL oracle (a BLAS matmul would reorder the summation); the
    ROUND-then-threshold cut stays JVM-side for HALF_UP parity.  An
    interpreted-HOF JVM cosine here measured ~4x slower at sf0.1 (the
    candidate set is ~1M pairs; per-pair fold cost dominates).
    """
    cand = cosine_lsh_candidate_pairs(
        df, id_col, vec_col, planes, tables, dim
    )
    return exact_cosine_on_pairs(df, cand, id_col, vec_col, threshold)


def exact_cosine_on_pairs(
    df: DataFrame,
    cand: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Exact cosine verify of an (id_a, id_b) candidate frame — the
    shared tail of every candidates-then-verify semantic dedup path
    (LSH candidates, k-means cluster candidates).  Joins the embeddings
    back onto the pairs and scores each Arrow batch vectorized, with
    the dim-sequential fold + JVM-side ROUND documented in
    `cosine_near_dup_pairs_at_scale`."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pairs = cand.join(a, "id_a").join(b, "id_b")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pin in batches:
            if len(pin) == 0:
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pin["vec_a"]])
            B = np.stack([np.asarray(v, dtype=np.float64) for v in pin["vec_b"]])
            acc = np.zeros(len(pin))
            na = np.zeros(len(pin))
            nb = np.zeros(len(pin))
            for d in range(A.shape[1]):
                acc += A[:, d] * B[:, d]
                na += A[:, d] * A[:, d]
                nb += B[:, d] * B[:, d]
            yield pd.DataFrame(
                {
                    "id_a": pin["id_a"],
                    "id_b": pin["id_b"],
                    "raw_cos": acc / (np.sqrt(na) * np.sqrt(nb)),
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return (
        pairs.mapInPandas(score, f"id_a {id_t}, id_b {id_t}, raw_cos double")
        .withColumn("cosine_sim", F.round(F.col("raw_cos"), 6))
        .filter(F.col("cosine_sim") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine_sim")
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): k-means as the
    candidate generator — embeddings are clustered, and ONLY
    within-cluster pairs are cosine-verified.

    vs the hyperplane-LSH path (`cosine_near_dup_pairs_at_scale`):
    k-means buckets adapt to the data's density (LSH planes are
    data-blind), which is why SemDeDup is the published choice for
    web-scale embedding dedup.  Cost: per-cluster all-pairs is
    (n/k)^2 — k MUST grow with n (the paper uses tens of thousands of
    clusters for billions of docs); recall is bounded by the
    clustering (near-dups straddling a cluster boundary are missed,
    exactly the trade the paper accepts).

    Everything downstream of the (already bit-exact, oracle-proven)
    `kmeans_train` is the shared exact verify — deterministic end to
    end.
    """
    from netflix_data_ingestion_spark.operators.kmeans import kmeans_train

    # the returned assignment is a narrow pass whose distance expression
    # carries k codeword folds per row — pin the (id, cluster) frame so
    # the two sides of the within-cluster join don't each re-run it
    asg = kmeans_train(df, id_col, vec_col, k=k, iters=iters).select(
        id_col, "cluster_id"
    ).localCheckpoint(eager=True)
    a = asg.select(F.col(id_col).alias("id_a"), "cluster_id")
    b = asg.select(F.col(id_col).alias("id_b"), "cluster_id")
    cand = (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return exact_cosine_on_pairs(df, cand, id_col, vec_col, threshold)


def near_dup_pairs_at_scale(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """The composed corpus-scale near-dup pipeline: MinHash-LSH candidate
    generation -> exact Jaccard verification on candidates only.

    Same output schema as `ngram_jaccard_pairs`, but the exact scorer
    touches O(candidates) pairs instead of O(docs sharing a shingle)² —
    the only shape that survives a 100 TB corpus.  Recall is the LSH
    band probability 1-(1-J^r)^b (≈0.999998 at J=0.99 with 4x4), so a
    vanishing fraction of true pairs can be missed; the all-pairs form
    is the audit tool, this is the production path.

    Verification joins the candidates back to per-doc DISTINCT shingle
    arrays and intersects them per pair (`array_intersect` — no shingle
    explosion in the verify stage at all).

    Verify-stage shape: the shingle-array projection is the expensive
    part (interpreted HOF, ~1ms/doc), so it must be evaluated ONCE — it
    is pinned (eager localCheckpoint), then the pairs take the arrays
    with two plain equi-joins against the pinned frame
    (``attach_pair_arrays``) and score each pair's intersection exactly
    once behind a Generate barrier (``pair_overlap_stats``).  The former
    explode-to-long + min_by/max_by regroup also evaluated the
    projection once, but paid a Sort + two SortAggregates carrying the
    full shingle arrays per pair, and re-evaluated ``array_intersect``
    3x per pair in the threshold filter + score projection (guide
    §2.4/§1.2; measured at sf0.1 — OPTIMIZATION_r12.md).
    """
    # pin the (small) pair list so it can seed the id prefilter below
    # without re-running the band self-join
    cand = minhash_lsh_candidate_pairs(
        df, id_col, text_col, n, num_hashes, bands, tokens_col=tokens_col
    ).localCheckpoint(eager=True)
    # guide §8: decide with small rows first — the expensive shingle
    # projection runs ONLY for docs that appear in a candidate pair
    # (semi-join prefilter), not for the whole corpus; at 100 TB the
    # verify side is the near-dup subset, not the corpus
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    arr_tok = F.col(tokens_col) if tokens_col else tokens(F.col(text_col))
    arrs = (
        ensure_parallelism(df)
        .join(ids, id_col, "semi")
        .select(
            F.col(id_col).alias("jid"),
            shingles(arr_tok, n).alias("sh_arr"),
        )
        .localCheckpoint(eager=True)
    )
    scored = pair_overlap_stats(attach_pair_arrays(cand, arrs))
    return (
        scored.select(
            "id_a",
            "id_b",
            F.col("__v.i").alias("intersection"),
            (F.col("__v.i") / F.col("__v.u")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "intersection", "jaccard")
    )


def incremental_near_dup_candidates(
    new_docs: DataFrame,
    band_snapshot: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Incremental corpus dedup — the daily-ingest shape: band the NEW
    batch only, probe it against the persisted band table of everything
    already ingested, and return

      (candidate pairs touching the new batch, the updated snapshot).

    Pairs cover new-vs-old AND new-vs-new (a fresh batch can contain
    its own duplicates); old-vs-old pairs were reported when those
    batches arrived — nothing is recomputed over the historical corpus,
    which is the entire point: per-day cost is O(batch x bands), not
    O(corpus).  Because the md5 minhash family is deterministic, the
    result equals the full-corpus ``minhash_lsh_candidate_pairs``
    restricted to pairs with a new-batch member (asserted by test) —
    the incremental path inherits the batch path's oracle.

    The snapshot is a plain (id, band, band_key) DataFrame — persist it
    partitioned/bucketed by (band, band_key) so tomorrow's probe join
    is co-located; union'd snapshots stay valid because banding is
    per-document.
    """
    new_bands = minhash_band_table(
        new_docs, id_col, text_col, n, num_hashes, bands
    ).localCheckpoint(eager=True)  # probe side AND part of the union side
    a = new_bands.alias("a")
    b = band_snapshot.union(new_bands).alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias(
                "id_b"
            ),
        )
        .distinct()
    )
    return pairs, band_snapshot.union(new_bands)


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_df: int = 5,
) -> DataFrame:
    """(id_a, id_b, intersection, containment) — ASYMMETRIC near-dup:
    containment C = |A∩B| / min(|A|, |B|) >= threshold.  Catches the
    short-doc-inside-long-doc duplicates (quoted articles, chunked
    re-posts) that symmetric Jaccard structurally misses: a 100-shingle
    doc embedded in a 10,000-shingle doc has J ≈ 0.01 but C = 1.0.

    Candidates come from RARE-shingle blocking (the inverted-index
    counterpart of MinHash banding): only shingles with document
    frequency in [2, max_df] generate pairs, so per-shingle fan-out is
    capped at max_df² and boilerplate shingles (the quadratic hazard)
    never join.  Recall: a truly contained doc shares ALL its shingles
    with its container, so it is found unless EVERY one of its
    shingles is high-frequency boilerplate — the standard blocking
    blind spot, owned here (such docs are better handled by
    linededup.remove_common_segments first).

    Shape at 100 TB: shingle df-count is one combinable shuffle; the
    blocked self-join runs per rare-shingle group (bounded by max_df);
    verification attaches the pinned per-doc arrays with two equi-joins
    and intersects once per pair behind a Generate barrier
    (``attach_pair_arrays`` / ``pair_overlap_stats``).
    """
    # sh feeds the df-count agg AND both sides of the blocked self-join
    # — pin it or the shingle explode runs three times
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=True)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("shingle")
    )
    # pin the blocked rows: the self-join's two sides carry slightly
    # different null filters, which defeats exchange reuse — a lazy
    # `blocked` re-ran the full df-count aggregation subtree once PER
    # SIDE (two HashAggregate+Exchange trees in the captured plan,
    # guide §2.4 — the lineitem_bloom_semi lesson)
    blocked = sh.join(rare, "shingle").localCheckpoint(eager=True)
    # pinned: the pair list seeds the id prefilter below
    cand = (
        blocked.alias("a")
        .join(blocked.alias("b"), "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # guide §8: the expensive shingle projection runs ONLY for docs in a
    # candidate pair (semi-join prefilter), never the whole corpus
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    arr_tok = F.col(tokens_col) if tokens_col else tokens(F.col(text_col))
    arrs = (
        ensure_parallelism(df)
        .join(ids, id_col, "semi")
        .select(
            F.col(id_col).alias("jid"),
            shingles(arr_tok, n).alias("sh_arr"),
        )
        .localCheckpoint(eager=True)
    )
    scored = pair_overlap_stats(attach_pair_arrays(cand, arrs))
    return (
        scored.select(
            "id_a",
            "id_b",
            F.col("__v.i").alias("intersection"),
            (F.col("__v.i") / F.least("__v.sa", "__v.sb")).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "intersection", "containment")
    )


def canonical_text(text: Column) -> Column:
    """Canonical form for dedup keys: lowercase, punctuation stripped
    to spaces, whitespace runs collapsed, trimmed — so case/punct/
    spacing variants of the same content share one md5 digest.  ASCII
    regex only (Java==RE2==PCRE portable), same class as tokens()."""
    collapsed = F.regexp_replace(
        F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "), " +", " "
    )
    return F.trim(collapsed)


def exact_dedup_canonical(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """`exact_dedup` on the canonicalized text: groups byte-different
    but content-identical variants ("Hello, World!" == "hello world").
    Same one-digest-shuffle plan; the normalization is a narrow map.
    """
    canon = df.select(
        F.col(id_col), canonical_text(F.col(text_col)).alias("__canon")
    )
    return exact_dedup(canon, id_col, "__canon")


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) — document pairs whose 64-bit SimHash
    fingerprints differ in at most ``max_hamming`` bits, found with the
    BLOCK-PERMUTATION trick (Manku, Jain & Sarma, WWW'07): the hex
    fingerprint splits into 4 x 16-bit blocks; by pigeonhole, any pair
    within Hamming distance 3 agrees EXACTLY on at least one block, so
    candidates come from 4 equi-joins on (block_idx, block_value) —
    never an all-pairs scan — and max_hamming <= 3 keeps that guarantee
    (4 blocks tolerate up to 3 differing bits).  Verification is the
    exact Hamming distance: per hex digit, bit_count of the XOR of the
    two digit values, summed — pure integer ops both engines replay.

    Completes the SimHash pipeline (fingerprint -> near-dup JOIN); the
    complementary MinHash path catches n-gram-set overlap while SimHash
    catches weighted-token-profile proximity.  At 100 TB: fingerprints
    checkpoint once (referenced by both join sides), the block join
    fans out per 16-bit-block collision group, and the verify touches
    candidates only.
    """
    sh = simhash(df, id_col, text_col).localCheckpoint(eager=True)
    return hamming_pairs_64(sh, id_col, "simhash64", max_hamming)


def hamming_pairs_64(
    fps: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs of 64-bit hex fingerprints within
    ``max_hamming`` bits, via the 4-block pigeonhole join (see
    ``simhash_near_dup_pairs``, which this generalizes).  Works for ANY
    64-bit fingerprint family — SimHash over text, perceptual hashes
    over images — because the block-permutation recall guarantee is a
    property of the JOIN, not of how the bits were made.  Input rows:
    one (id, 16-hex-char hash) per item; the frame should already be
    pinned if its derivation is expensive.
    """
    if max_hamming > 3:
        raise ValueError(
            "4-block pigeonhole guarantees recall only for max_hamming <= 3"
        )
    blocks = fps.select(
        F.col(id_col),
        F.col(hash_col).alias("__h64"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("bidx"),
                        F.substring(hash_col, b * 4 + 1, 4).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bl"),
    ).select(
        id_col, "__h64", F.col("bl.bidx").alias("bidx"), F.col("bl.bval").alias("bval")
    )
    a = blocks.select(
        F.col(id_col).alias("id_a"),
        F.col("__h64").alias("sh_a"),
        "bidx",
        "bval",
    )
    b = blocks.select(
        F.col(id_col).alias("id_b"),
        F.col("__h64").alias("sh_b"),
        "bidx",
        "bval",
    )
    cand = (
        a.join(b, ["bidx", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "sh_a", "id_b", "sh_b")
        .distinct()
    )
    # exact Hamming distance via two 32-bit words per side (the simhash
    # conv trick): bit_count of the XOR of word pairs — identical to the
    # per-digit bit_count sum (XOR and popcount distribute over the
    # digit split), with 4 string parses per pair instead of 32
    # substring+instr lookups
    def w(col: str, lo: int) -> Column:
        return F.conv(F.substring(col, lo, 8), 16, 10).cast("long")

    hamming = F.bit_count(
        w("sh_a", 1).bitwiseXOR(w("sh_b", 1))
    ) + F.bit_count(w("sh_a", 9).bitwiseXOR(w("sh_b", 9)))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    t_num: int = 4,
    t_den: int = 5,
) -> DataFrame:
    """(id_a, id_b, intersection, jaccard) — EXACT set-similarity join
    via prefix filtering (the PPJoin family: Chaudhuri et al. ICDE'06,
    Xiao et al. WWW'08).  Same result set as the quadratic
    ``ngram_jaccard_pairs`` audit — provably, not probabilistically —
    at near-LSH cost: the third point in the dedup design space
    (all-pairs = exact+quadratic, MinHash-LSH = cheap+probabilistic,
    prefix filter = exact+cheap).

    The filter: order every document's shingle set by one global total
    order (document frequency ascending, shingle ascending — rarest
    first, which minimizes candidate fan-out) and keep only the first
    ``|x| - ceil(tau * |x|) + 1`` shingles as its *prefix*.  If
    J(A,B) >= tau, then |A∩B| >= ceil(tau * max(|A|,|B|)), and two sets
    whose overlap is that large cannot avoid colliding inside both
    prefixes under ANY shared total order — so joining on prefix
    shingles alone loses no qualifying pair.  A length filter
    (t_num * max(|A|,|B|) <= t_den * min(|A|,|B|), a necessary
    condition for J >= tau) prunes candidates before verification.

    The threshold rides as the exact fraction ``t_num/t_den`` and every
    size comparison is integer arithmetic (``ceil(tau*s)`` is
    ``floor((t_num*s + t_den - 1) / t_den)``), so the boundary
    J == tau is decided identically to the all-pairs oracle — no
    float-epsilon recall hole at the threshold.

    Shape at 100 TB: df-count is one combinable shuffle; the rank join
    and per-doc regroup are one more; the candidate join runs per
    prefix-shingle group, and rarest-first ordering means prefix
    shingles are by construction the LOW-frequency ones — the stopword
    quadratic hazard that kills naive token blocking never joins here.
    Verification reuses the long-format single-projection pattern
    (shingle arrays ride the regroup once, candidates only).
    """
    if not (0 < t_num < t_den):
        raise ValueError("threshold t_num/t_den must be in (0, 1)")
    sh = shingle_table(df, id_col, text_col, n)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    # ordered feeds BOTH the prefix explode and the verify arrays — pin
    # it so the tokenize + df-count + rank-join pipeline runs once (the
    # triangle_counts eager-localCheckpoint discipline)
    ordered = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__ord")
        )
        .select(
            F.col(id_col),
            F.col("__ord.shingle").alias("__sorted"),
        )
        .localCheckpoint(eager=True)
    )
    sz = F.size("__sorted").cast("long")
    # ceil(tau * s) in exact integer arithmetic
    ceil_tau = F.floor((F.lit(t_num) * sz + F.lit(t_den - 1)) / F.lit(t_den))
    prefix = ordered.select(
        F.col(id_col),
        sz.alias("__sz"),
        F.explode(
            F.slice(F.col("__sorted"), F.lit(1), (sz - ceil_tau + 1).cast("int"))
        ).alias("__ptok"),
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("__sz").alias("__sa"), "__ptok"
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("__sz").alias("__sb"), "__ptok"
    )
    cand = (
        a.join(b, "__ptok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.lit(t_num) * F.greatest("__sa", "__sb")
                <= F.lit(t_den) * F.least("__sa", "__sb")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # verify: two equi-joins against the PINNED ordered frame (its arrays
    # are materialized, so a second reference is a cheap rescan — unlike
    # the live-projection case in near_dup_pairs_at_scale, which is why
    # attach_pair_arrays documents the pin requirement), then the
    # intersection/size math evaluated ONCE per pair behind a Generate
    # barrier (guide §2.4/§7.2: the former explode-to-long regroup paid a
    # Sort + two SortAggregates carrying the full shingle arrays, and the
    # filter+projection re-evaluated array_intersect 3x per pair)
    paired = attach_pair_arrays(
        cand, ordered.select(F.col(id_col).alias("jid"), F.col("__sorted").alias("sh_arr"))
    )
    scored = pair_overlap_stats(paired)
    return (
        scored.filter(
            F.lit(t_den) * F.col("__v.i") >= F.lit(t_num) * F.col("__v.u")
        )
        .select(
            "id_a",
            "id_b",
            F.col("__v.i").alias("intersection"),
            (F.col("__v.i") / F.col("__v.u")).alias("jaccard"),
        )
    )
