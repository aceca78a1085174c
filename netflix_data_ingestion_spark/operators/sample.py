"""Deterministic sampling / packing operators — beyond-reference.

Corpus curation at 100 TB needs sampling that is reproducible (re-runs
and engines agree bit-for-bit) and cap semantics that bound any one
source's contribution (the "domain cap" used by large web-corpus
pipelines to stop a few giant hosts dominating the mix).  Everything
here orders by ``md5(salt || '|' || id)`` — a uniform, engine-portable
pseudo-random key (same discipline as operators/split.hash_split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: str = "v1",
) -> DataFrame:
    """At most `cap` rows per group, chosen by deterministic hash order.

    sample_rank = row_number over (group, md5(salt|id) asc, id asc); rows
    with rank <= cap survive.  The hash order makes the kept subset (a)
    uniform within the group, (b) stable across runs and engines, and
    (c) GROWTH-STABLE: adding new rows to a group can only displace
    hash-later rows, never reshuffle the kept set arbitrarily.

    Scale: one shuffle on the group key; within a group the window sorts
    that group's rows.  A pathologically hot group concentrates its sort
    in one task — for that shape, pre-filter with an approximate
    per-group threshold on the hash (two-pass: sample the hash CDF, cut
    at ~cap/|group|) before the exact window; the exact form here is the
    correctness baseline and is fine up to ~10M rows per group.
    """
    hashed = ensure_parallelism(df).withColumn(
        "__qs_h", F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__qs_h").asc(), F.col(id_col).asc()
    )
    return (
        hashed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= cap)
        .drop("__qs_h")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fraction: float,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic PROPORTIONAL sample: each stratum keeps its
    ``ceil(n * fraction)`` hash-first rows (quota_sample's fixed cap
    becomes a per-stratum share, preserving the strata mix — the
    eval-set/ablation sampler, where a cap would crush big strata and
    keep small ones whole).

    Same md5 order as quota_sample, so the kept set is uniform within
    each stratum, engine-reproducible, and growth-stable.  ceil keeps
    every non-empty stratum represented (a fraction of a tiny stratum
    never rounds to zero rows).

    Plan: one shuffle on the stratum key; the per-stratum count rides
    the same window partition (no second aggregation pass).
    """
    hashed = ensure_parallelism(df).withColumn(
        "__ss_h",
        F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("__ss_h").asc(), F.col(id_col).asc()
    )
    n = F.count("*").over(Window.partitionBy(strata_col))
    return (
        hashed.withColumn("sample_rank", F.row_number().over(w))
        .withColumn("__ss_keep", F.ceil(F.lit(float(fraction)) * n))
        .filter(F.col("sample_rank") <= F.col("__ss_keep"))
        .drop("__ss_h", "__ss_keep")
    )


def pack_chunks(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row to a token-budget chunk within its partition
    column: rows are taken in `order_col` order; chunk k covers the rows
    whose RUNNING size starts in [k*budget, (k+1)*budget).

    The sequence-packing primitive for LLM training shards: documents
    stream into fixed-token-budget chunks per source/shard, a document
    that straddles a boundary belongs to the chunk where it STARTS (so
    chunks can overflow by at most one document — the standard
    concatenate-then-split loader contract).

    chunk_id = floor((running_sum - size) / budget) where running_sum is
    the inclusive prefix sum — pure integer window math, bit-identical
    in any engine.  One shuffle on `part_col`; per-partition window sort
    (partitions are shards — bounded by construction, unlike a global
    ORDER BY cumsum which would serialize the corpus through one task).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    size = F.col(size_col).cast("long")
    return (
        ensure_parallelism(df)
        .withColumn("__pc_cum", F.sum(size).over(w))
        .withColumn("__pc_start", F.col("__pc_cum") - size)
        # integer DIV, not floor(double /): beyond 2^53 total tokens the
        # double path drops precision (same hazard as the ns-epoch DIV)
        .withColumn("chunk_id", F.expr(f"__pc_start DIV {int(budget)}"))
        .withColumn("chunk_offset", F.col("__pc_start") % F.lit(int(budget)))
        .drop("__pc_cum", "__pc_start")
    )


def bernoulli_mix(
    df: DataFrame,
    id_col: str,
    rate: Column,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic Bernoulli sampling at a PER-ROW rate — the corpus
    MIXING primitive: pass ``rate`` as a column derived from source /
    quality / language and each row keeps with that probability,
    reproducibly.

    keep  <=>  uniform_hash(id) < rate * 2^32, where the uniform hash is
    the first 8 hex digits of ``md5(salt|id)`` — the same portable
    pseudo-randomness as quota_sample/hash_split, so the kept set is
    identical on any engine, any partitioning, any run, and DISJOINT
    support across salts gives independent draws.  Versus
    ``DataFrame.sample``: Spark's sampler is seeded per-partition, so
    its output changes with the partitioning — useless for reproducible
    corpus mixing.

    Pure narrow map (hash + one double multiply + compare); rate
    boundary semantics: rate<=0 keeps nothing, rate>=1 keeps all.
    """
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.filter(h32.cast("double") < rate * F.lit(4294967296.0))


def pps_systematic_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "v1",
) -> DataFrame:
    """~``k`` rows per group, inclusion probability PROPORTIONAL to the
    integer weight (systematic PPS sampling: long documents must be
    over-sampled when one epoch cannot cover the corpus, or token-level
    coverage skews short).

    Mechanics — exact integer arithmetic end to end, no randomness
    beyond the md5 order:

      1. rows order by md5(salt|id) within the group (uniform,
         growth-perturbation-bounded — quota_sample's ordering);
      2. running cumulative weight C_i (window sum);
      3. step = ceil(total_weight / k); a row is SELECTED iff its
         weight interval (C_{i-1}, C_i] contains a multiple of the
         step — i.e. floor(C_i/step) > floor(C_{i-1}/step).

    Rows heavier than the step can contain several multiples and are
    still emitted once (with ``n_hits`` recording the multiplicity, the
    caller's repeat knob — standard PPS-with-replacement accounting).
    Zero/negative weights never select.  Deterministic on any
    partitioning; one shuffle on the group key (same hot-group caveat
    as quota_sample).
    """
    h = F.md5(
        F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    wg = Window.partitionBy(group_col)
    base = (
        df.withColumn("__h", h)
        .withColumn("__w", F.greatest(F.col(weight_col).cast("long"), F.lit(0)))
        .withColumn("__c", F.sum("__w").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("__total", F.sum("__w").over(wg))
    )
    step = F.expr(f"(__total + {int(k)} - 1) div {int(k)}")
    hits = F.expr("__c div __step") - F.expr("(__c - __w) div __step")
    return (
        base.withColumn("__step", step)
        .withColumn("n_hits", hits.cast("bigint"))
        .where(F.col("n_hits") > 0)
        .drop("__h", "__w", "__c", "__total", "__step")
    )


def negative_sample(
    positives: DataFrame,
    items: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """(user, item, slot) — up to ``k`` deterministic NEGATIVE items per
    user: candidate items the user has NO positive interaction with
    (the contrastive / recommender-training companion to
    ``hash_split``'s example routing).

    The scale-correct construction avoids the naive
    ``users CROSS JOIN items ANTI JOIN positives`` (quadratic in the
    catalog): per user, ``k`` candidate ids are drawn directly as
    ``pmod(md5(salt|user|slot), n_items)`` — O(users x k) rows total —
    then one hash anti-join against the positives removes accidental
    positives, and duplicate draws collapse to their first slot.
    Cost: the distinct-user shuffle plus one (user, item) anti-join;
    nothing driver-side (``n_items`` rides a broadcast 1-row aggregate,
    lazily).

    Caller contract: item ids are DENSE ``0..n_items-1`` (``n_items`` =
    ``max(item)+1`` over ``items``); sparse catalogs need an id-compact
    step first.  Dropped draws (collisions with positives or duplicate
    candidates) are NOT resampled — at scale you over-provision ``k``
    instead, keeping the draw one narrow map.  Same md5 discipline as
    the rest of this module: re-runs and engines agree bit-for-bit.
    """
    n = items.agg((F.max(F.col(item_col).cast("long")) + 1).alias("__n_items"))
    users = positives.select(F.col(user_col)).distinct()
    cand = (
        users.crossJoin(F.broadcast(n))
        .select(
            user_col,
            "__n_items",
            F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("slot"),
        )
        .withColumn(
            item_col,
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{salt}|"),
                                F.col(user_col).cast("string"),
                                F.lit("|"),
                                F.col("slot").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("__n_items"),
            ).cast("long"),
        )
        .groupBy(user_col, item_col)
        .agg(F.min("slot").cast("int").alias("slot"))
    )
    return cand.join(
        positives.select(user_col, item_col).distinct(),
        [user_col, item_col],
        "left_anti",
    )


def balanced_oversample(
    df: DataFrame,
    class_col: str,
    id_col: str,
    salt: str = "bal",
) -> DataFrame:
    """(class, id, copy_idx) — replicate rows so every class reaches the
    size of the LARGEST class exactly (class-imbalance correction by
    deterministic oversampling; the label-balancing step before
    training on skewed corpora).

    Each row of a class with ``n_c`` rows gets ``target div n_c``
    copies, and the first ``target mod n_c`` rows in md5 order get one
    extra — per-class output is exactly ``target`` rows, and which rows
    carry the extra copy is uniform, engine-portable, and growth-stable
    (same md5-order rationale as ``quota_sample``).

    Plan: one combinable class-count aggregate (broadcast back), one
    class-keyed window for the md5 rank (quota_sample's skew caveat
    applies: a single giant class serializes its sort — acceptable
    because oversampling targets the SMALL classes by construction;
    the giant class gets ``div = 1, mod = 0`` and needs no rank), then
    a narrow ``explode(sequence(...))``.  copy_idx is 1-based.
    """
    counts = df.groupBy(class_col).agg(F.count("*").alias("__n_c"))
    target = counts.agg(F.max("__n_c").alias("__target"))
    w = Window.partitionBy(class_col).orderBy(
        F.md5(
            F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
        ).asc(),
        F.col(id_col).asc(),
    )
    return (
        ensure_parallelism(df)
        .withColumn("__rk", F.row_number().over(w))
        .join(F.broadcast(counts), class_col)
        .crossJoin(F.broadcast(target))
        .withColumn(
            "__n_copies",
            F.expr("__target div __n_c").cast("long")
            + F.when(
                F.col("__rk") <= F.pmod("__target", "__n_c"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .select(
            class_col,
            id_col,
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("__n_copies"))
            ).alias("copy_idx"),
        )
    )


def source_mixture_plan(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    budget_tokens: int | None = None,
    max_epochs: int = 10,
) -> DataFrame:
    """(source, n_docs, tokens, weight_ppm, n_epochs) — the
    temperature-scaled data-mixture table an LLM training run samples
    from: each source's draw weight is sqrt(tokens) normalized across
    sources (alpha = 0.5, the standard upsampling temperature — small
    high-quality sources get proportionally MORE epochs, huge crawls
    fewer), and n_epochs is how many passes over source *s* a
    ``budget_tokens`` total budget implies at that weight.

    Bit-exact across engines by the lm.py discipline: token counts are
    exact integers; sqrt is IEEE-correctly-rounded (so identical in any
    engine — this is why the alpha=0.5 temperature is computed via
    sqrt, not pow); the weight is frozen to integer micro-units
    immediately; everything after is DECIMAL(38,0) integer arithmetic
    (overflow-safe at 100 TB token counts where weight*budget exceeds
    int64).  ``n_epochs`` = ceil(weight_share * budget / tokens),
    capped at ``max_epochs`` (unbounded upsampling of a tiny source is
    never what you want).

    One combinable groupBy on source (few groups) then driver-free
    window-free arithmetic over the model-sized per-source frame; the
    1-row totals crossJoin is the sanctioned bm25/tfidf corpus-stats
    shape.  Default budget: one full pass (total tokens).
    """
    from netflix_data_ingestion_spark.operators.dedup import tokens

    per_source = (
        ensure_parallelism(docs)
        .select(
            F.col(source_col).alias("source"),
            F.size(tokens(F.col(text_col))).cast("long").alias("__n_tok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__n_tok").cast("long").alias("tokens"),
        )
        .withColumn(
            "__w_micro",
            F.round(F.sqrt(F.col("tokens").cast("double")) * 1e6, 0)
            .cast("decimal(38,0)"),
        )
    )
    totals = per_source.agg(
        F.sum("__w_micro").cast("decimal(38,0)").alias("__w_total"),
        F.sum("tokens").cast("decimal(38,0)").alias("__tok_total"),
    )
    budget_expr = (
        F.lit(budget_tokens).cast("decimal(38,0)")
        if budget_tokens is not None
        else F.col("__tok_total")
    )
    joined = per_source.crossJoin(F.broadcast(totals)).withColumn(
        "__budget", budget_expr
    )
    # `div` is INTEGRAL division (truncation == floor for these
    # non-negative operands) in both Spark and DuckDB's `//` — a
    # cast-to-decimal(38,0) would ROUND instead and drift at boundaries
    return (
        joined.select(
            "source",
            "n_docs",
            "tokens",
            F.expr(
                "(__w_micro * CAST(1000000 AS DECIMAL(38,0)))"
                " div __w_total"
            ).cast("long").alias("weight_ppm"),
            F.when(F.col("tokens") > 0, F.least(
                F.lit(max_epochs).cast("long"),
                # ceil(w*budget / (w_total*tokens)) as (a + b - 1) div b
                F.expr(
                    "(__w_micro * __budget"
                    " + __w_total * CAST(tokens AS DECIMAL(38,0))"
                    " - CAST(1 AS DECIMAL(38,0)))"
                    " div (__w_total * CAST(tokens AS DECIMAL(38,0)))"
                ).cast("long"),
            )).otherwise(F.lit(0).cast("long")).alias("n_epochs"),
        )
        .orderBy("source")
    )


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(id, source, epoch) — realize a ``source_mixture_plan``: each
    document of source *s* appears once per epoch 1..n_epochs(s), the
    replicated corpus a mixture-weighted training run actually reads.

    The plan frame is source-cardinality (model-sized) — broadcast
    join, then ``explode(sequence(...))`` fans rows out WITHIN each
    task: no shuffle of the corpus, output is a deterministic function
    of (doc, plan).  Sources with n_epochs = 0 drop out entirely
    (sequence(1, 0) is empty), which is the correct reading of a
    zero-weight source.
    """
    n = F.col("__n_epochs")
    return (
        docs.select(id_col, source_col)
        .join(
            F.broadcast(
                plan.select(
                    source_col, F.col("n_epochs").alias("__n_epochs")
                )
            ),
            source_col,
            "inner",
        )
        .select(
            id_col,
            source_col,
            F.explode(
                F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
                    F.array().cast("array<bigint>")
                )
            ).alias("epoch"),
        )
    )


def dsir_llr_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target,
    hex_chars: int = 2,
    join_path: bool | None = None,
) -> DataFrame:
    """(id, is_target, n_features, dsir_llr_micro) — Data Selection via
    Importance Resampling (Xie et al. 2023) weights over hashed n-gram
    features, in exact integer micro-nats.

    DSIR scores each raw document by how much it resembles a TARGET
    distribution (a trusted reference corpus — here any boolean column
    over ``df``): features are word unigrams + bigrams hashed into
    ``16**hex_chars`` buckets (bucket key = md5 hex prefix, the
    engine-portable hash discipline), the target and raw bucket
    distributions are estimated with +1 smoothing, and a document's
    weight is the sum over its feature occurrences of the per-bucket
    log-likelihood ratio ln(p_target/p_raw).  Each per-bucket LLR is
    rounded to integer micro-nats BEFORE summing (round-6 kills any
    last-ulp ln() divergence across engines — same discipline as
    operators/lm.bigram_lm_scores), so the per-doc sum is exact int64
    arithmetic and bit-stable across engines and runs.

    Scale: two corpus scans (count pass, score pass), NO corpus-sized
    shuffle on the default path — the count pass partial-aggregates the
    exploded feature stream down to <= B bucket rows before its
    (B-row) exchange, and the score pass folds each doc's feature array
    against a broadcast B-entry map literal inside codegen
    (``F.aggregate`` + ``element_at``), a narrow map.  The LLR model
    itself is B-sized: ONE model-sized collect of the bucket counts,
    with the micro-nat rounding then applied on a local B-row frame
    (so the corpus is never re-scanned for totals).  For large bucket
    counts (hex_chars >= 4, where a 65k-entry map literal would bloat
    the plan) set ``join_path=True``: the score pass becomes
    explode -> broadcast-join the B-row LLR frame -> re-agg by id — one
    feature-volume shuffle, still no all-pairs anything.  Auto: literal
    map for B <= 4096, join path above.
    """
    from netflix_data_ingestion_spark.operators.dedup import (
        tokens,
        word_ngrams,
    )

    n_buckets = 16 ** hex_chars
    if join_path is None:
        join_path = n_buckets > 4096

    text = F.coalesce(F.col(text_col), F.lit(""))
    tok = tokens(text)
    feats = F.concat(tok, word_ngrams(tok, 2))
    bucks = F.transform(
        feats, lambda f: F.substring(F.md5(f), 1, hex_chars)
    )
    # both passes pay the interpreted feature pipeline per row — a
    # one-split parquet input must not serialize that on one task
    # (quota_sample's convention: the operator owns its parallelism)
    df = ensure_parallelism(df)
    # r13: pin the hashed-feature frame — the count pass and the score
    # pass both traverse it (and the score projection references __bk
    # twice), so un-pinned the interpreted tokenize+ngram+md5 pipeline
    # ran 2-3x per doc; checkpointed it runs exactly once (guide §2.4;
    # measured first-run 8.5 -> 3.1 s at sf0.1, warm 2.3 -> 2.0 s)
    base = df.select(
        F.col(id_col),
        F.col(id_col).alias("__id"),
        target.cast("boolean").alias("is_target"),
        bucks.alias("__bk"),
    ).localCheckpoint(eager=True)

    # explode_outer, NOT explode: Catalyst's InferFiltersFromGenerate
    # adds size(child)>0 for a plain explode, and because the child here
    # is the whole derived feature expression, that inferred filter
    # re-evaluates the full tokenize+ngram+md5 tree a second time — and
    # pushes it below the ensure_parallelism exchange onto the un-split
    # scan, serializing it on one task (measured 7.8s vs 1.3s at sf0.1).
    # The rule skips outer generates; the isNotNull drops the one null
    # row an empty-feature doc contributes.
    counts_rows = (
        base.select(F.explode_outer("__bk").alias("bk"), "is_target")
        .filter(F.col("bk").isNotNull())
        .groupBy("bk")
        .agg(
            F.sum(F.when(F.col("is_target"), 1).otherwise(0))
            .cast("long")
            .alias("ct"),
            F.count("*").cast("long").alias("cr"),
        )
        .collect()
    )
    tt = sum(int(r.ct) for r in counts_rows)
    tr = sum(int(r.cr) for r in counts_rows)
    # per-bucket LLR in micro-nats, computed ON SPARK over the B-row
    # LOCAL counts frame (JVM ln + HALF_UP round, the lm.py cross-engine
    # pin) — one corpus count pass total, not one per collect
    spark = df.sparkSession
    llr = spark.createDataFrame(
        [(r.bk, int(r.ct), int(r.cr)) for r in counts_rows],
        "bk string, ct long, cr long",
    ).select(
        "bk",
        F.round(
            (
                F.log((F.col("ct") + 1) / F.lit(float(tt + n_buckets)))
                - F.log((F.col("cr") + 1) / F.lit(float(tr + n_buckets)))
            )
            * 1e6
        )
        .cast("long")
        .alias("w"),
    )

    out_cols = [
        F.col(id_col),
        F.col("is_target"),
        F.size("__bk").cast("long").alias("n_features"),
    ]
    if join_path:
        scored = (
            base.select("__id", F.explode_outer("__bk").alias("bk"))
            .filter(F.col("bk").isNotNull())
            .join(F.broadcast(llr), "bk")
            .groupBy("__id")
            .agg(F.sum("w").cast("long").alias("__s"))
        )
        return (
            base.join(scored, "__id", "left")
            .select(
                *out_cols,
                F.coalesce(F.col("__s"), F.lit(0))
                .cast("long")
                .alias("dsir_llr_micro"),
            )
        )
    kv: list = []
    for r in llr.collect():
        kv.extend([F.lit(r.bk), F.lit(int(r.w))])
    if not kv:  # empty corpus: no buckets, every doc scores 0
        return base.select(
            *out_cols, F.lit(0).cast("long").alias("dsir_llr_micro")
        )
    m = F.create_map(*kv)
    # try_element_at + coalesce: with a deterministic source every bucket
    # key is present (both passes scan the same input), but a
    # non-deterministic source could surface a key unseen by the count
    # pass — plain element_at would raise MAP_KEY_DOES_NOT_EXIST under
    # Spark 4's default ANSI mode; score it 0 like the join path does.
    return base.select(
        *out_cols,
        F.aggregate(
            "__bk",
            F.lit(0).cast("long"),
            lambda acc, b: acc
            + F.coalesce(F.try_element_at(m, b), F.lit(0).cast("long")),
        ).alias("dsir_llr_micro"),
    )


def dsir_gumbel_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target,
    n: int,
    hex_chars: int = 2,
    salt: str = "dsir-v1",
) -> DataFrame:
    """(id, is_target, dsir_llr_micro, gumbel_key_micro) — the DSIR
    RESAMPLE itself: the n documents a quality-targeted pretraining mix
    would actually keep, drawn without replacement with probability
    proportional to exp(llr) via the Gumbel-top-k trick — argtop-n of
    (llr + Gumbel noise) is an exact sample from the softmax of the
    scores, and both terms here are integer micro-nats, so the draw is
    bit-reproducible on any engine, partitioning, or run.

    The noise is Gumbel(0,1) in micro-nats from the md5 uniform
    (``bernoulli_mix``'s portable pseudo-randomness): u = (h32 + 0.5) /
    2^32, g = round(-ln(-ln(u)) * 1e6) — round-6 kills last-ulp ln()
    divergence (the lm.py pin), and h32 + 0.5 is exact in double.
    Distinct salts give independent draws.

    Scale: dsir_llr_weights' two narrow passes plus ONE
    TakeOrderedAndProject (per-partition top-n, driver merges n rows) —
    no full sort, no shuffle beyond the model-sized count exchange.
    """
    w = dsir_llr_weights(df, id_col, text_col, target, hex_chars)
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    g = F.round(-F.log(-F.log(u)) * 1e6).cast("long")
    return (
        w.select(
            id_col,
            "is_target",
            "dsir_llr_micro",
            (F.col("dsir_llr_micro") + g).alias("gumbel_key_micro"),
        )
        .orderBy(F.col("gumbel_key_micro").desc(), F.col(id_col))
        .limit(n)
    )
