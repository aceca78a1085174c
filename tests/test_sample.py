"""Deterministic sampling/packing: quota caps, growth stability, chunk math."""

from __future__ import annotations

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.sample import (
    pack_chunks,
    quota_sample,
)


def _half_up(x: float) -> int:
    """Replicate Spark's F.round on a double EXACTLY: Java
    BigDecimal.valueOf(double) (shortest decimal repr, like Python's
    repr) rounded HALF_UP (ties away from zero) — Python's built-in
    round() is banker's rounding and would diverge on an exact .5
    micro-nat boundary."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_quota_sample_caps_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
    )
    out = quota_sample(df, "source", "doc_id", cap=10)
    rows = out.collect()
    from collections import Counter

    per_source = Counter(r["source"] for r in rows)
    assert per_source == {"s0": 10, "s1": 10, "s2": 10}
    assert all(1 <= r["sample_rank"] <= 10 for r in rows)
    # deterministic: identical kept set on re-run
    again = {r["doc_id"] for r in quota_sample(df, "source", "doc_id", cap=10).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_quota_sample_growth_stability(spark):
    """Adding rows to a group may displace kept rows only by hash order —
    every kept row of the grown corpus that already existed in the small
    corpus must have had rank <= its new rank (never re-shuffled)."""
    small = spark.createDataFrame(
        [(i, "s") for i in range(40)], "doc_id long, source string"
    )
    big = spark.createDataFrame(
        [(i, "s") for i in range(80)], "doc_id long, source string"
    )
    kept_small = {
        r["doc_id"]: r["sample_rank"]
        for r in quota_sample(small, "source", "doc_id", cap=10).collect()
    }
    kept_big = {
        r["doc_id"]: r["sample_rank"]
        for r in quota_sample(big, "source", "doc_id", cap=10).collect()
    }
    # survivors common to both keep their relative hash order
    common = set(kept_small) & set(kept_big)
    ranks_small = [kept_small[k] for k in sorted(common)]
    ranks_big = [kept_big[k] for k in sorted(common)]
    assert (
        sorted(range(len(ranks_small)), key=ranks_small.__getitem__)
        == sorted(range(len(ranks_big)), key=ranks_big.__getitem__)
    )


def test_pack_chunks_invariants(spark):
    df = spark.createDataFrame(
        [(i, "a", 100) for i in range(10)] + [(i, "b", 300) for i in range(4)],
        "doc_id long, source string, n_tokens long",
    )
    out = pack_chunks(df, "source", "doc_id", "n_tokens", budget=512)
    rows = {(r["source"], r["doc_id"]): r for r in out.collect()}
    # source a: cumulative starts 0,100,...,900 -> chunks 0,0,0,0,0,0(500),1,...
    assert rows[("a", 0)]["chunk_id"] == 0 and rows[("a", 0)]["chunk_offset"] == 0
    assert rows[("a", 5)]["chunk_id"] == 0  # starts at 500 < 512
    assert rows[("a", 6)]["chunk_id"] == 1  # starts at 600
    # source b: starts 0,300,600,900 -> chunks 0,0,1,1
    assert [rows[("b", i)]["chunk_id"] for i in range(4)] == [0, 0, 1, 1]
    # chunk_offset is the start position within the chunk
    assert rows[("b", 1)]["chunk_offset"] == 300
    # every chunk's rows are contiguous in order
    a_chunks = [rows[("a", i)]["chunk_id"] for i in range(10)]
    assert a_chunks == sorted(a_chunks)


def test_bernoulli_mix_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.sample import bernoulli_mix

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).alias("hot"),
    )
    rate = F.when(F.col("hot"), F.lit(0.9)).otherwise(F.lit(0.1))
    kept = bernoulli_mix(df, "doc_id", rate).collect()
    hot = sum(1 for r in kept if r["hot"])
    cold = len(kept) - hot
    # 2000 rows per class; binomial bounds are generous
    assert 1650 <= hot <= 1950
    assert 100 <= cold <= 320
    # deterministic: same ids on a different partitioning
    kept2 = bernoulli_mix(df.repartition(13), "doc_id", rate).collect()
    assert {r["doc_id"] for r in kept} == {r["doc_id"] for r in kept2}
    # boundary semantics
    assert bernoulli_mix(df, "doc_id", F.lit(0.0)).count() == 0
    assert bernoulli_mix(df, "doc_id", F.lit(1.0)).count() == 4000


def test_negative_sample_excludes_positives_and_collapses_dups(spark):
    from netflix_data_ingestion_spark.operators.sample import negative_sample

    # tiny item domain (0..1) with k=8 draws: duplicate candidates MUST
    # collapse to their first slot, and user 1's sole non-positive item
    # is the only possible negative
    positives = spark.createDataFrame(
        [(1, 0), (2, 0), (2, 1)], "user_id long, item long"
    )
    items = spark.createDataFrame([(0,), (1,)], "item long")
    out = negative_sample(positives, items, "user_id", "item", k=8).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append((r["item"], r["slot"]))
    # user 2 owns the whole catalog: zero negatives survive the anti-join
    assert 2 not in by_user
    # user 1: only item 1 is a legal negative, collapsed to ONE row
    assert len(by_user[1]) == 1 and by_user[1][0][0] == 1
    # determinism
    again = negative_sample(positives, items, "user_id", "item", k=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_negative_sample_draws_in_domain_and_bounded(spark):
    from netflix_data_ingestion_spark.operators.sample import negative_sample

    positives = spark.createDataFrame(
        [(u, 0) for u in range(20)], "user_id long, item long"
    )
    items = spark.createDataFrame([(i,) for i in range(100)], "item long")
    out = negative_sample(positives, items, "user_id", "item", k=4).collect()
    assert all(0 <= r["item"] <= 99 for r in out)
    per_user = {}
    for r in out:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert all(n <= 4 for n in per_user.values())
    # with a 100-item domain and one positive, nearly every draw survives
    assert sum(per_user.values()) >= 20 * 3


def test_balanced_oversample_exact_target_per_class(spark):
    from netflix_data_ingestion_spark.operators.sample import (
        balanced_oversample,
    )

    df = spark.createDataFrame(
        [(i, "big") for i in range(5)] + [(100, "small"), (101, "small")],
        "doc_id long, lang string",
    )
    out = balanced_oversample(df, "lang", "doc_id").collect()
    per_class = {}
    copies = {}
    for r in out:
        per_class[r["lang"]] = per_class.get(r["lang"], 0) + 1
        copies[r["doc_id"]] = max(copies.get(r["doc_id"], 0), r["copy_idx"])
    # every class lands exactly on the majority-class size
    assert per_class == {"big": 5, "small": 5}
    # big-class rows are copied once; small-class copies differ by <= 1
    assert all(copies[i] == 1 for i in range(5))
    assert sorted([copies[100], copies[101]]) == [2, 3]
    # copy indexes are dense 1..n per doc
    idx = sorted(r["copy_idx"] for r in out if r["doc_id"] == 101)
    assert idx in ([1, 2], [1, 2, 3])


def test_time_split_boundaries_and_null_ts(spark):
    import datetime

    from netflix_data_ingestion_spark.operators.split import time_split

    t = datetime.datetime
    df = spark.createDataFrame(
        [
            (1, t(2024, 1, 1)),
            (2, t(2024, 2, 1)),          # exactly the train cutoff: val
            (3, t(2024, 2, 15)),
            (4, t(2024, 3, 1)),          # exactly the val cutoff: test
            (5, t(2030, 1, 1)),
            (6, None),                   # NULL ts -> NULL split
        ],
        "id long, ts timestamp",
    )
    got = {r["id"]: r["split"] for r in time_split(
        df, "ts",
        {"train": "2024-02-01", "val": "2024-03-01", "test": "9999-01-01"},
    ).collect()}
    assert got == {
        1: "train", 2: "val", 3: "val", 4: "test", 5: "test", 6: None
    }


def test_dsir_llr_weights_hand_computed(spark):
    """Tiny corpus where the LLR model is computed by hand: target docs
    repeat 'good', raw-only docs repeat 'bad' — target-bucket LLR must
    be positive, raw-only-bucket LLR negative, and the per-doc sum must
    match an exact from-first-principles replication."""
    import hashlib
    import math

    from netflix_data_ingestion_spark.operators.sample import (
        dsir_llr_weights,
    )

    # counts must DOMINATE the +1-over-256-buckets smoothing mass for
    # the direction assertion to be meaningful (with 3-word docs every
    # LLR is pulled toward ln((tt+B)/(tr+B)) regardless of content)
    rows = [
        (1, ("good " * 50).strip(), True),
        (2, ("good " * 30).strip() + " " + ("bad " * 3).strip(), True),
        (3, ("bad " * 50).strip(), False),
        (4, ("bad " * 30).strip() + " " + ("good " * 3).strip(), False),
        (5, "", False),  # zero-feature doc scores exactly 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    out = {
        r["doc_id"]: r
        for r in dsir_llr_weights(df, "doc_id", "text", F.col("t")).collect()
    }

    # replicate: features = unigrams + bigrams, bucket = md5 prefix
    def feats(text):
        tk = [w for w in text.split(" ") if w]
        return tk + [" ".join(tk[i : i + 2]) for i in range(len(tk) - 1)]

    def bucket(f):
        return hashlib.md5(f.encode()).hexdigest()[:2]

    ct, cr = {}, {}
    for _id, text, t in rows:
        for f in feats(text):
            b = bucket(f)
            cr[b] = cr.get(b, 0) + 1
            if t:
                ct[b] = ct.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    llr = {
        b: _half_up(
            (
                math.log((ct.get(b, 0) + 1) / (tt + 256))
                - math.log((cr[b] + 1) / (tr + 256))
            )
            * 1e6
        )
        for b in cr
    }
    for _id, text, t in rows:
        fs = feats(text)
        assert out[_id]["n_features"] == len(fs)
        assert out[_id]["is_target"] == t
        assert out[_id]["dsir_llr_micro"] == sum(llr[bucket(f)] for f in fs)
    assert out[5]["dsir_llr_micro"] == 0 and out[5]["n_features"] == 0
    # direction: pure-target text scores above pure-raw text
    assert out[1]["dsir_llr_micro"] > 0 > out[3]["dsir_llr_micro"]


def test_dsir_llr_weights_join_path_identical(spark):
    """The hex_chars>=4 broadcast-join scoring path must produce the
    byte-identical frame as the literal-map fold (both at hex_chars=2,
    forced)."""
    from netflix_data_ingestion_spark.operators.sample import (
        dsir_llr_weights,
    )

    df = spark.createDataFrame(
        [
            (i, f"tok{i % 7} tok{(i * 3) % 5} tok{i % 2} filler", i % 3 == 0)
            for i in range(60)
        ],
        "doc_id long, text string, t boolean",
    )
    a = dsir_llr_weights(df, "doc_id", "text", F.col("t")).orderBy("doc_id")
    b = dsir_llr_weights(
        df, "doc_id", "text", F.col("t"), join_path=True
    ).orderBy("doc_id")
    assert a.collect() == b.collect()


def test_dsir_gumbel_topk_softmax_draw(spark):
    """Gumbel-top-k must equal a from-first-principles replication
    (same md5 uniform, same micro-nat rounding) and behave like a
    softmax draw: n larger than the corpus returns everything, and the
    kept set is deterministic across invocations."""
    import hashlib
    import math

    from netflix_data_ingestion_spark.operators.sample import (
        dsir_gumbel_topk,
        dsir_llr_weights,
    )

    rows = [
        (i, ("good " * 20).strip() if i % 2 else ("bad " * 20).strip(),
         bool(i % 2))
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    out = dsir_gumbel_topk(df, "doc_id", "text", F.col("t"), n=8).collect()
    assert len(out) == 8

    # replicate the key: llr (trusted — pinned by the weights test) +
    # Gumbel micro-nats from md5("dsir-v1|id")
    llr = {
        r["doc_id"]: r["dsir_llr_micro"]
        for r in dsir_llr_weights(df, "doc_id", "text", F.col("t")).collect()
    }

    def gumbel(i):
        h = int(hashlib.md5(f"dsir-v1|{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return _half_up(-math.log(-math.log(u)) * 1e6)

    keys = sorted(
        ((llr[i] + gumbel(i), i) for i, _, _ in rows),
        key=lambda t: (-t[0], t[1]),
    )
    expect = [(i, k) for k, i in keys[:8]]
    got = [(r["doc_id"], r["gumbel_key_micro"]) for r in out]
    assert sorted(got) == sorted(expect)
    # n >= corpus returns every doc
    assert len(dsir_gumbel_topk(df, "doc_id", "text", F.col("t"), n=99).collect()) == 20
    # deterministic re-draw
    again = [r["doc_id"] for r in dsir_gumbel_topk(df, "doc_id", "text", F.col("t"), n=8).collect()]
    assert sorted(again) == sorted(r["doc_id"] for r in out)


def test_dsir_weights_partitioning_invariant(spark):
    """Both dsir passes (count collect, score fold) must give the
    byte-identical frame under any input partitioning — the two-pass
    structure may not depend on split layout (the ffill
    deterministic-source hazard class, pinned absent here)."""
    from netflix_data_ingestion_spark.operators.sample import (
        dsir_llr_weights,
    )

    df = spark.createDataFrame(
        [
            (i, f"alpha{i % 5} beta{(i * 7) % 11} gamma{i % 3}", i % 4 == 0)
            for i in range(200)
        ],
        "doc_id long, text string, t boolean",
    )
    a = dsir_llr_weights(df, "doc_id", "text", F.col("t")).orderBy("doc_id").collect()
    b = (
        dsir_llr_weights(df.repartition(7), "doc_id", "text", F.col("t"))
        .orderBy("doc_id")
        .collect()
    )
    c = (
        dsir_llr_weights(df.coalesce(1), "doc_id", "text", F.col("t"))
        .orderBy("doc_id")
        .collect()
    )
    assert a == b == c
