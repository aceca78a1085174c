"""Bloom-filter semi-join: a distributed runtime filter for huge joins.

The 100 TB problem this solves: a semi-join of a petabyte fact table
against a selective dimension subset shuffles the ENTIRE fact table on
the join key before the join can drop 99% of it.  The classic fix
(Bloom join — Mackert & Lohman, SIGMOD'86; Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` applies it to plain
joins) is to build a small bit-array summary of the dimension keys,
pre-filter the fact table with it map-side (no false negatives, small
false-positive rate), and only shuffle the survivors into the exact
join.

This operator builds the filter as a DATAFRAME of bit-words — not a
driver-side bitmap — so nothing ever funnels through the driver:

  build:  dim keys -> k xxhash64 bit positions each -> group bit positions
          by 64-bit word index -> ``bit_or`` the words.  Output is at
          most ``n_bits/64`` rows (16k rows for a 1M-bit filter) —
          broadcastable at any dimension cardinality.
  probe:  k broadcast left joins word-index -> word, one per hash
          function (narrow: no shuffle of the fact side); a key
          survives iff every probed bit is set.
  exact:  survivors left-semi join the dimension — false positives
          drop here, so the END RESULT is byte-identical to a plain
          semi-join (the DuckDB oracle is exactly that), while the
          shuffle volume is survivors-only.

Determinism: bit positions are xxhash64-derived (deterministic, and
codegen-native so the per-fact-row probe is an integer hash, not a hex
digest), and the final exact join makes the output independent of both
the hash family and filter sizing — n_bits/n_hashes only move the
false-positive rate, i.e. the pre-shuffle survivor count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def _bit_pos(key: Column, hash_idx: int, n_bits: int) -> Column:
    """xxhash64-derived bit position of `key` for hash function
    `hash_idx`.  r12 optimization (guide §1.2 per-task work): the probe
    evaluates this per fact row per hash function, and xxhash64 is a
    codegen-native integer hash — the previous md5 form paid a string
    concat + hex digest + base-16 conv per probe.  Bit positions only
    steer the false-positive rate; the exact join makes the RESULT
    independent of the hash family (pinned by the plain-semi-join
    oracle and tests)."""
    return F.pmod(
        F.xxhash64(F.lit(hash_idx), key), F.lit(n_bits)
    )


def bloom_build(
    dim: DataFrame, key_col: str, n_bits: int = 1 << 20, n_hashes: int = 3
) -> DataFrame:
    """(word_idx, word) — 64-bit words of the Bloom filter over dim keys.

    One narrow explode (x n_hashes) + one combinable ``bit_or`` groupBy;
    at most ``ceil(n_bits / 64)`` output rows regardless of dim size.
    """
    key = F.col(key_col)
    positions = F.array(
        *[_bit_pos(key, i, n_bits) for i in range(n_hashes)]
    )
    return (
        dim.select(F.explode(positions).alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("long").alias("word_idx"),
            # SQL shiftleft: the python F.shiftleft only takes a literal
            # shift amount
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """fact rows whose key exists in dim — Bloom-prefiltered semi-join.

    Result is exactly ``fact LEFT SEMI JOIN dim`` (false positives are
    removed by the final exact join); the Bloom pass only reduces how
    many fact rows reach the exact join's shuffle.
    """
    # pin the word table before the probe loop: each of the k probe
    # joins broadcasts its own renamed projection of `words`, and the
    # rename defeats exchange reuse — unpinned, the dim scan + bit
    # aggregation subtree re-executes once PER HASH FUNCTION (observed
    # as k identical HashAggregate+Exchange subtrees in the plan).
    # The frame is <= n_bits/64 rows, so the eager checkpoint is tiny.
    words = bloom_build(
        dim, dim_key, n_bits=n_bits, n_hashes=n_hashes
    ).localCheckpoint(eager=True)
    key = F.col(fact_key)

    # widen a file-bound input so the k hash probes parallelize (no-op on
    # a well-split 100 TB scan; locally a narrow round-robin, NOT a
    # keyed shuffle — the point of the Bloom pass is avoiding the keyed
    # exchange of non-survivors, which this preserves)
    probed = ensure_parallelism(fact)
    survive = F.lit(True)
    for i in range(n_hashes):
        pos = _bit_pos(key, i, n_bits)
        w = F.broadcast(
            words.select(
                F.col("word_idx").alias(f"__wi{i}"),
                F.col("word").alias(f"__w{i}"),
            )
        )
        probed = (
            probed.withColumn(f"__pos{i}", pos)
            .withColumn(f"__wi{i}", (F.col(f"__pos{i}") / 64).cast("long"))
            .withColumn(
                f"__b{i}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__pos{i} % 64 AS INT))"
                ),
            )
        )
        probed = probed.join(w, f"__wi{i}", "left")
        # a missing word row means no dim key ever touched this word
        survive = survive & (
            F.coalesce(F.col(f"__w{i}"), F.lit(0)).bitwiseAND(F.col(f"__b{i}"))
            != 0
        )

    survivors = probed.where(survive).select(*fact.columns)
    return survivors.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
