"""Item co-occurrence mining — beyond-reference (the market-basket /
PMI ingredient table behind association rules, complement detection,
and co-occurrence-based embedding pretraining signals).

Spark-first shape: the pair generation is a WITHIN-BASKET self-join —
one shuffle on the basket key, per-basket fan-out bounded by (basket
size)², the same bounded-blocking discipline as
operators/fuzzy.fuzzy_name_pairs — followed by one combinable pair
groupBy.  Marginals (per-item basket counts) and the basket total ride
back on item-keyed joins and a broadcast 1-row aggregate, so a
consumer computes support / confidence / lift / PMI from the one
output table without another corpus pass.  All outputs are exact
integers; the (float, engine-dependent) log of PMI is deliberately
left to the consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.util import ensure_parallelism


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """(item_a, item_b, pair_count, count_a, count_b, n_baskets) — how
    many baskets contain BOTH items (item_a < item_b), with each item's
    own basket count and the total basket count as PMI marginals.

    SET semantics: an item repeated inside one basket counts once (the
    association question is "do these co-occur", not "how many units")
    — the distinct projection is the first thing that happens.
    ``min_support`` prunes the long tail of singleton pairs BEFORE the
    marginal joins, which is what keeps the output (and the two
    item-keyed joins) proportional to the interesting pairs, not to
    all pairs.
    """
    # basket_items feeds FOUR consumers (both self-join sides, the
    # marginal counts, the basket total) — a lazy frame re-plans the
    # scan+distinct once per consumer, and the self-join re-shuffles it
    # on __b twice.  Pin it hash-partitioned on the join key: the
    # distinct runs once, and the within-basket self-join needs NO
    # exchange on either side (guide §2.4 — the graph-loop adjacency
    # discipline; LogicalRDD preserves the partitioning across the
    # checkpoint).  Repartitioning BEFORE the distinct makes it ONE
    # shuffle total: hashpartitioning(__b) already clusters equal
    # (__b, __i) rows, so the distinct aggregate adds no exchange.
    basket_items = (
        ensure_parallelism(df)
        .select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .repartition("__b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = basket_items.select("__b", F.col("__i").alias("item_a"))
    b = basket_items.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )
    item_counts = basket_items.groupBy("__i").agg(
        F.count("*").cast("long").alias("__c")
    )
    totals = basket_items.agg(
        F.count_distinct("__b").cast("long").alias("n_baskets")
    )
    return (
        pairs.join(
            item_counts.select(
                F.col("__i").alias("item_a"), F.col("__c").alias("count_a")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("__i").alias("item_b"), F.col("__c").alias("count_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            "n_baskets",
        )
    )


def item_similarity_topk(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_support: int = 2,
) -> DataFrame:
    """(item, neighbor, pair_count, cosine_sim) — each item's top-k
    most-similar items by co-occurrence cosine
    ``pair_count / sqrt(count_a * count_b)`` — the classic item-item
    collaborative filter (Sarwar et al. WWW'01): normalizing by both
    marginals stops bestsellers from being everyone's neighbor, which
    raw pair counts cannot.

    Determinism: the cosine is ONE correctly-rounded sqrt of an exact
    integer product and one division, rounded to 6 places BEFORE
    ranking, with a neighbor-id tie-break — so the top-k cut is
    engine- and partition-exact.

    Shape: inherits ``cooccurrence_pairs``' pruned-pair economy; the
    symmetrize is a union of two projections of the SAME pair frame,
    and the per-item rank is one window over the pruned pairs — at
    catalog scale, cost follows interesting pairs, not items².
    """
    # both union branches reference the pair frame — pin it so the
    # basket self-join + marginal joins run once (triangle_counts
    # eager-localCheckpoint discipline)
    pairs = cooccurrence_pairs(
        df, basket_col, item_col, min_support
    ).localCheckpoint(eager=True)
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "pair_count",
        F.col("count_a").alias("__ci"),
        F.col("count_b").alias("__cn"),
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "pair_count",
            F.col("count_b").alias("__ci"),
            F.col("count_a").alias("__cn"),
        )
    )
    scored = sym.withColumn(
        "cosine_sim",
        F.round(
            F.col("pair_count") / F.sqrt(F.col("__ci") * F.col("__cn")), 6
        ),
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("item", "neighbor", "pair_count", "cosine_sim")
    )
