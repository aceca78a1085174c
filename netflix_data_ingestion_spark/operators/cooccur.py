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

from pyspark.sql import DataFrame
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
    basket_items = (
        ensure_parallelism(df)
        .select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
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
