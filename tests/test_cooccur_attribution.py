"""Co-occurrence mining and linear multi-touch attribution."""

from __future__ import annotations

import datetime

from netflix_data_ingestion_spark.operators.attribution import (
    linear_attribution,
)
from netflix_data_ingestion_spark.operators.cooccur import (
    cooccurrence_pairs,
)


def test_cooccurrence_set_semantics_support_and_marginals(spark):
    rows = [
        (1, 10), (1, 20), (1, 20),   # basket 1: {10,20} — dup 20 counts once
        (2, 10), (2, 20), (2, 30),
        (3, 10), (3, 30),
        (4, 40),                      # singleton basket: no pairs
    ]
    df = spark.createDataFrame(rows, "order long, part long")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_pairs(df, "order", "part", min_support=2).collect()
    }
    # only (10,20) [baskets 1,2] and (10,30) [baskets 2,3] reach support 2;
    # (20,30) appears once and is pruned
    assert set(got) == {(10, 20), (10, 30)}
    r = got[(10, 20)]
    assert (r["pair_count"], r["count_a"], r["count_b"], r["n_baskets"]) == (
        2, 3, 2, 4)
    r = got[(10, 30)]
    assert (r["pair_count"], r["count_a"], r["count_b"]) == (2, 3, 2)


def test_linear_attribution_window_and_weights(spark):
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, dt_hours, user, etype):
        return (
            eid,
            t0 + datetime.timedelta(hours=dt_hours),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, -2, 7, "view"),     # in window
        ev(2, -1, 7, "view"),     # in window
        ev(3, -30, 7, "view"),    # outside 1-day lookback
        ev(4, 0, 7, "view"),      # same instant: excluded (half-open)
        ev(5, 0, 7, "purchase"),
        ev(6, 0, 8, "purchase"),  # no views: unattributed
        ev(7, -1, 9, "click"),    # wrong touch type
        ev(8, 0, 9, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    got = linear_attribution(df).collect()
    assert {(r["conversion_id"], r["touch_id"]) for r in got} == {
        (5, 1), (5, 2)}
    assert all(r["weight"] == 0.5 for r in got)


def test_item_similarity_normalizes_bestsellers(spark):
    """A bestseller co-occurring with everything is NOT the nearest
    neighbor of niche items that perfectly co-occur with each other."""
    from netflix_data_ingestion_spark.operators.cooccur import (
        item_similarity_topk,
    )

    rows = []
    # bestseller 99 in every basket; niche 1 & 2 always together in 3 baskets
    for b in range(1, 11):
        rows.append((b, 99))
    for b in (1, 2, 3):
        rows += [(b, 1), (b, 2)]
    df = spark.createDataFrame(rows, "basket long, item long")
    out = {
        r["item"]: (r["neighbor"], r["cosine_sim"])
        for r in item_similarity_topk(df, "basket", "item", k=1).collect()
    }
    # item 1's best neighbor is 2 (cos=1.0), not the bestseller
    assert out[1] == (2, 1.0) and out[2] == (1, 1.0)
    import math
    expected = round(3 / math.sqrt(3 * 10), 6)
    assert out[99][1] == expected
