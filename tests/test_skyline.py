"""2-D grouped skyline: dominance semantics, duplicates, NULLs."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.skyline import skyline_2d


def test_skyline_dominance_duplicates_and_nulls(spark):
    rows = [
        # group g: frontier is (1, 9) and (2, 12); (2, 9) dominated by
        # both; (3, 12) dominated by (2,12) on price
        ("g", 1, 1.0, 9),
        ("g", 2, 2.0, 12),
        ("g", 3, 2.0, 9),
        ("g", 4, 3.0, 12),
        # duplicate frontier point: both survive (no strict dominance)
        ("g", 5, 1.0, 9),
        # NULL dimension: excluded
        ("g", 6, None, 99),
        # separate group: independent frontier
        ("h", 7, 5.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "grp string, pid long, price double, size long"
    )
    got = sorted(
        r["pid"]
        for r in skyline_2d(df, ["grp"], "price", "size").collect()
    )
    assert got == [1, 2, 5, 7]


def test_skyline_matches_bruteforce_on_random_points(spark):
    import random

    rng = random.Random(5)
    rows = [
        ("k", i, float(rng.randint(0, 20)), rng.randint(0, 20))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "grp string, pid long, price double, size long"
    )
    got = sorted(
        r["pid"]
        for r in skyline_2d(df, ["grp"], "price", "size").collect()
    )
    pts = {pid: (p, s) for _, pid, p, s in rows}
    expect = sorted(
        a
        for a, (pa, sa) in pts.items()
        if not any(
            pb <= pa and sb >= sa and (pb < pa or sb > sa)
            for b, (pb, sb) in pts.items()
        )
    )
    assert got == expect
