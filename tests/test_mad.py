from __future__ import annotations

from netflix_data_ingestion_spark.operators.outliers import (
    mad_outliers,
    zscore_outliers,
)


def test_mad_resists_the_masking_that_breaks_zscore(spark):
    # nine values near 10 plus THREE at 10000: the spikes inflate the
    # stddev so much they mask each other (every |z| < 2 -> z=2 flags
    # NOTHING), while median/MAD still flags exactly the spikes — the
    # masking-resistance point of MAD (Hampel)
    base = [8, 9, 9, 10, 10, 10, 11, 11, 12]
    rows = [("g", i, float(v)) for i, v in enumerate(base)]
    rows += [("g", 9 + j, 10000.0) for j in range(3)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    z = zscore_outliers(df, ["g"], "v", z_num=2, z_den=1, scale=1).collect()
    assert z == []
    m = mad_outliers(df, ["g"], "v", k_num=3, k_den=1, scale=1).collect()
    assert sorted(r["id"] for r in m) == [9, 10, 11]
    assert all(r["is_high"] for r in m)


def test_exact_boundary_is_strict(spark):
    # values 1..9: median 5, deviations sorted [0,1,1,2,2,3,3,4,4],
    # MAD = value at rank ceil(9/2)=5 -> 2; k=2 -> |dev| > 4 never
    # holds (max dev is exactly 4: strict inequality excludes it)
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(1, 10)], ["g", "id", "v"]
    )
    out = mad_outliers(df, ["g"], "v", k_num=2, k_den=1, scale=1).collect()
    assert out == []
    # k = 19/10 < 2 brings the extremes in
    out2 = mad_outliers(df, ["g"], "v", k_num=19, k_den=10, scale=1).collect()
    assert sorted(r["id"] for r in out2) == [1, 9]


def test_zero_mad_group_flags_all_deviants(spark):
    # documented caveat: >50% identical -> MAD 0 -> every deviant flags
    rows = [("g", i, 5.0) for i in range(6)] + [("g", 6, 5.01)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    out = mad_outliers(df, ["g"], "v", k_num=3, k_den=1).collect()
    assert [r["id"] for r in out] == [6]
