"""Property-based block-parser test (SURVEY.md §5.2.4).

Invariants for ANY generated ratings file:
- parsed row count == generated valid detail-line count
- every row is attributed to the correct (nearest preceding) header
- malformed lines never crash the parse, only drop
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

block_sizes = st.lists(
    st.integers(min_value=0, max_value=60), min_size=1, max_size=25
)
malformed = st.sampled_from(
    ["bad,line", "x,1,2004-01-01", "7,,2004-01-01", ",,", "justtext"]
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sizes=block_sizes, junk_every=st.integers(min_value=0, max_value=7))
def test_block_attribution_invariants(spark, sizes, junk_every):
    from netflix_data_ingestion_spark.sources.ratings import parse_rating_lines

    lines = []
    expected = {}
    line_no = 0
    for mid, n in enumerate(sizes, start=1):
        lines.append(f"{mid}:")
        expected[mid] = n
        for i in range(n):
            if junk_every and line_no % junk_every == 3:
                lines.append("x,bad,row")  # dropped, not attributed
            lines.append(f"{100 + i},{(i % 5) + 1},2004-06-{(i % 28) + 1:02d}")
            line_no += 1

    df = spark.createDataFrame([(line,) for line in lines], "value string")
    got = {
        r["movie_id"]: r["cnt"]
        for r in parse_rating_lines(df)
        .groupBy("movie_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert got == {m: n for m, n in expected.items() if n > 0}
