"""Ratings block parser — nearest-preceding-header attribution
(reference etl_pipeline_spark.py:1082-1142; hazard SURVEY.md §4.4).

Property-style generator: random block sizes including empty blocks and
one block far larger than any partition split, parsed from real files
with forced-small splits so blocks MUST span partition boundaries.
"""

from __future__ import annotations

import random

import pytest

from netflix_data_ingestion_spark.sources.ratings import (
    parse_rating_lines,
    read_and_parse,
)


def _gen_file(path: str, blocks: dict[int, int], seed: int) -> dict[int, int]:
    rng = random.Random(seed)
    with open(path, "w") as f:
        for mid, n in blocks.items():
            f.write(f"{mid}:\n")
            for _ in range(n):
                f.write(
                    f"{rng.randint(1, 400)},{rng.randint(1, 5)},"
                    f"2004-0{rng.randint(1, 9)}-0{rng.randint(1, 9)}\n"
                )
    return blocks


def test_inline_attribution(spark):
    lines = ["5:", "1,3,2004-01-01", "2,4,2004-01-02", "9:", "3,5,2004-01-03"]
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    got = sorted(
        (r["movie_id"], r["customer_id"]) for r in parse_rating_lines(df).collect()
    )
    assert got == [(5, 1), (5, 2), (9, 3)]


def test_malformed_lines_dropped(spark):
    lines = ["5:", "x,3,2004-01-01", "1,,2004-01-01", "1,3", "2,4,2004-01-02"]
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    out = parse_rating_lines(df).collect()
    # "1,3" has no date field -> date_str NULL but customer/rating valid:
    # kept at parse level (date validity is enforced at fact assembly,
    # matching the reference's split of responsibilities)
    assert sorted((r["customer_id"], r["rating"]) for r in out) == [(1, 3), (2, 4)]


def test_leading_orphans_dropped(spark):
    lines = ["1,3,2004-01-01", "5:", "2,4,2004-01-02"]
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    got = [(r["movie_id"], r["customer_id"]) for r in parse_rating_lines(df).collect()]
    assert got == [(5, 2)]


@pytest.mark.parametrize("seed", [1, 2])
def test_blocks_spanning_partitions(spark, tmp_path, seed):
    """The §4.4 case: a block much larger than a file split must not lose rows."""
    rng = random.Random(seed * 100)
    blocks = {}
    for mid in range(1, 30):
        r = rng.random()
        blocks[mid] = 0 if r < 0.2 else rng.randint(1, 40)
    blocks[rng.randint(1, 29)] = 20_000  # spans many 64KB splits

    p1 = str(tmp_path / "f1.txt")
    p2 = str(tmp_path / "f2.txt")
    _gen_file(p1, {m: n for m, n in blocks.items() if m <= 15}, seed)
    _gen_file(p2, {m: n for m, n in blocks.items() if m > 15}, seed + 1)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        parsed = read_and_parse(spark, [p1, p2])
        got = {
            r["movie_id"]: r["cnt"]
            for r in parsed.groupBy("movie_id")
            .count()
            .withColumnRenamed("count", "cnt")
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    expected = {m: n for m, n in blocks.items() if n > 0}
    assert got == expected
