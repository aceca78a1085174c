"""Movie-title parser (reference etl_pipeline_spark.py:884-909)."""

from __future__ import annotations

from netflix_data_ingestion_spark.sources.movies import parse_movie_lines


def _parse(spark, lines):
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    return {r["movie_id"]: r for r in parse_movie_lines(df).collect()}


def test_commas_in_title_preserved(spark):
    rows = _parse(spark, ["7,1997,Movie, With, Commas"])
    assert rows[7]["title"] == "Movie, With, Commas"
    assert rows[7]["release_year"] == 1997


def test_null_year_tolerated(spark):
    rows = _parse(spark, ["8,NULL,Some Movie"])
    assert rows[8]["release_year"] is None
    assert rows[8]["title"] == "Some Movie"


def test_two_field_fallback(spark):
    # title falls back to field 2 when only two fields exist (:900-905)
    rows = _parse(spark, ["9,2001"])
    assert rows[9]["title"] == "2001"
    assert rows[9]["release_year"] == 2001


def test_non_integer_id_dropped(spark):
    rows = _parse(spark, ["x,2000,Bad Row", "10,2000,Good Row"])
    assert set(rows) == {10}


def test_title_truncated_to_500(spark):
    long_title = "A" * 600
    rows = _parse(spark, [f"11,1999,{long_title}"])
    assert len(rows[11]["title"]) == 500
