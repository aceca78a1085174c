"""CLI entry point: exit-code contract of ``python -m`` main().

Mirrors the reference runner's codes (etl_pipeline_spark.py:1510-1646):
0 success / 1 failure / 2 safety-check refusal / 130 interrupt.
"""

from __future__ import annotations

import pytest

from netflix_data_ingestion_spark.__main__ import main


@pytest.fixture()
def fixture_inputs(tmp_path):
    ratings = tmp_path / "combined_data_1.txt"
    ratings.write_text(
        "1:\n"
        "7,5,2004-01-10\n"
        "14,3,2004-02-11\n"
        "2:\n"
        "21,4,2005-03-12\n"
    )
    movies = tmp_path / "movie_titles.csv"
    movies.write_text("1,2003,First Movie\n2,1999,Second, The\n")
    return {
        "ratings": str(ratings),
        "movies": str(movies),
        "warehouse": str(tmp_path / "warehouse"),
    }


def _argv(fx, *extra):
    return [
        "--ratings", fx["ratings"],
        "--movie-titles", fx["movies"],
        "--warehouse", fx["warehouse"],
        "--date-range", "2004-01-01", "2005-12-31",
        *extra,
    ]


def test_success_and_resume_exit_zero(spark, fixture_inputs):
    assert main(_argv(fixture_inputs), spark=spark) == 0
    # second run resumes (all stages skipped) and still exits 0
    assert main(_argv(fixture_inputs), spark=spark) == 0
    assert main(_argv(fixture_inputs, "--validate-only"), spark=spark) == 0


def test_safety_check_failure_exits_two(spark, fixture_inputs):
    assert main(_argv(fixture_inputs), spark=spark) == 0
    # corrupt a completed table: same path, wrong contents
    spark.range(3).write.mode("overwrite").parquet(
        fixture_inputs["warehouse"] + "/dim_movie"
    )
    assert main(_argv(fixture_inputs), spark=spark) == 2


def test_failure_exits_one(spark, fixture_inputs):
    bad = dict(fixture_inputs, ratings=fixture_inputs["ratings"] + ".missing")
    assert main(_argv(bad), spark=spark) == 1


def test_interrupt_exits_130(spark, fixture_inputs, monkeypatch):
    from netflix_data_ingestion_spark.pipeline import StarPipeline

    def boom(self):
        raise KeyboardInterrupt

    monkeypatch.setattr(StarPipeline, "run", boom)
    assert main(_argv(fixture_inputs), spark=spark) == 130


def test_cli_query_list_and_run(spark, capsys):
    from netflix_data_ingestion_spark.__main__ import main

    assert main(["query", "list"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out and "dedup_exact" in out
    # run one against the small SF
    assert (
        main(
            ["query", "table_counts", "--sf-dir", "/root/testdata/sf0.001"],
            spark=spark,
        )
        == 0
    )
    assert "lineitem" in capsys.readouterr().out
    # unknown name: exit 1, session untouched
    assert main(["query", "no_such_query"], spark=spark) == 1


def test_cli_query_dispatch_resolves_sys_argv(spark, capsys, monkeypatch):
    """Regression (r8): ``python -m netflix_data_ingestion_spark query
    list`` calls main() with argv=None — the query dispatch must
    resolve sys.argv itself, not fall through to the pipeline parser
    (which would error on the required --ratings/--warehouse args)."""
    import sys as _sys

    from netflix_data_ingestion_spark.__main__ import main

    monkeypatch.setattr(
        _sys, "argv", ["netflix_data_ingestion_spark", "query", "list"]
    )
    assert main(None, spark=spark) == 0
    assert "pricing_summary" in capsys.readouterr().out
