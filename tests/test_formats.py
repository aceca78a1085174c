from __future__ import annotations

from netflix_data_ingestion_spark.sources.readers import (
    read_csv,
    read_jsonl,
    split_dead_letters,
)


def test_csv_schema_and_dead_letters(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,price,name\n"
        "1,10.5,widget\n"
        "oops,not_a_number,bad\n"
        "2,20.0,gizmo\n"
    )
    df = read_csv(spark, str(p), "id bigint, price double, name string")
    clean, dead = split_dead_letters(df)
    rows = {r["id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["price"] == 10.5
    assert clean.columns == ["id", "price", "name"]
    dl = dead.collect()
    assert len(dl) == 1
    # the raw line survives for quarantine + replay
    assert "not_a_number" in dl[0]["_corrupt_record"]


def test_csv_custom_delimiter(spark, tmp_path):
    p = tmp_path / "in.psv"
    p.write_text("id|name\n1|a|b\n2|plain\n")
    df = read_csv(
        spark, str(p), "id bigint, name string", delimiter="|"
    )
    clean, dead = split_dead_letters(df)
    # extra-column line is malformed under the declared 2-col schema
    assert [r["id"] for r in clean.collect()] == [2]
    assert dead.count() == 1


def test_jsonl_schema_evolution_and_dead_letters(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "extra_field": true}\n'
        "this is not json\n"
        '{"id": 2}\n'
    )
    df = read_jsonl(spark, str(p), "id bigint, name string")
    clean, dead = split_dead_letters(df)
    rows = {r["id"]: r["name"] for r in clean.collect()}
    # unknown fields ignored; missing fields read as NULL
    assert rows == {1: "a", 2: None}
    assert dead.count() == 1


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC interop: partitioned write + read back row-identical; filter
    on the partition column prunes (PartitionFilters), and a value
    predicate reaches the ORC scan (PushedFilters)."""
    from netflix_data_ingestion_spark.sources.readers import read_orc
    from netflix_data_ingestion_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)],
        "id long, part int, val string",
    )
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path, partition_by=["part"])
    back = read_orc(spark, path)
    assert sorted((r["id"], r["val"]) for r in back.collect()) == sorted(
        (r["id"], r["val"]) for r in df.collect()
    )
    plan = (
        back.filter((back["part"] == 1) & (back["id"] > 5))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "isnotnull(id" in plan


def test_jsonl_round_trip_via_writer(spark, tmp_path):
    from netflix_data_ingestion_spark.sources.readers import read_jsonl
    from netflix_data_ingestion_spark.sources.writers import write_jsonl

    df = spark.createDataFrame(
        [(1, "a \"quoted\" string", 1.5), (2, None, -3.0)],
        "id long, txt string, score double",
    )
    path = str(tmp_path / "jsonl_out")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "id long, txt string, score double")
    got = sorted(
        (r["id"], r["txt"], r["score"])
        for r in back.select("id", "txt", "score").collect()
    )
    assert got == [(1, 'a "quoted" string', 1.5), (2, None, -3.0)]
