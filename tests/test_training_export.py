"""End-to-end training-data export (training_export.py)."""

from __future__ import annotations

import glob
import json
import os

from netflix_data_ingestion_spark.training_export import (
    export_training_data,
    verify_export,
)

SF_DIR = "/root/testdata/sf0.001"


def test_export_produces_consistent_artifacts(spark, tmp_path):
    out = str(tmp_path / "release1")
    m = export_training_data(spark, SF_DIR, out, target_rows_per_file=10)
    # manifest on disk equals the return value
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == m
    assert 0 < m["n_curated"] <= m["n_input"]
    assert m["n_shards"] >= 1 and m["n_chunks"] >= 1
    # every artifact carries exactly the curated rows
    shards = spark.read.parquet(os.path.join(out, "shards"))
    assert shards.count() == m["n_curated"]
    jsonl = spark.read.json(os.path.join(out, "jsonl"))
    assert jsonl.count() == m["n_curated"]
    assert glob.glob(os.path.join(out, "shards", "part-*.parquet"))
    # consumer-side integrity check passes from the artifacts alone
    assert verify_export(spark, out)


def test_export_is_reproducible(spark, tmp_path):
    """Same inputs -> byte-identical release fingerprint."""
    m1 = export_training_data(
        spark, SF_DIR, str(tmp_path / "r1"), target_rows_per_file=10
    )
    m2 = export_training_data(
        spark, SF_DIR, str(tmp_path / "r2"), target_rows_per_file=10
    )
    assert m1 == m2


def test_export_tamper_detection(spark, tmp_path):
    out = str(tmp_path / "release2")
    export_training_data(spark, SF_DIR, out, target_rows_per_file=10)
    # corrupt the manifest digest -> verify must fail
    p = os.path.join(out, "manifest.json")
    with open(p) as f:
        m = json.load(f)
    m["digest"] = str(int(m["digest"]) + 1)
    with open(p, "w") as f:
        json.dump(m, f)
    assert not verify_export(spark, out)


def test_export_text_tamper_detection(spark, tmp_path):
    """The release digest covers the text payload itself: rewriting the
    shards with one character of one document changed must fail the
    consumer-side integrity check (metadata columns untouched)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "release3")
    export_training_data(spark, SF_DIR, out, target_rows_per_file=10)
    shard_dir = os.path.join(out, "shards")
    shards = spark.read.parquet(shard_dir)
    first_id = shards.select("doc_id").orderBy("doc_id").first()[0]
    tampered = shards.withColumn(
        "text",
        F.when(
            F.col("doc_id") == F.lit(first_id),
            F.concat(F.col("text"), F.lit("X")),
        ).otherwise(F.col("text")),
    )
    tampered.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        shard_dir
    )
    assert not verify_export(spark, out)
