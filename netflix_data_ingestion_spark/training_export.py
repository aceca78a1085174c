"""End-to-end training-data export — the capstone composition.

One call takes the raw documents table to loader-ready artifacts:

    curate (lang gate -> quality gate -> CC near-dup dedup -> source
    quota -> token-budget packing, operators/curate.curate_corpus — the
    oracle-proven ladder) -> re-attach text -> length-sorted balanced
    parquet shards (padding-efficient batching) + gzip JSONL interchange
    copy + a manifest carrying per-stage counts and the order-invariant
    content digest.

Everything upstream is deterministic (md5 sampling, integer gates), so
the digest doubles as the release fingerprint: re-running the export on
the same inputs MUST reproduce it byte-for-byte, and a consumer on any
engine can re-derive it from the shards alone to verify integrity
(operators/digest.table_digest's cross-engine contract).

Scale: every stage inherits its operator's posture (see SCALE.md); the
export adds one balance repartition and two sink writes — nothing new
shuffles.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.curate import curate_corpus
from netflix_data_ingestion_spark.operators.digest import table_digest
from netflix_data_ingestion_spark.sources.readers import read_table
from netflix_data_ingestion_spark.sources.writers import (
    write_jsonl,
    write_length_sorted_shards,
)

#: digest canonicalization: integer/string columns only (double columns
#: like quality_score are engine-render-sensitive and stay OUT of the
#: release fingerprint; they ride the shards as data regardless).
#: ``text`` — the actual training payload — IS digested: the consumer
#: integrity check must catch shard text tampering, not just metadata.
_DIGEST_COLS = ["doc_id", "source", "n_tokens", "chunk_id", "chunk_offset", "text"]


def export_training_data(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    target_rows_per_file: int = 200,
    **curate_kwargs,
) -> dict:
    """Run the full export; returns (and writes to
    ``<out_dir>/manifest.json``) the release manifest:
    ``{n_input, n_curated, n_chunks, n_shards, digest}``.
    """
    docs = read_table(spark, sf_dir, "documents")
    curated = curate_corpus(docs, **curate_kwargs)
    full = curated.join(
        docs.select("doc_id", "text"), "doc_id"
    ).localCheckpoint(eager=True)

    n_input = docs.count()
    n_curated = full.count()
    n_chunks = full.select("chunk_id").distinct().count()

    shards = write_length_sorted_shards(
        full,
        os.path.join(out_dir, "shards"),
        "doc_id",
        "n_tokens",
        target_rows_per_file,
    )
    write_jsonl(full, os.path.join(out_dir, "jsonl"))

    canon = full.select(
        *[F.col(c).cast("string").alias(c) for c in _DIGEST_COLS]
    )
    drow = table_digest(canon).collect()[0]
    manifest = {
        "n_input": n_input,
        "n_curated": n_curated,
        "n_chunks": n_chunks,
        "n_shards": shards,
        "digest": drow["digest"],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def verify_export(spark: SparkSession, out_dir: str) -> bool:
    """Consumer-side integrity check: recompute the digest from the
    written SHARDS and compare to the manifest — the receiving cluster
    needs only the artifact directory, no upstream access."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    shards: DataFrame = spark.read.parquet(os.path.join(out_dir, "shards"))
    canon = shards.select(
        *[F.col(c).cast("string").alias(c) for c in _DIGEST_COLS]
    )
    drow = table_digest(canon).collect()[0]
    return (
        drow["digest"] == manifest["digest"]
        and drow["n_rows"] == manifest["n_curated"]
    )
