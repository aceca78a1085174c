"""Pipeline orchestrator — idempotent staged builds with a manifest.

Spark-first replacement for the reference's control plane: the mutable
``etl_checkpoint.json`` + ProgressTracker (etl_pipeline_spark.py:188-287),
per-stage skip logic (:816-821, 867-882, 1003-1019), and the pre-flight
safety validation comparing DB counts against the checkpoint (:433-567).

Here a stage is complete iff its output Parquet table AND its manifest
row exist; re-runs skip completed stages; recorded row counts provide the
same count-vs-checkpoint consistency check, without a mutable JSON file
being the source of truth (the data is).

The fact table is written partitioned by ``year`` (derived from
date_key), the reference's own roadmap wish (README.md:819) — at 100 TB
this is what makes date-range queries prune partitions instead of
scanning everything.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.plans import star
from netflix_data_ingestion_spark.sources.movies import parse_movie_lines
from netflix_data_ingestion_spark.sources.ratings import read_and_parse
from netflix_data_ingestion_spark.sources.writers import write_partitioned

MANIFEST = "_manifest.json"


@dataclass
class StageResult:
    name: str
    rows: int
    seconds: float
    skipped: bool


class StarPipeline:
    """Build the full star schema from raw Netflix-format inputs."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        rating_paths: list[str],
        movie_titles_path: str,
        date_range: tuple[str, str] = star.DEFAULT_DATE_RANGE,
    ) -> None:
        self.spark = spark
        self.warehouse = warehouse_dir
        self.rating_paths = rating_paths
        self.movie_titles_path = movie_titles_path
        self.date_range = date_range
        os.makedirs(warehouse_dir, exist_ok=True)

    # -- manifest -----------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.warehouse, MANIFEST)

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _record(self, name: str, rows: int, seconds: float) -> None:
        manifest = self._load_manifest()
        manifest[name] = {"rows": rows, "seconds": round(seconds, 2)}
        with open(self._manifest_path(), "w") as f:
            json.dump(manifest, f, indent=2)

    def _table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _is_complete(self, name: str) -> bool:
        return name in self._load_manifest() and os.path.isdir(
            self._table_path(name)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._table_path(name))

    # -- stages -------------------------------------------------------------

    def _run_stage(
        self, name: str, build: callable, partition_by: list[str] | None = None
    ) -> StageResult:
        if self._is_complete(name):
            return StageResult(name, self._load_manifest()[name]["rows"], 0.0, True)
        t0 = time.time()
        df = build()
        # retrying writer (reference bulk-load parity): transient sink
        # failures back off instead of aborting the stage
        write_partitioned(
            df, self._table_path(name), partition_by, mode="overwrite"
        )
        rows = self.read(name).count()
        secs = time.time() - t0
        self._record(name, rows, secs)
        return StageResult(name, rows, secs, False)

    def run(self) -> list[StageResult]:
        results = []

        results.append(
            self._run_stage(
                "dim_date",
                lambda: star.build_dim_date(self.spark, *self.date_range),
            )
        )

        results.append(
            self._run_stage(
                "dim_movie",
                lambda: star.build_dim_movie(
                    parse_movie_lines(self.spark.read.text(self.movie_titles_path))
                ),
            )
        )

        # stage the parsed lines as parquet ONCE: DataFrames are lazy, so
        # handing the same parse plan to two stages re-runs the whole
        # text scan + forward-fill per stage (measured 2x the pipeline
        # wall-clock at 10M rows); downstream stages re-read columnar
        results.append(
            self._run_stage(
                "stg_ratings",
                lambda: read_and_parse(self.spark, self.rating_paths),
            )
        )
        ratings = self.read("stg_ratings")

        results.append(
            self._run_stage(
                "dim_customer_base",
                lambda: star.build_dim_customer(ratings),
            )
        )

        def build_fact() -> DataFrame:
            fact, _extras = star.build_fact_ratings(
                ratings, self.read("dim_movie"), self.read("dim_customer_base")
            )
            # partition by year for pruning at scale (README.md:819 wish)
            return fact.withColumn(
                "year", (F.col("date_key") / 10000).cast("int")
            )

        results.append(self._run_stage("fact_ratings", build_fact, ["year"]))

        results.append(
            self._run_stage(
                "dim_customer",
                lambda: star.with_customer_aggregates(
                    self.read("dim_customer_base"),
                    self.read("fact_ratings"),
                    self.read("dim_date"),
                ),
            )
        )
        return results

    # -- validation (reference validate_existing_data_safety analog) --------

    def validate(self) -> dict[str, bool]:
        """Recount every completed table and compare with the manifest.

        A manifest row whose table directory is gone is NOT a failure —
        by `_is_complete`'s own definition that stage is simply
        incomplete and `run()` will rebuild it; only a table that exists
        with the WRONG contents is a safety violation (the CLI's exit-2
        gate, mirroring the reference's DB-vs-checkpoint pre-flight).
        """
        manifest = self._load_manifest()
        out = {}
        for name, meta in manifest.items():
            if not os.path.isdir(self._table_path(name)):
                continue
            actual = self.read(name).count()
            out[name] = actual == meta["rows"]
        return out
