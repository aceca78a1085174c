"""Batched model-inference plumbing — beyond-reference (the "score
every document with a learned quality/safety classifier" stage of a
curation pipeline, e.g. the fastText/logreg gates in web-corpus
curation).

What is REAL here is the Spark-side shape a model-scoring stage must
have at 100 TB — and it is the same shape whatever the model is:

- ``mapInPandas`` over Arrow record batches: the model runs VECTORIZED
  on thousands of rows per call, never per-row Python;
- the model loads ONCE PER TASK (inside the generator, before the
  batch loop), not per batch — the pattern that amortizes a
  multi-second model load over a whole partition;
- ``batch_rows`` caps Arrow batch size so activation memory is
  bounded regardless of partition size;
- output is (id, score) — a narrow frame joined back by id, so the
  heavy text column does not ride through the scoring exchange.

The model itself is a DETERMINISTIC STAND-IN (an md5-keyed linear
probe: score = hexint(md5(salt|text)[:8]) / 2^32, plus a length
feature), because no ML runtime ships in this environment — the same
honest-stub discipline as operators/multimodal.  Unlike an opaque
model, the stand-in is reproducible in SQL, so even this stage gets a
full value-hash oracle (`doc_model_scores`).  Swap ``_load_model``
for a real artifact load; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql import types as T

from netflix_data_ingestion_spark.operators.util import ensure_parallelism

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("n_batches", T.IntegerType(), True),
    ]
)


def _load_model(salt: str):
    """Stand-in for a per-task model load.  Returns a vectorized
    scorer: pandas.Series[str] -> pandas.Series[float] in [0, 1)."""
    import hashlib

    def score(texts):
        def one(t: str) -> float:
            h = hashlib.md5(f"{salt}|{t}".encode()).hexdigest()[:8]
            return int(h, 16) / 2**32

        return texts.map(one)

    return score


def score_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "m1",
    batch_rows: int = 512,
) -> DataFrame:
    """(doc_id, score, n_batches) — every document scored by the
    (stand-in) model in Arrow batches of at most ``batch_rows`` rows.
    ``n_batches`` records how many batches the row's TASK processed at
    the time the row was emitted — it exists so tests can prove the
    batch-size cap actually bit (plumbing observability, not data).
    """
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
    )

    def run(batches: Iterator) -> Iterator:
        model = _load_model(salt)  # once per task, before the batch loop
        seen = 0
        for pdf in batches:
            seen += 1
            out = pdf[[id_col]].copy()
            out["score"] = model(pdf[text_col].astype(str))
            out["n_batches"] = seen
            yield out.rename(columns={id_col: "doc_id"})

    return ensure_parallelism(df).select(id_col, text_col).mapInPandas(
        run, SCORE_SCHEMA
    )
