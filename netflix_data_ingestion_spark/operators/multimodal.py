"""Multimodal column plumbing — beyond-reference (BASELINE.json north star).

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata.  The Spark-side plumbing — schemas, per-row metadata
extraction, Arrow-batched ``mapInPandas`` decode/feature stages — is real
and tested; the actual media decode is STUBBED (image/audio libraries are
not available in this environment): ``decode_stub_features`` derives a
deterministic fake feature vector from the payload hash so the pipeline
shape (batch sizes, schema evolution, partitioning) can be validated
end-to-end, and raises ``NotImplementedError`` when asked for a real
decode.

At 100 TB: binary payloads make row groups large — ingest should set
``spark.sql.files.maxPartitionBytes`` with payload size in mind, and
feature extraction is a ``mapInPandas`` over Arrow batches (payloads
never pass through Python row-by-row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Demo ingest: treat a text column's UTF-8 bytes as an opaque payload
    and attach the typed metadata columns of MEDIA_SCHEMA."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("feature_norm", T.DoubleType(), True),
    ]
)


def decode_stub_features(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched 'decode + feature extract' stage over MEDIA_SCHEMA rows.

    ``real_decode=True`` raises NotImplementedError (no media libs in this
    container); the stub derives deterministic pseudo-features from the
    payload bytes so batch shape / schema / partitioning are exercised.
    """
    if real_decode:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this environment; wire PIL/torchaudio here on a real cluster"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            # deterministic fake dimensions from payload length
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": (n_bytes % 1920 + 1).astype("int32"),
                    "fake_height": (n_bytes % 1080 + 1).astype("int32"),
                    "feature_norm": (n_bytes.astype("float64") ** 0.5),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-SQL metadata projection over a MEDIA_SCHEMA frame (oracle-able)."""
    return df.select(
        "media_id",
        "media_type",
        "n_bytes",
        "sha256",
    )
