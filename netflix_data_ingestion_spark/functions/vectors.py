"""Vector math over ``array<float>`` embedding columns — pure built-ins.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no Python
row transfer), which is the scale path for brute-force similarity over
100 TB of embeddings.  Elements are cast to double before accumulation so
results are stable regardless of the storage element type (float32 in the
testdata parquet).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm of a numeric array (double)."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe only as far as Spark array ops are."""
    return dot(a, b) / (norm(a) * norm(b))
