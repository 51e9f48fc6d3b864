"""Vector column expressions over array<float> embedding columns.

All math is expressed with ``zip_with`` / ``aggregate`` so it runs JVM-side
(no Python round-trips); inputs are cast to double so results are
bit-deterministic across engines (sequential left-fold summation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision, sequential summation order —
    matches a DuckDB ``list_dot_product`` oracle to ~1e-15."""
    return dot(a, b) / (norm(a) * norm(b))
