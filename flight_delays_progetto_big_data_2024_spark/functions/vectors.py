"""Vector column expressions over ``array<float/double>`` embeddings.

Dot products and cosines are built from ``zip_with`` + ``aggregate``
higher-order functions: JVM-side, sequential left-to-right summation in
index order — which makes results bit-reproducible and lets the DuckDB
oracle (``list_dot_product`` over ``DOUBLE[]``, same ordering) agree to
the last ulp before rounding. A Pandas-UDF/numpy path would be faster
per-row but non-deterministic in summation order; for 64-dim vectors
the expression path is plenty.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.coerce import _c


def as_double_array(col: str | Column) -> Column:
    return _c(col).cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ a_i·b_i, sequential in index order."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column, scale: int | None = None) -> Column:
    """Cosine similarity; pass ``scale`` to round for stable cross-engine
    comparison and deterministic top-k ranking."""
    c = dot(a, b) / (l2_norm(a) * l2_norm(b))
    return F.round(c, scale) if scale is not None else c


def cosine_prenormed(a: str | Column, b: str | Column, norm_a: str | Column, norm_b: str | Column, scale: int | None = None) -> Column:
    """Cosine with precomputed norms (avoids recomputing the corpus-side
    norm once per query in a top-k scan)."""
    c = dot(a, b) / (_c(norm_a) * _c(norm_b))
    return F.round(c, scale) if scale is not None else c
