"""Deterministic sampling and splitting for training-data pipelines.

``df.randomSplit`` / ``df.sample`` are seed-based but NOT content-
deterministic: assignment depends on partitioning and row order, so the
same document can change splits across cluster layouts, reruns, or
upstream repartitions — poison for train/test hygiene. These operators
assign by a hash of the ROW IDENTITY instead: the same id lands in the
same split on any cluster, any day, regardless of physical layout.

The bucket is the first 4 hex chars of ``md5(id || salt)`` — a uniform
65536-bucket space expressed as a lexicographically ordered string, so
the assignment is a pure projection (no shuffle, fully pushed into the
scan stage) and engine-portable verbatim (DuckDB/ANSI:
``substr(md5(...), 1, 4)``), which keeps every split oracle-checkable.

Scale posture: both operators are narrow maps — zero shuffles, no
driver state, trivially parallel at 100 TB. Changing ``salt`` re-draws
the assignment (e.g. per-epoch subsampling) without touching the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 65536


def _hash_bucket(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )


def _cut(frac: float) -> str:
    """Cumulative-fraction cut point as a 4-hex lower bound; fractions
    ≥ 1 map to a sentinel above 'ffff' so the comparison stays true."""
    n = int(frac * _BUCKETS)
    return "zzzz" if n >= _BUCKETS else format(n, "04x")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append a content-deterministic split label: bucket(id) falls in
    the half-open interval whose width is the (normalized) weight.
    Granularity is 1/65536 — weights are honored to ±0.002%."""
    assert len(weights) == len(labels) and len(labels) >= 2
    total = float(sum(weights))
    bucket = _hash_bucket(id_col, salt)
    acc = 0.0
    expr = None
    for w, label in zip(weights[:-1], labels[:-1]):
        acc += w / total
        cond = bucket < F.lit(_cut(acc))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(split_col, expr.otherwise(labels[-1]))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Content-deterministic Bernoulli-style sample: keeps ids whose
    bucket falls below ``fraction`` of the hash space. Unlike
    ``df.sample`` the kept set is a stable function of (id, salt)."""
    assert 0.0 <= fraction <= 1.0
    return df.filter(_hash_bucket(id_col, salt) < F.lit(_cut(fraction)))
