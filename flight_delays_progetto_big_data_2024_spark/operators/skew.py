"""Skew-mitigation operators for hot keys at scale.

AQE's skew-join splitting (on in session.py) covers sort-merge joins
whose skew is visible in shuffle statistics. These helpers cover what
AQE can't rewrite:

- ``salted_distinct_count``: COUNT(DISTINCT x) per key shuffles every
  distinct value of a hot key to one task. Two-level form: distinct
  within (key, hash-bucket-of-value), then sum per key — the hash
  buckets PARTITION the value space, so bucket-level distinct counts
  add exactly. Skew cost drops by the bucket factor.
- ``salted_join``: replicate-and-salt for a shuffle join against a
  modest (but above-broadcast-threshold) right side: the big side gets
  a deterministic salt, the right side is exploded across all salts, so
  one hot key spreads over ``n_salt`` tasks. Exact same rows as the
  plain join.

Salts derive from ``spark_partition_id`` — deterministic for a given
layout, no RNG state in the plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    alias: str = "n_distinct",
    buckets: int = 64,
) -> DataFrame:
    """Exact COUNT(DISTINCT value_col) per key, skew-resistant.

    Level 1 groups by (keys, xxhash64(value) % buckets): each task sees
    only one bucket of a hot key's values. Level 2 sums the per-bucket
    distinct counts — exact because equal values always hash to the
    same bucket (buckets partition the distinct-value set)."""
    bucket = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets))
    return (
        df.groupBy(*keys, bucket.alias("__bucket"))
        .agg(F.count_distinct(value_col).alias("__partial"))
        .groupBy(*keys)
        .agg(F.sum("__partial").alias(alias))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``n_salt`` times, spreading each hot join key over ``n_salt``
    reducers. Use when the small side exceeds the broadcast threshold
    but replication is still affordable (cost: |small| × n_salt rows
    shuffled). Supports inner and left joins (the salted key never
    changes match existence, only placement)."""
    assert how in ("inner", "left"), "salting supports inner/left joins"
    big_s = big.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salt))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")
