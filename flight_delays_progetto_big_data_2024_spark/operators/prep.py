"""Preprocessing operators (SURVEY.md §2.2 P1-P13, reference
src/preprocessing.py).

The reference runs its null profile 4 times, each with its own
``df.count()`` action and no caching (reference preprocessing.py:14-26,
SURVEY.md §3.1) — ≥8 full-table jobs before any analysis. Here the
profile is ONE aggregation pass (null counts and the total row count in
the same agg), returned as a DataFrame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """One row; per-column null counts + ``total_rows`` (reference
    preprocessing.py:14-26, one pass instead of count()+select)."""
    cols = list(columns) if columns is not None else df.columns
    aggs = [F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls") for c in cols]
    aggs.append(F.count("*").alias("total_rows"))
    return df.agg(*aggs)


def null_pct_profile(df: DataFrame, columns: Sequence[str] | None = None, scale: int = 6) -> DataFrame:
    """One row; per-column null percentage (reference
    preprocessing.py:24-25)."""
    cols = list(columns) if columns is not None else df.columns
    profile = null_profile(df, cols)
    exprs = [
        F.round(F.col(f"{c}_nulls") / F.col("total_rows") * 100.0, scale).alias(f"{c}_null_pct")
        for c in cols
    ]
    return profile.select(*exprs)


def split_by_flag(df: DataFrame, flag_col: str, value: object = 1) -> tuple[DataFrame, DataFrame]:
    """(matching, non-matching) split on an equality predicate (reference
    preprocessing.py:74-79: cancelled vs operated flights). Both halves
    share the parent plan; Catalyst pushes each predicate to the scan."""
    matching = df.filter(F.col(flag_col) == F.lit(value))
    non_matching = df.filter(F.col(flag_col) != F.lit(value))
    return matching, non_matching


def drop_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Drop with ignore-missing semantics (reference preprocessing.py:85-105
    drops names that don't exist — Spark's ``drop`` tolerates that;
    preserved deliberately, SURVEY.md P9)."""
    return df.drop(*columns)


def drop_null_rows(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """dropna on a subset (reference preprocessing.py:119, SURVEY.md P10)."""
    return df.na.drop(subset=list(subset))


def fill_nulls(df: DataFrame, value: object, subset: Sequence[str] | None = None) -> DataFrame:
    """0-fill after outer joins (reference delayed_flights.py:284, P11)."""
    return df.na.fill(value, list(subset) if subset else None)
