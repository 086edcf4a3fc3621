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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Measurement-domain ceiling for SECOND-MOMENT statistics (stddev /
#: variance / z-score / correlation): past |x| ~ 1.34e154 a squared
#: value or squared deviation overflows double, where the engines
#: DIVERGE — DuckDB's stddev_samp raises OUT OF RANGE while Spark's
#: M2 accumulator silently saturates to Inf/NaN (round-10 measure-axis
#: probe: a finite +DBL_MAX event value crashed the q101/q184 oracles).
#: A value that large is not a usable measurement for moment stats, so
#: both engines exclude it AT THE DOMAIN, the same resolution as the
#: round-8 EUCLID_NORM_BOUND (similarity.py:429) for the rounding-grid
#: envelope. 1e150 leaves 4 orders of magnitude of headroom for the
#: deviation doubling and group-size multipliers. FIRST-moment-only
#: aggregates (plain sums/avgs) deliberately keep the full finite
#: domain — same-sign absorption is deterministic and both engines
#: agree there.
MEASURE_DOMAIN_BOUND = 1.0e150

#: DuckDB twin of :func:`is_moment_measurement` — keep both in sync.
MOMENT_MEASUREMENT_SQL = (
    "({col} IS NOT NULL AND isfinite({col}) AND abs({col}) < 1e150)"
)


def is_moment_measurement(col: str | Column) -> Column:
    """True when ``col`` is a defined measurement for second-moment
    statistics: non-NULL, non-NaN, finite, and inside
    MEASURE_DOMAIN_BOUND (see the constant's rationale). Spark orders
    NaN above every double, so the explicit isnan test is load-bearing
    (the |x| < bound comparison alone would keep NaN out, but only by
    accident of NaN comparison semantics — keep it explicit)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        c.isNotNull()
        & ~F.isnan(c)
        & (F.abs(c) < F.lit(MEASURE_DOMAIN_BOUND))
    )


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
