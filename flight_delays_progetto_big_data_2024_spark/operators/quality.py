"""Data-quality constraint checking: declarative expectations evaluated
in ONE pass over the table.

The pipeline-gate pattern (Deequ/Great-Expectations shape, Spark-first):
each rule is a boolean column expression; all rules aggregate together
as conditional counts in a single scan — adding a rule adds a column to
the aggregate, never a scan. At 100 TB the whole report is one
map-side-combined aggregation, no shuffle beyond the 1-row result.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_non_null(col: str) -> Column:
    return F.col(col).isNotNull()


def expect_unique_key(*cols: str) -> Column:
    """Marker for uniqueness rules — handled separately (uniqueness is a
    property of the table, not a row); see :func:`constraint_report`."""
    raise NotImplementedError(
        "uniqueness is table-level; pass unique_keys= to constraint_report"
    )


def expect_in_range(col: str, lo: float, hi: float) -> Column:
    return F.col(col).between(F.lit(lo), F.lit(hi))


def expect_in_set(col: str, values: list) -> Column:
    return F.col(col).isin(values)


def expect_matches(col: str, pattern: str) -> Column:
    return F.col(col).rlike(pattern)


def constraint_report(
    df: DataFrame,
    rules: Mapping[str, Column],
    unique_keys: Mapping[str, list[str]] | None = None,
) -> DataFrame:
    """One row per rule: ``(rule, violations, total, pass)``. Row rules
    evaluate in ONE aggregation pass; each ``unique_keys`` entry adds
    one groupBy over its key columns (a uniqueness check is inherently
    a shuffle on the key — but counts duplicate GROUPS map-side, so the
    shuffle carries partial aggregates, not rows).

    NULL semantics follow SQL CHECK constraints: a rule evaluating to
    UNKNOWN on a row (e.g. ``expect_in_range`` over a NULL value) is
    NOT a violation — pair any nullable column with an explicit
    ``expect_non_null`` rule when missing values should fail."""
    total = F.count(F.lit(1))
    agg = df.agg(
        total.alias("__total"),
        *[
            F.sum(F.when(~cond, 1).otherwise(0)).alias(f"__v_{name}")
            for name, cond in rules.items()
        ],
    )
    report = agg.select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in rules]),
                F.array(*[F.col(f"__v_{n}") for n in rules]),
            )
        ).alias("rule", "violations"),
        F.col("__total").alias("total"),
    )
    parts = [report]
    for name, keys in (unique_keys or {}).items():
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1)), F.lit(0)
                ).alias("violations"),
                F.coalesce(F.sum("__n"), F.lit(0)).alias("total"),
            )
            .select(F.lit(name).alias("rule"), "violations", "total")
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("violations") == 0)
