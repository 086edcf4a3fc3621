"""Parameterized relational operators (SURVEY.md §2.2-2.5, §2.7).

Each is a pure function over DataFrames, extracted from the query shapes
the reference hard-codes inside its plotting methods. Scale posture:

- group-by aggregations rely on Catalyst's partial+final hash agg
  (map-side combine) — no driver round-trips;
- "above the global mean" filters use an empty window, not collect
  (reference anti-pattern, SURVEY.md §4.3-3);
- dimension decoration broadcasts the small side explicitly;
- top-k is sort+limit so Spark plans TakeOrderedAndProject (no global
  sort materialization).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def count_by(df: DataFrame, keys: Sequence[str], alias: str = "num_rows") -> DataFrame:
    """groupBy(keys).count with a stable alias (reference
    delayed_flights.py:25-26 et al., SURVEY.md A1/A2)."""
    return df.groupBy(*keys).agg(F.count("*").alias(alias))


def avg_by(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, str],
    scale: int = 6,
) -> DataFrame:
    """Multi-measure mean per group (SURVEY.md A3/A4/A9).

    ``measures`` maps source column -> output alias. Averages are rounded
    so both engines of an oracle comparison canonicalize the same way.
    """
    aggs = [F.round(F.avg(src), scale).alias(dst) for src, dst in measures.items()]
    return df.groupBy(*keys).agg(*aggs)


def sum_by(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, str],
    scale: int = 4,
) -> DataFrame:
    """Multi-measure sum per group (SURVEY.md A5). Negative values sum in
    as-is (the reference's delay totals include early flights)."""
    aggs = [F.round(F.sum(src), scale).alias(dst) for src, dst in measures.items()]
    return df.groupBy(*keys).agg(*aggs)


def popular_groups(
    counts: DataFrame,
    count_col: str = "num_rows",
    strict: bool = True,
) -> DataFrame:
    """Keep groups whose count exceeds the global mean count (reference
    delayed_flights.py:29-36, 181-187) — one lazy plan, no collect.

    Implemented as crossJoin(broadcast(1-row agg)) rather than an
    empty-partition window: WindowExec with no partition keys funnels
    every group row through ONE task, which dies at high group
    cardinality; the broadcast scalar keeps the filter fully parallel.
    """
    stats = counts.agg(F.avg(count_col).alias("__avg"))
    pred = (
        F.col(count_col) > F.col("__avg")
        if strict
        else F.col(count_col) >= F.col("__avg")
    )
    return counts.crossJoin(F.broadcast(stats)).filter(pred).drop("__avg")


def with_pct_of_total(df: DataFrame, count_col: str, alias: str = "pct", scale: int = 4) -> DataFrame:
    """Percentage-of-total column (SURVEY.md A11). Broadcast 1-row total,
    not an empty window (same single-task hazard as popular_groups)."""
    total = df.agg(F.sum(count_col).alias("__total"))
    return (
        df.crossJoin(F.broadcast(total))
        # c * 100.0 / t, matching the SQL oracle's evaluation order —
        # (c / t) * 100 can differ in the last ulp, which flips round()
        # exactly on a .5 boundary. A zero total (all-zero measure
        # column) yields NULL pct for every row: share-of-nothing is
        # undefined, and under ANSI mode the raw division would abort
        # the whole query instead.
        .withColumn(
            alias,
            F.when(
                F.col("__total") != 0,
                F.round(F.col(count_col) * 100.0 / F.col("__total"), scale),
            ),
        )
        .drop("__total")
    )


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Deterministic top-k: sort + limit -> TakeOrderedAndProject
    (SURVEY.md O3). Callers must include a tiebreak column in ``order``."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """Top-k within each group via row_number — the windowed variant the
    reference lacks entirely (SURVEY.md §2.9).

    NULL-ordering contract: Spark's bare/``asc`` puts NULLs FIRST
    (ANSI/DuckDB ASC is NULLS LAST), so a nullable ASC order column
    lets missing-key rows occupy top-k slots and silently diverge from
    a SQL oracle; pass ``asc_nulls_last()`` there. DESC is safe — both
    engines default to NULLS LAST for it."""
    w = Window.partitionBy(*partition_keys).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def dim_decorate(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | str | Sequence[str],
    how: str = "inner",
    payload: dict[str, str] | None = None,
) -> DataFrame:
    """Decorate a fact table with dimension attributes via an explicit
    broadcast join (reference J1/J2/J7/J8 rely on auto-broadcast).

    ``payload`` maps dim column -> alias; None keeps all dim columns.
    """
    if payload:
        keys: list[str] = []
        if isinstance(on, str):
            keys = [on]
        elif isinstance(on, (list, tuple)):
            keys = [k for k in on if isinstance(k, str)]
        if keys or not isinstance(on, Column):
            # prune the dim to join keys + payload; with a Column join
            # condition the referenced dim columns can't be inferred, so
            # pruning would break resolution — keep the dim whole there
            # (Catalyst still prunes unused columns at the scan)
            keep = list(dict.fromkeys([*keys, *payload.keys()]))
            dim = dim.select(*[F.col(c) for c in keep])
        for src, dst in payload.items():
            dim = dim.withColumnRenamed(src, dst)
    return fact.join(F.broadcast(dim), on=on, how=how)


def decode_map(
    df: DataFrame,
    col: str,
    mapping: dict[str, str],
    alias: str,
    default: str | None = None,
) -> DataFrame:
    """Decode a code column through a literal mapping as a when-chain —
    Spark-side replacement for the reference's driver-side pandas
    ``.map(dict)`` decodes (reference delayed_flights.py:385-400,
    cancelled_flights.py:25-34; SURVEY.md F10)."""
    expr: Column | None = None
    for code, label in mapping.items():
        cond = F.col(col) == F.lit(code)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None, "mapping must be non-empty"
    expr = expr.otherwise(F.lit(default) if default is not None else F.col(col))
    return df.withColumn(alias, expr)


def two_sided_totals(
    df: DataFrame,
    left_key: str,
    right_key: str,
    measure: str,
    left_alias: str = "left_total",
    right_alias: str = "right_total",
    key_alias: str = "key",
    scale: int = 4,
) -> DataFrame:
    """Totals of ``measure`` grouped by two different key columns of the
    same input, merged with 0 where a key appears on only one side —
    the reference's departures-vs-arrivals per airport shape (reference
    delayed_flights.py:255-284, SURVEY.md J5).

    The reference aggregates TWICE and full-outer-joins (its
    delayed_flights.py:255-278) — at 100 TB that re-executes the whole
    upstream pipeline. Here: explode each row to its two (key, side)
    assignments, ONE groupBy(key) with conditional sums — single scan,
    single shuffle, identical output for non-null keys (a null key would
    merge into one row here vs. two under a full-outer join, which never
    matches null keys).
    """
    long = df.select(
        F.explode(
            F.array(
                F.struct(F.col(left_key).alias("k"), F.lit("l").alias("side")),
                F.struct(F.col(right_key).alias("k"), F.lit("r").alias("side")),
            )
        ).alias("x"),
        F.col(measure).alias("__m"),
    )
    return (
        long.groupBy(F.col("x.k").alias(key_alias))
        .agg(
            F.round(
                F.coalesce(F.sum(F.when(F.col("x.side") == "l", F.col("__m"))), F.lit(0)),
                scale,
            ).alias(left_alias),
            F.round(
                F.coalesce(F.sum(F.when(F.col("x.side") == "r", F.col("__m"))), F.lit(0)),
                scale,
            ).alias(right_alias),
        )
        .select(key_alias, left_alias, right_alias)
    )


def pivot_table(
    df: DataFrame,
    row_keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Long -> wide pivot (the complement of :func:`unpivot_measures`):
    one output column per ``pivot_values`` entry holding ``agg`` over the
    matching rows. ``pivot_values`` is REQUIRED — passing it skips the
    extra distinct-collection job Spark otherwise runs to discover the
    value set (a full scan at 100TB), and makes the output schema static
    so downstream plans can be compiled before any data is read.
    ``renames`` maps raw pivot values to stable column names."""
    out = df.groupBy(*row_keys).pivot(pivot_col, list(pivot_values)).agg(agg)
    for raw, name in (renames or {}).items():
        out = out.withColumnRenamed(raw, name)
    return out


def unpivot_measures(
    df: DataFrame,
    ids: Sequence[str],
    measures: Sequence[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """Wide measures -> long (SURVEY.md F12): Spark-side ``unpivot``
    replacing the reference's driver-side pandas ``melt`` (reference
    delayed_flights.py:325-332)."""
    return df.unpivot(list(ids), list(measures), var_name, value_name)
