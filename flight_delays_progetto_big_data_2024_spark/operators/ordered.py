"""Order-dependent analytics that stay distributed.

The naive Spark expression of a GLOBAL running sum — ``Window.orderBy(ts)``
with no partition keys — funnels the whole table through ONE task (Spark
even warns "No Partition Defined for Window"). That is the single most
common scale bug in analytic Spark code. Every operator here exists to
express order-dependent semantics (prefix sums, sweep-line interval
concurrency, weighted quantiles) with only keyed shuffles:

- ``bucketed_running_sum`` is the classic two-phase distributed prefix
  sum: per-bucket partial totals (tiny aggregate), an exclusive prefix
  over the bucket totals (a window over the AGGREGATE, thousands of rows
  at most), broadcast back, then a within-bucket window. Wall-clock is
  one keyed shuffle over the data regardless of table size.
- ``max_concurrency`` is the sweep-line (+1/-1) algorithm over
  intervals, built on the prefix sum, so "how many sessions were open"
  never leaves the keyed-window world.
- ``weighted_median`` / ``winsorize_bounds`` pick order statistics via
  per-group cumulative-weight windows / exact interpolated percentiles.

Nothing in the reference needs these (its data fits one pandas frame —
SURVEY.md §2.5); they're table stakes for an event pipeline at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    bucket_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Global running sum of ``value_col`` in ``(bucket_col, *order_cols)``
    order, computed as a distributed prefix sum.

    ``bucket_col`` must be a prefix of the global order (e.g. the day of
    a timestamp when ordering by that timestamp): rows in a smaller
    bucket sort entirely before rows in a larger one. Phase 1 computes
    per-bucket totals; phase 2 turns them into exclusive prefix offsets
    with a window over the bucket AGGREGATE (one row per bucket — this
    is the only unpartitioned window, and it never sees the fact table);
    phase 3 broadcasts the offsets back and adds a within-bucket
    cumulative window. Rows tied on the full ordering receive
    order-dependent running values (standard running-sum semantics);
    aggregate ties away upstream if per-row determinism is required.
    """
    totals = df.groupBy(bucket_col).agg(
        F.sum(value_col).alias("__tot"), F.count(value_col).alias("__n")
    )
    w_off = (
        Window.orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        F.col(bucket_col).alias("__bkt"),
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__noff"),
    )
    w_in = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL-SAFE join: groupBy keeps a NULL bucket as a group, but a
    # plain equi-join would silently DROP every NULL-bucket row on the
    # way back (4 rows in, 3 out — row loss, not an error). NULL sorts
    # first in the offset window, so a NULL bucket is simply the
    # earliest bucket of the global order.
    #
    # NULL values must match the single-window reference F.sum(v).over
    # (global order): NULL contributes nothing, and the result is NULL
    # only while NO non-null value has appeared in the entire global
    # prefix. The naive `__off + sum.over(w_in)` got this wrong — a row
    # whose WITHIN-BUCKET prefix is all-NULL made the addition NULL and
    # silently dropped the carried offset from prior buckets. Carry the
    # non-null COUNT through the same decomposition to decide
    # NULL-vs-0 exactly.
    return (
        df.join(
            F.broadcast(offsets), F.col(bucket_col).eqNullSafe(F.col("__bkt"))
        )
        .withColumn(
            out_col,
            F.when(
                (F.col("__noff") + F.count(value_col).over(w_in)) > 0,
                F.col("__off")
                + F.coalesce(F.sum(value_col).over(w_in), F.lit(0)),
            ),
        )
        .drop("__bkt", "__off", "__noff")
    )


def max_concurrency(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: Column | None = None,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Peak number of simultaneously-open intervals, sweep-line style:
    every interval start is a +1 event, every end a -1, and concurrency
    is the running sum over all events in ``(ts, delta DESC)`` order —
    +1 before -1 at equal timestamps, so intervals are CLOSED at both
    ends (a zero-length interval still counts while it is open, and two
    intervals touching at a point briefly overlap).

    ``bucket`` (default: the calendar day of the event timestamp) drives
    the distributed prefix sum AND the output grain: one row per bucket
    with the peak concurrency observed at event points inside it.

    Intervals with a NULL endpoint are dropped (the scd2 undated-change
    rule): a NULL sweep event lands in the NULL bucket, which sorts
    FIRST in the global order — an open interval's ``-1`` would then be
    counted before its ``+1``, driving the running count negative and
    deflating every bucket's peak (and a NULL start symmetrically
    fabricates an always-open interval). An undefined extent cannot
    contribute to a sweep count.
    """
    intervals = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    # ONE pass over the (possibly expensive) interval relation: explode
    # each interval into its +1/-1 sweep events in the same projection.
    # The union formulation scanned `intervals` twice — when the input
    # is itself a windowed computation (q130's sessionization), that
    # recomputes the whole upstream per branch at scale.
    deltas = intervals.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("__ts"), F.lit(1).alias("__delta")
                ),
                F.struct(
                    F.col(end_col).alias("__ts"), F.lit(-1).alias("__delta")
                ),
            )
        ).alias("__e")
    ).select("__e.__ts", "__e.__delta")
    b = F.to_date("__ts") if bucket is None else bucket
    deltas = deltas.withColumn(bucket_name, b)
    # order -delta ascending == delta descending (starts first at ties)
    deltas = deltas.withColumn("__negdelta", -F.col("__delta"))
    # bucketed_running_sum references its input twice (bucket totals +
    # the decorated join); deltas is tiny (2 rows per interval, already
    # reduced by the upstream aggregation) — persist it so the upstream
    # pipeline runs exactly once however many times the prefix-sum
    # decomposition fans out.
    deltas = deltas.persist()
    running = bucketed_running_sum(
        deltas,
        order_cols=["__ts", "__negdelta"],
        value_col="__delta",
        bucket_col=bucket_name,
        out_col="__open",
    )
    return (
        running.groupBy(bucket_name)
        .agg(F.max("__open").alias("peak_concurrency"))
        .orderBy(bucket_name)
    )


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Lower weighted median per group: the smallest value whose
    cumulative weight (in ascending value order) reaches half the
    group's total weight.

    Ties on the value are aggregated FIRST (groupBy value → one row per
    distinct value with its summed weight), which both makes the
    cumulative window deterministic and shrinks it to the distinct-value
    cardinality; the window then runs per group, never globally.

    NULL values and NULL weights are excluded up front: a NULL value
    otherwise consumes cumulative weight mass (NULL sorts first in the
    window) and SHIFTS which real value crosses the half-weight line —
    a fabricated median from missing data. A group left with no usable
    rows disappears from the output (its median is undefined). Negative
    weights are garbage-in/garbage-out, as with any weighted statistic.
    """
    keys = list(group_cols)
    per_value = df.filter(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    ).groupBy(*keys, value_col).agg(
        F.sum(weight_col).alias("__w")
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    cum = per_value.select(
        *keys,
        value_col,
        F.sum("__w").over(w_cum).alias("__cw"),
        F.sum("__w").over(w_tot).alias("__tw"),
    )
    return (
        cum.filter(F.col("__cw") * 2 >= F.col("__tw"))
        .groupBy(*keys)
        .agg(F.min(value_col).alias("weighted_median"))
    )


def winsorize_bounds(
    df: DataFrame,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Attach global exact-percentile clip bounds (``__lo`` / ``__hi``)
    to every row via a broadcast 1-row aggregate — the engine's standard
    no-collect scalar idiom (COVERAGE S6). Exact interpolated
    percentiles (``F.percentile``) match DuckDB ``quantile_cont``; swap
    for ``percentile_approx`` at fact scale where a bounded-error bound
    is acceptable (documented, not default — oracles need exactness).
    """
    bounds = df.agg(
        F.percentile(value_col, F.lit(lower)).alias("__lo"),
        F.percentile(value_col, F.lit(upper)).alias("__hi"),
    )
    return df.crossJoin(F.broadcast(bounds))


def winsorize(
    df: DataFrame,
    value_col: str,
    out_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Winsorized copy of ``value_col``: values below the exact ``lower``
    percentile clip up to it, above ``upper`` clip down. One scan for
    the bounds, one for the clip (Spark computes both percentiles in a
    single aggregate).

    NULL stays NULL: Spark's greatest/least SKIP nulls, so the naive
    clamp silently rewrote missing measurements as the lower bound —
    fabricating a 1st-percentile value out of no data."""
    clipped = winsorize_bounds(df, value_col, lower, upper).withColumn(
        out_col,
        F.when(
            F.col(value_col).isNotNull(),
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        ),
    )
    return clipped.drop("__lo", "__hi")


def bucketed_running_max(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    bucket_col: str,
    out_col: str = "running_max",
) -> DataFrame:
    """Global running MAX in ``(bucket_col, *order_cols)`` order — the
    same two-phase decomposition as :func:`bucketed_running_sum` with
    (max, max) replacing (sum, sum): per-bucket maxima → exclusive
    prefix-max over the bucket AGGREGATE → within-bucket running max
    combined via ``greatest``. This is the streaming high-watermark
    computed in batch (the watermark Spark Structured Streaming tracks
    per trigger), so lateness profiles can be mined from history before
    choosing a production watermark delay."""
    totals = df.groupBy(bucket_col).agg(F.max(value_col).alias("__tot"))
    w_off = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        F.col(bucket_col).alias("__bkt"), F.max("__tot").over(w_off).alias("__off")
    )
    w_in = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null-safe for the same reason as bucketed_running_sum: a plain
    # equi-join silently drops every NULL-bucket row
    return (
        df.join(
            F.broadcast(offsets), F.col(bucket_col).eqNullSafe(F.col("__bkt"))
        )
        .withColumn(
            out_col,
            F.greatest(
                F.max(value_col).over(w_in),
                F.coalesce(F.col("__off"), F.max(value_col).over(w_in)),
            ),
        )
        .drop("__bkt", "__off")
    )
