"""Temporal operators: session windows and as-of joins.

Neither exists in the reference (SURVEY.md §2.9 — no window functions,
no streaming), but both are table stakes for event pipelines at scale:

- ``session_windows`` uses Spark's native ``F.session_window`` (batch
  AND streaming): gap-based sessions per key, one shuffle on the key.
- ``asof_join`` is the operator Spark lacks as a primitive. The naive
  form (theta-join on ``l.ts >= r.ts`` + max) explodes quadratically;
  the scalable idiom used here is union + per-key ordered forward-fill:
  tag both sides, union, one window sorted by (ts, side), carry the
  last non-null right value forward, keep left rows. ONE shuffle on the
  join key, zero join blow-up, works at any key cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def session_windows(
    events: DataFrame,
    gap: str = "2 hours",
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 4,
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when an event
    arrives MORE than ``gap`` after the previous one (an event at
    exactly ``prev + gap`` still merges — Spark session_window closes
    the window only strictly after ``last + gap``). Native
    ``F.session_window`` — identical semantics under Structured
    Streaming with a watermark. Window start is emitted as a formatted
    string (engine-portable, like streaming.windowed)."""
    return (
        events.groupBy(*keys, F.session_window(ts_col, gap).alias("sw"))
        .agg(
            F.count("*").alias("num_events"),
            F.round(F.sum(value_col), scale).alias("total_value"),
        )
        .select(
            *keys,
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "num_events",
            "total_value",
        )
    )


def range_join_buckets(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 86400,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Interval containment join (``start <= ts < end``, no equi key)
    without the nested-loop blow-up: both sides are mapped to
    fixed-width time buckets — each interval EXPLODES into every bucket
    it overlaps, each left row lands in exactly one — and the buckets
    become an equi-join key, so Catalyst plans a hash join (broadcast
    when the exploded interval side is small) that only compares rows
    whose buckets collide. A final exact predicate keeps semantics
    identical to the theta-join.

    Cost model: the exploded interval side grows by
    ``interval_length / bucket_seconds`` rows per interval — pick the
    bucket near the typical interval length. Works with BOTH sides
    arbitrarily large (shuffle hash join on the bucket), which the
    broadcast-nested-loop fallback for raw theta joins does not.

    Pass ``broadcast_intervals=True`` when the interval side is known
    small: intervals produced by an aggregation have no size estimate,
    so without the hint Catalyst may build the hash table from the
    EVENT side — exactly wrong at scale.
    """
    width = F.lit(bucket_seconds).cast("long")
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(ts_col)) / width).cast("long")
    )
    # empty/REVERSED intervals (end <= start) match nothing under the
    # exact predicate, but Spark's `sequence` with stop < start counts
    # DOWN — a corrupted interval reversed by years at small buckets
    # explodes into millions of junk bucket rows before the filter can
    # discard them. Drop them ahead of the explode (NULL bounds already
    # drop themselves: sequence(NULL, ..) is NULL and explode emits
    # nothing, matching theta-join NULL semantics).
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / width).cast("long"),
                # end is exclusive: an interval ending exactly on a
                # bucket boundary does not reach into that bucket
                ((F.unix_timestamp(F.col(end_col)) - 1) / width).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (
        lb.join(iv, "__bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )


def scd2_from_changes(
    changes: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    attrs: Sequence[str] = ("value",),
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: one output row per version with ``valid_from`` / ``valid_to``
    (null = current) and a per-key ``version`` number. The standard
    warehouse pattern, one window (= one shuffle on the key) over the
    change log — no self-join.

    ``tiebreakers`` orders simultaneous changes of the same key
    deterministically (pass the change-log's unique id); without it,
    duplicate (key, ts) rows make version numbering nondeterministic.

    Undated changes (NULL ``ts_col``) are dropped: NULL sorts first, so
    such a row otherwise became a phantom "primordial" version with a
    NULL ``valid_from`` that no ``snapshot_as_of`` read can ever see —
    an ill-formed history row fabricated from a missing timestamp.
    """
    order = [F.col(ts_col).asc(), *[F.col(t).asc() for t in tiebreakers]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return changes.filter(F.col(ts_col).isNotNull()).select(
        *keys,
        *attrs,
        F.row_number().over(w).alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("value",),
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: each left row picks up the right row with the
    greatest ``ts_col`` ≤ its own (per ``on`` key); no match → nulls.
    Matches ANSI/DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND
    l.ts >= r.ts``.

    Implementation is the union + forward-fill idiom (module docstring):
    right rows sort before left rows at equal timestamps, so the match
    is inclusive. Right payload columns are carried as ``<col><suffix>``
    (the right timestamp as ``<ts_col><suffix>``).

    The carried columns travel as ONE struct and are filled together —
    per-column filling would let ``last(..., ignorenulls)`` skip a null
    payload field back to an OLDER right row, producing an output row
    that corresponds to no actual right row. Equal (key, ts) right rows
    are tie-broken by greatest carried struct, so output is
    deterministic (DuckDB ASOF leaves this case unspecified).

    NULL join keys never match (ANSI join equality): without the
    explicit mask, the window's partitionBy groups NULLs TOGETHER, so a
    NULL-key left row silently picked up the NULL-key right stream's
    payload — a match no SQL join would produce. (DuckDB's ASOF JOIN is
    worse still: a NULL left key matches an ARBITRARY row.) NULL
    timestamps also never match (the comparison is undefined); the row
    survives with null payload, like any unmatched left row.

    NULL-ts/NULL-key RIGHT rows are dropped before the union — the
    left-side mask alone is not enough: a right row with a NULL
    ``ts_col`` sorts FIRST in its key partition (``asc`` puts nulls
    first) and its non-null ``__carry`` would forward-fill into every
    left row preceding the first dated right row, fabricating a match
    ANSI/DuckDB ASOF would never produce. Dropping them at the scan
    (where the filter pushes down) is also cheaper than masking after
    the window.
    """
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{ts_col}{suffix}"]
    right_valid = F.col(ts_col).isNotNull()
    for k in on:
        right_valid = right_valid & F.col(k).isNotNull()
    right = right.filter(right_valid)
    r = right.select(
        *on,
        F.col(ts_col),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
        ).alias("__carry"),
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__carry", F.lit(None).cast(r.schema["__carry"].dataType)
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__carry").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(
        "__carry", F.last(F.col("__carry"), ignorenulls=True).over(w)
    )
    null_key = F.lit(False)
    for k in on:
        null_key = null_key | F.col(k).isNull()
    null_key = null_key | F.col(ts_col).isNull()
    out = filled.filter(F.col("__side") == 1).withColumn(
        "__carry",
        F.when(null_key, F.lit(None).cast(r.schema["__carry"].dataType)).otherwise(
            F.col("__carry")
        ),
    )
    for c in carried:
        out = out.withColumn(c, F.col("__carry").getField(c))
    return out.drop("__side", "__carry")


def snapshot_as_of(
    history: DataFrame,
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Time-travel read over an SCD type-2 history (``scd2_from_changes``
    output): the one version per key whose validity interval contains
    ``as_of`` (``valid_from <= t < valid_to``, null ``valid_to`` =
    current). A pure filter — predicate pushdown reaches the scan, and a
    history PARTITIONED on a date-truncated ``valid_from`` additionally
    prunes whole partitions at 100 TB."""
    t = F.lit(as_of).cast("timestamp")
    return history.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """CDC MERGE: apply a change batch (upserts + deletes) to a snapshot
    in one pass — the Delta/Iceberg ``MERGE INTO`` shape expressed as
    pure DataFrame ops. Rows whose key appears in the batch drop out of
    the target (left anti); non-delete change rows come back in. Net:
    deletes disappear, updates are replaced, inserts appended.

    The change batch must carry at most one row per key (enforce
    upstream — CDC compaction by max LSN — or this union keeps all of
    them). At 100 TB both sides shuffle once on ``key``; with bucketed
    tables on ``key`` the anti-join is shuffle-free, which is why
    snapshot tables in an incremental corpus pipeline should be
    bucketed by document id.

    NULL keys follow standard MERGE equality (Delta/Iceberg alike):
    NULL never matches NULL, so a NULL-key change INSERTS alongside any
    NULL-key target row instead of replacing it. Deduplicate or drop
    null-key rows upstream if that is not the intended outcome.
    """
    change_keys = changes.select(key)
    kept = target.join(change_keys, key, "left_anti")
    incoming = changes.filter(F.col(op_col) != delete_op).drop(op_col)
    return kept.unionByName(incoming)
