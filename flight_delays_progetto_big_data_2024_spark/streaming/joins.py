"""Stream-stream joins and streaming dedup.

The reference is batch-only; these are the two remaining stateful
streaming shapes an always-on pipeline needs beyond windowed
aggregation (streaming.windowed) and custom sessionization
(streaming.stateful):

- ``stream_interval_join``: inner join of two streams where the right
  event must land inside a bounded interval after the left one. The
  TIME BOUND is what makes it runnable: without it Spark would have to
  retain both sides' state forever; with watermarks + the interval
  condition, each side's state is evicted as the watermark passes
  (state size ~ rate x (watermark + interval), independent of stream
  length).
- ``stream_dedup``: exactly-once-per-key semantics over an at-least-
  once transport via ``dropDuplicatesWithinWatermark`` — state holds
  only keys younger than the watermark horizon, so (unlike a plain
  ``dropDuplicates`` on a stream) it does not grow unboundedly.

Both run identically under ``availableNow`` backfill and continuous
micro-batch; the tests drive them against their batch equivalents.

PRE-EPOCH EVENT TIMES (round-9, found by the dirty-corpus 1901 probe):
Structured Streaming's initial watermark is epoch 0 (1970-01-01), so
an event time before the epoch is already "late" in the very first
micro-batch and every watermarked stateful operator in this package —
dedup, sessionization, append-mode windowed aggregation, interval
joins — silently DROPS it. That is a platform semantic, not an
operator bug. Corpora that genuinely carry pre-1970 event times
(digitized archives, mis-parsed two-digit years) must pre-filter or
re-base timestamps before the watermark; batch analogs used for
stream==batch verification must mirror the watermark-visible domain
(``ts >= '1970-01-01'``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner interval join: pair each left row with right rows of the
    same ``key`` whose ``right_ts`` falls in
    ``[left_ts, left_ts + max_delay]``. Column names (other than
    ``key``) must already be disjoint — rename before calling.

    In batch the same expression is an ordinary equi+range join; in
    streaming the equi key co-partitions state and the range condition
    plus both watermarks bound it (module docstring).
    """
    return _stream_interval_join(
        left, right, key, left_ts, right_ts, max_delay, watermark, "inner"
    )


def stream_interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER interval join: like :func:`stream_interval_join`, but
    an unmatched left row is EMITTED WITH NULL right columns once the
    watermark proves no match can still arrive — the streaming
    "conversion did not happen within the window" detector. The delayed
    null emission is the semantic difference from batch left joins:
    results for a left row are final only after
    ``watermark(right) > left_ts + max_delay``."""
    return _stream_interval_join(
        left, right, key, left_ts, right_ts, max_delay, watermark, "left_outer"
    )


def _stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str,
    watermark: str,
    how: str,
) -> DataFrame:
    # NULL event times never pass the range condition, and — worse — a
    # NULL-ts LEFT row in the outer form can never be proven unmatched
    # (the watermark comparison against left_ts + delay is NULL), so it
    # would sit in the join state FOREVER: an unbounded state leak on a
    # dirty stream. No event time, no interval (the F.window rule).
    left = left.filter(F.col(left_ts).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())
    l, r = left.withWatermark(left_ts, watermark), right.withWatermark(
        right_ts, watermark
    )
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how).drop(r[key])


def stream_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop re-deliveries of the same ``keys`` arriving within the
    watermark horizon (``dropDuplicatesWithinWatermark``). The horizon
    is the dedup CONTRACT: a duplicate older than the watermark can be
    re-emitted — size it to the transport's redelivery window, not to
    the data's full history."""
    # NULL event times are dropped first: a row with no timestamp has
    # no watermark horizon, so its dedup state could never be evicted —
    # the same unbounded-state hazard as the interval join.
    return (
        stream.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join each micro-batch against
    a BATCH dimension table. Stateless — no watermark, no state store;
    Spark re-plans the static side per micro-batch, so a dimension
    backed by a table/path picks up slowly-changing updates between
    batches for free. The static side is explicitly broadcast: at 100 TB
    of stream the dimension join must never shuffle the stream."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, how)
