"""Exactly-once streaming sinks via ``foreachBatch``.

Structured Streaming's contract is at-least-once for ``foreachBatch``:
after a crash between the user write and the checkpoint commit, the
SAME (batch_id, data) is replayed. Exactly-once therefore needs the
sink write to be idempotent in ``batch_id``. Two standard shapes:

- **partition-overwrite** (:class:`IdempotentParquetSink`): each batch
  writes to ``path/batch_id=N``; a replay overwrites the identical
  directory, so duplicates cannot exist by construction. No commit log,
  works on any filesystem; readers see the union of batch partitions.
- **commit-marker skip** (:func:`idempotent_foreach_batch`): consult a
  marker for ``batch_id`` before writing, write the marker after. For
  sinks that cannot overwrite (append-only stores). The marker store
  here is a directory of files — on a cluster point it at the same
  durable FS as the checkpoint, because exactly-once only holds if the
  marker survives whatever kills the query.

Both compose with any DataFrame write, batch-side joins and all —
``foreachBatch`` hands over a plain batch DataFrame.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


class IdempotentParquetSink:
    """``foreachBatch`` target writing each micro-batch to its own
    ``batch_id=N`` parquet partition with overwrite — replays of a batch
    land in the same directory and cannot duplicate rows.

    Use as ``query.foreachBatch(IdempotentParquetSink(path))``.
    """

    def __init__(self, path: str):
        self.path = path

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(self.path, f"batch_id={batch_id}")
            )
        )


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None],
    marker_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Wrap a non-idempotent ``foreachBatch`` function with a commit
    marker: a replayed ``batch_id`` whose marker exists is skipped
    entirely.

    The marker is written AFTER ``write_fn`` returns, so the failure
    window collapses to "write succeeded but marker didn't" — a replay
    then re-runs ``write_fn``, which is why this wrapper gives
    exactly-once only when the underlying write is atomic-or-retryable
    per batch (e.g. a transactional insert, or the partition-overwrite
    sink above for belt-and-braces)."""

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"committed-{batch_id}")
        if os.path.exists(marker):
            return
        write_fn(batch_df, batch_id)
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("")

    return wrapped
