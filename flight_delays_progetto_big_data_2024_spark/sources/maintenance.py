"""Table maintenance: small-file compaction (the OPTIMIZE analog).

Streaming sinks and fine-grained partition writes (streaming/sinks.py's
per-batch directories, micro-batch file sources) accumulate many small
parquet files; at scale that bloats file listings, wastes scan tasks,
and starves row-group-level pushdown. Compaction rewrites a directory
into size-targeted files.

The rewrite is a plain Spark job — one distributed read + one write
sized by the measured input bytes, no driver-side row handling — then a
directory swap. The swap here is local-filesystem rename (atomic on
POSIX); object stores need the table-format route (Delta/Iceberg
rewrite + metadata commit) since S3-style stores cannot rename
atomically — the sizing logic is the same, only the commit differs.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _tree_bytes(path: str, suffix: str = ".parquet") -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(suffix):
                total += os.path.getsize(os.path.join(root, name))
    return total


def plan_compaction(
    input_bytes: int, target_file_mb: int = 128, compression_ratio: float = 1.0
) -> int:
    """Output file count for a compaction rewrite: input size (scaled by
    the expected recompression ratio) divided into target-sized files.
    Pulled out pure so the sizing rule is testable without IO."""
    target = target_file_mb * 1024 * 1024
    return max(1, math.ceil(input_bytes * compression_ratio / target))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ``ceil(bytes/target)`` files and
    swap it into place. Returns the output file count.

    Uses ``coalesce`` (narrow — each output file unions whole input
    files, no shuffle) rather than ``repartition``: for pure compaction
    the row order inside files is irrelevant and skipping the exchange
    halves the IO. Partition discovery folds a streaming sink's
    ``batch_id=N/part-*.parquet`` layout into one flat compacted set,
    re-materializing the directory column into the data.
    """
    in_bytes = _tree_bytes(path)
    n_files = plan_compaction(in_bytes, target_file_mb)
    df = spark.read.parquet(path)

    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
