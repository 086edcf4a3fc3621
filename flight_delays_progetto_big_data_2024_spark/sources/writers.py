"""Writers. The reference has none (charts were its only output —
SURVEY.md §2.1); an engine needs materialization paths.

At 100 TB the write layout is part of the query plan: partition columns
give downstream readers partition pruning, and per-file row-group sizing
comes from upstream partitioning, so ``repartition`` before write is
exposed here rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    repartition: int | None = None,
) -> None:
    if repartition is not None:
        df = df.repartition(repartition, *(partition_by or []))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
