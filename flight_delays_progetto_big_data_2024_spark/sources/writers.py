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


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table write — the co-located-join layout:
    two tables bucketed on their join key with the same bucket count
    join WITHOUT a shuffle exchange on either side (Spark trusts the
    on-disk hash partitioning). This is the 100 TB answer to repeated
    fact-to-fact joins: pay the shuffle once at write time. Registered
    as a catalog table because bucketing metadata lives in the
    metastore, with data at the explicit ``path``."""
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-lines writer — the lingua franca of LLM training-data
    interchange. One JSON object per line, gzip by default (JSONL is
    ~5-10x the parquet footprint uncompressed; splittable compression
    doesn't exist for gzip, so downstream Spark reads get one task per
    FILE — keep output files ~100-500MB via the upstream partition
    count, not one giant file)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (native Spark, no extra package): same partitioned
    layout contract as write_parquet. ORC matters for interop with
    Hive/Trino-centric warehouses; predicate pushdown and column
    pruning work the same way as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
