"""Windowed event aggregation, batch and Structured Streaming.

The reference is batch-only (SURVEY.md §2.9: no readStream anywhere);
an engine serving the same analyses over live data needs the streaming
form. The SAME logical aggregation (``F.window`` tumbling windows)
serves both: in batch it's an ordinary groupBy; under
``readStream`` + watermark it becomes incremental stateful aggregation.

Scale notes: watermarks bound state (late rows beyond the horizon are
dropped); tumbling windows shuffle once on (window, keys); for
always-on pipelines pair with ``availableNow`` triggers for backfill
and checkpointing for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window count + mean (sliding when ``slide`` < window:
    each event then lands in window/slide overlapping windows). Window
    start is emitted as a formatted string so results are
    engine-portable (raw timestamps hash differently across engines)."""
    group_cols = [F.window(ts_col, window, slide or window).alias("w"), *(keys or [])]
    return (
        events.groupBy(*group_cols)
        .agg(
            F.count("*").alias("num_events"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            *(keys or []),
            "num_events",
            "avg_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Sliding-window count + mean: windows of ``window`` length starting
    every ``slide`` (epoch-aligned, like ``F.window``)."""
    return tumbling_counts(events, window, ts_col, value_col, keys, slide=slide)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    ts_col: str = "ts",
    ts_is_nanos_long: bool = False,
) -> DataFrame:
    """File-source stream over a directory of parquet drops (the
    standard ingestion pattern for micro-batch backfill). Pass
    ``ts_is_nanos_long=True`` when the files carry TIMESTAMP(NANOS)
    read as longs (see sources.readers); if the column is already a
    timestamp type the flag is a no-op, so callers can pass it
    defensively for files of either vintage."""
    from pyspark.sql.types import LongType, TimestampNTZType

    stream = spark.readStream.schema(schema).parquet(source_dir)
    if ts_is_nanos_long and isinstance(schema[ts_col].dataType, LongType):
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    elif isinstance(schema[ts_col].dataType, TimestampNTZType):
        # watermarks require TIMESTAMP (with zone); the session runs UTC
        # so the cast is value-preserving
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def stream_tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming form of :func:`tumbling_counts`: watermarked so state is
    bounded and late data beyond the horizon is dropped deterministically."""
    return tumbling_counts(
        events.withWatermark(ts_col, watermark), window, ts_col, value_col, keys
    )


def stream_session_windows(
    events: DataFrame,
    gap: str = "2 hours",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming form of :func:`operators.temporal.session_windows`.
    Unlike fixed windows, a session's end moves as events arrive; the
    watermark is what lets Spark ever finalize one (a session closes
    when the watermark passes its last event + gap). Complete mode is
    not supported for session windows — use append (finalized sessions
    only) or update.

    Pre-epoch event times are dropped by the initial watermark (epoch 0)
    — see streaming.joins module docstring (r9 platform semantic).
    """
    from ..operators.temporal import session_windows

    return session_windows(
        events.withWatermark(ts_col, watermark),
        gap=gap,
        keys=list(keys or ["user_id"]),
        ts_col=ts_col,
        value_col=value_col,
    )


def stream_sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming form of :func:`sliding_counts`. Each event updates
    window/slide overlapping windows, so state (and the append-mode
    emission lag) scales with that ratio — keep it small for always-on
    queries."""
    return sliding_counts(
        events.withWatermark(ts_col, watermark), window, slide, ts_col, value_col, keys
    )
