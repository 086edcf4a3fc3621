"""Multimodal + windowed-aggregation queries.

The multimodal pair deliberately routes through Arrow-batched
``mapInPandas`` on the Spark side while its oracle is pure SQL
arithmetic — so the driver's hash check validates the Python-batch
plumbing itself (schema, typing, row expansion), not just expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flight_delays_progetto_big_data_2024_spark.operators.multimodal import (
    attach_binary_payload,
    fake_decode_images,
    sample_frames,
)
from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog
from flight_delays_progetto_big_data_2024_spark.streaming.windowed import (
    tumbling_counts,
)


@register(
    "q37_multimodal_decode_metadata",
    sql="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 37 + 1 AS INTEGER) AS height,
           3 AS channels
    FROM documents
    """,
)
def q37_multimodal_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → image metadata through mapInPandas (deterministic
    fake codec; real codec is the same loop, see operators.multimodal)."""
    cat = Catalog(spark, sf_dir)
    return fake_decode_images(attach_binary_payload(cat.documents))


@register(
    "q38_multimodal_frame_sample",
    sql="""
    WITH f AS (
        SELECT doc_id,
               octet_length(encode(text)) % 10 + 1 AS nf,
               least(3, octet_length(encode(text)) % 10 + 1) AS take
        FROM documents
    )
    SELECT doc_id,
           CAST(j * nf // take AS INTEGER) AS frame_idx,
           CAST((j * nf // take) * 1024 AS BIGINT) AS frame_offset
    FROM f, unnest(generate_series(0, take - 1)) AS t(j)
    """,
)
def q38_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampling (video analog) through mapInPandas:
    k evenly-strided frames per payload."""
    cat = Catalog(spark, sf_dir)
    return sample_frames(attach_binary_payload(cat.documents), k=3)


@register(
    "q39_tumbling_hourly_events",
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS num_events,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    ORDER BY window_start
    """,
)
def q39_tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over events — the batch form of the
    Structured Streaming aggregation (streaming.windowed; epoch-aligned
    windows == date_trunc)."""
    cat = Catalog(spark, sf_dir)
    return tumbling_counts(cat.events, "1 hour").orderBy("window_start")


@register(
    "q40_tumbling_hourly_by_type",
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS num_events,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY window_start, event_type
    """,
)
def q40_tumbling_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed tumbling windows (window × event_type)."""
    cat = Catalog(spark, sf_dir)
    return tumbling_counts(cat.events, "1 hour", keys=["event_type"]).orderBy(
        "window_start", "event_type"
    )
