"""Multimodal + windowed-aggregation queries.

The multimodal pair deliberately routes through Arrow-batched
``mapInPandas`` on the Spark side while its oracle is pure SQL
arithmetic — so the driver's hash check validates the Python-batch
plumbing itself (schema, typing, row expansion), not just expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    fake_decode_images,
    resize_images,
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
    WHERE text IS NOT NULL
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


@register(
    "q52_multimodal_feature_stats",
    sql="""
    WITH f AS (
        SELECT doc_id,
               octet_length(encode(text)) AS nb
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           round(CAST(nb AS DOUBLE), 2) AS f0,
           round(CAST(nb % 7 AS DOUBLE), 2) AS f1,
           round(CAST(nb % 13 AS DOUBLE), 2) AS f2,
           round(CAST(nb % 29 AS DOUBLE), 2) AS f3
    FROM f
    """,
)
def q52_multimodal_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through mapInPandas (array<float> output),
    flattened to scalars for the value-hash (list-typed columns don't
    canonicalize portably across engines)."""
    cat = Catalog(spark, sf_dir)
    feats = extract_features(attach_binary_payload(cat.documents))
    return feats.select(
        "doc_id",
        *[
            F.round(F.col("feature").getItem(i).cast("double"), 2).alias(f"f{i}")
            for i in range(4)
        ],
    )


@register(
    "q53_multimodal_resize_plan",
    sql="""
    WITH d AS (
        SELECT doc_id,
               octet_length(encode(text)) % 64 + 1 AS w,
               octet_length(encode(text)) % 37 + 1 AS h
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(greatest(w * 32 // greatest(w, h), 1) AS INTEGER) AS out_width,
           CAST(greatest(h * 32 // greatest(w, h), 1) AS INTEGER) AS out_height
    FROM d
    """,
)
def q53_multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning through mapInPandas (real
    resampler slots into the same loop)."""
    cat = Catalog(spark, sf_dir)
    return resize_images(attach_binary_payload(cat.documents), max_side=32)


@register(
    "q55_kafka_feed_progress",
    sql="""
    SELECT 'events' AS topic,
           CAST(user_id % 4 AS INT) AS partition,
           count(*) - 1 AS max_offset,
           count(*) AS n_rows,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY user_id % 4
    """,
)
def q55_kafka_feed_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-wire round trip: events → simulated Kafka feed (binary
    key/value JSON envelope, per-partition offsets) → JSON parse-back →
    per-partition consumer progress. The oracle recomputes the same
    progress from the raw table, so a hash match proves the envelope
    encode/decode and offset bookkeeping lose nothing. Partitioner is
    ``pmod(user_id, 4)`` here (SQL-reproducible); production default is
    the xxhash64 partitioner in sources.kafka. Offsets are 0-based
    arrival order, so max_offset ≡ n_rows - 1 by construction — the
    load-bearing checks are the partition split and the summed payload
    surviving the round trip."""
    from flight_delays_progetto_big_data_2024_spark.sources.kafka import (
        parse_json_envelope,
        simulated_kafka_feed,
    )

    cat = Catalog(spark, sf_dir)
    feed = simulated_kafka_feed(
        cat.events, partition_expr=F.pmod(F.col("user_id"), F.lit(4)).cast("int")
    )
    parsed = parse_json_envelope(feed, cat.events.schema)
    return parsed.groupBy("topic", "partition").agg(
        F.max("offset").alias("max_offset"),
        F.count("*").alias("n_rows"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
