"""Multimodal + windowed-aggregation queries.

The multimodal pair deliberately routes through Arrow-batched
``mapInArrow`` on the Spark side while its oracle is pure SQL
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
    """Binary payload → image metadata through mapInArrow (deterministic
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
        -- the decode stage skips absent containers (NULL payload); the
        -- oracle must too — DuckDB's least() IGNORES the NULL frame
        -- count and would fabricate 3 NULL-indexed frames per corrupt
        -- doc (wave-5 finding)
        WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(j * nf // take AS INTEGER) AS frame_idx,
           CAST((j * nf // take) * 1024 AS BIGINT) AS frame_offset
    FROM f, unnest(generate_series(0, take - 1)) AS t(j)
    """,
)
def q38_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampling (video analog) through mapInArrow:
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
    -- F.window assigns NO window to a NULL event time; the oracle must
    -- not emit a NULL bucket (wave-5 dirty-corpus finding)
    WHERE ts IS NOT NULL
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
    WHERE ts IS NOT NULL  -- F.window drops NULL event times
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
    """Feature extraction through mapInArrow (array<float> output),
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
    """Aspect-preserving resize planning through mapInArrow (real
    resampler slots into the same loop)."""
    cat = Catalog(spark, sf_dir)
    return resize_images(attach_binary_payload(cat.documents), max_side=32)


@register(
    "q55_kafka_feed_progress",
    sql="""
    -- ((x % 4) + 4) % 4 is pmod: DuckDB's % is dividend-sign, so a
    -- negative user_id would land on partition -1..-3 while the Spark
    -- partitioner (pmod) says 1..3 — the r9 id-domain probe's find.
    -- Total on all longs: |x % 4| <= 3, so the +4 never overflows.
    SELECT 'events' AS topic,
           CAST(((user_id % 4) + 4) % 4 AS INT) AS partition,
           count(*) - 1 AS max_offset,
           count(*) AS n_rows,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY ((user_id % 4) + 4) % 4
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


@register(
    "q82_lineitem_constraint_report",
    sql="""
    WITH row_rules AS (
        SELECT * FROM (
            SELECT 'quantity_positive' AS rule,
                   sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END)::BIGINT
                       AS violations,
                   count(*) AS total
            FROM lineitem
            UNION ALL
            SELECT 'discount_in_range',
                   sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.3) THEN 1 ELSE 0 END)::BIGINT,
                   count(*)
            FROM lineitem
            UNION ALL
            SELECT 'returnflag_in_set',
                   sum(CASE WHEN NOT (l_returnflag IN ('A', 'N', 'R')) THEN 1 ELSE 0 END)::BIGINT,
                   count(*)
            FROM lineitem
            UNION ALL
            SELECT 'shipdate_non_null',
                   sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
                   count(*)
            FROM lineitem
        )
    ),
    uniq AS (
        SELECT 'unique_order_line' AS rule,
               coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0)::BIGINT AS violations,
               coalesce(sum(n), 0)::BIGINT AS total
        FROM (SELECT count(*) AS n FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    )
    SELECT rule, violations, total, violations = 0 AS pass
    FROM (SELECT * FROM row_rules UNION ALL SELECT * FROM uniq)
    ORDER BY rule
    """,
)
def q82_lineitem_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators.quality): four row rules
    evaluated in ONE aggregation pass (one scan regardless of rule
    count — the oracle's UNION ALL of four scans states the semantics,
    not the plan) plus a key-uniqueness check as a map-side-combined
    groupBy."""
    from flight_delays_progetto_big_data_2024_spark.operators.quality import (
        constraint_report,
        expect_in_range,
        expect_in_set,
        expect_non_null,
    )

    cat = Catalog(spark, sf_dir)
    return constraint_report(
        cat.lineitem,
        rules={
            "quantity_positive": F.col("l_quantity") > 0,
            "discount_in_range": expect_in_range("l_discount", 0.0, 0.3),
            "returnflag_in_set": expect_in_set("l_returnflag", ["A", "N", "R"]),
            "shipdate_non_null": expect_non_null("l_shipdate"),
        },
        unique_keys={"unique_order_line": ["l_orderkey", "l_linenumber"]},
    ).orderBy("rule")


@register(
    "q83_mergeable_partial_aggregates",
    sql="""
    WITH direct AS (
        SELECT event_type,
               count(*) AS n,
               round(sum(value), 4) AS total_value,
               round(avg(value), 6) AS avg_value,
               round(max(value), 6) AS max_value
        FROM events GROUP BY event_type
    )
    SELECT * FROM direct ORDER BY event_type
    """,
)
def q83_mergeable_partial_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic-aggregate decomposition — the incremental-pipeline
    identity: per-day PARTIAL aggregates (count/sum/max carry; avg does
    NOT — it travels as sum+count) merged into the same result as a
    direct aggregation, which is what the oracle states. This is the
    contract behind every incremental/backfill job: day partials merge
    into month rollups without touching raw events again."""
    cat = Catalog(spark, sf_dir)
    partials = cat.events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("p_n"),
        F.sum("value").alias("p_sum"),
        F.max("value").alias("p_max"),
    )
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("p_n").alias("n"),
            F.round(F.sum("p_sum"), 4).alias("total_value"),
            F.round(F.sum("p_sum") / F.sum("p_n"), 6).alias("avg_value"),
            F.round(F.max("p_max"), 6).alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q84_user_value_trend",
    sql="""
    SELECT user_id,
           count(*) AS n_events,
           round(regr_slope(value, epoch(ts) / 86400.0), 6) AS slope_per_day,
           round(regr_intercept(value, epoch(ts) / 86400.0), 4) AS intercept
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 20
    ORDER BY user_id
    """,
)
def q84_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event value over time via built-in
    ``regr_slope``/``regr_intercept`` (Spark >= 3.4) — the
    'fit-a-line-per-group' task that tempts applyInPandas, done as a
    plain algebraic aggregate instead: one shuffle, codegen, mergeable
    partials."""
    cat = Catalog(spark, sf_dir)
    x = F.col("ts").cast("timestamp").cast("double") / 86400.0
    return (
        cat.events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.regr_slope(F.col("value"), x), 6).alias("slope_per_day"),
            F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
        )
        .filter(F.col("n_events") >= 20)
        .orderBy("user_id")
    )
