"""Kafka-shaped source layer.

The reference has no streaming ingestion at all (SURVEY.md §2.9); a
production deployment of this engine would read its event feed from
Kafka. The Kafka connector JAR (``spark-sql-kafka-0-10``) is not in
this environment, so the layer is split the way the multimodal codecs
are (operators/multimodal.py): the *plumbing* — wire schema, JSON
envelope parsing, offset bookkeeping — is real Spark code, fully
exercised by tests against a simulated wire-shaped DataFrame; the
*transport* is a thin ``format("kafka")`` call gated behind a clear
error when the connector is absent.

Scale notes: a Kafka scan parallelizes per topic-partition (1 Spark
task each; ``minPartitions`` can split further), so parse work after
``parse_json_envelope`` is already distributed and shuffle-free — the
``from_json`` + field projection stays inside whole-stage codegen.
``maxOffsetsPerTrigger`` bounds micro-batch size for backpressure.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The exact column set Spark's Kafka source produces (Structured
#: Streaming Kafka integration guide) — simulated feeds must match it
#: so downstream parse logic is transport-agnostic.
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

#: Spark's default JSON timestampFormat carries milliseconds only;
#: event timestamps here are micro-precision, so both envelope sides
#: must pin a microsecond format or the round trip silently truncates.
#: TIMESTAMP and TIMESTAMP_NTZ columns read *different* options
#: (timestampFormat vs timestampNTZFormat) — parquet event tables load
#: as NTZ here, so both keys must be pinned.
_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka connector JAR is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Real Kafka transport: ``readStream.format("kafka")``. Raises a
    clear error when the connector JAR is absent (this container) rather
    than Spark's opaque ClassNotFound at query start."""
    if not kafka_available(spark):
        raise NotImplementedError(
            "Kafka connector (spark-sql-kafka-0-10) is not on the classpath; "
            "add the package JAR, or use simulated_kafka_feed() to exercise "
            "the parse pipeline without a broker."
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def simulated_kafka_feed(
    events: DataFrame,
    topic: str = "events",
    n_partitions: int = 4,
    key_col: str = "user_id",
    ts_col: str = "ts",
    partition_expr=None,
) -> DataFrame:
    """Re-shape a typed event table into the exact Kafka wire schema:
    key = utf8 bytes of the key column, value = utf8 JSON of the whole
    row, partition = hash(key) % n (Kafka's default partitioner shape),
    offset = per-partition arrival order. Deterministic, so tests can
    assert exact round-trips through :func:`parse_json_envelope`.
    ``partition_expr`` overrides the partitioner (e.g. a plain
    ``pmod(key, n)`` when an external oracle must reproduce the
    assignment without xxhash64).

    The offset's ``row_number`` window is one shuffle over the feed —
    acceptable for a simulator (a real broker assigns offsets at append
    time, not in Spark).
    """
    from pyspark.sql import Window

    partition = (
        partition_expr
        if partition_expr is not None
        else F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_partitions))
    )
    w = Window.partitionBy("partition").orderBy(ts_col, F.col(key_col))
    return (
        events.withColumn("partition", partition.cast("int"))
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
        .select(
            F.col(key_col).cast("string").cast("binary").alias("key"),
            F.to_json(F.struct(*events.columns), _JSON_OPTS).cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            "partition",
            "offset",
            F.col(ts_col).cast("timestamp").alias("timestamp"),
            F.lit(0).alias("timestampType"),  # 0 = CreateTime
        )
    )


def parse_json_envelope(
    wire: DataFrame,
    payload_schema: StructType,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Decode a Kafka-wire DataFrame (batch or streaming) whose value is
    a JSON document: typed payload columns + the transport metadata
    (topic/partition/offset/timestamp) kept for lineage & exactly-once
    bookkeeping.

    Corrupt detection: PERMISSIVE ``from_json`` yields an all-NULL
    struct for garbage (NOT a null struct — ``payload IS NULL`` misses
    it), so the schema is extended with a ``_corrupt_record`` capture
    column; a null value there is the authoritative "parsed fine"
    signal. Corrupt rows are dropped by default — at 100 TB a poison
    message must not kill the feed; flip ``drop_corrupt`` to keep them
    (``is_corrupt`` flag) and route to a dead-letter sink."""
    capture = StructType(
        [*payload_schema.fields, StructField("_corrupt_record", StringType())]
    )
    opts = {
        **_JSON_OPTS,
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt_record",
    }
    parsed = wire.select(
        F.from_json(F.col("value").cast("string"), capture, opts).alias("payload"),
        # a null value never reaches from_json's corrupt capture — flag
        # it here (a broker tombstone is not a document)
        F.col("value").isNull().alias("__tombstone"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_timestamp"),
    )
    corrupt = F.col("payload._corrupt_record").isNotNull() | F.col("__tombstone")
    fields = [f.name for f in payload_schema.fields]
    if drop_corrupt:
        return parsed.filter(~corrupt).select(
            *[f"payload.{f}" for f in fields],
            "topic",
            "partition",
            "offset",
            "kafka_timestamp",
        )
    return parsed.select(
        *[f"payload.{f}" for f in fields],
        "topic",
        "partition",
        "offset",
        "kafka_timestamp",
        corrupt.alias("is_corrupt"),
    )


def feed_progress(parsed: DataFrame) -> DataFrame:
    """Max committed offset + row count per (topic, partition) — the
    bookkeeping table an exactly-once batch consumer persists alongside
    its output (offsets are the Kafka-native idempotence key)."""
    return parsed.groupBy("topic", "partition").agg(
        F.max("offset").alias("max_offset"),
        F.count("*").alias("n_rows"),
    )
