"""Kafka-shaped source plumbing and exactly-once foreachBatch sinks."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from flight_delays_progetto_big_data_2024_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    kafka_available,
    parse_json_envelope,
    read_kafka_stream,
    simulated_kafka_feed,
)
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog
from flight_delays_progetto_big_data_2024_spark.streaming.sinks import (
    IdempotentParquetSink,
    idempotent_foreach_batch,
)


def test_simulated_feed_matches_wire_schema(spark, sf_dir):
    feed = simulated_kafka_feed(Catalog(spark, sf_dir).events)
    assert [(f.name, f.dataType) for f in feed.schema.fields] == [
        (f.name, f.dataType) for f in KAFKA_WIRE_SCHEMA.fields
    ]


def test_feed_offsets_dense_per_partition(spark, sf_dir):
    feed = simulated_kafka_feed(Catalog(spark, sf_dir).events, n_partitions=3)
    stats = (
        feed.groupBy("partition")
        .agg(
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.count("*").alias("n"),
            F.countDistinct("offset").alias("nd"),
        )
        .collect()
    )
    assert len(stats) > 1  # the hash partitioner actually spreads keys
    for r in stats:
        # dense 0..n-1, no gaps or duplicates — the broker-log invariant
        assert (r["lo"], r["hi"], r["nd"]) == (0, r["n"] - 1, r["n"])


def test_envelope_roundtrip_is_lossless(spark, sf_dir):
    events = Catalog(spark, sf_dir).events
    parsed = parse_json_envelope(simulated_kafka_feed(events), events.schema)
    back = parsed.select(*events.columns)
    assert back.schema == events.schema
    assert back.exceptAll(events).count() == 0
    assert events.exceptAll(back).count() == 0


def test_corrupt_payloads_dropped_not_fatal(spark):
    payload = StructType(
        [StructField("a", IntegerType()), StructField("b", StringType())]
    )
    wire = spark.createDataFrame(
        [
            (None, b'{"a": 1, "b": "x"}', "t", 0, 0, None, 0),
            (None, b"not json at all", "t", 0, 1, None, 0),
            (None, None, "t", 0, 2, None, 0),
        ],
        KAFKA_WIRE_SCHEMA,
    )
    good = parse_json_envelope(wire, payload).collect()
    assert [(r["a"], r["b"], r["offset"]) for r in good] == [(1, "x", 0)]
    kept = parse_json_envelope(wire, payload, drop_corrupt=False)
    assert kept.count() == 3


def test_real_transport_cleanly_gated(spark):
    if kafka_available(spark):
        pytest.skip("connector present; gate test is for bare classpaths")
    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "events")


def _run_stream_to_sink(spark, src_dir, sink_fn, checkpoint):
    raw_schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    query = (
        stream.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    assert query.awaitTermination(120)


def test_idempotent_parquet_sink_replay_safe(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-000.parquet")
    out = str(tmp_path / "out")

    sink = IdempotentParquetSink(out)
    _run_stream_to_sink(spark, str(src), sink, str(tmp_path / "ckpt"))
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.parquet(out).count() == n_events

    # simulate the at-least-once replay: same (batch_df, batch_id) again
    sink(spark.read.parquet(f"{sf_dir}/events.parquet"), 0)
    assert spark.read.parquet(out).count() == n_events


def test_commit_marker_skips_replayed_batch(spark, sf_dir, tmp_path):
    appended = []

    def append_write(batch_df, batch_id):  # non-idempotent: blind append
        appended.append((batch_id, batch_df.count()))

    wrapped = idempotent_foreach_batch(append_write, str(tmp_path / "markers"))
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    wrapped(df, 7)
    wrapped(df, 7)  # replay of a committed batch: must not re-write
    wrapped(df, 8)
    assert [b for b, _ in appended] == [7, 8]


def test_streaming_materialized_view_maintenance(spark, sf_dir, tmp_path):
    """foreachBatch incremental aggregate maintenance: partial
    aggregates merged per micro-batch into a parquet 'view' must equal
    the direct batch aggregate over all input (the q83 algebraic
    identity, driven through Structured Streaming)."""
    import shutil

    from pyspark.sql import functions as F

    src = tmp_path / "mv_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "b0.parquet")
    out = str(tmp_path / "mv_out")
    schema = spark.read.parquet(str(src / "b0.parquet")).schema

    def merge_batch(batch_df, batch_id):
        partial = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("p_n"), F.sum("value").alias("p_sum")
        )
        try:
            existing = spark.read.parquet(out)
            merged = (
                existing.unionByName(partial)
                .groupBy("event_type")
                .agg(F.sum("p_n").alias("p_n"), F.sum("p_sum").alias("p_sum"))
            )
        except Exception:
            merged = partial
        merged.coalesce(1).write.mode("overwrite").parquet(out + "_tmp")
        spark.read.parquet(out + "_tmp").write.mode("overwrite").parquet(out)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    got = {
        r["event_type"]: (r["p_n"], round(r["p_sum"], 4))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["s"], 4))
        for r in spark.read.parquet(str(src))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want and len(got) == 5


def test_streaming_cdc_merge_upsert_snapshot(spark, sf_dir, tmp_path):
    """foreachBatch + merge_upsert: a stream of CDC batches (upserts
    then deletes for a key subset) maintained into a parquet snapshot
    must equal applying the batches in order — the incremental-corpus
    maintenance loop (q118's operator) driven through Structured
    Streaming with availableNow."""
    from pyspark.sql import functions as F

    from flight_delays_progetto_big_data_2024_spark.operators.temporal import (
        merge_upsert,
    )

    src = tmp_path / "cdc_src"
    src.mkdir()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    # batch 0: upsert everything tagged v1; batch 1: delete doc_id%3==0,
    # re-tag doc_id%5==0 as v2 (files ingested in name order; the
    # streaming file source wants FLAT files, so extract the part file)
    def write_flat(df, name):
        import shutil
        from pathlib import Path

        tmp = tmp_path / f"_{name}"
        df.coalesce(1).write.parquet(str(tmp))
        part = next(Path(tmp).glob("part-*.parquet"))
        shutil.move(str(part), str(src / name))

    write_flat(
        docs.withColumn("ver", F.lit("v1")).withColumn("op", F.lit("upsert")),
        "b0.parquet",
    )
    b1 = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "ver", F.lit(None).cast("string")
    ).withColumn("op", F.lit("delete")).unionByName(
        docs.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 3 != 0))
        .withColumn("ver", F.lit("v2"))
        .withColumn("op", F.lit("upsert"))
    )
    write_flat(b1, "b1.parquet")

    out = str(tmp_path / "snapshot")
    schema = spark.read.parquet(str(src / "b0.parquet")).schema

    def apply_cdc(batch_df, batch_id):
        try:
            target = spark.read.parquet(out)
        except Exception:
            target = batch_df.sparkSession.createDataFrame(
                [], "doc_id long, source string, ver string"
            )
        merged = merge_upsert(target, batch_df, "doc_id")
        merged.coalesce(1).write.mode("overwrite").parquet(out + "_tmp")
        spark.read.parquet(out + "_tmp").write.mode("overwrite").parquet(out)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(apply_cdc)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    got = {r["doc_id"]: r["ver"] for r in spark.read.parquet(out).collect()}
    want = {}
    for r in docs.collect():
        d = r["doc_id"]
        if d % 3 == 0:
            want.pop(d, None)
        else:
            want[d] = "v2" if d % 5 == 0 else "v1"
    assert got == want


def test_stream_static_enrich_matches_batch(spark, sf_dir, tmp_path):
    import glob
    import shutil

    from flight_delays_progetto_big_data_2024_spark.streaming.joins import (
        stream_static_enrich,
    )

    src = str(tmp_path / "enrich-in")
    os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    staging = str(tmp_path / "enrich-staging")
    events.coalesce(1).write.parquet(staging)
    (part,) = glob.glob(f"{staging}/part-*.parquet")
    shutil.copy(part, f"{src}/b1.parquet")

    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("view", 0.1)],
        "event_type string, weight double",
    )
    stream = (
        spark.readStream.schema(events.schema)
        .parquet(src)
    )
    collected = []
    q = (
        stream_static_enrich(stream, dim, "event_type")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    batch = stream_static_enrich(events, dim, "event_type").collect()

    def key(rows):
        return sorted(
            (r.event_id, r.event_type, r.weight) for r in rows
        )

    assert key(collected) == key(batch)
    # left join: unmapped types survive with null weight
    assert any(r.weight is None for r in batch) or all(
        r.event_type in {"click", "purchase", "view"} for r in batch
    )


def test_complete_mode_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    """Output-mode coverage: COMPLETE mode re-emits the whole aggregate
    per micro-batch; after availableNow drains every file, the LAST
    emission must equal the batch aggregate over all data (append and
    update modes are covered by the windowed/sessionizer tests)."""
    import glob

    src = str(tmp_path / "complete-in")
    os.makedirs(src)
    events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(300)
    # two arrival files so at least two micro-batches re-emit
    for i, pred in enumerate([F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1]):
        staging = str(tmp_path / f"cstage-{i}")
        events.filter(pred).coalesce(1).write.parquet(staging)
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.copy(part, f"{src}/b{i}.parquet")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy(
        F.window("ts", "6 hours").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    emissions = []
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(lambda df, bid: emissions.append((bid, df.collect())))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert len(emissions) >= 2  # complete mode re-emitted per batch

    final = {
        (r["w"]["start"], r["event_type"]): r["n"] for r in emissions[-1][1]
    }
    batch = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == batch


def test_stream_stream_left_outer_emits_null_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: matched left rows emit
    with their match; an UNMATCHED left row must surface with null right
    columns once the right watermark passes left_ts + max_delay — the
    streaming 'no conversion inside the window' signal batch joins give
    for free but streams can only emit after the watermark proves
    finality."""
    import glob
    from datetime import datetime

    from flight_delays_progetto_big_data_2024_spark.streaming.joins import (
        stream_interval_join_outer,
    )

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    lsrc = str(tmp_path / "lo-left")
    rsrc = str(tmp_path / "lo-right")
    os.makedirs(lsrc)
    os.makedirs(rsrc)
    lschema = "k long, lts timestamp, lval string"
    rschema = "k long, rts timestamp, rval string"

    def drop(dirpath, name, rows, schema):
        staging = str(tmp_path / f"lo-stage-{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staging)
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.copy(part, f"{dirpath}/{name}.parquet")

    # left: key 1 will match; key 2 never gets a right row
    drop(lsrc, "l1", [(1, t(10, 0), "a"), (2, t(10, 0), "b")], lschema)
    # right: match for key 1 inside the 30-min window. The GLOBAL
    # watermark is min(left, right), so BOTH streams get far-future
    # advancing rows, and one more batch after that flushes the
    # evicted-state outer nulls
    drop(rsrc, "r1", [(1, t(10, 10), "m")], rschema)
    drop(lsrc, "l2", [(98, t(20, 0), "advance-l")], lschema)
    drop(rsrc, "r2", [(99, t(20, 0), "advance-r")], rschema)
    drop(lsrc, "l3", [(97, t(21, 0), "advance-l2")], lschema)
    drop(rsrc, "r3", [(96, t(21, 0), "advance-r2")], rschema)

    left = spark.readStream.schema(lschema).option("maxFilesPerTrigger", "1").parquet(lsrc)
    right = spark.readStream.schema(rschema).option("maxFilesPerTrigger", "1").parquet(rsrc)
    out = stream_interval_join_outer(
        left, right, "k", "lts", "rts", max_delay="30 minutes", watermark="10 minutes"
    )
    collected = []
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "lo-ckpt"))
        .foreachBatch(lambda df, _id: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    rows = {(r.k, r.lval): (r.rval) for r in collected if r.k in (1, 2)}
    assert rows.get((1, "a")) == "m"  # matched pair
    assert (2, "b") in rows and rows[(2, "b")] is None  # null-emitted after close
