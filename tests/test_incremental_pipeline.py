"""End-to-end incremental-ingest integration: documents arrive in
micro-batches; each batch is deduplicated WITHIN itself (exact + near-dup
cluster collapse) and AGAINST the accumulated snapshot (exact fingerprint
anti-join + cross-relation Jaccard), and survivors append to the snapshot.

The assertions are the two contracts an incremental dedup loop must keep,
independent of arrival order:
  1. DEDUPEDNESS — the final snapshot contains no pair with J >= t and
     no exact-fingerprint duplicate;
  2. COVERAGE — every document ever ingested is either in the snapshot
     or has a representative there (exact or J >= t near-dup).
This composes merge-style appends, jaccard_pairs / _cross, and
connected_components under Structured Streaming's foreachBatch — the
shape a nightly 100 TB ingest runs, shrunk to sf0.001.
"""

import glob
import os
import shutil

from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.text import fingerprint
from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
    connected_components,
)
from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_cross,
)

THRESHOLD = 0.5


def _collapse_batch(batch):
    """Within-batch dedup: exact (min-id per fingerprint), then near-dup
    cluster collapse (min-id per connected component)."""
    exact_keep = (
        batch.withColumn("__fp", fingerprint("text"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exd = batch.join(exact_keep, "doc_id")
    pairs = jaccard_pairs(exd, "doc_id", "text", k=3, threshold=THRESHOLD)
    cc = connected_components(
        pairs, "id_a", "id_b", vertices=exd.select(F.col("doc_id").alias("id"))
    )
    keep = cc.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return exd.join(keep, "doc_id")


def test_streaming_incremental_dedup_invariants(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    src = str(tmp_path / "ingest-in")
    os.makedirs(src)
    # three arrival batches in doc_id ranges (near-dups often have close
    # ids, so some pairs land in the same batch and some across batches
    # — both paths get exercised)
    for i, pred in enumerate(
        [F.col("doc_id") % 3 == 0, F.col("doc_id") % 3 == 1, F.col("doc_id") % 3 == 2]
    ):
        staging = str(tmp_path / f"stage-{i}")
        docs.filter(pred).coalesce(1).write.parquet(staging)
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.copy(part, f"{src}/b{i}.parquet")

    snapshot = str(tmp_path / "snapshot")

    def apply_batch(batch, _bid):
        incoming = _collapse_batch(batch)
        if glob.glob(f"{snapshot}/*.parquet"):
            snap = spark.read.parquet(snapshot)
            # exact dup vs snapshot: fingerprint anti-join
            incoming = incoming.withColumn("__fp", fingerprint("text")).join(
                snap.select(fingerprint("text").alias("__fp")).distinct(),
                "__fp",
                "left_anti",
            )
            # near-dup vs snapshot: cross-relation Jaccard
            dup_ids = jaccard_pairs_cross(
                incoming, snap, "doc_id", "text", k=3, threshold=THRESHOLD
            ).select(F.col("id_left").alias("doc_id")).distinct()
            incoming = incoming.join(dup_ids, "doc_id", "left_anti")
        incoming.select("doc_id", "text", "source").write.mode("append").parquet(
            snapshot
        )

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "ingest stream did not finish"

    snap = spark.read.parquet(snapshot)
    n_in, n_snap = docs.count(), snap.count()
    assert 0 < n_snap < n_in  # something survived AND something deduped

    # 1. DEDUPEDNESS: no exact dup, no near-dup pair inside the snapshot
    assert (
        snap.select(fingerprint("text").alias("fp")).distinct().count() == n_snap
    )
    assert jaccard_pairs(snap, "doc_id", "text", k=3, threshold=THRESHOLD).count() == 0

    # 2. COVERAGE: every dropped doc has a representative in the snapshot
    dropped = docs.join(snap.select("doc_id"), "doc_id", "left_anti")
    exact_covered = (
        dropped.withColumn("__fp", fingerprint("text"))
        .join(
            snap.select(fingerprint("text").alias("__fp")).distinct(),
            "__fp",
            "left_semi",
        )
        .select("doc_id")
    )
    near_covered = jaccard_pairs_cross(
        dropped, snap, "doc_id", "text", k=3, threshold=THRESHOLD
    ).select(F.col("id_left").alias("doc_id")).distinct()
    uncovered = (
        dropped.select("doc_id")
        .join(exact_covered.unionByName(near_covered).distinct(), "doc_id", "left_anti")
        .count()
    )
    assert uncovered == 0
