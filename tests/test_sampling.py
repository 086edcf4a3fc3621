"""Deterministic sampling/splitting and decontamination operators."""

from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
    cross_corpus_containment,
)
from flight_delays_progetto_big_data_2024_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    pack_sequences,
    pack_stats,
    stratified_sample,
)
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog


def test_hash_split_is_layout_invariant(spark, sf_dir):
    """The same doc must land in the same split regardless of physical
    partitioning — the property randomSplit lacks."""
    docs = Catalog(spark, sf_dir).documents
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7, "lang")).collect()
    }
    assert a == b and set(a.values()) == {"train", "val", "test"}


def test_hash_split_weights_and_salt(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    n = docs.count()
    counts = {
        r["split"]: r["n"]
        for r in hash_split(docs).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # 80/10/10 within generous tolerance at 500-5000 docs
    assert abs(counts["train"] / n - 0.8) < 0.08
    assert abs(counts["val"] / n - 0.1) < 0.06
    assert abs(counts["test"] / n - 0.1) < 0.06
    # a different salt re-draws the assignment
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="v2").collect()}
    assert any(a[k] != b[k] for k in a)


def test_deterministic_sample_stable_and_nested(spark, sf_dir):
    """Smaller fractions must be SUBSETS of larger ones (same salt) —
    the property that makes hash sampling resumable/reproducible."""
    docs = Catalog(spark, sf_dir).documents
    s10 = {r["doc_id"] for r in deterministic_sample(docs, 0.1).select("doc_id").collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    again = {r["doc_id"] for r in deterministic_sample(docs, 0.1).select("doc_id").collect()}
    n = docs.count()
    assert s10 == again
    assert s10 <= s30
    assert abs(len(s30) / n - 0.3) < 0.1
    assert deterministic_sample(docs, 0.0).count() == 0
    assert deterministic_sample(docs, 1.0).count() == n


def test_cross_corpus_containment_planted(spark):
    """A short benchmark doc fully embedded in a long corpus doc is
    containment 1.0 even though pair Jaccard is tiny."""
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    filler = " ".join(f"filler{i} token{i} pad{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [
            (10, filler + " the quick brown fox jumps over the lazy dog " + filler),
            (11, filler),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["bench_id"], r["corpus_id"]): r["containment"]
        for r in cross_corpus_containment(corpus, bench, threshold=0.5).collect()
    }
    assert got == {(1, 10): 1.0}


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir):
    import math

    docs = Catalog(spark, sf_dir).documents
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sampled = stratified_sample(docs, "source", 0.25)
    got = {
        r["source"]: r["n"]
        for r in sampled.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # EXACT ceil(frac*n) per stratum — no stratum missing, none rounded away
    assert got == {s: math.ceil(0.25 * n) for s, n in totals.items()}
    # content-deterministic: identical kept set on a different layout
    a = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(11, "lang"), "source", 0.25)
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_pack_sequences_chunking_invariants(spark, sf_dir):
    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        token_count,
    )

    budget = 256
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", token_count("text").alias("length")
    )
    packed = pack_sequences(docs, budget, "length", n_shards=4)
    # coverage: every doc assigned exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    rows = pack_stats(packed, budget).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["bin"], r["n_tokens"]))
    for shard, bins in by_shard.items():
        bins.sort()
        # bins are consecutive from 0
        assert [b for b, _ in bins] == list(range(len(bins)))
        # contiguous chunking: cumulative tokens through every non-final
        # bin must reach that bin's budget boundary (the stream overflows
        # into the next bin exactly when the boundary is crossed)
        cum = 0
        for b, toks in bins[:-1]:
            cum += toks
            assert cum >= (b + 1) * budget, (shard, b, cum)
    # layout-invariant assignment
    a = {(r["doc_id"], r["shard"], r["bin"]) for r in packed.collect()}
    b = {
        (r["doc_id"], r["shard"], r["bin"])
        for r in pack_sequences(
            docs.repartition(13), budget, "length", n_shards=4
        ).collect()
    }
    assert a == b
