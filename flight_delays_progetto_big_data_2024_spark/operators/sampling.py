"""Deterministic sampling and splitting for training-data pipelines.

``df.randomSplit`` / ``df.sample`` are seed-based but NOT content-
deterministic: assignment depends on partitioning and row order, so the
same document can change splits across cluster layouts, reruns, or
upstream repartitions — poison for train/test hygiene. These operators
assign by a hash of the ROW IDENTITY instead: the same id lands in the
same split on any cluster, any day, regardless of physical layout.

The bucket is the first 4 hex chars of ``md5(id || salt)`` — a uniform
65536-bucket space expressed as a lexicographically ordered string, so
the assignment is a pure projection (no shuffle, fully pushed into the
scan stage) and engine-portable verbatim (DuckDB/ANSI:
``substr(md5(...), 1, 4)``), which keeps every split oracle-checkable.

Scale posture: both operators are narrow maps — zero shuffles, no
driver state, trivially parallel at 100 TB. Changing ``salt`` re-draws
the assignment (e.g. per-epoch subsampling) without touching the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 65536


def _hash_bucket(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )


def _cut(frac: float) -> str:
    """Cumulative-fraction cut point as a 4-hex lower bound; fractions
    ≥ 1 map to a sentinel above 'ffff' so the comparison stays true."""
    n = int(frac * _BUCKETS)
    return "zzzz" if n >= _BUCKETS else format(n, "04x")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append a content-deterministic split label: bucket(id) falls in
    the half-open interval whose width is the (normalized) weight.
    Granularity is 1/65536 — weights are honored to ±0.002%.

    A NULL id hashes to a NULL bucket, every interval comparison is
    NULL, and the when-chain's otherwise assigns the LAST label —
    deterministic (all NULL-id rows land together, never split across
    train/test), but worth knowing when ids can be missing."""
    assert len(weights) == len(labels) and len(labels) >= 2
    total = float(sum(weights))
    bucket = _hash_bucket(id_col, salt)
    acc = 0.0
    expr = None
    for w, label in zip(weights[:-1], labels[:-1]):
        acc += w / total
        cond = bucket < F.lit(_cut(acc))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(split_col, expr.otherwise(labels[-1]))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Content-deterministic Bernoulli-style sample: keeps ids whose
    bucket falls below ``fraction`` of the hash space. Unlike
    ``df.sample`` the kept set is a stable function of (id, salt)."""
    assert 0.0 <= fraction <= 1.0
    return df.filter(_hash_bucket(id_col, salt) < F.lit(_cut(fraction)))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACT-size per-stratum sample: every group keeps exactly
    ``ceil(fraction · group_size)`` rows (the hash-ranked prefix), so
    small strata are never rounded away — the failure mode of Bernoulli
    sampling (``deterministic_sample`` / ``sampleBy``), which can drop a
    rare language or source entirely.

    Selection is content-deterministic: rows are ranked inside each
    stratum by ``(md5-bucket(id, salt), id)``; the kept set is a stable
    function of (ids, salt) on any layout. One shuffle on ``group_col``
    + per-group sort — the exact-count guarantee needs a total order
    per stratum, which Bernoulli hashing cannot give. Skew posture: a
    hot stratum sorts in one task; for a pathological mega-stratum,
    pre-split it with a salted sub-key and take per-sub-stratum
    prefixes."""
    assert 0.0 <= fraction <= 1.0
    w = Window.partitionBy(group_col).orderBy(
        _hash_bucket(id_col, salt), F.col(id_col)
    )
    counts = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(counts))
        .filter(F.col("_rn") <= F.ceil(F.lit(float(fraction)) * F.col("_n")))
        .drop("_rn", "_n")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    length_col: Column | str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every document to a training-batch bin by contiguous
    token-budget chunking: ``(id_col, shard, bin, length)``.

    Documents are sharded by id hash (``n_shards`` independent packing
    streams — at cluster scale set this ≥ total cores so packing is
    embarrassingly parallel), ordered content-deterministically inside
    each shard by ``(md5-bucket, id)``, and a document starting at
    running-token offset ``o`` lands in bin ``floor(o / budget)``.

    These are concatenate-then-chunk semantics (GPT-style pretraining
    packing): bins are full back-to-back windows of the shard's token
    stream, so a bin can overrun ``budget`` by at most the tail of its
    last document — unlike greedy first-fit, the assignment is a pure
    window function (one shuffle + sort per shard, no sequential
    driver loop) and is expressible in ANSI SQL for the oracle.
    """
    length = F.col(length_col) if isinstance(length_col, str) else length_col
    # NULL / negative token counts are corrupt metadata and POISON
    # other documents' bins: a NULL length makes its own bin NULL
    # (silently unplaceable), and a negative length shifts every later
    # running offset down — measured fabricating bin -1 for a CLEAN
    # document that followed one corrupt row. Drop them (the scd2
    # undated-change rule); zero-length docs are harmless and keep
    # their slot.
    df = df.filter(length.isNotNull() & (length >= 0))
    # stable integer shard from the first 4 md5 hex chars (engine-
    # portable: DuckDB computes the identical value)
    shard = (
        F.conv(_hash_bucket(id_col, salt), 16, 10).cast("long") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(
        _hash_bucket(id_col, salt), F.col(id_col)
    )
    running = F.sum("length").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), shard, length.cast("long").alias("length"))
        .withColumn(
            "bin", F.floor((running - F.col("length")) / F.lit(int(budget)))
        )
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill accounting for :func:`pack_sequences` output:
    ``(shard, bin, n_docs, n_tokens, fill_ratio)``. Every bin except
    possibly each shard's last is full by construction (fill ≥ 1 −
    tail-doc/budget); systematic underfill means the budget is smaller
    than typical documents."""
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("length").alias("n_tokens"),
        F.round(F.sum("length") / F.lit(float(budget)), 6).alias("fill_ratio"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    id_col: str = "doc_id",
    salt: str = "w",
) -> DataFrame:
    """Deterministic Bernoulli sampling with PER-ROW keep probability
    ``weight_col`` (clamped to [0,1]): keep iff the row's md5-derived
    uniform < weight. Content-hash randomness, zero RNG state — the
    same row always makes the same decision regardless of partitioning,
    executor count, or retries (speculative task re-runs produce
    identical samples, which ``rand()`` does NOT guarantee). A pure
    projection+filter: no shuffle, pushes down past column pruning.

    NULL and NaN weights drop the row (an undefined keep probability is
    not a keep). Without the explicit NaN guard, Spark's total ordering
    makes ``greatest(NaN, 0.0) = NaN`` and ``least(NaN, 1.0) = 1.0`` —
    one NaN weight silently became KEEP-ALWAYS."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = F.conv(_hash_bucket(id_col, salt), 16, 10).cast("double") / float(_BUCKETS)
    return df.filter(
        ~F.isnan(w.cast("double"))
        & (u < F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0)))
    )


def chunk_documents_udtf(spark):
    """Register and return the sliding-window token chunker UDTF (the
    RAG/pretraining chunking op): one output row per chunk of
    ``chunk_size`` tokens advancing by ``stride`` (overlap =
    chunk_size - stride). A chunk at start s>0 is emitted only if the
    PREVIOUS chunk didn't already reach the document's end
    (s - stride + chunk_size < n) — no redundant tail chunks.

    A UDTF (table function) rather than explode-of-array because each
    input row yields a VARIABLE number of rows with per-row derived
    state — exactly the one-to-many generator shape the UDTF API exists
    for. ``useArrow=True`` matters: without it the UDTF plans as
    BatchEvalPythonUDTF (pickled row-at-a-time transfer); with it the
    exchange is Arrow-batched (ArrowEvalPythonUDTF), the same transport
    the mapInPandas operators use — pinned by the repo-wide
    no-BatchEvalPython plan invariant in tests/test_plan_shapes.py.
    """
    from pyspark.sql.functions import udtf

    import re

    @udtf(returnType="chunk_idx int, n_chunk_tokens int", useArrow=True)
    class ChunkDoc:
        # ASCII \s+ split, NOT str.split(): Python's bare split()
        # treats UNICODE whitespace (NBSP, ideographic space) as
        # separators, but the repo's tokens() contract — Spark
        # split('\\s+') and DuckDB RE2 alike — is ASCII-only, so a
        # single NBSP made the UDTF's token count disagree with
        # every other operator (round-6 unicode probe). Compiled ONCE
        # at class scope: eval() is the per-row hot path.
        _WS = re.compile(r"\s+", re.ASCII)

        def eval(self, text: str, chunk_size: int, stride: int):
            toks = [t for t in self._WS.split(text or "") if t]
            n = len(toks)
            if n == 0:
                return
            idx = 0
            for s in range(0, n, stride):
                if s == 0 or s - stride + chunk_size < n:
                    yield idx, min(chunk_size, n - s)
                    idx += 1

    spark.udtf.register("chunk_doc", ChunkDoc)
    return ChunkDoc
