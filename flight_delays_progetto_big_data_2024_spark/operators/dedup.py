"""Deduplication operators for LLM-training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.

Scale design (the whole point of these ops is the 100 TB case):

- exact dedup is a hash groupBy on the fingerprint — one shuffle keyed
  by md5, no driver state;
- exact-Jaccard pairs use an inverted-index (explode shingles → join on
  shingle → count per pair), NOT a crossJoin: pairs sharing zero
  shingles never materialize, so cost tracks shared-shingle frequency
  rather than n²;
- MinHash-LSH banding turns near-dup search into an equi-join on
  (band_index, band_hash) — the classic sub-quadratic candidate
  generator — followed by exact-Jaccard verification of candidates only;
- SimHash + pigeonhole blocking: 64-bit signature split into B blocks;
  any pair within Hamming distance < B must agree on ≥1 block, so the
  block equi-join has PERFECT recall for that radius (it's an exact
  algorithm, not an approximation);
- embedding near-dup joins on random-hyperplane sign buckets before the
  cosine check.

All signatures/hashes derive from xxhash64 with fixed seeds — fully
deterministic across runs and cluster layouts.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.text import (
    fingerprint,
    word_shingles,
)

#: Modulus for the MinHash permutation family. 2^31-1 (Mersenne prime):
#: products a*x stay < 2^62, inside signed-64 range — no overflow UDF
#: tricks needed to stay JVM-side.
_MINHASH_PRIME = 2_147_483_647


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint: one row per distinct
    text with the minimum id as representative + the duplicate count.
    (``dropDuplicates`` keeps an ARBITRARY row — min-id keep is
    deterministic, which the oracle comparison requires.)"""
    return (
        df.withColumn("text_hash", fingerprint(text_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_copies"),
        )
    )


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence,
) -> DataFrame:
    """Deterministic 'keep one row per key' (order decides which):
    the row_number form of dropDuplicates."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    scale: int = 6,
    shingle_fn=word_shingles,
) -> DataFrame:
    """ALL pairs with word-k-gram Jaccard ≥ threshold, computed exactly
    via an inverted shingle index (explode → self-join on shingle →
    per-pair intersection count). Exact because any pair with J > 0
    shares ≥1 shingle and is therefore enumerated.

    At 100 TB the hazard is ubiquitous shingles exploding the join;
    mitigate upstream by raising k (longer shingles are rarer) or
    filtering stop-shingles by document frequency before the join —
    both change which pairs are *candidates* but not the J ≥ t result
    for t > 0 as long as dropped shingles are counted in the union
    (they are: sizes come from the full shingle sets).
    """
    docs = df.select(
        F.col(id_col).alias("id"), shingle_fn(text_col, k).alias("shingles")
    ).persist()  # feeds the index twice + the size table: shingle once
    sizes = docs.select("id", F.size("shingles").alias("n_sh"))
    # join on the 64-bit shingle hash, not the string: ~10× less shuffle
    # volume and cheaper key compares; xxhash64 collisions are ~n²/2⁶⁴ —
    # immaterial below ~10⁸ distinct shingles per join scope
    inv = docs.select("id", F.explode("shingles").alias("s")).select(
        "id", F.xxhash64("s").alias("s")
    )
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                scale,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MINHASH_PRIME), rng.randrange(0, _MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def hashed_shingles(shingles_col):
    """xxhash64 of each shingle, mod the MinHash prime (array<bigint>).
    Materialize this as its OWN column before building signatures: the 64
    permutation mins each reference the whole array, and Catalyst's
    CollapseProject keeps a non-cheap multiply-referenced column as a
    separate projection — so the string hashing runs once per row, not
    64 times."""
    return F.transform(
        shingles_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_PRIME))
    )


def _signature_from_hashed(hashed_col, num_hashes: int, seed: int):
    def _perm(a: int, b: int):
        # factory closure: PySpark derives lambda arity from the Python
        # signature, so default-arg capture (lambda x, a=a: ...) breaks
        return lambda x: F.pmod(a * x + b, F.lit(_MINHASH_PRIME))

    mins = [
        F.array_min(F.transform(hashed_col, _perm(a, b)))
        for a, b in _minhash_params(num_hashes, seed)
    ]
    return F.array(*mins)


def minhash_signature(
    shingles_col,
    num_hashes: int = 64,
    seed: int = 42,
):
    """MinHash signature column (array<bigint>, length num_hashes) over a
    distinct-shingle array column: ``min((a_i·h(s)+b_i) mod p)`` with
    ``h = xxhash64 mod p``. Pure higher-order expressions — JVM-side.

    Prefer the two-step ``hashed_shingles`` + ``_signature_from_hashed``
    (as ``minhash_lsh_candidates`` does) in hot paths: inlined here, the
    hashing subexpression is duplicated across all ``num_hashes`` mins.
    """
    return _signature_from_hashed(hashed_shingles(shingles_col), num_hashes, seed)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: signature split into
    ``bands`` bands of ``num_hashes//bands`` rows; pairs agreeing on any
    full band collide. Returns distinct (id_a, id_b), id_a < id_b.

    The whole pipeline is (narrow maps) + one explode + one equi-join on
    (band, band_hash): sub-quadratic, shuffle keyed by band hash."""
    docs = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, k).alias("shingles")
    )
    return _lsh_candidates_from_docs(docs, num_hashes, bands, seed)


def _lsh_candidates_from_docs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """LSH banding over a prepared (id, shingles) relation."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    docs = docs.withColumn("hs", hashed_shingles(F.col("shingles"))).withColumn(
        "sig", _signature_from_hashed(F.col("hs"), num_hashes, seed)
    )
    # NB: rows stay NARROW (id, band, bh) — a first-agreeing-band filter
    # (as simhash_near_dups uses) would need the 16-int band-hash array
    # on every exploded row, inflating the join shuffle ~10×; with LSH's
    # low candidate multiplicity the distinct() is the cheaper dedup.
    banded = docs.select(
        "id",
        F.posexplode(
            F.array(
                *[F.hash(F.slice("sig", i * rows + 1, rows)) for i in range(bands)]
            )
        ).alias("band", "bh"),
    )
    # both self-join sides read this; persist so shingling + the 64-hash
    # signature run once over the corpus
    banded = banded.persist()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    scale: int = 6,
) -> DataFrame:
    """LSH candidates verified by EXACT Jaccard on the shingle sets —
    precision 1.0 by construction; recall governed by the banding curve
    (64 hashes / 16 bands ⇒ ~99.9% at J=0.5).

    The (id, shingles) relation feeds candidate generation AND both
    sides of the verification join — persist it so tokenization/
    shingling (the dominant per-row cost) runs once over the corpus."""
    docs = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, k).alias("shingles")
    ).persist()
    cands = _lsh_candidates_from_docs(docs, num_hashes, bands, seed)
    da = docs.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    db = docs.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("jaccard", F.round(inter / union, scale))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _simhash_from_hashes(hashes):
    """64-bit SimHash from a token-hash array: per-bit ±1 votes, sign of
    the vote total sets the bit. The 64 bit positions are unrolled in
    Python (bit masks must be literals — shift amounts can't be lambda
    variables), each an ``aggregate`` over the token-hash array.
    Entirely JVM-side expressions — no UDF. Pass ``hashes`` as a real
    column (not an inline expression): all 64 votes reference it, and a
    non-cheap multiply-referenced column survives CollapseProject, so
    the hashing runs once per row."""

    def _vote(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    sig = F.lit(0).cast("long")
    for j in range(64):
        # bit 63 of a signed long is the sign bit: its mask is min-long
        mask = (1 << j) if j < 63 else -(1 << 63)
        votes = F.aggregate(hashes, F.lit(0), _vote(mask))
        sig = sig.bitwiseOR(
            F.when(votes > 0, F.lit(mask)).otherwise(F.lit(0)).cast("long")
        )
    return sig


def simhash_signature(tokens_col):
    """64-bit SimHash over a token array. Prefer the two-step token-hash
    column + ``_simhash_from_hashes`` in hot paths (as
    ``simhash_near_dups`` does) so hashing isn't duplicated per bit."""
    return _simhash_from_hashes(F.transform(tokens_col, lambda t: F.xxhash64(t)))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
    blocks: int = 8,
) -> DataFrame:
    """All pairs within Hamming distance ≤ max_hamming of their 64-bit
    SimHash. Pigeonhole blocking: with ``blocks`` equal bit-blocks, any
    pair with < blocks differing bits agrees on ≥ 1 block, so joining on
    (block_idx, block_value) has perfect recall for
    max_hamming ≤ blocks-1 — this is exact, not approximate."""
    assert max_hamming < blocks, "pigeonhole guarantee needs max_hamming < blocks"
    width = 64 // blocks
    from flight_delays_progetto_big_data_2024_spark.functions.text import tokens

    docs = (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
        .withColumn("th", F.transform("toks", lambda t: F.xxhash64(t)))
        .select("id", _simhash_from_hashes(F.col("th")).alias("sh"))
    )
    mask = (1 << width) - 1
    blocked = docs.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sh", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.blk").alias("blk"), F.col("bb.bv").alias("bv"))
    # both self-join sides read this; persist so the signature pipeline
    # (tokenize + 64-bit votes) runs once over the corpus
    blocked = blocked.persist()
    a = blocked.alias("a")
    b = blocked.alias("b")
    hamming = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    # a pair agreeing on m blocks matches in m block-buckets; instead of
    # dedup-by-shuffle (distinct over the full candidate stream), keep
    # only the row whose bucket is the FIRST agreeing block — computable
    # from the two signatures already on the row, so each pair survives
    # exactly once with zero extra shuffle
    block_eq = F.array(
        *[
            (
                F.shiftrightunsigned(F.col("a.sh"), i * width).bitwiseAND(F.lit(mask))
                == F.shiftrightunsigned(F.col("b.sh"), i * width).bitwiseAND(F.lit(mask))
            ).cast("int")
            for i in range(blocks)
        ]
    )
    first_match = F.array_position(block_eq, 1) - 1
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(F.col("a.blk") == first_match)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
