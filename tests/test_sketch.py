"""Unit tests for the sketch / corpus-growth / incremental-dedup batch:
PCA against numpy ground truth, cross-relation Jaccard against planted
near-dups, count-min estimates against the one-sided-error guarantee."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
    jaccard_pairs_cross,
)
from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
    pca_variance_profile,
)
from flight_delays_progetto_big_data_2024_spark.plans import registry

from tests.conftest import SF_DIR as SF


def test_pca_matches_numpy(spark):
    rng = np.random.RandomState(7)
    # anisotropic data: variance concentrated along a few directions so
    # the spectrum is distinguishable
    base = rng.randn(300, 6) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    df = spark.createDataFrame(
        [Row(embedding=[float(x) for x in row]) for row in base]
    )
    got = pca_variance_profile(df, "embedding", k=4).orderBy("component").collect()
    cov = np.cov(base, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    ratios = evals / evals.sum()
    for r in got:
        assert r.eigenvalue == pytest.approx(evals[r.component], rel=1e-6)
        assert r.variance_ratio == pytest.approx(ratios[r.component], abs=1e-5)
    # ratios are monotone for this spectrum and cum_ratio is their cumsum
    assert got[-1].cum_ratio == pytest.approx(ratios[:4].sum(), abs=1e-5)


def test_jaccard_pairs_cross_planted(spark):
    left = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely different content about spark plans"),
        ]
    )
    right = spark.createDataFrame(
        [
            # near-copy of left doc 1 (one word changed at the end)
            Row(doc_id=10, text="the quick brown fox jumps over the lazy cat"),
            Row(doc_id=11, text="unrelated text with no overlap whatsoever here"),
        ]
    )
    out = jaccard_pairs_cross(left, right, k=3, threshold=0.3).collect()
    pairs = {(r.id_left, r.id_right) for r in out}
    assert pairs == {(1, 10)}
    [row] = out
    # 7 distinct 3-gram shingles per side; only the one containing the
    # changed final word differs → 6 shared / 8 union = 0.75
    assert row.jaccard == pytest.approx(0.75, abs=1e-6)


def test_cms_estimates_are_one_sided(spark):
    out = registry.QUERIES["q134_cms_term_frequency"](spark, SF).collect()
    assert len(out) == 20
    for r in out:
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count
        assert r.overestimate >= 0


def test_pq_encode_shape_and_bounds(spark, sf_dir):
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    codes = pq_encode(emb, m=4, sub_dim=16, k=8, iterations=2).collect()
    assert len(codes) == 4 * n  # one code per (vector, subspace)
    assert all(0 <= r.code < 8 for r in codes)
    assert all(r.dist2 >= 0.0 for r in codes)
    per_vec = {}
    for r in codes:
        per_vec.setdefault(r.vec_id, set()).add(r.sub)
    assert all(subs == {0, 1, 2, 3} for subs in per_vec.values())


def test_bloom_filter_has_no_false_negatives(spark, sf_dir):
    # one-sided error is the Bloom contract: every gram truly in the
    # benchmark set MUST pass the filter (n_contaminated <= n_candidates
    # per source, and no source can have contaminated docs the bloom
    # pass missed)
    out = registry.QUERIES["q147_bloom_decontamination"](spark, sf_dir).collect()
    assert out, "no sources"
    for r in out:
        assert r.n_candidates >= r.n_contaminated
        assert r.n_false_positive == r.n_candidates - r.n_contaminated


def test_q29_hll_error_within_rsd_bound(spark):
    """q29's HLL++ estimates are rows-only at the driver (registers are
    engine-internal; see its docstring) — this is the certification that
    stands in: every estimate must sit within a conservative multiple of
    the configured rsd=0.02 of the EXACT distinct count. 5x rsd ≈ 5
    sigma: loose enough to never flake, tight enough that a broken
    estimator (or a column mixup) fails immediately."""
    est = registry.QUERIES["q29_cardinality_profile_approx"](spark, SF).first()
    cat_exact = spark.read.parquet(f"{SF}/lineitem.parquet").agg(
        F.countDistinct("l_orderkey").alias("n_orderkeys"),
        F.countDistinct("l_partkey").alias("n_partkeys"),
        F.countDistinct("l_suppkey").alias("n_suppkeys"),
    ).first()
    for col in ("n_orderkeys", "n_partkeys", "n_suppkeys"):
        exact = cat_exact[col]
        assert abs(est[col] - exact) <= max(5 * 0.02 * exact, 3), col
