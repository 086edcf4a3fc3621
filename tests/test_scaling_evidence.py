"""Scaling-evidence gates (round-5): the committed SCALING.json is the
measured growth curve for every headline + dedup/ANN query, and this
suite (a) fails if any committed exponent exceeds its documented bound
and (b) re-measures the prefix filter's DETERMINISTIC candidate counts
across a live 10x decade — wall time can only be measured alone
(bench rule), but candidate row counts are exact and concurrency-proof,
so the sub-quadratic claim keeps a live runtime gate too."""

import json
import os

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scaling_record():
    path = os.path.join(REPO, "SCALING.json")
    assert os.path.exists(path), (
        "SCALING.json missing — run `python scaling.py` (alone) and commit "
        "the result; the scale claims need committed evidence"
    )
    with open(path) as fh:
        return json.load(fh)


def test_committed_exponents_within_documented_bounds():
    """Every measured top-decade exponent must sit under its documented
    ceiling (scaling.py EXPONENT_BOUNDS). A silent quadratic blowup —
    a filter that stopped pushing, a prefix that stopped pruning —
    adds ~+1 to the exponent and trips this on the next measurement."""
    import scaling

    rec = _scaling_record()
    assert set(rec) == set(scaling.EXPONENT_BOUNDS), (
        "SCALING.json and scaling.EXPONENT_BOUNDS cover different queries — "
        "re-run scaling.py after editing the measured set"
    )
    over = {
        name: (r["alpha_top"], scaling.EXPONENT_BOUNDS[name][0])
        for name, r in rec.items()
        if r["alpha_top"] > scaling.EXPONENT_BOUNDS[name][0]
    }
    assert not over, f"measured exponent over documented bound: {over}"


def test_committed_times_are_bench_consistent():
    """The sf0.1 column of SCALING.json must be the same order of
    magnitude as the committed bench record — a stale or hand-edited
    scaling file would silently disarm the exponent gate."""
    import bench

    rec = _scaling_record()
    prev = bench._latest_committed_bench(REPO)
    if not prev:
        return
    for name, t_bench in prev.items():
        if name not in rec or t_bench < 0.5:
            continue
        t_scaling = rec[name]["t"]["0.1"]
        assert t_scaling <= 5 * t_bench + 1.0, (name, t_scaling, t_bench)


def test_prefix_filter_candidates_grow_subquadratically_live(spark):
    """Live 10x-decade gate on DETERMINISTIC counts: the PPJoin prefix
    candidates on the real documents corpus must grow with a row-count
    exponent beta = log10(c(0.01)/c(0.001)) strictly below the
    co-occurrence exponent of the full inverted index, and below 2.
    Counts are exact — this gate holds under concurrent load where
    wall-time gates would flake."""
    import math

    from pyspark.sql import Window

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        word_shingles,
    )
    from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
        _shingle_docs,
    )
    from flight_delays_progetto_big_data_2024_spark.session import release_caches
    from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog

    t_eff = 0.5 - 1e-6
    counts = {}
    for sf in ("0.001", "0.01"):
        docs = _shingle_docs(
            Catalog(spark, f"/root/testdata/sf{sf}").documents,
            "doc_id", "text", 3, word_shingles,
        )
        inv = docs.select(
            "id", F.size("shingles").alias("n"), F.explode("shingles").alias("s0")
        ).select("id", "n", F.xxhash64("s0").alias("s"))
        dfreq = inv.groupBy("s").agg(F.count("*").alias("df"))
        full_pairs = dfreq.agg(
            F.sum(F.col("df") * (F.col("df") - 1) / 2)
        ).collect()[0][0]
        ranked = inv.join(dfreq, "s").withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("id").orderBy("df", "s")),
        )
        prefix = ranked.filter(
            F.col("rk") <= F.col("n") - F.ceil(F.lit(t_eff) * F.col("n")) + 1
        ).select("id", "s")
        cand = (
            prefix.alias("a")
            .join(
                prefix.alias("b"),
                (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .distinct()
            .count()
        )
        counts[sf] = {"full": float(full_pairs), "cand": float(cand)}
        release_caches(spark)

    beta_full = math.log10(counts["0.01"]["full"] / counts["0.001"]["full"])
    beta_cand = math.log10(
        max(counts["0.01"]["cand"], 1.0) / max(counts["0.001"]["cand"], 1.0)
    )
    assert beta_cand < 2.0, counts
    assert beta_cand <= beta_full, counts
    # and the pruning is material at both scales, not a no-op
    for sf in counts:
        assert counts[sf]["cand"] <= 0.5 * counts[sf]["full"], counts
