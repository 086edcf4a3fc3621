"""Skew operators + bucketed co-located joins: exactness against the
naive forms, and the plan-shape guarantees (no shuffle on bucketed
joins) that are the point of these operators at 100 TB."""

import pyspark.sql.functions as F
import pytest

from flight_delays_progetto_big_data_2024_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog
from flight_delays_progetto_big_data_2024_spark.sources.writers import write_bucketed

from tests.conftest import SF_DIR as SF  # honors $SPARK_GRAFT_TEST_SF_DIR


def test_salted_distinct_count_matches_naive(spark):
    li = Catalog(spark, SF).lineitem
    naive = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: r["n_distinct"]
        for r in salted_distinct_count(
            li, ["l_returnflag"], "l_orderkey", buckets=16
        ).collect()
    }
    assert salted == naive


def test_salted_distinct_count_hot_key(spark):
    # one key owning ~all rows with many distinct values — the case the
    # two-level form exists for
    df = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 997).alias("v")
    )
    row = salted_distinct_count(df, ["k"], "v", buckets=8).collect()[0]
    assert (row["k"], row["n_distinct"]) == ("hot", 997)


def test_salted_join_matches_plain_join(spark):
    cat = Catalog(spark, SF)
    plain = (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
    )
    salted = (
        salted_join(
            cat.lineitem.withColumnRenamed("l_orderkey", "k"),
            cat.orders.withColumnRenamed("o_orderkey", "k"),
            on=["k"],
            n_salt=4,
        )
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, x string")
    right = spark.createDataFrame([(1, 10.0)], "k long, y double")
    got = {r["k"]: r["y"] for r in salted_join(left, right, ["k"], 4, "left").collect()}
    assert got == {1: 10.0, 2: None}


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    cat = Catalog(spark, SF)
    write_bucketed(
        cat.lineitem.select("l_orderkey", "l_quantity"),
        "t_li_b", str(tmp_path / "li"), ["l_orderkey"], 8, ["l_orderkey"],
    )
    write_bucketed(
        cat.orders.select("o_orderkey", "o_orderpriority"),
        "t_o_b", str(tmp_path / "o"), ["o_orderkey"], 8, ["o_orderkey"],
    )
    yield spark.table("t_li_b"), spark.table("t_o_b")
    spark.sql("DROP TABLE IF EXISTS t_li_b")
    spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    li, o = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketing is what avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert joined.count() == Catalog(spark, SF).lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_aqe_skew_join_splits_hot_partition(spark, tmp_path):
    """AQE's skew-join must actually ACTIVATE on a hot key once the
    skew thresholds are crossed — this pins the runtime behavior the
    engine's skew story relies on (the salted operators cover the
    map side; OptimizeSkewedJoin covers the reduce side). Thresholds
    are lowered temporarily so a test-sized hot key crosses them
    deterministically, and restored afterwards."""
    conf = spark.conf
    saved = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.coalescePartitions.enabled": conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled"
        ),
    }
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        big = spark.range(0, 200_000).select(
            # 90% of rows share ONE key; rest spread over 1000 keys
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        small = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        # aggregate over the payload so column pruning can't strip it —
        # the hot partition must stay physically big through the shuffle
        joined = big.join(small, "k").select(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("b")
        )
        [row] = joined.collect()  # executes THIS DataFrame's plan
        assert row.n == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # AQE marks split skew partitions in the final plan
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


# ---------------------------------------------------------------------------
# Round-5: adversarial Zipf corpus — skew behavior measured, not assumed
# ---------------------------------------------------------------------------


def _zipf_docs():
    """Deterministic heavy-tailed corpus: word w of a 400-word
    vocabulary appears ∝ 1/w (pool of floor(400/w) copies), docs drawn
    by a fixed coprime stride — no RNG, same corpus every run. The hot
    words reach df ≈ 28% of documents, the regime where a plain
    inverted index quadratically explodes on co-occurrences. 15 exact
    duplicates are planted on top of the (many) natural near-dups the
    tiny vocabulary creates."""
    vocab = 400
    pool: list[str] = []
    for w in range(1, vocab + 1):
        pool.extend([f"w{w:03d}"] * (vocab // w))
    stride = 7919 if len(pool) % 7919 else 7920
    n_docs, wpd = 300, 16
    rows = []
    for d in range(n_docs):
        words = [pool[((d * wpd + j) * stride) % len(pool)] for j in range(wpd)]
        rows.append((d, " ".join(words)))
    rows += [(1000 + d, rows[d][1]) for d in range(15)]
    return rows


def test_jaccard_prefix_filter_bounds_candidates_on_zipf_corpus(spark):
    """On the heavy-tailed corpus the PPJoin prefix filter must (a)
    return EXACTLY the plain inverted-index result and (b) keep its
    candidate set within the measured Σdf² budget — the '100 TB
    runnable' claim as numbers: the full index co-occurs ~30k pairs
    here, the prefix index must enumerate under 10% of that."""
    from pyspark.sql import Window

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        word_shingles,
    )
    from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
        _shingle_docs,
        jaccard_pairs,
        jaccard_pairs_prefix,
    )
    from flight_delays_progetto_big_data_2024_spark.session import release_caches

    df = spark.createDataFrame(_zipf_docs(), "doc_id long, text string")
    k, t = 3, 0.5

    # measure the same index the operators build
    docs = _shingle_docs(df, "doc_id", "text", k, word_shingles)
    inv = docs.select(
        "id", F.size("shingles").alias("n"), F.explode("shingles").alias("s0")
    ).select("id", "n", F.xxhash64("s0").alias("s"))
    dfreq = inv.groupBy("s").agg(F.count("*").alias("df"))
    full_pairs = dfreq.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p")
    ).collect()[0]["p"]
    top_df, n_docs = dfreq.agg(F.max("df")).collect()[0][0], df.count()
    assert top_df >= 0.2 * n_docs  # the corpus IS adversarial

    t_eff = t - 1e-6
    ranked = inv.join(dfreq, "s").withColumn(
        "rk", F.row_number().over(Window.partitionBy("id").orderBy("df", "s"))
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("n") - F.ceil(F.lit(t_eff) * F.col("n")) + 1
    )
    # prefix postings drop the high-df tail (measured: 2520 vs 4410)
    assert prefix.count() <= 0.7 * inv.count()
    pj = prefix.select("id", "s").alias("a").join(
        prefix.select("id", "s").alias("b"),
        (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")),
    )
    raw_pairs = pj.count()
    cand_pairs = pj.select("a.id", "b.id").distinct().count()
    # the enumerated candidates respect the Σ df_prefix·(df_prefix−1)/2
    # budget, and land far under the full index's Σdf² (measured: 1084
    # distinct candidates vs 30018 full co-occurrences = 3.6%)
    budget = prefix.groupBy("s").count().agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2)
    ).collect()[0][0]
    assert raw_pairs <= budget
    assert cand_pairs <= 0.10 * full_pairs, (cand_pairs, full_pairs)

    exact = {(r["id_a"], r["id_b"])
             for r in jaccard_pairs(df, k=k, threshold=t).collect()}
    pref = {(r["id_a"], r["id_b"])
            for r in jaccard_pairs_prefix(df, k=k, threshold=t).collect()}
    assert pref == exact and len(exact) >= 15  # planted dupes found
    assert len(exact) <= cand_pairs            # verified ⊆ candidates
    release_caches(spark)


def test_salted_join_spreads_hot_key_on_skewed_fact(spark):
    """One key owning 20% of a 100k-row fact: the salt must spread the
    hot key across reducers (measured per-(key,salt) group sizes, not
    wall time — deterministic under local[32]) while the join stays
    row-identical to the plain join."""
    n, n_salt = 100_000, 8
    fact = spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit(7))
        .otherwise(F.col("id") % 997)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(997).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    hot_rows = n // 5  # ~20%

    # the exact salt expression salted_join applies to the big side
    salted_groups = (
        fact.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salt)))
        .filter(F.col("k") == 7)
        .groupBy("__salt")
        .count()
        .collect()
    )
    sizes = {r["__salt"]: r["count"] for r in salted_groups}
    # the hot key's rows land on most salts, and no single (key, salt)
    # group keeps more than half the unsalted hot group
    assert len(sizes) >= n_salt // 2, sizes
    assert max(sizes.values()) <= hot_rows / 2, sizes
    assert sum(sizes.values()) >= hot_rows * 0.99

    plain = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("rows"), F.sum(F.col("payload") + F.col("v")).alias("s")
    ).collect()[0]
    salted = salted_join(fact, dim, ["k"], n_salt).agg(
        F.count(F.lit(1)).alias("rows"), F.sum(F.col("payload") + F.col("v")).alias("s")
    ).collect()[0]
    assert (plain["rows"], plain["s"]) == (salted["rows"], salted["s"])


def test_cap_per_group_caps_hot_domain(spark):
    """Mixture cap under domain skew: a hot domain at 50% of the corpus
    is capped to exactly n while cold domains pass through, and the
    kept rows are the deterministic lowest-order prefix."""
    from flight_delays_progetto_big_data_2024_spark.operators.curation import (
        cap_per_group,
    )

    df = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 50).cast("string")))
        .alias("source"),
        F.col("id").alias("doc_id"),
    )
    kept = cap_per_group(df, "source", 40, order_cols=("doc_id",))
    counts = {r["source"]: r["n"]
              for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["hot"] == 40
    assert all(v <= 40 for v in counts.values())
    hot_kept = sorted(
        r["doc_id"] for r in kept.filter(F.col("source") == "hot").collect()
    )
    assert hot_kept == [2 * i for i in range(40)]  # lowest-doc_id prefix


def test_cap_per_group_hashed_exact_and_prefilter_reduces_hot_domain(spark):
    """The hash-threshold pre-filter form must return EXACTLY the plain
    window form's rows (same order spec) on a skewed corpus with NULL
    domains and NULL ids, while the pre-filter measurably shrinks the
    hot domain's window input (~margin*n survivors instead of 5000)."""
    from flight_delays_progetto_big_data_2024_spark.operators.curation import (
        cap_per_group,
        cap_per_group_hashed,
    )

    df = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .when(F.col("id") % 401 == 3, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 50).cast("string")))
        .alias("source"),
        F.when(F.col("id") % 773 == 5, F.lit(None).cast("long"))
        .otherwise(F.col("id"))
        .alias("doc_id"),
    )
    n, margin = 25, 4.0
    plain = cap_per_group(
        df.withColumn("__h", F.xxhash64("doc_id")),
        "source", n, order_cols=("__h", "doc_id"),
    ).drop("__h")
    hashed = cap_per_group_hashed(df, "source", n, "doc_id", margin=margin)
    key = lambda r: (str(r["source"]), str(r["doc_id"]))
    assert sorted(map(key, hashed.collect())) == sorted(map(key, plain.collect()))

    # measured reduction: replicate the operator's pre-filter on the
    # hot domain and check the window input shrank from 5000 rows to
    # roughly margin*n (binomial around 100; generous ceiling)
    hot_total = df.filter(F.col("source") == "hot").count()
    frac = margin * n / hot_total
    thr = -(2.0**63) + frac * 2.0**64
    survivors = df.filter(
        (F.col("source") == "hot")
        & (F.xxhash64("doc_id").cast("double") <= F.lit(thr))
    ).count()
    assert hot_total == 5_000
    assert n <= survivors <= 4 * margin * n, survivors


def test_cap_per_group_hashed_zero_survivor_group_falls_back(spark):
    """Regression (round-6 advisor, curation.py): a domain whose rows
    ALL hash above the pre-filter threshold has no row in the survivor
    groupBy, so a survivors-side `short` derivation never saw it and
    the domain vanished from the output. For keep-1-per-host (n=1,
    margin=4) that is P ≈ e^-4 ≈ 1.8% per large domain — real loss.
    The counts-side derivation must route it through the fallback."""
    from flight_delays_progetto_big_data_2024_spark.operators.curation import (
        cap_per_group_hashed,
    )

    # Deterministically pick 5 ids whose xxhash64 is POSITIVE (top half
    # of the hash space). With n=1, margin=1, count=5 the threshold is
    # -2^63 + (1/5)*2^64 = -0.6*2^63 < 0, so NONE of them survive the
    # pre-filter: the zero-survivor case, constructed, not sampled.
    pool = spark.range(200).select(
        F.concat(F.lit("id"), F.col("id").cast("string")).alias("doc_id"),
        F.xxhash64(F.concat(F.lit("id"), F.col("id").cast("string"))).alias("h"),
    )
    unlucky = [r["doc_id"] for r in pool.filter("h > 0").limit(5).collect()]
    lucky = [r["doc_id"] for r in pool.filter("h < 0").limit(5).collect()]
    assert len(unlucky) == 5 and len(lucky) == 5

    rows = [("unlucky", d) for d in unlucky] + [("lucky", d) for d in lucky]
    df = spark.createDataFrame(rows, "source string, doc_id string")
    n, margin = 1, 1.0

    # precondition: replicate the operator's pre-filter — the unlucky
    # domain must have ZERO survivors or the test isn't testing the bug
    thr = -(2.0**63) + (margin * n / 5.0) * 2.0**64
    pre_unlucky = df.filter(
        (F.col("source") == "unlucky")
        & (F.xxhash64("doc_id").cast("double") <= F.lit(thr))
    ).count()
    assert pre_unlucky == 0, pre_unlucky

    kept = cap_per_group_hashed(df, "source", n, "doc_id", margin=margin)
    by_group = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_group == {"unlucky": 1, "lucky": 1}
    # and the kept row is the exact window-form choice: min (hash, id)
    want = min(unlucky, key=lambda d: (
        pool.filter(F.col("doc_id") == d).collect()[0]["h"], d))
    got = kept.filter(F.col("source") == "unlucky").collect()[0]["doc_id"]
    assert got == want
