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
