"""Partition-layout invariance: results must be bit-stable however the
planner splits the data, or the driver's value-hash gate flakes in some
future round.

The round-6 full sweep ran EVERY registered query at sf0.01 under a
hostile layout (shuffle.partitions=7, 64 KB input splits, AQE off) and
hash-matched all 182 against their oracles. CI pins the subset whose
shapes are most exposed to ordering (any_value carriers, orderBy+limit
top-k, ntile/row_number chains, iterative k-means, ES sampling,
window-value functions) under the same layout.
"""
from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_pandas_parity

#: queries whose plans lean hardest on deterministic tie-breaks
RISKY = [
    "q68_order_price_deciles",        # global ntile
    "q80_kmeans_clusters",            # iterative assignment, rounded ties
    "q109_customer_revenue_gini",     # global row_number rank
    "q119_hourly_event_ohlc",         # first/last/nth_value windows
    "q140_bigram_surprisal",          # any_value carrier columns
    "q142_copurchase_pairs",          # orderBy + limit top-k
    "q166_weighted_sample_without_replacement",  # ES top-50 boundary
    "q33_minhash_lsh_near_dups",      # banded candidates + exact verify
]


@pytest.fixture(scope="module")
def hostile_layout(spark):
    saved = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get(
            "spark.sql.adaptive.enabled"
        ),
    }
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield spark
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", RISKY)
def test_result_invariant_under_hostile_layout(hostile_layout, oracle, name):
    got = entry.queries()[name](hostile_layout, SF_DIR).toPandas()
    want = oracle.execute(entry.oracle_sql()[name]).fetchdf()
    assert_pandas_parity(got, want)
