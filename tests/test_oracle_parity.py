"""Every registered (query, oracle_sql) pair must agree with DuckDB —
the local mirror of the driver's t2 correctness gate, at sf0.001."""

import pytest

from flight_delays_progetto_big_data_2024_spark.plans import registry
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    result = registry.QUERIES[name](spark, sf_dir)
    assert_parity(result, registry.ORACLE[name], sf_dir)


def test_every_query_returns_rows(spark, sf_dir):
    # the driver's rows-only gate; every registered query is known to be
    # non-empty at every shipped SF — a zero here is a regression
    for name, fn in registry.QUERIES.items():
        assert fn(spark, sf_dir).count() > 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
