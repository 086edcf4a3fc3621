"""Local mirror of the driver's DuckDB-oracle comparison: row count,
sorted schema, and order-insensitive values (tolerance for float noise
that the in-query rounding should already have removed)."""

from __future__ import annotations

import duckdb
import pandas as pd

from flight_delays_progetto_big_data_2024_spark.sources.readers import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def assert_parity(spark_df, sql: str, sf_dir: str, rtol: float = 1e-9, atol: float = 1e-9) -> None:
    actual = canonicalize(spark_df.toPandas())
    expected = canonicalize(run_oracle(sql, sf_dir))
    assert list(actual.columns) == list(expected.columns), (
        f"schema mismatch: spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row-count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    pd.testing.assert_frame_equal(
        actual, expected, check_dtype=False, check_exact=False, rtol=rtol, atol=atol
    )
