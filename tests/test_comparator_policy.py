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
