"""First-class tolerance verdicts (r11 verdict item 4): the sf10
certification proved exact str(double) hashing scale-unsound for big FP
aggregates (sums ~6e12 exceed double resolution at 2dp rounding), so
verify_driver now emits a strict hash AND a relative-grid hash per slot
from one run. These tests gate the grid's two required properties:

- a PLANTED LAST-ULP divergence (the exact failure class observed at
  sf10) splits the strict hash but NOT the grid hash;
- a real divergence (wrong value, rel err >> grid) splits both.

No SparkSession needed — the signatures operate on pandas frames, which
is exactly the layer the round driver compares at.
"""

from __future__ import annotations

import math

import pandas as pd

from ct_clickhouse_spark.testing import (
    RTOL_SIG_DIGITS,
    pandas_signature,
    pandas_signature_rtol,
)


def _frames_with(value_a: float, value_b: float):
    a = pd.DataFrame({"g": ["A", "B"], "s": [value_a, 123.25]})
    b = pd.DataFrame({"g": ["A", "B"], "s": [value_b, 123.25]})
    return a, b


def test_last_ulp_divergence_splits_strict_but_not_grid():
    # the observed sf10 failure: a ~6e12 sum whose two engine-side
    # addition orders differ by one ulp after 2dp rounding
    v = 6123456789012.34
    v_ulp = math.nextafter(v, math.inf)
    assert v != v_ulp and str(v) != str(v_ulp)  # the strict compare breaks
    a, b = _frames_with(v, v_ulp)
    assert pandas_signature(a) != pandas_signature(b)
    assert pandas_signature_rtol(a) == pandas_signature_rtol(b)


def test_real_divergence_splits_both():
    v = 6123456789012.34
    a, b = _frames_with(v, v * (1 + 1e-6))
    assert pandas_signature(a) != pandas_signature(b)
    assert pandas_signature_rtol(a) != pandas_signature_rtol(b)


def test_grid_is_exact_for_non_floats():
    # ints, strings, NULLs must render exactly as the strict compare —
    # only floats snap to the grid
    a = pd.DataFrame({"g": ["x", None], "n": [7, 8]})
    b = pd.DataFrame({"g": ["x", None], "n": [7, 9]})
    assert pandas_signature_rtol(a) != pandas_signature_rtol(b)
    assert pandas_signature_rtol(a) == pandas_signature_rtol(a.copy())


def test_grid_collapses_signed_zero_and_handles_nonfinite():
    a = pd.DataFrame({"v": [0.0, float("inf"), float("-inf")]})
    b = pd.DataFrame({"v": [-0.0, float("inf"), float("-inf")]})
    assert pandas_signature_rtol(a) == pandas_signature_rtol(b)


def test_grid_digits_cover_2dp_rounded_teraSums():
    # invariant the constant encodes: a 2dp-rounded sum up to ~1e13 whose
    # engines agree to ~1e-9 relative must land in one grid cell
    assert RTOL_SIG_DIGITS <= 12  # digits beyond double's ulp at 1e13 are noise
    v = 9999999999999.99
    assert f"{v:.{RTOL_SIG_DIGITS - 1}e}" == f"{math.nextafter(v, 0):.{RTOL_SIG_DIGITS - 1}e}"
