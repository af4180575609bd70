"""Directional rounding of float-rescaled decimal footer bounds
(ADVICE r12, manifest.py _dec_raw): above ~15 significant digits,
nearest-float rounding can move a bound INWARD — a lower bound rounded
up can skip a file containing matches (inclusive pruning), and a max
rounded down can let the STRICT evaluator wrongly classify a file as
all-match (metadata-only delete drops surviving rows).  Bounds must
only ever WIDEN: lower rounds toward -inf, upper toward +inf."""

from __future__ import annotations

from fractions import Fraction

import pytest

from iceberg_geo_poc_spark.table.manifest import _dec_raw


@pytest.mark.parametrize(
    "raw,scale",
    [
        (10**18 + 1, 2),  # 19 digits: not exactly representable
        (-(10**18 + 1), 2),
        (12345678901234567891, 4),
        (-12345678901234567891, 4),
        (2**63 + 3, 6),
        (1, 0),  # exact small values must pass through unchanged
        (-700, 2),
    ],
)
def test_dec_raw_widens_only(raw, scale):
    exact = Fraction(raw, 10**scale)
    lo = _dec_raw(raw, scale, -1)
    hi = _dec_raw(raw, scale, +1)
    assert Fraction(lo) <= exact <= Fraction(hi)
    # and stays within a couple of ulps (not over-widened)
    import math

    assert hi <= math.nextafter(math.nextafter(float(lo), math.inf), math.inf) or lo == hi


def test_dec_raw_bytes_form():
    raw = (10**20 + 7).to_bytes(16, "big", signed=True)
    exact = Fraction(10**20 + 7, 10**3)
    assert Fraction(_dec_raw(raw, 3, -1)) <= exact <= Fraction(_dec_raw(raw, 3, +1))


def test_dec_raw_exact_values_unchanged():
    # values exactly representable as floats are NOT nudged
    assert _dec_raw(12500, 2, -1) == 125.0
    assert _dec_raw(12500, 2, +1) == 125.0
