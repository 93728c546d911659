"""Property tests (pure Python, no SparkSession) for the content-keyed
sampling threshold math that both engines rely on for parity."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from ct_clickhouse_spark.operators.bloomjoin import _BIT_MASKS
from ct_clickhouse_spark.operators.sampling import HEX_WIDTH, _hex_threshold

fracs = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


@given(fracs, fracs)
def test_hex_threshold_monotone(a, b):
    """More fraction never keeps fewer rows: thresholds order like the
    fractions (lexicographic on fixed-width hex == numeric)."""
    lo, hi = sorted((a, b))
    assert _hex_threshold(lo) <= _hex_threshold(hi)


@given(fracs)
def test_hex_threshold_shape(f):
    t = _hex_threshold(f)
    if round(f * 16**HEX_WIDTH) >= 16**HEX_WIDTH:
        # within half a bucket of 1.0: keep everything
        assert t == "g"  # sorts after every hex digit
    else:
        assert len(t) == HEX_WIDTH
        assert all(c in "0123456789abcdef" for c in t)


def test_hex_threshold_edges():
    assert _hex_threshold(0.0) == "0" * HEX_WIDTH  # keeps nothing
    assert _hex_threshold(1.0) == "g"
    # granularity: 1/16^W steps resolve
    one_step = 1.0 / 16**HEX_WIDTH
    assert _hex_threshold(one_step) != _hex_threshold(0.0)


def test_bloom_bit_masks_cover_all_64_bits_exactly_once():
    """Each mask has exactly one bit set; together they cover the word
    (bit 63 is the sign bit: -2^63 in two's complement)."""
    seen = 0
    for m in _BIT_MASKS:
        v = m & 0xFFFFFFFFFFFFFFFF
        assert v and (v & (v - 1)) == 0  # single bit
        assert not (seen & v)  # no repeats
        seen |= v
    assert seen == 0xFFFFFFFFFFFFFFFF
