"""Property suites (pure Python, no SparkSession) for the math the new
operators rely on: the KMV closure/estimator laws, the incremental-dedup
routing identity, and the WAV codec round-trip."""

from __future__ import annotations

import io
import struct
import wave

from hypothesis import given, settings
from hypothesis import strategies as st

from ct_clickhouse_spark.operators.multimodal import (
    wav_encode,
    wav_parse_header,
)

# ---- KMV closure law over the underlying math -----------------------------
# The Spark pipeline computes k-smallest-of-distinct per group; merge is
# k-smallest of the union of two sketches. The law the rollup's range
# merge depends on: sketch(A ∪ B) == merge(sketch(A), sketch(B)).

hash_sets = st.sets(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False), max_size=60
)


def _sketch(values, k):
    return sorted(set(values))[:k]


@given(hash_sets, hash_sets, st.integers(min_value=2, max_value=16))
def test_kmv_closure_law(a, b, k):
    merged = sorted(set(_sketch(a, k)) | set(_sketch(b, k)))[:k]
    direct = _sketch(a | b, k)
    assert merged == direct


@given(hash_sets, st.integers(min_value=2, max_value=16))
def test_kmv_estimator_branches(a, k):
    """Unsaturated -> exact size; saturated -> (k-1)/u_(k) is positive,
    finite, and >= k-1 (u_(k) <= 1)."""
    sk = _sketch(a, k)
    if len(sk) < k:
        assert len(sk) == len(set(a))
    else:
        ukth = sk[k - 1]
        if ukth > 0:
            est = (k - 1) / ukth
            assert est >= k - 1


# ---- incremental-dedup routing identity -----------------------------------
# Soundness for ANY bloom-positive set P that contains all true members
# (no false negatives): (B \ P) ∪ ((B ∩ P) \ C) == B \ C.

keys = st.sets(st.integers(min_value=0, max_value=200), max_size=60)


@given(keys, keys, keys)
def test_incremental_routing_identity(batch, corpus, extra_fp):
    bloom_pos = (batch & corpus) | (extra_fp & batch)  # superset of matches
    result = (batch - bloom_pos) | ((batch & bloom_pos) - corpus)
    assert result == batch - corpus


# ---- WAV codec round-trip --------------------------------------------------

payloads = st.binary(max_size=400)
rates = st.integers(min_value=1, max_value=192_000)


@settings(max_examples=50)
@given(payloads, rates)
def test_wav_roundtrip(data, rate):
    payload = wav_encode(data, rate)
    assert len(payload) == 44 + 2 * len(data)
    parsed = wav_parse_header(payload)
    assert parsed == (rate, 1, 16, len(data))
    with wave.open(io.BytesIO(payload)) as wf:
        assert (
            wf.getframerate(),
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getnframes(),
        ) == (rate, 1, 2, len(data))
        frames = wf.readframes(len(data))
    want = b"".join(
        struct.pack("<h", (b - 128) << 8) for b in data
    )
    assert frames == want


@given(st.binary(max_size=60))
def test_wav_parse_never_crashes_on_garbage(blob):
    out = wav_parse_header(blob)
    if out is not None:
        rate, ch, bits, n = out
        assert n >= 0 and ch >= 0
