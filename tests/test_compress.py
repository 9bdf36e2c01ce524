"""Round-trip and property tests for the compression codecs."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dads_spark.compress import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)
from dads_spark.compress.bitpack import BitReader, clz64, ctz64, pack_fields, popcount64


def test_bit_primitives():
    x = np.array([0, 1, 2, 3, 0x8000000000000000, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 1, 2, 1, 64]
    assert clz64(x).tolist() == [64, 63, 62, 62, 0, 0]
    assert ctz64(x).tolist() == [64, 0, 1, 0, 63, 0]


def test_pack_fields_roundtrip():
    vals = np.array([0b101, 0b1, 0b11111111, 7], dtype=np.uint64)
    bits = np.array([3, 1, 8, 64])
    r = BitReader(pack_fields(vals, bits))
    for v, b in zip(vals, bits):
        assert r.read(int(b)) == int(v)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, width=64) | st.sampled_from([0.0, -0.0, 1.5, 3.25]),
        max_size=300,
    )
)
def test_gorilla_roundtrip_property(vals):
    v = np.array(vals, dtype=np.float64)
    dec = decode_values(encode_values(v), len(v))
    if len(v):
        assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


def test_gorilla_nan_and_extremes():
    v = np.array([np.nan, np.inf, -np.inf, 5e-324, 1.7976931348623157e308, -0.0])
    dec = decode_values(encode_values(v), len(v))
    assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


def test_gorilla_compresses_counter_series():
    # rollup metrics are integer-valued doubles (doc counts, byte sums):
    # adjacent XORs share exponent + most mantissa bits
    rng = np.random.default_rng(3)
    v = (100 + np.cumsum(rng.integers(-3, 4, 5000))).astype(np.float64)
    enc = encode_values(v)
    assert len(enc) < len(v) * 8 * 0.35  # ~3x or better
    dec = decode_values(enc, len(v))
    assert np.array_equal(v, dec)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200)
)
def test_deltadelta_roundtrip_property(ts):
    t = np.array(sorted(ts), dtype=np.int64)
    dec = decode_timestamps(encode_timestamps(t), len(t))
    assert np.array_equal(t, dec)


def test_deltadelta_regular_buckets_near_one_bit():
    t = np.arange(0, 10_000 * 3600, 3600, dtype=np.int64)
    enc = encode_timestamps(t)
    # ~1 bit per timestamp after the 16-byte header
    assert len(enc) <= 16 + len(t) // 8 + 8


def test_deltadelta_mixed_gaps():
    rng = np.random.default_rng(5)
    deltas = rng.choice([3600, 3600, 3600, 7200, 86400, 1], size=2000)
    t = np.cumsum(deltas).astype(np.int64)
    dec = decode_timestamps(encode_timestamps(t), len(t))
    assert np.array_equal(t, dec)
