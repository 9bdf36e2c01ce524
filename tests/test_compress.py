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


# ------------------------------------------------------------------- chimp
@given(
    st.lists(
        st.floats(allow_nan=False, width=64) | st.sampled_from([0.0, -0.0, 1.5, 3.25]),
        max_size=300,
    )
)
def test_chimp_roundtrip_property(vals):
    from dads_spark.compress import chimp

    v = np.array(vals, dtype=np.float64)
    dec = chimp.decode_values(chimp.encode_values(v), len(v))
    if len(v):
        assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


def test_chimp_nan_and_extremes():
    from dads_spark.compress import chimp

    v = np.array([np.nan, np.inf, -np.inf, 5e-324, 1.7976931348623157e308, -0.0])
    dec = chimp.decode_values(chimp.encode_values(v), len(v))
    assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


def test_chimp_beats_gorilla_on_decimal_doubles():
    # the paper's motivating case: rounded decimals have FEW trailing
    # zeros, so Gorilla's 6+6 header is overhead Chimp's 2-bit flag +
    # class reuse avoids
    from dads_spark.compress import chimp

    rng = np.random.default_rng(7)
    v = np.round(rng.normal(100, 5, 5000), 2)
    enc_c = chimp.encode_values(v)
    enc_g = encode_values(v)
    assert len(enc_c) < len(enc_g)
    assert np.array_equal(
        chimp.decode_values(enc_c, len(v)).view(np.uint64), v.view(np.uint64)
    )


def test_chimp_flag_coverage_and_repeat_runs():
    from dads_spark.compress import chimp

    # constant run -> flag 00 everywhere after the first value: 2 bits/val
    v = np.full(4000, 12345.6789)
    enc = chimp.encode_values(v)
    assert len(enc) <= 8 + 4000 // 4 + 8
    assert np.array_equal(chimp.decode_values(enc, len(v)), v)
    # integer-valued doubles exercise the many-trailing-zeros (01) flag
    v2 = (100 + np.cumsum(np.arange(500) % 7)).astype(np.float64)
    assert np.array_equal(
        chimp.decode_values(chimp.encode_values(v2), 500), v2
    )


def test_tier_roundtrip_codec_chimp(spark):
    from dads_spark.compress import compressed_tier_roundtrip

    import pandas as pd

    pdf = pd.DataFrame({
        "k": ["a"] * 50 + ["b"] * 30,
        "bucket_ts": pd.date_range("2024-01-01", periods=50, freq="h").tolist()
        + pd.date_range("2024-02-01", periods=30, freq="h").tolist(),
        "value_sum": np.round(np.random.default_rng(1).normal(10, 2, 80), 3),
    })
    df = spark.createDataFrame(pdf)
    out = (
        compressed_tier_roundtrip(df, ["k"], codec="chimp")
        .orderBy("k", "bucket_ts")
        .toPandas()
    )
    want = pdf.sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    assert np.array_equal(
        out["value_sum"].to_numpy().view(np.uint64),
        want["value_sum"].to_numpy().view(np.uint64),
    )
    assert (out["bucket_ts"].to_numpy() == want["bucket_ts"].to_numpy()).all()

# --------------------------------------------------------------- simple8b
@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 60) - 1)
        | st.sampled_from([0, 1, 1, 1, 2, 3600, 86400]),
        max_size=600,
    )
)
def test_simple8b_roundtrip_property(vals):
    from dads_spark.compress import simple8b

    v = np.array(vals, dtype=np.uint64)
    dec = simple8b.decode_ints(simple8b.encode_ints(v), len(v))
    assert np.array_equal(v, dec)


def test_simple8b_rle_and_selector_paths():
    from dads_spark.compress import simple8b

    # RLE fast paths: exactly 240, exactly 120, run straddling both
    for n in (240, 120, 359, 479, 241, 119):
        v = np.ones(n, dtype=np.uint64)
        enc = simple8b.encode_ints(v)
        assert np.array_equal(simple8b.decode_ints(enc, n), v)
    # a 240-run is ONE word; regular hour deltas after delta coding
    assert len(simple8b.encode_ints(np.ones(240, dtype=np.uint64))) == 8
    # touch every selector width
    for _, bits in simple8b.MODES[2:]:
        hi = (1 << bits) - 1
        v = np.array([hi, 0, hi // 2] * 40, dtype=np.uint64)
        assert np.array_equal(
            simple8b.decode_ints(simple8b.encode_ints(v), len(v)), v
        )


def test_simple8b_bound_and_density():
    from dads_spark.compress import simple8b

    with pytest.raises(ValueError):
        simple8b.encode_ints(np.array([1 << 60], dtype=np.uint64))
    # small counts pack densely: <= ~8 bits/val for values < 2^6
    rng = np.random.default_rng(11)
    v = rng.integers(0, 64, 6000).astype(np.uint64)
    assert len(simple8b.encode_ints(v)) <= 6000  # >= 8x vs raw int64


def test_simple8b_tier_roundtrip(spark):
    from dads_spark.compress import simple8b_tier_roundtrip

    import pandas as pd

    pdf = pd.DataFrame({
        "k": ["a"] * 60 + ["b"] * 25,
        "bucket_ts": pd.date_range("2024-01-01", periods=60, freq="h").tolist()
        + pd.date_range("2024-03-01", periods=25, freq="2h").tolist(),
        "doc_count": np.random.default_rng(2).integers(1, 10_000, 85),
    })
    df = spark.createDataFrame(pdf)
    out = (
        simple8b_tier_roundtrip(df, ["k"])
        .orderBy("k", "bucket_ts")
        .toPandas()
    )
    want = pdf.sort_values(["k", "bucket_ts"]).reset_index(drop=True)
    assert (out["doc_count"].to_numpy() == want["doc_count"].to_numpy()).all()
    assert (out["bucket_ts"].to_numpy() == want["bucket_ts"].to_numpy()).all()

# -------------------------------------------------------------------- alp
@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64)
        | st.integers(-10**6, 10**6).map(lambda i: i / 100.0),
        max_size=400,
    )
)
def test_alp_roundtrip_property(vals):
    from dads_spark.compress import alp

    v = np.array(vals, dtype=np.float64)
    dec = alp.decode_values(alp.encode_values(v), len(v))
    assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


def test_alp_bit_exact_edge_values():
    from dads_spark.compress import alp

    v = np.array(
        [-0.0, 0.0, np.nan, np.inf, -np.inf, 1e300, 0.1, 490.02, -3.07,
         123456789.12, 2.0**52, 5e-324],
        dtype=np.float64,
    )
    dec = alp.decode_values(alp.encode_values(v), len(v))
    assert np.array_equal(v.view(np.uint64), dec.view(np.uint64))


def test_alp_beats_gorilla_on_decimals():
    from dads_spark.compress import alp, gorilla

    rng = np.random.default_rng(7)
    # 2-decimal telemetry: the data shape ALP exists for
    v = np.round(rng.uniform(0, 500, 4000), 2)
    a = len(alp.encode_values(v))
    g = len(gorilla.encode_values(v))
    assert np.array_equal(alp.decode_values(alp.encode_values(v), len(v)), v)
    assert a * 2 < g, (a, g)  # measured ~3x on this shape


def test_rle_roundtrip_bitexact():
    import numpy as np

    from dads_spark.compress.rle import decode_values, encode_values

    x = np.array(
        [1.0, 1.0, 1.0, -0.0, 0.0, 0.0, np.nan, np.nan, 2.5, 2.5, 2.5]
    )
    out = decode_values(encode_values(x), len(x))
    assert np.array_equal(
        x.view(np.uint64), out.view(np.uint64)
    ), "bit patterns must survive (NaN runs, signed zeros)"


def test_rle_empty_and_single():
    import numpy as np

    from dads_spark.compress.rle import decode_values, encode_values

    assert len(decode_values(encode_values(np.empty(0)), 0)) == 0
    one = np.array([7.25])
    assert decode_values(encode_values(one), 1)[0] == 7.25


def test_rle_compresses_stepwise_series():
    import numpy as np

    from dads_spark.compress.rle import decode_values, encode_values

    x = np.repeat(np.arange(10, dtype=np.float64), 100)  # 10 runs
    blob = encode_values(x)
    assert len(blob) == 4 + 10 * 12  # header + (u32 + u64) per run
    assert np.array_equal(decode_values(blob, len(x)), x)


def test_rle_random_roundtrip_property():
    import numpy as np

    from dads_spark.compress.rle import decode_values, encode_values

    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 400))
        vals = rng.choice([0.0, 1.5, -3.25, 7.0], size=n)
        out = decode_values(encode_values(vals), n)
        assert np.array_equal(out, vals)


def test_rle_empty_payload_with_nonzero_n_raises():
    # a zero-byte payload claiming n > 0 points is corrupt and must fail
    # like every other length mismatch (r4 ADVICE item: the old
    # short-circuit silently returned an empty array)
    import numpy as np
    import pytest

    from dads_spark.compress.rle import decode_values

    with pytest.raises(ValueError, match="empty payload"):
        decode_values(b"", 3)
    # n == 0 with empty payload stays valid
    assert len(decode_values(b"", 0)) == 0
