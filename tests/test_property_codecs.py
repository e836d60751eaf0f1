"""Property tests (hypothesis): codec round-trip laws hold for ALL
inputs, not just the fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sentinel2_crop_trait_timeseries_spark.operators.compress import (
    _gorilla_decode_scalar,
    _gorilla_encode_scalar,
    _unzigzag,
    _zigzag,
    gorilla_decode,
    gorilla_encode,
)

finite_or_special = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.sampled_from([float("inf"), float("-inf"), float("nan"), 0.0, -0.0]),
)


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_zigzag_roundtrip(x):
    assert _unzigzag(_zigzag(x)) == x


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**7), finite_or_special),
        min_size=0,
        max_size=60,
    )
)
def test_gorilla_roundtrip_any_series(pairs):
    gaps = np.array([p[0] for p in pairs], dtype=np.int64)
    ts = np.cumsum(gaps) if len(gaps) else np.empty(0, np.int64)
    vals = np.array([p[1] for p in pairs], dtype=np.float64)
    blob = gorilla_encode(ts, vals)
    ts2, v2 = gorilla_decode(blob)
    np.testing.assert_array_equal(ts, ts2)
    # bit-level equality (NaN payloads included)
    np.testing.assert_array_equal(vals.view(np.uint64), v2.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**7), finite_or_special),
        min_size=0,
        max_size=60,
    )
)
def test_vectorized_matches_scalar(pairs):
    """The vectorized codec is BYTE-IDENTICAL to the scalar reference
    implementation (format unchanged), and both decoders agree."""
    gaps = np.array([p[0] for p in pairs], dtype=np.int64)
    ts = np.cumsum(gaps) if len(gaps) else np.empty(0, np.int64)
    vals = np.array([p[1] for p in pairs], dtype=np.float64)
    blob_v = gorilla_encode(ts, vals)
    blob_s = _gorilla_encode_scalar(ts, vals)
    assert blob_v == blob_s
    ts_s, v_s = _gorilla_decode_scalar(blob_v)
    ts_v, v_v = gorilla_decode(blob_v)
    np.testing.assert_array_equal(ts_s, ts_v)
    np.testing.assert_array_equal(v_s.view(np.uint64), v_v.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),
            st.floats(
                allow_nan=False, allow_infinity=False, width=64,
                min_value=-1e12, max_value=1e12,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([2.0**-9, 2.0**-6, 2.0**-18]),
)
def test_quantized_roundtrip_within_bound(pairs, step):
    """Quantized-mode law (compress_segments value_grid): the stored
    series is exactly the snapped grid value, decode is bit-exact on
    it, and every point is within step/2 of the original."""
    gaps = np.array([p[0] for p in pairs], dtype=np.int64)
    ts = np.cumsum(gaps)
    vals = np.array([p[1] for p in pairs], dtype=np.float64)
    snapped = np.floor(vals / step + 0.5) * step  # the kernel's snap
    blob = gorilla_encode(ts, snapped)
    ts2, v2 = gorilla_decode(blob)
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(snapped.view(np.uint64), v2.view(np.uint64))
    assert np.all(np.abs(v2 - vals) <= step / 2)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2**20),   # dt hours > 0
            st.integers(min_value=-(2**31), max_value=2**31 - 1),  # v int32
        ),
        min_size=1,
        max_size=17,
    )
)
def test_token_pairs_roundtrip_numpy(pairs):
    """The token layout law at the numpy level: interleave -> decode
    offsets -> re-diff reproduces the token array exactly."""
    dts = np.array([p[0] for p in pairs], dtype=np.int64)
    vs = np.array([p[1] for p in pairs], dtype=np.int64)
    offs = np.cumsum(dts)
    back_dts = np.diff(offs, prepend=0)
    np.testing.assert_array_equal(dts, back_dts)
    tokens = np.empty(2 * len(dts), dtype=np.int64)
    tokens[0::2] = dts
    tokens[1::2] = vs
    np.testing.assert_array_equal(tokens[0::2], dts)
    np.testing.assert_array_equal(tokens[1::2], vs)
