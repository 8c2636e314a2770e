"""Gorilla codec round-trip property tests (FIXTURES.md §E)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from light_curve_feature_ray.codec import decode, encode


def roundtrip(ts, values):
    ts = np.asarray(ts, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    blob = encode(ts, values)
    ts2, v2 = decode(blob)
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(
        values.view(np.uint64), v2.view(np.uint64)
    )  # bit-exact, incl. NaN payloads
    return blob


def test_empty():
    blob = encode(np.array([], dtype=np.int64), np.array([]))
    ts, v = decode(blob)
    assert ts.size == 0 and v.size == 0


def test_single_point():
    roundtrip([1_700_000_000_000_000], [42.5])


def test_regular_cadence_compresses_well():
    n = 1000
    ts = 1_700_000_000_000_000 + 60_000_000 * np.arange(n, dtype=np.int64)
    values = np.full(n, 17.25)
    blob = roundtrip(ts, values)
    # constant cadence + constant value: ~2 bits/point
    assert len(blob) < 24 + n // 2


def test_irregular_cadence():
    rng = np.random.default_rng(7)
    ts = np.cumsum(rng.integers(1, 10_000_000, size=500)).astype(np.int64)
    values = rng.normal(100.0, 5.0, size=500)
    roundtrip(ts, values)


def test_large_jumps_and_negatives():
    ts = np.array([0, 1, 10**15, 10**15 + 1, 2 * 10**15], dtype=np.int64)
    values = np.array([-1e300, 1e-300, 0.0, -0.0, np.inf])
    roundtrip(ts, values)


def test_nan_payload_preserved():
    ts = np.arange(3, dtype=np.int64)
    values = np.array([1.0, np.nan, 1.0])
    blob = encode(ts, values)
    _, v = decode(blob)
    assert np.isnan(v[1]) and v[0] == v[2] == 1.0


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.floats(allow_nan=False, width=64),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_roundtrip_property(pairs):
    ts = np.sort(np.array([p[0] for p in pairs], dtype=np.int64))
    values = np.array([p[1] for p in pairs])
    roundtrip(ts, values)
