"""Phase-folded periodogram features (FIXTURES.md §C phase-fold row):
names, phase-0-at-minimum, Bins(1e-6) duplicate-phase merge, degenerate
best-period fill."""

import numpy as np
import pytest

import light_curve_feature_ray as lcf
from light_curve_feature_ray.features import Periodogram, Series, feature_from_config
from light_curve_feature_ray.features.periodogram_feature import (
    compute_adjusted_phases,
)


def sine_series(period=0.17, n=301):
    t = np.linspace(0.0, 1.0, n)
    m = np.sin(2 * np.pi / period * t)
    return Series(t, m)


def test_names():
    f = Periodogram(phase_features=["mean", "eta"])
    assert f.names == [
        "periodogram_period_0",
        "periodogram_period_s_to_n_0",
        "period_folded_mean",
        "period_folded_eta",
    ]
    assert f.size == 4


def test_phase_zero_at_minimum():
    t = np.array([0.0, 0.3, 0.6, 0.9, 1.2])
    m = np.array([3.0, 1.0, -5.0, 2.0, 4.0])
    phases = compute_adjusted_phases(t, m, period=0.5)
    i_min = int(np.argmin(m))
    assert phases[i_min] == 0.0
    assert np.all((phases >= 0.0) & (phases < 1.0))


def test_value_preserving_features_match_unfolded():
    s = sine_series()
    f = Periodogram(phase_features=["mean", "standard_deviation", "median"])
    out = f.eval(s)
    # folding permutes points; value-only features are invariant
    np.testing.assert_allclose(out[2], s.mean(), rtol=1e-12)
    np.testing.assert_allclose(out[3], s.std(), rtol=1e-12)
    np.testing.assert_allclose(out[4], s.median(), rtol=1e-12)


def test_folded_eta_smaller_for_periodic_signal():
    # folding a clean periodic signal at its period orders points smoothly:
    # string-length-like stats over the fold should be small
    s = sine_series()
    f = Periodogram(phase_features=["lafler_kinman_string_length"])
    out = f.eval(s)
    assert abs(out[0] - 0.17) < 5e-3  # recovered period
    assert out[2] < 0.2  # smooth fold


def test_duplicate_phases_merged():
    # two full periods sampled at identical phases -> duplicate phases get
    # merged through Bins(1e-6); eta over the fold sees each phase once
    period = 0.25
    # dyadic timestamps => bit-identical duplicate phases across periods
    t1 = np.arange(64) * (period / 64)
    t = np.concatenate([t1, t1 + period])
    m = np.sin(2 * np.pi / period * t)
    s = Series(t, m)
    # eta_e requires t => the Bins(1e-6) merge kicks in for the whole
    # phase extractor; observation_count then sees the merged series.
    # Fold at the exact period (the grid-recovered one is inexact, so the
    # duplicate phases would not collide bit-for-bit).
    f = Periodogram(phase_features=["eta_e", "observation_count"])
    phase_s = f._phase_series(s, period)
    out = f._eval_phase(phase_s)
    # 128 points fold onto 64 distinct phases
    assert out[1] == 64.0
    assert np.isfinite(out[0])


def test_plateau_phase_part_filled():
    t = np.linspace(0.0, 9.0, 10)
    s = Series(t, np.zeros(10))
    f = Periodogram(phase_features=["mean"])
    out = f.eval_or_fill(s, fill_value=np.nan)
    np.testing.assert_array_equal(out[:2], [0.0, 0.0])
    assert np.isnan(out[2])
    with pytest.raises(lcf.EvaluatorError):
        f.eval(s)


def test_config_roundtrip_with_phase():
    import json

    f = Periodogram(peaks=2, phase_features=["mean", {"name": "beyond_n_std", "nstd": 2.0}])
    f2 = feature_from_config(json.loads(json.dumps(f.to_dict())))
    assert f2.names == f.names
    s = sine_series()
    np.testing.assert_allclose(f.eval(s), f2.eval(s), rtol=1e-12)
