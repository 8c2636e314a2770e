"""Non-linear fit features: parameter recovery on synthetic curves,
determinism (fixed seeds => retry-safe), error semantics."""

import numpy as np
import pytest

import light_curve_feature_ray as lcf
from light_curve_feature_ray.features import Series, feature_from_config
from light_curve_feature_ray.features.nl_fit import BazinFit, LinexpFit


def bazin(t, a, b, t0, rise, fall):
    md = t0 - t
    return b + a * np.exp(md / fall) / (np.exp(md / rise) + 1.0)


def test_bazin_recovery():
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 100, 120))
    m = bazin(t, 50.0, 10.0, 40.0, 5.0, 20.0) + rng.normal(0, 0.5, t.shape[0])
    s = Series(t, m, np.full_like(t, 4.0))
    out = BazinFit().eval(s)
    a, b, t0, rise, fall, rchi2 = out
    assert abs(a - 50) < 2 and abs(b - 10) < 1
    assert abs(t0 - 40) < 2
    assert abs(rise - 5) < 1 and abs(fall - 20) < 2
    assert 0.5 < rchi2 < 2.0


def test_linexp_recovery():
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 100, 100))
    dt = (t - 10.0) / 15.0
    m = 5.0 + 30.0 * dt * np.exp(-dt) + rng.normal(0, 0.3, t.shape[0])
    s = Series(t, m, np.full_like(t, 1 / 0.09))
    a, t0, tau, b, rchi2 = LinexpFit().eval(s)
    assert abs(a - 30) < 3 and abs(t0 - 10) < 2
    assert abs(tau - 15) < 2 and abs(b - 5) < 1
    assert 0.5 < rchi2 < 2.0


def test_villar_recovery():
    from light_curve_feature_ray.features.nl_fit import VillarFit

    rng = np.random.default_rng(4)
    t = np.sort(rng.uniform(0, 200, 150))
    a, c, t0, rise, fall, nu, gamma = 40.0, 5.0, 50.0, 4.0, 25.0, 0.4, 30.0
    dt = t - t0
    m = (
        c
        + a
        * (1 / (1 + np.exp(-dt / rise)))
        * (1 - nu * np.minimum(dt / gamma, 1))
        * np.where(dt <= gamma, 1, np.exp(-(dt - gamma) / fall))
        + rng.normal(0, 0.4, 150)
    )
    s = Series(t, m, np.full_like(t, 1 / 0.16))
    f = VillarFit(niterations=256)
    out = f.eval(s)
    assert f.names[5] == "villar_fit_plateau_rel_amplitude"
    np.testing.assert_allclose(
        out[:7], [a, c, t0, rise, fall, nu, gamma], rtol=0.15, atol=1.0
    )
    assert 0.5 < out[7] < 2.0


def test_deterministic_and_roundtrip():
    import json

    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 50, 60))
    m = bazin(t, 20, 1, 25, 3, 10) + rng.normal(0, 0.2, 60)
    s = Series(t, m)
    f = BazinFit()
    out1 = f.eval(s)
    out2 = f.eval(s)
    np.testing.assert_array_equal(out1, out2)
    f2 = feature_from_config(json.loads(json.dumps(f.to_dict())))
    np.testing.assert_array_equal(f2.eval(s), out1)


def test_short_and_flat_error():
    f = BazinFit()
    assert f.names[-1] == "bazin_fit_reduced_chi2" and f.size == 6
    s = Series(np.arange(4.0), np.array([1.0, 2, 3, 4]))
    with pytest.raises(lcf.ShortTimeSeries):
        f.eval(s)
    s2 = Series(np.arange(10.0), np.full(10, 3.0))
    with pytest.raises(lcf.FlatTimeSeries):
        f.eval(s2)
    out = f.eval_or_fill(s2)
    assert np.isnan(out).all()
