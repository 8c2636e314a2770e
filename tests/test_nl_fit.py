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


# ---------------------------------------------------------------------------
# priors + algorithm config + fit-output transformers (round 2)
# ---------------------------------------------------------------------------


def test_ln_prior_1d_values():
    from light_curve_feature_ray.features.nl_fit import ln_prior_1d_fn

    # normal: standard normal at 0 -> -0.5*ln(2pi)
    f = ln_prior_1d_fn({"name": "normal", "mu": 0.0, "std": 1.0})
    assert abs(f(0.0) - (-0.5 * np.log(2 * np.pi))) < 1e-12
    # uniform on [0, 2] -> ln(1/2) inside, -inf outside
    f = ln_prior_1d_fn({"name": "uniform", "left": 0.0, "right": 2.0})
    assert abs(f(1.0) - np.log(0.5)) < 1e-12 and f(3.0) == -np.inf
    # log_uniform: p(x) = 1/(x ln(r/l)) (ln_prior_1d.rs:185-215)
    f = ln_prior_1d_fn({"name": "log_uniform", "left": 1.0, "right": np.e})
    assert abs(f(1.0) - 0.0) < 1e-12  # 1/(1*ln e) = 1
    assert f(0.5) == -np.inf
    # log_normal at x=1 (ln x = 0), mu=0, std=1 -> -0.5 ln(2pi)
    f = ln_prior_1d_fn({"name": "log_normal", "mu": 0.0, "std": 1.0})
    assert abs(f(1.0) - (-0.5 * np.log(2 * np.pi))) < 1e-12
    assert f(-1.0) == -np.inf
    # mix of two uniforms, weights normalized
    f = ln_prior_1d_fn(
        {
            "name": "mix",
            "pairs": [
                [1.0, {"name": "uniform", "left": 0.0, "right": 1.0}],
                [3.0, {"name": "uniform", "left": 0.0, "right": 2.0}],
            ],
        }
    )
    # at x=0.5: 0.25*1 + 0.75*0.5 = 0.625
    assert abs(f(0.5) - np.log(0.625)) < 1e-12


def test_prior_pulls_fit():
    """A tight normal prior on the baseline must move the point estimate
    toward the prior mean (posterior = likelihood * prior)."""
    from light_curve_feature_ray.features.nl_fit import BazinFit

    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 100, 60))
    true = np.array([10.0, 3.0, 40.0, 5.0, 20.0])
    base = BazinFit(niterations=64)
    m = base.model(t, true) + 0.05 * rng.normal(size=60)
    s = Series(t, m)
    free = base.eval(s)
    prior = [
        "none",
        {"name": "normal", "mu": 30.0, "std": 0.01},  # baseline pulled to 30
        "none",
        "none",
        "none",
    ]
    pulled = BazinFit(niterations=64, ln_prior=prior).eval(s)
    assert abs(free[1] - 3.0) < 1.0  # free fit near the true baseline
    assert abs(pulled[1] - 30.0) < 1.0  # prior dominates


def test_algorithm_config_roundtrip():
    from light_curve_feature_ray.features.base import feature_from_config
    from light_curve_feature_ray.features.nl_fit import BazinFit

    f = BazinFit(algorithm={"name": "mcmc", "niterations": 37, "fine_tuning": False})
    assert f.niterations == 37 and f.polish is False
    d = f.to_dict()
    f2 = feature_from_config(d)
    assert f2.to_dict() == d
    # lmsder/ceres alias to the pure-Python 'lsq' LM solver
    f3 = BazinFit(algorithm={"name": "lmsder", "niterations": 12})
    assert f3.algorithm_name == "lsq" and f3.lsq_niterations == 12
    d3 = f3.to_dict()
    assert d3["algorithm"] == {"name": "lsq", "niterations": 12}
    assert feature_from_config(d3).to_dict() == d3
    with pytest.raises(NotImplementedError):
        BazinFit(algorithm={"name": "gradient_descent"})


def test_lsq_recovery_tighter_than_mcmc():
    """The deterministic LM solver recovers Bazin parameters from a clean
    curve to much tighter tolerance than the MCMC point estimate, and is
    bit-deterministic across calls (no RNG in the path)."""
    from light_curve_feature_ray.features.nl_fit import BazinFit, LinexpFit, VillarFit

    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 100, 80))
    true = np.array([10.0, 3.0, 40.0, 5.0, 20.0])
    m = BazinFit().model(t, true)  # noiseless: LM should nail it
    s = Series(t, m)
    f = BazinFit(algorithm={"name": "lsq"})
    out = f.eval(s)
    np.testing.assert_allclose(out[:5], true, rtol=1e-4)
    assert out[-1] < 1e-10  # reduced chi2 at the float floor
    np.testing.assert_array_equal(out, f.eval(s))  # deterministic

    # noisy case still beats the MCMC tolerance used elsewhere (rtol=0.1)
    m_noisy = m + 0.05 * rng.normal(size=80)
    out_n = BazinFit(algorithm={"name": "lsq"}).eval(Series(t, m_noisy))
    np.testing.assert_allclose(out_n[:5], true, rtol=0.05)

    # linexp: noiseless exact recovery too
    true_l = np.array([5.0, 10.0, 15.0, 2.0])
    ml = LinexpFit().model(t, true_l)
    out_l = LinexpFit(algorithm={"name": "lsq"}).eval(Series(t, ml))
    np.testing.assert_allclose(out_l[:4], true_l, rtol=1e-4)

    # villar (non-smooth at dt=gamma): generous but deterministic recovery
    true_v = np.array([10.0, 2.0, 30.0, 4.0, 15.0, 0.3, 10.0])
    mv = VillarFit().model(t, true_v)
    fv = VillarFit(algorithm={"name": "lsq", "niterations": 60})
    out_v = fv.eval(Series(t, mv))
    assert out_v[-1] < 1e-3
    np.testing.assert_array_equal(out_v, fv.eval(Series(t, mv)))


def test_lsq_as_fine_tuning():
    """fine_tuning='lsq' inside mcmc config = the reference's
    fine_tuning_algorithm=LMSDER; tightens the MCMC point estimate."""
    from light_curve_feature_ray.features.base import feature_from_config
    from light_curve_feature_ray.features.nl_fit import BazinFit

    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 100, 60))
    true = np.array([10.0, 3.0, 40.0, 5.0, 20.0])
    m = BazinFit().model(t, true) + 0.02 * rng.normal(size=60)
    s = Series(t, m)
    f = BazinFit(
        algorithm={"name": "mcmc", "niterations": 64, "fine_tuning": "lsq"}
    )
    assert f.polish == "lsq"
    out = f.eval(s)
    np.testing.assert_allclose(out[:5], true, rtol=0.05)
    d = f.to_dict()
    assert d["algorithm"]["fine_tuning"] == "lsq"
    f2 = feature_from_config(d)
    assert f2.to_dict() == d
    np.testing.assert_array_equal(f2.eval(s), out)


def test_fit_output_transformers():
    from light_curve_feature_ray.features.transformers import (
        BazinFitTransformer,
        LinexpFitTransformer,
        VillarFitTransformer,
        transformer_from_config,
    )

    tr = BazinFitTransformer()  # default zp = 8.9 (bazin_fit.rs:40-42)
    v = np.array([2.0, 1.0, 5.0, 3.0, 7.0, 0.5])
    out = tr.transform(v)
    assert abs(out[0] - (8.9 - 2.5 * np.log10(4.0))) < 1e-12
    np.testing.assert_allclose(out[1:], [0.5, 3.0, 7.0, np.log1p(0.5)])
    assert tr.names(["a"] * 6) == [
        "bazin_fit_mag_full_amplitude",
        "bazin_fit_baseline_amplitude_ratio",
        "bazin_fit_rise_time",
        "bazin_fit_fall_time",
        "ln1p_bazin_fit_reduced_chi2",
    ]
    assert tr.size_of(6) == 5

    vtr = VillarFitTransformer(mag_zp=10.0)
    v8 = np.array([4.0, 2.0, 1.0, 3.0, 6.0, 0.25, 12.0, 1.5])
    out = vtr.transform(v8)
    assert abs(out[0] - (10.0 - 2.5 * np.log10(8.0))) < 1e-12
    np.testing.assert_allclose(out[1:], [0.5, 3.0, 6.0, 0.25, 12.0, np.log1p(1.5)])

    ltr = LinexpFitTransformer()
    v5 = np.array([2.0, 1.0, 4.0, 3.0, 0.1])
    out = ltr.transform(v5)
    np.testing.assert_allclose(
        out, [8.9 - 2.5 * np.log10(4.0), 4.0, 1.5, np.log1p(0.1)]
    )

    # config round-trip through the registry
    d = vtr.to_dict()
    vtr2 = transformer_from_config(d)
    np.testing.assert_allclose(vtr2.transform(v8), vtr.transform(v8))


def test_transformed_wraps_fit():
    """Transformed(BazinFit, BazinFitTransformer) — the reference's main
    use of the fit transformers (transformer.rs:37-48)."""
    from light_curve_feature_ray.features.base import feature_from_config

    feat = feature_from_config(
        {
            "name": "transformed",
            "feature": {"name": "bazin_fit", "niterations": 32},
            "transformer": {"name": "bazin_fit", "mag_zp": 8.9},
        }
    )
    assert feat.size == 5
    assert feat.names[0] == "bazin_fit_mag_full_amplitude"
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 100, 60))
    from light_curve_feature_ray.features.nl_fit import BazinFit

    m = BazinFit().model(t, np.array([10.0, 3.0, 40.0, 5.0, 20.0]))
    out = feat.eval(Series(t, m + 0.05 * rng.normal(size=60)))
    assert np.isfinite(out).all()
    assert abs(out[1] - 0.3) < 0.2  # baseline/amplitude ~ 3/10


def test_nuts_recovery_and_config():
    """NUTS (nuts.rs semantics: tune+draw, best-likelihood draw, optional
    fine-tuning) recovers Bazin parameters and round-trips its config."""
    from light_curve_feature_ray.features.base import feature_from_config
    from light_curve_feature_ray.features.nl_fit import BazinFit

    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 100, 60))
    true = np.array([10.0, 3.0, 40.0, 5.0, 20.0])
    m = BazinFit().model(t, true) + 0.05 * rng.normal(size=60)
    s = Series(t, m)
    f = BazinFit(
        algorithm={"name": "nuts", "num_tune": 80, "num_draws": 80,
                   "fine_tuning": True}
    )
    out = f.eval(s)
    np.testing.assert_allclose(out[:5], true, rtol=0.1)
    assert out[-1] < 0.01  # reduced chi2 near the noise floor
    # deterministic across calls (fixed seed)
    np.testing.assert_array_equal(out, f.eval(s))
    # config round-trip through the registry
    d = f.to_dict()
    f2 = feature_from_config(d)
    assert f2.to_dict() == d
    np.testing.assert_array_equal(f2.eval(s), out)


def test_nuts_with_prior():
    from light_curve_feature_ray.features.nl_fit import BazinFit

    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 100, 60))
    m = BazinFit().model(t, np.array([10.0, 3.0, 40.0, 5.0, 20.0]))
    m = m + 0.05 * rng.normal(size=60)
    prior = ["none", {"name": "normal", "mu": 30.0, "std": 0.01},
             "none", "none", "none"]
    out = BazinFit(
        algorithm={"name": "nuts", "num_tune": 80, "num_draws": 80,
                   "fine_tuning": True},
        ln_prior=prior,
    ).eval(Series(t, m))
    assert abs(out[1] - 30.0) < 1.0  # tight prior dominates the baseline
