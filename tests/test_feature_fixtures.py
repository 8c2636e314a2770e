"""Golden per-evaluator fixtures ported from the reference crate's
``feature_test!`` suites (/root/reference/src/tests.rs:12-44; catalog in
FIXTURES.md §B). Default tolerance 1e-6, matching the reference."""

import numpy as np
import pytest

import light_curve_feature_ray as lcf
from light_curve_feature_ray.features import basic
from light_curve_feature_ray.features.kernel import Series, fit_straight_line


def check(feature, m, expected, t=None, w=None, tol=1e-6):
    m = np.asarray(m, dtype=np.float64)
    t = np.arange(len(m), dtype=np.float64) if t is None else np.asarray(t, float)
    s = Series(t, m, w)
    got = feature.eval(s)
    np.testing.assert_allclose(got, expected, rtol=tol, atol=tol)


def test_amplitude():
    check(basic.Amplitude(), [0.0, 2.0], [1.0], t=[0.0, 1.0])


def test_beyond_n_std():
    m = [0.0] * 17 + [np.sqrt(2), -np.sqrt(2), 2 * np.sqrt(2), -2 * np.sqrt(2)]
    t = [0.0] * 21
    check(basic.BeyondNStd(1.0), m, [4 / 21], t=t)
    check(basic.BeyondNStd(2.0), m, [2 / 21], t=t)
    assert basic.BeyondNStd(1.0).names == ["beyond_1_std"]
    assert basic.BeyondNStd(2.0).names == ["beyond_2_std"]


def test_biweight_scale():
    # astropy.stats.biweight_scale(c=9, modify_sample_size=False),
    # /root/reference/src/features/biweight_scale.rs fixture
    m = [1.0, 2.0, 4.0, 7.0, 11.0, 16.0, 22.0, 100.0]
    check(basic.BiweightScale(), m, [7.922078257662727])
    check(basic.BiweightScale(9.0), m, [7.922078257662727])
    # MAD == 0 => 0, no NaN
    check(basic.BiweightScale(), [5.0] * 6, [0.0])


def test_eta():
    check(basic.Eta(), [1.0, 0, 0, 0, 0, 0, 0, 0, 0, 109.0], [1.11338])


def test_eta_e():
    check(basic.EtaE(), [1.0, 1, 6, 8], [0.6957894], t=[1.0, 2, 5, 10])


def test_eta_e_equals_eta_on_even_grid():
    t = np.linspace(0.0, 1.0, 11)
    m = 3.0 + t**2
    s = Series(t, m)
    eta = basic.Eta().eval(s)[0]
    eta_e = basic.EtaE().eval(s)[0]
    assert abs(eta - eta_e) < 1e-10


def test_stetson_k():
    m = [1.0] * 500 + [-1.0] * 500
    check(basic.StetsonK(), m, [1.0])
    x = np.sin(np.linspace(0, 2 * np.pi, 1000))
    check(basic.StetsonK(), x, [np.sqrt(8) / np.pi], tol=2e-3)
    saw = np.linspace(0.0, 1.0, 1000)
    check(basic.StetsonK(), saw, [np.sqrt(12) / 4], tol=1e-4)


def test_linear_trend():
    check(
        basic.LinearTrend(),
        [1.0, 2, 3, 8, 10, 19],
        [1.38198758, 0.24532195657979344, 2.54157969],
        t=[1.0, 3, 5, 7, 11, 13],
    )


def test_linear_fit():
    t = np.arange(0, 1.01, 0.1)
    m = np.round(t**2, 10)
    w = np.arange(1.0, 2.01, 0.1)
    check(
        basic.LinearFit(),
        m,
        [1.0544186045473263, 0.7963978113902943, 0.013781209302325587],
        t=t,
        w=w,
        tol=1e-6,
    )


def test_straight_line_fit():
    t = [0.5, 1.5, 2.5, 5.0, 7.0, 16.0]
    m = [-1.0, 3.0, 2.0, 6.0, 10.0, 25.0]
    slope, sigma2, rchi2 = fit_straight_line(t, m)
    np.testing.assert_allclose(
        [slope, sigma2, rchi2], [1.63021767, 0.0078127, 1.271190781], rtol=1e-5
    )
    slope, sigma2, rchi2 = fit_straight_line(t, m, [2.0, 1, 3, 10, 1, 0.4])
    np.testing.assert_allclose(
        [slope, sigma2, rchi2],
        [1.6023644, 0.00882845, 1.7927152569891913],
        rtol=1e-5,
    )


def test_skew():
    check(basic.Skew(), [2.0, 3, 5, 7, 11, 13], [0.4626804756753222])


def test_kurtosis():
    check(basic.Kurtosis(), [0.0, 1, 2, 3, 4], [-1.2])


def test_mean():
    check(basic.Mean(), [1.0, 1, 1, 1, 5, 6, 6, 6, 99], [14.0])


def test_mean_variance():
    check(basic.MeanVariance(), [1.0, 1, 1, 1, 5, 6, 6, 6, 99], [2.2832017440606585])


def test_median():
    check(basic.Median(), [-99.0, 0, 3, 3.1, 3.2], [3.0])
    check(basic.Median(), [-99.0, 0, 4, 3, 2, 1], [1.5])


def test_median_absolute_deviation():
    check(basic.MedianAbsoluteDeviation(), [1.0, 1, 1, 1, 5, 6, 6, 6, 100], [4.0])


def test_standard_deviation():
    check(basic.StandardDeviation(), [0.0, 1, 2, 3, 4], [1.5811388300841898])


def test_percent_amplitude():
    check(basic.PercentAmplitude(), [1.0, 1, 1, 2, 4, 5, 5, 98, 100], [96.0])


def test_cusum():
    check(basic.Cusum(), [1.0, 1, 1, 5, 8, 20], [0.3589213])


def test_chi2_pvar():
    m = [1.0, 2, 1, 0, -1, 0, 1, 2, -2, 0]
    w = [1.0, 2, 1, 2, 1, 2, 1, 2, 1, 2]
    check(basic.Chi2Pvar(), m, [0.019631336718999857], w=w)


def test_reduced_chi2():
    m = [1.0, 2, 1, 0, -1, 0, 1, 2, -2, 0]
    w = [1.0, 2, 1, 2, 1, 2, 1, 2, 1, 2]
    check(basic.ReducedChi2(), m, [2.192592592592593], w=w)


def test_excess_variance():
    m = [1.0, 1, 1, 1, 5, 6, 6, 6, 7]
    w = [1.0, 0.5, 1, 2, 0.5, 2, 1, 1, 0.5]
    check(basic.ExcessVariance(), m, [0.41846885813148793], w=w)


def test_roms():
    check(
        basic.Roms(),
        [1.0, 1, 2, 3, 5],
        [2.6035533],
        t=[1.0, 2, 3, 4, 5],
        w=[1.0, 4, 1, 2, 4],
    )


def test_weighted_mean():
    check(
        basic.WeightedMean(),
        [0.0, 1, 2, 3, 4],
        [1.1777777777777778],
        w=[10.0, 5, 3, 2.5, 2],
    )


def test_duration():
    check(basic.Duration(), [1.0] * 5, [4.0], t=[0.0, 1, 2, 3, 4])


def test_observation_count():
    check(basic.ObservationCount(), [1.0, 2, 3, 4, 5], [5.0])


def test_time_intervals():
    t = [0.0, 0.5, 0.6, 1.6, 10.6]
    check(basic.MaximumTimeInterval(), [1.0] * 5, [9.0], t=t)
    check(basic.MinimumTimeInterval(), [1.0] * 5, [0.1], t=t)


def test_lafler_kinman():
    check(basic.LaflerKinmanStringLength(), [0.0, 1.0, 0.0], [1.5])


def test_otsu_split():
    check(
        basic.OtsuSplit(),
        [0.51, 0.52, 0.53, 0.54, 1.2, 1.3],
        [0.725, 0.012909944487358068, 0.07071067811865482, 0.6666666666666666],
    )
    check(basic.OtsuSplit(), [0.51, 0.52], [0.01, 0.0, 0.0, 0.5])
    check(basic.OtsuSplit(), [0.5, 1.5, 1.5, 1.5], [1.0, 0.0, 0.0, 0.25])
    check(basic.OtsuSplit(), [0.5, 0.5, 0.5, 1.5], [1.0, 0.0, 0.0, 0.75])


def test_otsu_flat_errors():
    s = Series(np.arange(4.0), np.full(4, 1.5))
    with pytest.raises(lcf.FlatTimeSeries):
        basic.OtsuSplit().eval(s)


def test_anderson_darling_normal():
    # scipy.stats.anderson(a).statistic * (1 + 4/n - 25/n^2),
    # a = linspace(0, 1, 101) — order-insensitive, the reference shuffles
    m = np.linspace(0.0, 1.0, 101)
    check(basic.AndersonDarlingNormal(), m, [1.1354353876265415])


def test_ts_level_weighted_mean_reduced_chi2():
    t = np.arange(5.0)
    m = [12.77883145, 18.89988406, 17.55633632, 18.36073996, 11.83854198]
    w = [0.1282489, 0.10576467, 0.32102692, 0.12962352, 0.10746144]
    s = Series(t, m, w)
    np.testing.assert_allclose(s.weighted_mean(), 16.31817047752941, rtol=1e-6)
    np.testing.assert_allclose(s.reduced_chi2(), 1.3752251301435465, rtol=1e-6)


def test_r5_quantiles():
    s = Series(np.arange(11.0), np.linspace(0, 1, 11))
    qs = np.arange(0.0, 1.01, 0.1)
    expected = [0.0, 0.06, 0.17, 0.28, 0.39, 0.5, 0.61, 0.72, 0.83, 0.94, 1.0]
    got = [s.ppf(q) for q in qs]
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_data_sample_stats():
    m = [3.92948846, 3.28436964, 6.73375373, -7.79420906, -7.23407407]
    s = Series(np.arange(5.0), m)
    np.testing.assert_allclose(s.minimum(), -7.79420906)
    np.testing.assert_allclose(s.maximum(), 6.73375373)
    np.testing.assert_allclose(s.mean(), -0.21613426)
    np.testing.assert_allclose(s.median(), 3.28436964)
    np.testing.assert_allclose(s.std(), 6.7900544035968435)


def test_magnitude_percentage_ratio_flat_errors():
    s = Series(np.arange(4.0), np.full(4, 2.0))
    with pytest.raises(lcf.EvaluatorError):
        basic.MagnitudePercentageRatio().eval(s)
    assert basic.MagnitudePercentageRatio().names == [
        "magnitude_percentage_ratio_40_5"
    ]


def test_short_series_errors_and_fill():
    s = Series(np.arange(2.0), np.array([1.0, 2.0]))
    f = basic.Kurtosis()
    with pytest.raises(lcf.ShortTimeSeries):
        f.eval(s)
    out = f.eval_or_fill(s, fill_value=-1.0)
    np.testing.assert_array_equal(out, [-1.0])


def test_f32_kernel_variant():
    """f32 Series (reference Float trait f32 path, float_trait.rs:30-76):
    every stateless evaluator computes in float32 and lands within f32
    tolerance of the f64 result."""
    import numpy as np

    from light_curve_feature_ray.features.base import REGISTRY
    from light_curve_feature_ray.features.kernel import Series

    rng = np.random.default_rng(12)
    t = np.sort(rng.uniform(0, 100, 128))
    m = 10.0 + rng.normal(size=128)
    w = rng.uniform(0.5, 2.0, 128)
    s64 = Series(t, m, w)
    s32 = Series(t, m, w, dtype=np.float32)
    assert s32.m.dtype == np.float32
    skip = {"periodogram", "_periodogram_peaks", "bins", "transformed",
            "bazin_fit", "villar_fit", "linexp_fit"}
    for kind, cls in sorted(REGISTRY.items()):
        if kind in skip:
            continue
        f = cls()
        a = f.eval(s64)
        b = f.eval(s32)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-4, err_msg=kind)
