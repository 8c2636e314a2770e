"""Periodogram conformance: ports of the reference's cross-implementation
equivalence tests (/root/reference/src/periodogram/mod.rs:163-345 and
features/periodogram.rs:806-927; catalog in FIXTURES.md §C)."""

import numpy as np

from light_curve_feature_ray.features.kernel import Series
from light_curve_feature_ray.features.periodogram import (
    DynamicFreqParams,
    NyquistFreq,
    ZeroBasedPow2FreqGrid,
)
from light_curve_feature_ray.features.periodogram.power import (
    power_direct,
    power_fft,
)
from light_curve_feature_ray.features.periodogram_feature import (
    Periodogram,
    peak_indices_desc,
)


def test_direct_vs_scipy_fixture():
    # /root/reference/src/periodogram/mod.rs:163-218: values from
    # scipy.signal.lombscargle(t, standardized_m, linspace(0, 0.04, 5))
    t = np.arange(100.0)
    m = np.sin(0.07 * t)
    grid = ZeroBasedPow2FreqGrid(0.01, 2)
    power = power_direct(t, m, grid.freqs())
    desired = [3.76158192e-33, 16.9901802, 18.5772252, 21.9604974, 28.1505681]
    np.testing.assert_allclose(power, desired, rtol=1e-6, atol=1e-15)


def test_standard_normalization_peak_is_one():
    n = 100
    t = np.arange(float(n))
    m = np.sin(0.07 * t)
    grid = ZeroBasedPow2FreqGrid(0.07, 0)  # freqs [0, 0.07]
    power = power_direct(t, m, grid.freqs())
    np.testing.assert_allclose(power[1] * 2.0 / (n - 1), 1.0, rtol=1.0 / n)


def test_direct_vs_fft_one_to_one():
    # /root/reference/src/periodogram/mod.rs:221-251: elementwise equal to
    # 1e-8 excluding the last (aliasing) bin.
    n = 64
    t = np.linspace(0.0, n - 1.0, n)
    m = np.sin(0.472 * t)
    params = DynamicFreqParams(resolution=1.0, max_freq_factor=1.0)
    grid = ZeroBasedPow2FreqGrid.from_t(t, params)
    direct = power_direct(t, m, grid.freqs())
    fft = power_fft(t, m, grid)
    np.testing.assert_allclose(fft[:-1], direct[:-1], atol=1e-8)


def test_direct_vs_fft_uniform_two_tone_peaks():
    n = 100
    t = np.linspace(0.0, n - 1.0, n)
    m = np.sin(0.472 * t) + 2.0 * np.cos(1.222 * t)
    params = DynamicFreqParams(resolution=4.0, max_freq_factor=1.0)
    grid = ZeroBasedPow2FreqGrid.from_t(t, params)
    direct = power_direct(t, m, grid.freqs())
    fft = power_fft(t, m, grid)
    np.testing.assert_array_equal(
        peak_indices_desc(fft)[:2], peak_indices_desc(direct)[:2]
    )


def test_direct_vs_fft_uneven_two_tone_peaks():
    # /root/reference/src/periodogram/mod.rs:297-345 analog with our own
    # deterministic rng: identical top-2 peak indices on uneven data.
    rng = np.random.default_rng(0)
    t = np.sort(rng.random(100) * 99.0)
    m = np.sin(0.222 * t) + 2.0 * np.cos(1.222 * t) + rng.random(100)
    grid = ZeroBasedPow2FreqGrid.with_size(0.01, 257)
    direct = power_direct(t, m, grid.freqs())
    fft = power_fft(t, m, grid)
    np.testing.assert_array_equal(
        peak_indices_desc(fft)[:2], peak_indices_desc(direct)[:2]
    )


def test_normalizations():
    # /root/reference/src/periodogram/mod.rs:416-516: Standard in [0,1] with
    # peak ~1; Model = p/(1-p); Log = -ln(1-p); Psd raw.
    t = np.linspace(0.0, 99.0, 100)
    m = np.sin(0.472 * t)
    s = Series(t, m)
    psd = Periodogram(normalization="psd")
    standard = Periodogram(normalization="standard")
    model = Periodogram(normalization="model")
    log = Periodogram(normalization="log")
    _, p_psd = psd.freq_power(s)
    _, p_std = standard.freq_power(s)
    _, p_model = model.freq_power(s)
    _, p_log = log.freq_power(s)
    assert np.all(p_std >= 0.0) and np.all(p_std <= 1.0 + 1e-12)
    assert p_std.max() > 0.9
    np.testing.assert_allclose(p_std, p_psd * 2.0 / (len(t) - 1), rtol=1e-12)
    mask = p_std < 1.0
    np.testing.assert_allclose(
        p_model[mask], p_std[mask] / (1.0 - p_std[mask]), rtol=1e-9
    )
    np.testing.assert_allclose(p_log[mask], -np.log1p(-p_std[mask]), rtol=1e-9)


def test_plateau_outputs_zero():
    # /root/reference/src/features/periodogram.rs:806-815
    t = np.linspace(0.0, 9.0, 10)
    s = Series(t, np.zeros(10))
    out = Periodogram().eval(s)
    np.testing.assert_array_equal(out, [0.0, 0.0])


def test_period_recovery_even_grid():
    # /root/reference/src/features/periodogram.rs:818-851 analog
    period = 0.17
    t = np.linspace(0.0, 1.0, 101)
    m = np.sin(2 * np.pi / period * t)
    s = Series(t, m)
    for fast in (True, False):
        out = Periodogram(fast=fast).eval(s)
        assert abs(out[0] - period) < 5e-3, (fast, out)
        assert out[1] > 0


def test_period_recovery_uneven_grid():
    period = 0.17
    rng = np.random.default_rng(42)
    t = np.sort(rng.random(100))
    m = np.sin(2 * np.pi / period * t)
    s = Series(t, m)
    out = Periodogram().eval(s)
    assert abs(out[0] - period) < 5e-3


def test_two_peak_recovery():
    # /root/reference/src/features/periodogram.rs:877-927 analog
    p1, p2 = 0.0753, 0.45
    t = np.linspace(0.0, 1.0, 1000)
    m = 2.0 * np.sin(2 * np.pi / p1 * t) + np.sin(2 * np.pi / p2 * t)
    s = Series(t, m)
    f = Periodogram(peaks=2)
    out = f.eval(s)
    assert f.names == [
        "periodogram_period_0",
        "periodogram_period_s_to_n_0",
        "periodogram_period_1",
        "periodogram_period_s_to_n_1",
    ]
    periods = sorted([out[0], out[2]])
    assert abs(periods[0] - p1) < 1e-2
    assert abs(periods[1] - p2) < 1e-2
    # stronger peak first
    assert out[1] >= out[3]


def test_peak_indices():
    # ports of /root/reference/src/peak_indices.rs tests
    np.testing.assert_array_equal(
        peak_indices_desc(np.array([0.0, 1.0, 0.0])), [1]
    )
    assert peak_indices_desc(np.array([0.0, 0.0, 0.0])).size == 0
    assert peak_indices_desc(np.array([0.0, -1.0, 0.0])).size == 0
    assert peak_indices_desc(np.zeros(100)).size == 0
    saw = np.array([1.0 if i % 2 == 0 else 0.0 for i in range(101)])
    got = np.sort(peak_indices_desc(saw))
    np.testing.assert_array_equal(got, [i for i in range(1, 100) if i % 2 == 0])
    x = np.linspace(-5, 5, 101)
    np.testing.assert_array_equal(
        peak_indices_desc(np.exp(-0.5 * x * x)), [50]
    )


def test_fixed_freq_grid_config():
    """FreqGridStrategy::Fixed analog (freq.rs:424-459): a configured grid
    overrides the dynamic one; FFT applies only to pow2 grids; config
    round-trips."""
    import numpy as np

    from light_curve_feature_ray.features.base import feature_from_config
    from light_curve_feature_ray.features.kernel import Series
    from light_curve_feature_ray.features.periodogram import power_direct
    from light_curve_feature_ray.features.periodogram_feature import Periodogram

    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 20, 150))
    m = np.sin(2 * np.pi * t / 0.75) + 0.1 * rng.normal(size=150)
    s = Series(t, m)

    # arbitrary fixed grid -> direct power on exactly those freqs
    freqs = np.linspace(2 * np.pi / 2.0, 2 * np.pi / 0.3, 400)
    p = Periodogram(peaks=1, freq_grid={"kind": "arbitrary", "freqs": list(freqs)})
    got_f, got_p = p.freq_power(s)
    np.testing.assert_array_equal(got_f, freqs)
    np.testing.assert_allclose(got_p, power_direct(t, m, freqs, s.std2()))
    assert abs(p.eval(s)[0] - 0.75) / 0.75 < 0.02

    # pow2 fixed grid identical to the dynamic grid -> bit-identical
    # output through the fast path (grid-source equivalence)
    from light_curve_feature_ray.features.periodogram import (
        DynamicFreqParams,
        ZeroBasedPow2FreqGrid,
    )
    from light_curve_feature_ray.features.periodogram_feature import (
        peak_indices_desc,
    )

    dyn = Periodogram(peaks=1, fast=True)
    g_dyn = ZeroBasedPow2FreqGrid.from_t(s.t, dyn._dynamic_params())
    fixed_same = Periodogram(
        peaks=1,
        fast=True,
        freq_grid={"kind": "pow2", "step": g_dyn.step, "size": g_dyn.size},
    )
    np.testing.assert_array_equal(
        fixed_same.freq_power(s)[1], dyn.freq_power(s)[1]
    )

    g2 = {"kind": "pow2", "step": 2 * np.pi / 200.0, "size": 1025}
    f_uneven = Periodogram(peaks=1, fast=True, freq_grid=g2).freq_power(s)[1]
    d_uneven = Periodogram(peaks=1, fast=False, freq_grid=g2).freq_power(s)[1]
    np.testing.assert_array_equal(
        peak_indices_desc(f_uneven)[:1], peak_indices_desc(d_uneven)[:1]
    )

    # serde round-trip
    d = p.to_dict()
    p2 = feature_from_config(d)
    assert p2.to_dict() == d
    np.testing.assert_array_equal(p2.freq_power(s)[1], got_p)

    # multicolor inherits the fixed grid
    from light_curve_feature_ray.features.multicolor import MultiColorPeriodogram

    mcts = {"g": Series(t, m), "r": Series(t, 0.8 * m + 0.05)}
    mc = MultiColorPeriodogram(
        ["g", "r"], peaks=1,
        freq_grid={"kind": "arbitrary", "freqs": list(freqs)},
    )
    fr, _ = mc.freq_power(mcts)
    np.testing.assert_array_equal(fr, freqs)
    assert abs(mc.eval(mcts)[0] - 0.75) / 0.75 < 0.02


def test_number_ending_and_peak_descriptions():
    from light_curve_feature_ray.features.base import number_ending
    from light_curve_feature_ray.features.periodogram_feature import (
        PeriodogramPeaks,
    )

    # the reference's own test vector (number_ending.rs tests)
    expect = ["th", "st", "nd", "rd"] + ["th"] * 17 + ["st", "nd", "rd"] + [
        "th"
    ] * 7
    assert [number_ending(i) for i in range(31)] == expect
    assert number_ending(111) == "th" and number_ending(101) == "st"

    d = PeriodogramPeaks(peaks=3).descriptions
    assert d[0] == "period of the 1st highest peak"
    assert d[4].endswith("of the 3rd highest peak")
