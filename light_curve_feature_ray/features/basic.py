"""All stateless per-series feature evaluators (SURVEY.md §2.2).

Each evaluator's definition, metadata (size / min length / required inputs)
and output names replicate the reference crate's evaluators; file:line
citations point at the reference definition each one must match. All math is
fresh numpy against :mod:`.kernel`.
"""

from __future__ import annotations

import numpy as np

from ..errors import FlatTimeSeries, ZeroDivision
from .base import Feature, register
from .kernel import Series, fit_straight_line
from .special import gammainc_q, ln_erfc

_SQRT2 = np.sqrt(2.0)


@register
class Amplitude(Feature):
    """(max(m) - min(m)) / 2 — /root/reference/src/features/amplitude.rs:67."""

    kind = "amplitude"

    @property
    def names(self):
        return ["amplitude"]

    def _eval(self, s: Series):
        return [0.5 * (s.maximum() - s.minimum())]


@register
class AndersonDarlingNormal(Feature):
    """Unbiased Anderson-Darling normality statistic —
    /root/reference/src/features/anderson_darling_normal.rs:66-88.

    A^2 on standardized sorted values (sample std), times the small-sample
    correction (1 + 4/n - 25/n^2)."""

    kind = "anderson_darling_normal"
    min_ts_length = 4
    variability_required = True

    @property
    def names(self):
        return ["anderson_darling_normal"]

    def _eval(self, s: Series):
        n = s.n
        y = (s.sorted_m() - s.mean()) / s.std()
        # ln CDF and ln SF of the standard normal via ln erfc
        ln_cdf = ln_erfc(-y / _SQRT2) - np.log(2.0)
        ln_sf = ln_erfc(y / _SQRT2) - np.log(2.0)
        i = np.arange(n, dtype=np.float64)
        a2 = -n - np.mean((2.0 * i + 1.0) * (ln_cdf + ln_sf[::-1]))
        return [a2 * (1.0 + 4.0 / n - 25.0 / (n * n))]


@register
class BeyondNStd(Feature):
    """Fraction of |m - mean| > nstd * std —
    /root/reference/src/features/beyond_n_std.rs:137-147."""

    kind = "beyond_n_std"
    min_ts_length = 2

    def __init__(self, nstd: float = 1.0):
        self.nstd = float(nstd)

    @property
    def names(self):
        return [f"beyond_{self.nstd:.0f}_std"]

    def _params(self):
        return {"nstd": self.nstd}

    def _eval(self, s: Series):
        thr = self.nstd * s.std()
        return [float(np.count_nonzero(np.abs(s.m - s.mean()) > thr)) / s.n]


@register
class BiweightScale(Feature):
    """Tukey biweight midvariance scale estimator —
    /root/reference/src/features/biweight_scale.rs:134-180.

    zeta = sqrt(N) * sqrt(sum_{|u|<1}(m-M)^2 (1-u^2)^4)
           / |sum_{|u|<1}(1-u^2)(1-5u^2)| with u = (m-M)/(c*MAD);
    returns 0 when MAD == 0."""

    kind = "biweight_scale"

    def __init__(self, c: float = 9.0):
        self.c = float(c)

    @property
    def names(self):
        return [f"biweight_scale_{self.c:.0f}"]

    def _params(self):
        return {"c": self.c}

    def _eval(self, s: Series):
        med = s.median()
        d = s.m - med
        mad = float(np.median(np.abs(d)))
        if mad == 0.0:
            return [0.0]
        u = d / (self.c * mad)
        mask = np.abs(u) < 1.0
        u2 = u[mask] * u[mask]
        dd = d[mask]
        # (w*w)*(w*w) rather than w**4: numpy's SIMD pow rounds
        # differently from explicit squaring, and the SQL oracle
        # (SQL_CONV_BIWEIGHT) needs a spelling both engines evaluate
        # bit-identically
        w = 1.0 - u2
        num = np.sqrt(np.sum(dd * dd * ((w * w) * (w * w))))
        den = np.abs(np.sum((1.0 - u2) * (1.0 - 5.0 * u2)))
        return [np.sqrt(s.n) * num / den]


@register
class Chi2Pvar(Feature):
    """p_var = 1 - P((N-1)/2, chi2/2) —
    /root/reference/src/features/chi2_pvar.rs:70-76 (chi2 about the weighted
    mean, dof = N - 1)."""

    kind = "chi2_pvar"
    min_ts_length = 2
    w_required = True
    variability_required = True

    @property
    def names(self):
        return ["chi2_pvar"]

    def _eval(self, s: Series):
        dof = s.n - 1
        return [gammainc_q(0.5 * dof, 0.5 * s.chi2())]


@register
class Cusum(Feature):
    """(max - min of cumsum(m - mean)) / (std * N) —
    /root/reference/src/features/cusum.rs:66-77."""

    kind = "cusum"
    min_ts_length = 2
    variability_required = True

    @property
    def names(self):
        return ["cusum"]

    def _eval(self, s: Series):
        cs = np.cumsum(s.m - s.mean())
        return [(float(np.max(cs)) - float(np.min(cs))) / (s.std() * s.n)]


@register
class Duration(Feature):
    """t[N-1] - t[0] — /root/reference/src/features/duration.rs:59-61."""

    kind = "duration"
    t_required = True
    m_required = False

    @property
    def names(self):
        return ["duration"]

    def _eval(self, s: Series):
        return [s.t[-1] - s.t[0]]


@register
class Eta(Feature):
    """Von Neumann eta: sum(dm^2) / ((N-1) * var) —
    /root/reference/src/features/eta.rs:62-75."""

    kind = "eta"
    min_ts_length = 2
    sorting_required = True
    variability_required = True

    @property
    def names(self):
        return ["eta"]

    def _eval(self, s: Series):
        dm = np.diff(s.m)
        return [float(np.sum(dm * dm)) / ((s.n - 1) * s.std2())]


@register
class EtaE(Feature):
    """Uneven-grid eta: span^2 * sum((dm/dt)^2, finite) / (var * (N-1)^3) —
    /root/reference/src/features/eta_e.rs:67-82 (non-finite terms filtered,
    :76)."""

    kind = "eta_e"
    min_ts_length = 2
    t_required = True
    sorting_required = True
    variability_required = True

    @property
    def names(self):
        return ["eta_e"]

    def _eval(self, s: Series):
        with np.errstate(divide="ignore", invalid="ignore"):
            sl = np.diff(s.m) / np.diff(s.t)
            sq = sl * sl
        total = float(np.sum(sq[np.isfinite(sq)]))
        span = s.t[-1] - s.t[0]
        return [span * span * total / (s.std2() * (s.n - 1) ** 3)]


@register
class ExcessVariance(Feature):
    """(var - mean(1/w)) / mean(m)^2 —
    /root/reference/src/features/excess_variance.rs:62-67."""

    kind = "excess_variance"
    min_ts_length = 2
    w_required = True

    @property
    def names(self):
        return ["excess_variance"]

    def _eval(self, s: Series):
        mean_d2 = float(np.mean(1.0 / s.w))
        return [(s.std2() - mean_d2) / s.mean() ** 2]


@register
class InterPercentileRange(Feature):
    """ppf(1-q) - ppf(q), R-5 quantiles —
    /root/reference/src/features/inter_percentile_range.rs:100-106."""

    kind = "inter_percentile_range"

    def __init__(self, quantile: float = 0.25):
        self.quantile = float(quantile)

    @property
    def names(self):
        return [f"inter_percentile_range_{100 * self.quantile:.0f}"]

    def _params(self):
        return {"quantile": self.quantile}

    def _eval(self, s: Series):
        return [s.ppf(1.0 - self.quantile) - s.ppf(self.quantile)]


@register
class Kurtosis(Feature):
    """Unbiased excess kurtosis G2 —
    /root/reference/src/features/kurtosis.rs:63-79."""

    kind = "kurtosis"
    min_ts_length = 4
    variability_required = True

    @property
    def names(self):
        return ["kurtosis"]

    def _eval(self, s: Series):
        n = s.n
        d = s.m - s.mean()
        m4 = float(np.sum(d**4))
        std2 = s.std2()
        g2 = (
            n * (n + 1.0) / ((n - 1.0) * (n - 2.0) * (n - 3.0)) * m4 / (std2 * std2)
            - 3.0 * (n - 1.0) ** 2 / ((n - 2.0) * (n - 3.0))
        )
        return [g2]


@register
class LaflerKinmanStringLength(Feature):
    """String length with wraparound: sum((m[(i+1)%N]-m[i])^2)/(2(N-1)s^2) —
    /root/reference/src/features/lafler_kinman_string_length.rs:86-99."""

    kind = "lafler_kinman_string_length"
    min_ts_length = 2
    sorting_required = True
    variability_required = True

    @property
    def names(self):
        return ["lafler_kinman_string_length"]

    def _eval(self, s: Series):
        dm = np.roll(s.m, -1) - s.m
        return [float(np.sum(dm * dm)) / (2.0 * s.std2() * (s.n - 1))]


@register
class LinearFit(Feature):
    """Weighted LSQ line (errors known): slope, sigma_slope, reduced chi2 —
    /root/reference/src/features/linear_fit.rs:73-81 over the shared fitter
    /root/reference/src/straight_line_fit.rs:12-80."""

    kind = "linear_fit"
    size = 3
    min_ts_length = 3
    t_required = True
    w_required = True
    sorting_required = True

    @property
    def names(self):
        return ["linear_fit_slope", "linear_fit_slope_sigma", "linear_fit_reduced_chi2"]

    def _eval(self, s: Series):
        slope, sigma2, rchi2 = fit_straight_line(s.t, s.m, s.w)
        return [slope, np.sqrt(sigma2), rchi2]


@register
class LinearTrend(Feature):
    """Unweighted LSQ line: slope, sigma_slope, noise —
    /root/reference/src/features/linear_trend.rs:67-74 (Press NR §15.2)."""

    kind = "linear_trend"
    size = 3
    min_ts_length = 3
    t_required = True
    sorting_required = True

    @property
    def names(self):
        return ["linear_trend", "linear_trend_sigma", "linear_trend_noise"]

    def _eval(self, s: Series):
        if s.is_all_same("t"):
            raise FlatTimeSeries()
        slope, sigma2, rchi2 = fit_straight_line(s.t, s.m)
        return [slope, np.sqrt(sigma2), np.sqrt(rchi2)]


@register
class MagnitudePercentageRatio(Feature):
    """(ppf(1-n)-ppf(n)) / (ppf(1-d)-ppf(d)) —
    /root/reference/src/features/magnitude_percentage_ratio.rs:121-133;
    FlatTimeSeries when the denominator is zero."""

    kind = "magnitude_percentage_ratio"

    def __init__(
        self, quantile_numerator: float = 0.40, quantile_denominator: float = 0.05
    ):
        self.quantile_numerator = float(quantile_numerator)
        self.quantile_denominator = float(quantile_denominator)

    @property
    def names(self):
        return [
            "magnitude_percentage_ratio_"
            f"{100 * self.quantile_numerator:.0f}_"
            f"{100 * self.quantile_denominator:.0f}"
        ]

    def _params(self):
        return {
            "quantile_numerator": self.quantile_numerator,
            "quantile_denominator": self.quantile_denominator,
        }

    def _eval(self, s: Series):
        den = s.ppf(1.0 - self.quantile_denominator) - s.ppf(self.quantile_denominator)
        if den == 0.0:
            raise FlatTimeSeries()
        num = s.ppf(1.0 - self.quantile_numerator) - s.ppf(self.quantile_numerator)
        return [num / den]


@register
class MaximumSlope(Feature):
    """max |dm/dt| over consecutive pairs, finite terms only —
    /root/reference/src/features/maximum_slope.rs:61-78."""

    kind = "maximum_slope"
    min_ts_length = 2
    t_required = True
    sorting_required = True

    @property
    def names(self):
        return ["maximum_slope"]

    def _eval(self, s: Series):
        with np.errstate(divide="ignore", invalid="ignore"):
            sl = np.abs(np.diff(s.m) / np.diff(s.t))
        sl = sl[np.isfinite(sl)]
        if sl.size == 0:
            raise ZeroDivision("all time intervals are zero")
        return [float(np.max(sl))]


@register
class MaximumTimeInterval(Feature):
    """max dt — /root/reference/src/features/maximum_time_interval.rs:60-69."""

    kind = "maximum_time_interval"
    min_ts_length = 2
    t_required = True
    m_required = False
    sorting_required = True

    @property
    def names(self):
        return ["maximum_time_interval"]

    def _eval(self, s: Series):
        return [float(np.max(np.diff(s.t)))]


@register
class MinimumTimeInterval(Feature):
    """min dt — /root/reference/src/features/minimum_time_interval.rs:60-69."""

    kind = "minimum_time_interval"
    min_ts_length = 2
    t_required = True
    m_required = False
    sorting_required = True

    @property
    def names(self):
        return ["minimum_time_interval"]

    def _eval(self, s: Series):
        return [float(np.min(np.diff(s.t)))]


@register
class Mean(Feature):
    """mean(m) — /root/reference/src/features/mean.rs:58-60."""

    kind = "mean"

    @property
    def names(self):
        return ["mean"]

    def _eval(self, s: Series):
        return [s.mean()]


@register
class MeanVariance(Feature):
    """std/mean — /root/reference/src/features/mean_variance.rs:57-59."""

    kind = "mean_variance"
    min_ts_length = 2

    @property
    def names(self):
        return ["mean_variance"]

    def _eval(self, s: Series):
        return [s.std() / s.mean()]


@register
class Median(Feature):
    """median(m) — /root/reference/src/features/median.rs:57-59."""

    kind = "median"

    @property
    def names(self):
        return ["median"]

    def _eval(self, s: Series):
        return [s.median()]


@register
class MedianAbsoluteDeviation(Feature):
    """median(|m - median(m)|) —
    /root/reference/src/features/median_absolute_deviation.rs:60-69."""

    kind = "median_absolute_deviation"

    @property
    def names(self):
        return ["median_absolute_deviation"]

    def _eval(self, s: Series):
        return [float(np.median(np.abs(s.m - s.median())))]


@register
class MedianBufferRangePercentage(Feature):
    """Fraction with |m - median| < q * (max-min)/2 —
    /root/reference/src/features/median_buffer_range_percentage.rs:117-128."""

    kind = "median_buffer_range_percentage"

    def __init__(self, quantile: float = 0.10):
        self.quantile = float(quantile)

    @property
    def names(self):
        return [f"median_buffer_range_percentage_{100 * self.quantile:.0f}"]

    def _params(self):
        return {"quantile": self.quantile}

    def _eval(self, s: Series):
        thr = self.quantile * 0.5 * (s.maximum() - s.minimum())
        frac = np.count_nonzero(np.abs(s.m - s.median()) < thr) / s.n
        return [float(frac)]


@register
class ObservationCount(Feature):
    """N — /root/reference/src/features/observation_count.rs:59-61."""

    kind = "observation_count"
    min_ts_length = 0
    m_required = False

    @property
    def names(self):
        return ["observation_count"]

    def _eval(self, s: Series):
        return [float(s.n)]


@register
class OtsuSplit(Feature):
    """Otsu threshold split statistics —
    /root/reference/src/features/otsu_split.rs:154-177 (threshold picked at
    the absolute maximum of inter-class variance, minimum threshold wins
    ties; subset std is sample std, 0 for singleton subsets)."""

    kind = "otsu_split"
    size = 4
    min_ts_length = 2
    variability_required = True

    @property
    def names(self):
        return [
            "otsu_mean_diff",
            "otsu_std_lower",
            "otsu_std_upper",
            "otsu_lower_to_all_ratio",
        ]

    def _eval(self, s: Series):
        sorted_m = s.sorted_m()
        n = s.n
        # split i: lower = sorted[:i], upper = sorted[i:], i in 1..n-1
        csum = np.cumsum(sorted_m)
        total = csum[-1]
        i = np.arange(1, n, dtype=np.float64)
        mean_lower = csum[:-1] / i
        mean_upper = (total - csum[:-1]) / (n - i)
        w0 = i / n
        inter_var = w0 * (1.0 - w0) * (mean_upper - mean_lower) ** 2
        split = int(np.argmax(inter_var)) + 1  # first (minimum threshold) wins
        lower = sorted_m[:split]
        upper = sorted_m[split:]
        std_lower = float(np.std(lower, ddof=1)) if lower.size > 1 else 0.0
        std_upper = float(np.std(upper, ddof=1)) if upper.size > 1 else 0.0
        return [
            float(np.mean(upper) - np.mean(lower)),
            std_lower,
            std_upper,
            lower.size / n,
        ]


@register
class PercentAmplitude(Feature):
    """max(max - median, median - min) —
    /root/reference/src/features/percent_amplitude.rs:60-65."""

    kind = "percent_amplitude"

    @property
    def names(self):
        return ["percent_amplitude"]

    def _eval(self, s: Series):
        med = s.median()
        return [max(s.maximum() - med, med - s.minimum())]


@register
class PercentDifferenceMagnitudePercentile(Feature):
    """(ppf(1-q) - ppf(q)) / median —
    /root/reference/src/features/percent_difference_magnitude_percentile.rs:100-109;
    ZeroDivision when the median is zero."""

    kind = "percent_difference_magnitude_percentile"

    def __init__(self, quantile: float = 0.05):
        self.quantile = float(quantile)

    @property
    def names(self):
        return [
            f"percent_difference_magnitude_percentile_{100 * self.quantile:.0f}"
        ]

    def _params(self):
        return {"quantile": self.quantile}

    def _eval(self, s: Series):
        med = s.median()
        if med == 0.0:
            raise ZeroDivision("median is zero")
        return [(s.ppf(1.0 - self.quantile) - s.ppf(self.quantile)) / med]


@register
class ReducedChi2(Feature):
    """chi2/(N-1) about the weighted mean —
    /root/reference/src/features/reduced_chi2.rs:63-65."""

    kind = "reduced_chi2"
    min_ts_length = 2
    w_required = True

    @property
    def names(self):
        return ["chi2"]

    def _eval(self, s: Series):
        return [s.reduced_chi2()]


@register
class Roms(Feature):
    """Robust median statistic: sum(|m-median|*sqrt(w), finite)/(N-1) —
    /root/reference/src/features/roms.rs:61-73."""

    kind = "roms"
    min_ts_length = 2
    w_required = True
    variability_required = True

    @property
    def names(self):
        return ["roms"]

    def _eval(self, s: Series):
        terms = np.abs(s.m - s.median()) * np.sqrt(s.w)
        terms = terms[np.isfinite(terms)]
        return [float(np.sum(terms)) / (s.n - 1)]


@register
class Skew(Feature):
    """Unbiased sample skewness G1 —
    /root/reference/src/features/skew.rs:62-71."""

    kind = "skew"
    min_ts_length = 3
    variability_required = True

    @property
    def names(self):
        return ["skew"]

    def _eval(self, s: Series):
        n = s.n
        d = s.m - s.mean()
        m3 = float(np.sum(d**3))
        return [n / ((n - 1.0) * (n - 2.0)) * m3 / s.std() ** 3]


@register
class StandardDeviation(Feature):
    """Sample std (N-1) —
    /root/reference/src/features/standard_deviation.rs:62-64."""

    kind = "standard_deviation"
    min_ts_length = 2

    @property
    def names(self):
        return ["standard_deviation"]

    def _eval(self, s: Series):
        return [s.std()]


@register
class StetsonK(Feature):
    """sum(|m - weighted_mean| * sqrt(w)) / sqrt(N * chi2) —
    /root/reference/src/features/stetson_k.rs:64-71."""

    kind = "stetson_k"
    min_ts_length = 2
    w_required = True
    variability_required = True

    @property
    def names(self):
        return ["stetson_K"]

    def _eval(self, s: Series):
        num = float(np.sum(np.abs(s.m - s.weighted_mean()) * np.sqrt(s.w)))
        return [num / np.sqrt(s.n * s.chi2())]


@register
class TimeMean(Feature):
    """mean(t) — /root/reference/src/features/time_mean.rs:57-59."""

    kind = "time_mean"
    t_required = True
    m_required = False

    @property
    def names(self):
        return ["time_mean"]

    def _eval(self, s: Series):
        return [s.mean("t")]


@register
class TimeStandardDeviation(Feature):
    """Sample std of t —
    /root/reference/src/features/time_standard_deviation.rs:59-61."""

    kind = "time_standard_deviation"
    min_ts_length = 2
    t_required = True
    m_required = False

    @property
    def names(self):
        return ["time_standard_deviation"]

    def _eval(self, s: Series):
        return [s.std("t")]


@register
class WeightedMean(Feature):
    """sum(m*w)/sum(w) — /root/reference/src/features/weighted_mean.rs:58-60."""

    kind = "weighted_mean"
    w_required = True

    @property
    def names(self):
        return ["weighted_mean"]

    def _eval(self, s: Series):
        return [s.weighted_mean()]
