"""Per-series stats kernel: the ``TimeSeries``/``DataSample`` analog.

A :class:`Series` wraps three float64 numpy arrays ``t`` (time, monotonically
non-decreasing), ``m`` (value) and ``w`` (weight = inverse squared error) and
memoizes the derived statistics every feature evaluator needs, so one pass of
the configured feature suite computes each stat at most once — the same
caching contract as the reference's mutable ``TimeSeries``
(/root/reference/src/data/time_series.rs:16-29) and ``DataSample``
(/root/reference/src/data/data_sample.rs:10-22).

Semantic invariants replicated from the reference (SURVEY.md §2.2):

- ``std`` is always the sample standard deviation (N-1 denominator),
  /root/reference/src/data/data_sample.rs:140-149.
- quantiles are R-5 (Hazen): ``h = n*q - 0.5``, linear interpolation clamped
  to min/max, /root/reference/src/data/sorted_array.rs:51-70.
- the weighted mean / chi^2 interpret ``w`` as inverse squared error,
  /root/reference/src/data/time_series.rs:149-166.
- ``chi2 == 0`` marks a plateau, /root/reference/src/data/time_series.rs:162-164.
"""

from __future__ import annotations

import numpy as np


class Series:
    """One light curve: (t, m, w) float64 arrays + memoized statistics."""

    __slots__ = (
        "t",
        "m",
        "w",
        "_m_sorted",
        "_t_cache",
        "_m_cache",
        "_weighted_mean",
        "_chi2",
        "_plateau",
    )

    def __init__(self, t, m, w=None, *, check: bool = True, dtype=np.float64):
        # dtype mirrors the reference's Float trait (f32 | f64,
        # /root/reference/src/float_trait.rs:30-76): evaluators are
        # dtype-generic numpy, so an f32 Series computes in f32 throughout
        self.t = np.ascontiguousarray(t, dtype=dtype)
        self.m = np.ascontiguousarray(m, dtype=dtype)
        if w is None:
            # unit weights, reference `new_without_weight`
            # (/root/reference/src/data/time_series.rs:110-136)
            self.w = np.ones_like(self.m)
        else:
            self.w = np.ascontiguousarray(w, dtype=dtype)
        if check:
            if not (self.t.shape == self.m.shape == self.w.shape):
                raise ValueError("t, m, w must have equal lengths")
            if self.t.ndim != 1:
                raise ValueError("t, m, w must be 1-D")
        self._m_sorted = None
        self._t_cache: dict = {}
        self._m_cache: dict = {}
        self._weighted_mean = None
        self._chi2 = None
        self._plateau = None

    # -- basic ---------------------------------------------------------------

    def __len__(self) -> int:
        return self.t.shape[0]

    @property
    def n(self) -> int:
        return self.t.shape[0]

    # -- column stats (DataSample analog) ------------------------------------

    def _col(self, which: str) -> np.ndarray:
        return self.m if which == "m" else self.t

    def _stat(self, which: str, key: str, fn) -> float:
        cache = self._m_cache if which == "m" else self._t_cache
        if key not in cache:
            cache[key] = fn(self._col(which))
        return cache[key]

    def mean(self, which: str = "m") -> float:
        return self._stat(which, "mean", lambda x: float(np.mean(x)))

    def minimum(self, which: str = "m") -> float:
        return self._stat(which, "min", lambda x: float(np.min(x)))

    def maximum(self, which: str = "m") -> float:
        return self._stat(which, "max", lambda x: float(np.max(x)))

    def std2(self, which: str = "m") -> float:
        """Sample variance, N-1 denominator."""
        return self._stat(which, "std2", lambda x: float(np.var(x, ddof=1)))

    def std(self, which: str = "m") -> float:
        return float(np.sqrt(self.std2(which)))

    def sorted_m(self) -> np.ndarray:
        if self._m_sorted is None:
            self._m_sorted = np.sort(self.m)
        return self._m_sorted

    def median(self, which: str = "m") -> float:
        if which == "m":
            s = self.sorted_m()
            n = s.shape[0]
            half = n // 2
            if n % 2 == 1:
                return float(s[half])
            return float(0.5 * (s[half - 1] + s[half]))
        return self._stat(which, "median", lambda x: float(np.median(x)))

    def ppf(self, q: float) -> float:
        """R-5 quantile of m: h = n*q - 0.5, linear interp, clamped.

        Matches /root/reference/src/data/sorted_array.rs:51-70 (verified
        there against scipy mquantiles(alphap=0.5, betap=0.5)).
        """
        s = self.sorted_m()
        n = s.shape[0]
        h = n * q - 0.5
        if h <= 0.0:
            return float(s[0])
        if h >= n - 1:
            return float(s[-1])
        lo = int(np.floor(h))
        frac = h - lo
        return float(s[lo] + frac * (s[lo + 1] - s[lo]))

    def signal_to_noise(self, value: float) -> float:
        """(value - mean)/std over m; 0 when std == 0
        (/root/reference/src/data/data_sample.rs:151-157)."""
        st = self.std("m")
        if st == 0.0:
            return 0.0
        return (value - self.mean("m")) / st

    def is_all_same(self, which: str = "m") -> bool:
        x = self._col(which)
        return bool(np.all(x == x[0])) if x.shape[0] else True

    # -- weighted stats (TimeSeries analog) ----------------------------------

    def weighted_mean(self) -> float:
        """sum(m*w)/sum(w), /root/reference/src/data/time_series.rs:149-153."""
        if self._weighted_mean is None:
            self._weighted_mean = float(np.sum(self.m * self.w) / np.sum(self.w))
        return self._weighted_mean

    def chi2(self) -> float:
        """sum(w * (m - weighted_mean)^2),
        /root/reference/src/data/time_series.rs:155-166."""
        if self._chi2 is None:
            d = self.m - self.weighted_mean()
            self._chi2 = float(np.sum(self.w * d * d))
        return self._chi2

    def reduced_chi2(self) -> float:
        """chi2 / (N - 1), /root/reference/src/data/time_series.rs:168-172."""
        return self.chi2() / (self.n - 1)

    def plateau(self) -> bool:
        """chi2 == 0 marks a plateau,
        /root/reference/src/data/time_series.rs:162-164."""
        if self._plateau is None:
            self._plateau = self.chi2() == 0.0
        return self._plateau

    def t_min_m(self) -> float:
        """Time of the (first) minimum value,
        /root/reference/src/data/time_series.rs:178-202."""
        return float(self.t[int(np.argmin(self.m))])

    def t_max_m(self) -> float:
        return float(self.t[int(np.argmax(self.m))])


def ppf_r5(sorted_values: np.ndarray, q: float) -> float:
    """R-5 quantile over a pre-sorted array (standalone helper)."""
    n = sorted_values.shape[0]
    h = n * q - 0.5
    if h <= 0.0:
        return float(sorted_values[0])
    if h >= n - 1:
        return float(sorted_values[-1])
    lo = int(np.floor(h))
    return float(
        sorted_values[lo] + (h - lo) * (sorted_values[lo + 1] - sorted_values[lo])
    )


def fit_straight_line(t, m, w=None):
    """Least-squares straight line fit m = intercept + slope*t.

    Returns (slope, slope_sigma2, reduced_chi2).

    Two modes, mirroring /root/reference/src/straight_line_fit.rs:12-80:

    - ``w is None`` (errors unknown, Press NR §15.2 "fitab" with unit
      errors): slope variance is rescaled by chi2/(N-2) so that the
      returned ``slope_sigma2`` already includes the noise estimate;
      ``reduced_chi2`` = chi2/(N-2) with unit weights.
    - ``w`` given (errors known): classic weighted fit; ``slope_sigma2``
      comes from the weights alone; ``reduced_chi2`` = chi2/(N-2).
    """
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    # slope / sigma / chi2 are invariant under a time shift; centering at
    # t[0] keeps precision when t is e.g. epoch seconds (~1e9)
    t = t - t[0]
    n = t.shape[0]
    known_errors = w is not None
    ww = np.asarray(w, dtype=np.float64) if known_errors else np.ones_like(t)
    s = float(np.sum(ww))
    sx = float(np.sum(ww * t))
    sy = float(np.sum(ww * m))
    # Numerically-stable form (NR "ti" trick): ti = t - sx/s
    ti = t - sx / s
    stt = float(np.sum(ww * ti * ti))
    slope = float(np.sum(ww * ti * m)) / stt
    intercept = (sy - sx * slope) / s
    slope_sigma2 = 1.0 / stt
    resid = m - intercept - slope * t
    chi2 = float(np.sum(ww * resid * resid))
    reduced_chi2 = chi2 / (n - 2) if n > 2 else np.nan
    if not known_errors:
        # rescale uncertainty by the observed scatter (NR §15.2)
        sigdat = np.sqrt(chi2 / (n - 2)) if n > 2 else np.nan
        slope_sigma2 = slope_sigma2 * sigdat * sigdat
    return slope, slope_sigma2, reduced_chi2
