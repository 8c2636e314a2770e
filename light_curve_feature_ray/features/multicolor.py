"""Multicolor (multi-passband) feature subsystem.

Analog of /root/reference/src/multicolor/: a multicolor time series
("mcts") is a mapping ``band name -> Series`` — bands iterate in sorted
name order, mirroring the reference's ``BTreeMap`` passband ordering
(/root/reference/src/data/multi_color_time_series.rs:53-58). Components:

- :class:`MultiColorFeature` base + registry (serde-config analog);
- color features ``ColorOfMaximum/Median/Minimum`` (difference of a
  per-band statistic between two bands,
  /root/reference/src/multicolor/features/color_of_*.rs) and
  ``ColorSpread`` (population std of per-band weighted means,
  /root/reference/src/multicolor/features/color_spread.rs:13-27);
- :class:`PerBandFeature` — a monochrome feature applied independently per
  band, names ``{name}_{band}``
  (/root/reference/src/multicolor/per_band_feature.rs:122-131);
- :class:`MultiColorExtractor` — ordered fan-out with aggregated info
  (/root/reference/src/multicolor/multicolor_extractor.rs:27-97);
- :class:`MultiColorBins` — bins each band independently (monochrome Bins
  semantics), then evaluates inner multicolor features on the binned mcts;
  names prefixed ``bins_window{w:.1f}_offset{o:.1f}_``
  (/root/reference/src/multicolor/multicolor_bins.rs:83-100);
- :class:`MultiColorPeriodogram` — per-band Lomb-Scargle powers on a COMMON
  frequency grid built from the union of all bands' times, combined as a
  weighted sum (count or chi2 weights), then the monochrome spectrum/phase
  machinery (/root/reference/src/multicolor/features/
  multi_color_periodogram.rs:482-705).

Missing-band handling: evaluating a feature whose passband set is not a
subset of the mcts raises :class:`MissingBand`; ``eval_or_fill`` converts
that into fill values (the reference's ``WrongPassbandsError`` +
``eval_or_fill_multicolor``).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import numpy as np

from ..errors import EvaluatorError, ShortTimeSeries
from .base import feature_from_config
from .bins import bin_series
from .extractor import FeatureExtractor
from .kernel import Series

MCSeries = dict  # band name -> Series


class MissingBand(EvaluatorError):
    """The mcts lacks a band the feature requires
    (reference ``MultiColorEvaluatorError::WrongPassbandsError``)."""

    def __init__(self, missing, present):
        super().__init__(
            f"missing passbands {sorted(missing)} (present: {sorted(present)})"
        )


class MultiColorFeature:
    """Base multicolor evaluator over ``dict[band, Series]``."""

    size: int = 1
    min_ts_length: int = 1
    t_required: bool = False
    m_required: bool = True
    w_required: bool = False
    sorting_required: bool = False
    variability_required: bool = False
    kind: str = ""

    @property
    def passband_set(self) -> frozenset:
        raise NotImplementedError

    @property
    def names(self) -> list[str]:
        raise NotImplementedError

    @property
    def descriptions(self) -> list[str]:
        return list(self.names)

    def check_mcts(self, mcts: MCSeries) -> None:
        """Band presence + per-band length validation — the reference's
        ``check_mcts_passabands`` + per-band ``check_ts_length``
        (/root/reference/src/multicolor/multicolor_evaluator.rs)."""
        missing = self.passband_set - set(mcts)
        if missing:
            raise MissingBand(missing, set(mcts))
        for band in self.passband_set:
            s = mcts[band]
            if s.n < self.min_ts_length:
                raise ShortTimeSeries(s.n, self.min_ts_length)

    def _eval(self, mcts: MCSeries) -> np.ndarray:
        raise NotImplementedError

    def eval(self, mcts: MCSeries) -> np.ndarray:
        self.check_mcts(mcts)
        out = np.asarray(self._eval(mcts), dtype=np.float64)
        assert out.shape == (self.size,), (self.kind, out.shape)
        return out

    def eval_or_fill(self, mcts: MCSeries, fill_value: float = np.nan) -> np.ndarray:
        try:
            return self.eval(mcts)
        except EvaluatorError:
            return np.full(self.size, fill_value, dtype=np.float64)

    # -- config ---------------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        return {"name": self.kind, **self._params()}

    def _params(self) -> dict[str, Any]:
        return {}

    def __repr__(self) -> str:
        params = ", ".join(f"{k}={v!r}" for k, v in self._params().items())
        return f"{type(self).__name__}({params})"


MC_REGISTRY: dict[str, Callable[..., MultiColorFeature]] = {}


def mc_register(cls):
    assert cls.kind, cls
    MC_REGISTRY[cls.kind] = cls
    return cls


def mc_feature_from_config(spec: dict[str, Any] | MultiColorFeature) -> MultiColorFeature:
    if isinstance(spec, MultiColorFeature):
        return spec
    d = dict(spec)
    kind = d.pop("name")
    return MC_REGISTRY[kind](**d)


# ---------------------------------------------------------------------------
# color features
# ---------------------------------------------------------------------------


class _ColorOf(MultiColorFeature):
    """Difference of a per-band statistic between two bands (a - b)."""

    stat = ""  # "max" | "median" | "min"

    def __init__(self, bands: Iterable[str]):
        a, b = tuple(bands)
        self.bands = (str(a), str(b))

    @property
    def passband_set(self) -> frozenset:
        return frozenset(self.bands)

    @property
    def names(self) -> list[str]:
        a, b = self.bands
        return [f"color_{self.stat}_{a}_{b}"]

    def _params(self):
        return {"bands": list(self.bands)}

    def _stat(self, s: Series) -> float:
        raise NotImplementedError

    def _eval(self, mcts: MCSeries) -> np.ndarray:
        a, b = self.bands
        return np.array([self._stat(mcts[a]) - self._stat(mcts[b])])


@mc_register
class ColorOfMaximum(_ColorOf):
    """max_a(m) - max_b(m) — color_of_maximum.rs."""

    kind = "color_of_maximum"
    stat = "max"

    def _stat(self, s: Series) -> float:
        return s.maximum("m")


@mc_register
class ColorOfMinimum(_ColorOf):
    """min_a(m) - min_b(m) — color_of_minimum.rs."""

    kind = "color_of_minimum"
    stat = "min"

    def _stat(self, s: Series) -> float:
        return s.minimum("m")


@mc_register
class ColorOfMedian(_ColorOf):
    """median_a(m) - median_b(m) — color_of_median.rs."""

    kind = "color_of_median"
    stat = "median"

    def _stat(self, s: Series) -> float:
        return s.median("m")


@mc_register
class ColorSpread(MultiColorFeature):
    """POPULATION std of per-band weighted means over the configured band
    set — color_spread.rs:100-141 (sum w*m / sum w per band; 1/B variance
    denominator)."""

    kind = "color_spread"
    w_required = True

    def __init__(self, bands: Iterable[str]):
        self.bands = tuple(sorted(set(map(str, bands))))

    @property
    def passband_set(self) -> frozenset:
        return frozenset(self.bands)

    @property
    def names(self) -> list[str]:
        return ["color_spread"]

    def _params(self):
        return {"bands": list(self.bands)}

    def _eval(self, mcts: MCSeries) -> np.ndarray:
        mus = np.array([mcts[b].weighted_mean() for b in self.bands])
        return np.array([np.sqrt(np.mean((mus - mus.mean()) ** 2))])


@mc_register
class PerBandFeature(MultiColorFeature):
    """A monochrome feature evaluated independently per band; names are
    ``{name}_{band}`` in the given band order —
    per_band_feature.rs:122-131."""

    kind = "per_band"

    def __init__(self, feature, bands: Iterable[str]):
        self.feature = (
            feature_from_config(feature)
            if not hasattr(feature, "eval")
            else feature
        )
        self.bands = tuple(map(str, bands))
        self.min_ts_length = self.feature.min_ts_length
        self.t_required = self.feature.t_required
        self.m_required = self.feature.m_required
        self.w_required = self.feature.w_required
        self.sorting_required = self.feature.sorting_required
        self.variability_required = self.feature.variability_required

    @property
    def size(self):
        return self.feature.size * len(self.bands)

    @property
    def passband_set(self) -> frozenset:
        return frozenset(self.bands)

    @property
    def names(self) -> list[str]:
        return [f"{n}_{b}" for b in self.bands for n in self.feature.names]

    def _params(self):
        return {"feature": self.feature.to_dict(), "bands": list(self.bands)}

    def _eval(self, mcts: MCSeries) -> np.ndarray:
        return np.concatenate([self.feature.eval(mcts[b]) for b in self.bands])

    def eval_or_fill(self, mcts: MCSeries, fill_value: float = np.nan):
        # per-band independent fill (reference PerBandFeature eval maps each
        # band's monochrome error; or_fill fills the whole output — we fill
        # per band, strictly more informative and a superset of the contract)
        try:
            self.check_mcts(mcts)
        except EvaluatorError:
            return np.full(self.size, fill_value, dtype=np.float64)
        return np.concatenate(
            [self.feature.eval_or_fill(mcts[b], fill_value) for b in self.bands]
        )


# ---------------------------------------------------------------------------
# extractor
# ---------------------------------------------------------------------------


class MultiColorExtractor:
    """Ordered fan-out of multicolor features; aggregated info = sum of
    sizes / max of min lengths / OR of flags; passband set = union —
    multicolor_extractor.rs:27-97."""

    def __init__(self, features: Iterable[MultiColorFeature]):
        self.features: list[MultiColorFeature] = [
            mc_feature_from_config(f) for f in features
        ]

    @property
    def size(self) -> int:
        return sum(f.size for f in self.features)

    @property
    def min_ts_length(self) -> int:
        return max((f.min_ts_length for f in self.features), default=0)

    @property
    def passband_set(self) -> frozenset:
        out: frozenset = frozenset()
        for f in self.features:
            out |= f.passband_set
        return out

    @property
    def variability_required(self) -> bool:
        return any(f.variability_required for f in self.features)

    def names(self) -> list[str]:
        out: list[str] = []
        for f in self.features:
            out.extend(f.names)
        return out

    def eval(self, mcts: MCSeries) -> np.ndarray:
        parts = [f.eval(mcts) for f in self.features]
        return np.concatenate(parts) if parts else np.empty(0)

    def eval_or_fill(self, mcts: MCSeries, fill_value: float = np.nan) -> np.ndarray:
        parts = [f.eval_or_fill(mcts, fill_value) for f in self.features]
        return np.concatenate(parts) if parts else np.empty(0)

    def to_config(self) -> list[dict[str, Any]]:
        return [f.to_dict() for f in self.features]

    @classmethod
    def from_config(cls, spec: Iterable[dict[str, Any]]) -> "MultiColorExtractor":
        return cls(spec)


# ---------------------------------------------------------------------------
# MultiColorBins
# ---------------------------------------------------------------------------


@mc_register
class MultiColorBins(MultiColorFeature):
    """Bin each band's series independently (monochrome Bins semantics:
    t* = (j+1/2)*window, m* = weighted mean, w* = sum(w)/N —
    /root/reference/src/features/bins.rs:171-201), then evaluate the inner
    multicolor extractor on the binned mcts —
    multicolor_bins.rs:160-196. Names prefixed
    ``bins_window{window:.1f}_offset{offset:.1f}_`` (:83-100)."""

    kind = "multicolor_bins"
    t_required = True
    m_required = True
    w_required = True
    sorting_required = True

    def __init__(self, features, window: float = 1.0, offset: float = 0.0):
        assert window > 0, "window must be positive"
        self.window = float(window)
        self.offset = float(offset)
        self.extractor = (
            features
            if isinstance(features, MultiColorExtractor)
            else MultiColorExtractor(features)
        )

    @property
    def size(self):
        return self.extractor.size

    @property
    def min_ts_length(self):
        return max(1, self.extractor.min_ts_length)

    @property
    def variability_required(self):
        return self.extractor.variability_required

    @property
    def passband_set(self) -> frozenset:
        return self.extractor.passband_set

    @property
    def names(self):
        w, o = self.window, self.offset
        return [
            f"bins_window{w:.1f}_offset{o:.1f}_{n}"
            for n in self.extractor.names()
        ]

    def _params(self):
        return {
            "features": self.extractor.to_config(),
            "window": self.window,
            "offset": self.offset,
        }

    def transform(self, mcts: MCSeries) -> MCSeries:
        out = {}
        for band in self.passband_set:
            s = mcts[band]
            bt, bm, bw = bin_series(s.t, s.m, s.w, self.window, self.offset)
            out[band] = Series(bt, bm, bw, check=False)
        return out

    def _eval(self, mcts: MCSeries):
        return self.extractor.eval(self.transform(mcts))

    def eval_or_fill(self, mcts: MCSeries, fill_value: float = np.nan):
        try:
            self.check_mcts(mcts)
            binned = self.transform(mcts)
        except EvaluatorError:
            return np.full(self.size, fill_value, dtype=np.float64)
        return self.extractor.eval_or_fill(binned, fill_value)


# ---------------------------------------------------------------------------
# MultiColorPeriodogram
# ---------------------------------------------------------------------------


@mc_register
class MultiColorPeriodogram(MultiColorFeature):
    """Combined multi-band Lomb-Scargle periodogram.

    Semantics (multi_color_periodogram.rs:482-575):

    - frequency grid from the CONCATENATION of per-band time arrays, bands
      in sorted name order (the reference flat-maps its BTreeMap; duration
      is t[last] - t[first] of that concatenation — replicated exactly);
    - per-band power evaluated on the common grid with the monochrome
      normalization (per-band n for the 'standard' factor);
    - band weights: ``count`` = n per band, ``chi2`` = per-band chi2 about
      the weighted mean; normalized by their sum over ALL configured bands
      (bands too short to evaluate still consume weight mass, :536-556);
    - weighted sum of powers -> the monochrome spectrum extractor on the
      (freq, power) pseudo-series (names identical to the monochrome
      periodogram, :396-401);
    - optional phase features, evaluated per phase band at the combined
      best period, names ``period_folded_{band}_{name}`` (:408-417).
    """

    kind = "multicolor_periodogram"
    min_ts_length = 2
    t_required = True
    m_required = True
    sorting_required = True

    def __init__(
        self,
        bands: Iterable[str],
        peaks: int = 1,
        normalization_weights: str = "count",  # "count" | "chi2"
        resolution: float = 10.0,
        max_freq_factor: float = 1.0,
        nyquist: str | dict = "average",
        fast: bool = True,
        normalization: str = "psd",
        features: list | None = None,
        phase_bands: list | None = None,
        phase_features: list | None = None,
        freq_grid: dict | None = None,
    ):
        from .periodogram_feature import Periodogram

        assert normalization_weights in ("count", "chi2")
        self.bands = tuple(sorted(set(map(str, bands))))
        self.normalization_weights = normalization_weights
        self.phase_bands = tuple(map(str, phase_bands or ()))
        self.mono = Periodogram(
            peaks=peaks,
            resolution=resolution,
            max_freq_factor=max_freq_factor,
            nyquist=nyquist,
            fast=fast,
            normalization=normalization,
            features=features,
            phase_features=phase_features if self.phase_bands else None,
            freq_grid=freq_grid,
        )

    @property
    def w_required(self):
        return self.normalization_weights == "chi2"

    @property
    def size(self):
        spectrum = self.mono.spectrum_extractor.size
        phase = self.mono.phase_extractor.size * len(self.phase_bands)
        return spectrum + phase

    @property
    def passband_set(self) -> frozenset:
        return frozenset(self.bands) | frozenset(self.phase_bands)

    @property
    def names(self):
        out = [
            f"periodogram_{n}" for n in self.mono.spectrum_extractor.names()
        ]
        for band in self.phase_bands:
            out += [
                f"period_folded_{band}_{n}"
                for n in self.mono.phase_extractor.names()
            ]
        return out

    def _params(self):
        p = self.mono._params()
        p.pop("phase_features", None)
        return {
            "bands": list(self.bands),
            "normalization_weights": self.normalization_weights,
            "phase_bands": list(self.phase_bands) or None,
            "phase_features": self.mono.phase_extractor.to_config() or None,
            **p,
        }

    def check_mcts(self, mcts: MCSeries) -> None:
        # bands may individually be too short — they are skipped in the
        # power sum (weight mass still spent); only presence is checked
        # here, degenerate unions error inside freq_power
        missing = self.passband_set - set(mcts)
        if missing:
            raise MissingBand(missing, set(mcts))

    # -- power ----------------------------------------------------------------

    def freq_power(self, mcts: MCSeries) -> tuple[np.ndarray, np.ndarray]:
        from ..errors import ZeroDivision
        from .periodogram import (
            LinearFreqGrid,
            ZeroBasedPow2FreqGrid,
            power_direct,
        )

        t_union = np.concatenate([mcts[b].t for b in self.bands])
        if t_union.shape[0] < 2 or t_union[-1] - t_union[0] <= 0.0:
            raise ZeroDivision("zero union time span: no frequency grid")
        if self.mono.freq_grid is not None:
            grid = self.mono.freq_grid
        else:
            params = self.mono._dynamic_params()
            if self.mono.fast:
                grid = ZeroBasedPow2FreqGrid.from_t(t_union, params)
            else:
                grid = LinearFreqGrid.from_t(t_union, params)
        freqs = grid.freqs()

        if self.normalization_weights == "count":
            weights = np.array([float(mcts[b].n) for b in self.bands])
        else:
            weights = np.array([mcts[b].chi2() for b in self.bands])
        total = weights.sum()
        if total == 0.0:
            raise ZeroDivision("all band weights are zero")
        weights = weights / total

        combined = None
        for b, wgt in zip(self.bands, weights):
            s = mcts[b]
            if s.n < self.mono.min_ts_length:
                continue  # too-short band skipped; its weight mass is spent
            if self.mono.fast and isinstance(grid, ZeroBasedPow2FreqGrid):
                p = self.mono._fft.power(s.t, s.m, grid, s.std2())
            else:
                p = power_direct(s.t, s.m, freqs, s.std2())
            p = self.mono._normalize(p, s.n) * wgt
            combined = p if combined is None else combined + p
        if combined is None:
            raise ShortTimeSeries(
                max(mcts[b].n for b in self.bands), self.mono.min_ts_length
            )
        return freqs, combined

    def _eval(self, mcts: MCSeries):
        from ..errors import ZeroDivision

        freqs, power = self.freq_power(mcts)
        derived = Series(freqs, power, check=False)
        result = self.mono.spectrum_extractor.eval_or_fill(derived)
        if not self.phase_bands or not self.mono.phase_extractor.features:
            return result
        best_period = result[0]
        if not np.isfinite(best_period) or best_period <= 0.0:
            raise ZeroDivision("best period is not positive, cannot phase-fold")
        parts = [result]
        for band in self.phase_bands:
            s = mcts[band]
            phase_s = self.mono._phase_series(s, best_period)
            if phase_s is None:
                parts.append(self.mono.phase_extractor.eval(s))
            else:
                parts.append(self.mono._eval_phase(phase_s))
        return np.concatenate(parts)

    def eval_or_fill(self, mcts: MCSeries, fill_value: float = np.nan):
        """Spectrum part fills independently; each band's phase part fills
        on its own failure (multi_color_periodogram.rs:705-776)."""
        try:
            self.check_mcts(mcts)
            freqs, power = self.freq_power(mcts)
        except EvaluatorError:
            return np.full(self.size, fill_value, dtype=np.float64)
        derived = Series(freqs, power, check=False)
        result = self.mono.spectrum_extractor.eval_or_fill(derived, fill_value)
        if not self.phase_bands or not self.mono.phase_extractor.features:
            return result
        best_period = result[0]
        phase_size = self.mono.phase_extractor.size
        parts = [result]
        if not np.isfinite(best_period) or best_period <= 0.0:
            parts += [np.full(phase_size, fill_value)] * len(self.phase_bands)
            return np.concatenate(parts)
        for band in self.phase_bands:
            s = mcts[band]
            try:
                phase_s = self.mono._phase_series(s, best_period)
                if phase_s is None:
                    parts.append(
                        self.mono.phase_extractor.eval_or_fill(s, fill_value)
                    )
                else:
                    parts.append(self.mono._eval_phase(phase_s, fill_value))
            except Exception:
                parts.append(np.full(phase_size, fill_value))
        return np.concatenate(parts)


# ---------------------------------------------------------------------------
# GroupedMultiColor — vectorized many-conversation evaluation
# ---------------------------------------------------------------------------


class _MCSegments:
    """Flat (conv, band)-segment-major arrays + lazily cached per-segment
    statistics. Rows are sorted by (conv, band, time); ``seg_starts`` marks
    (conv, band) run boundaries."""

    def __init__(self, conv_of_seg, band_of_seg, band_names, t, m, w, seg_starts, nconv):
        self.conv_of_seg = np.asarray(conv_of_seg, dtype=np.int64)
        self.band_of_seg = np.asarray(band_of_seg, dtype=np.int64)
        self.band_names = list(band_names)
        self.code_of = {b: i for i, b in enumerate(self.band_names)}
        self.t = np.ascontiguousarray(t, dtype=np.float64)
        self.m = np.ascontiguousarray(m, dtype=np.float64)
        self.w = np.ascontiguousarray(w, dtype=np.float64)
        self.seg_starts = np.asarray(seg_starts, dtype=np.int64)
        self.nconv = int(nconv)
        nseg = self.seg_starts.shape[0]
        self.sizes = (
            np.r_[self.seg_starts[1:], self.t.shape[0]] - self.seg_starts
        )
        self.seg_of_row = np.repeat(np.arange(nseg), self.sizes)
        self._cache: dict = {}
        # per-(conv, band) observation counts; 0 == band absent
        cnt = np.zeros((self.nconv, len(self.band_names)), dtype=np.int64)
        cnt[self.conv_of_seg, self.band_of_seg] = self.sizes
        self.count = cnt

    def _seg_stat(self, key):
        v = self._cache.get(key)
        if v is not None:
            return v
        if self.t.shape[0] == 0:
            v = np.empty(0, dtype=np.float64)
        elif key == "max":
            v = np.maximum.reduceat(self.m, self.seg_starts)
        elif key == "min":
            v = np.minimum.reduceat(self.m, self.seg_starts)
        elif key == "median":
            order = np.lexsort((self.m, self.seg_of_row))
            ms = self.m[order]
            lo = self.seg_starts + (self.sizes - 1) // 2
            hi = self.seg_starts + self.sizes // 2
            v = 0.5 * (ms[lo] + ms[hi])
        elif key == "weighted_mean":
            sw = np.add.reduceat(self.w, self.seg_starts)
            smw = np.add.reduceat(self.m * self.w, self.seg_starts)
            v = smw / sw
        else:  # pragma: no cover
            raise KeyError(key)
        self._cache[key] = v
        return v

    def stat_matrix(self, key) -> np.ndarray:
        """(nconv, nbands) matrix of the per-segment stat (NaN = absent)."""
        mk = ("mat", key)
        v = self._cache.get(mk)
        if v is None:
            v = np.full((self.nconv, len(self.band_names)), np.nan)
            v[self.conv_of_seg, self.band_of_seg] = self._seg_stat(key)
            self._cache[mk] = v
        return v

    def presence_ok(self, bands, min_n: int) -> np.ndarray:
        """(nconv,) bool: every named band present with >= min_n points.
        A band unseen in this partition fails everywhere."""
        ok = np.ones(self.nconv, dtype=bool)
        for b in bands:
            code = self.code_of.get(b)
            if code is None:
                return np.zeros(self.nconv, dtype=bool)
            ok &= self.count[:, code] >= max(min_n, 1)
        return ok

    def band_arrays(self, band_code: int):
        """Compact (t, m, w, starts, conv_codes) for one band's segments,
        segment-major in conv order (for the monochrome GroupedSuite)."""
        sel = self.band_of_seg == band_code
        rows = np.repeat(sel, self.sizes)
        sizes_b = self.sizes[sel]
        starts_b = np.r_[0, np.cumsum(sizes_b)[:-1]].astype(np.int64)
        return (
            self.t[rows],
            self.m[rows],
            self.w[rows],
            starts_b,
            self.conv_of_seg[sel],
        )

    def binned(self, window: float, offset: float) -> "_MCSegments":
        """New segments with each (conv, band) series rebinned by the
        monochrome Bins transform (t* = (j+1/2)*window, m* = weighted
        mean, w* = sum(w)/N — bins.py:bin_series), ALL segments at once."""
        if self.t.shape[0] == 0:
            return self
        j = np.floor((self.t - offset) / window)
        # time ascends within a segment => j non-decreasing within it
        new = np.zeros(self.t.shape[0], dtype=bool)
        new[self.seg_starts] = True
        new[1:] |= j[1:] != j[:-1]
        bstarts = np.flatnonzero(new)
        bends = np.r_[bstarts[1:], self.t.shape[0]]
        n_j = (bends - bstarts).astype(np.float64)
        sum_w = np.add.reduceat(self.w, bstarts)
        sum_mw = np.add.reduceat(self.m * self.w, bstarts)
        bt = (j[bstarts] + 0.5) * window
        bm = sum_mw / sum_w
        bw = sum_w / n_j
        # one bin row per (conv, band, j); seg boundaries where the source
        # segment changes
        src_seg = self.seg_of_row[bstarts]
        seg_new = np.r_[True, src_seg[1:] != src_seg[:-1]]
        new_starts = np.flatnonzero(seg_new)
        return _MCSegments(
            self.conv_of_seg[src_seg[new_starts]],
            self.band_of_seg[src_seg[new_starts]],
            self.band_names,
            bt,
            bm,
            bw,
            new_starts,
            self.nconv,
        )


class GroupedMultiColor:
    """Vectorized evaluation of a :class:`MultiColorExtractor` over many
    conversations at once (the multicolor analog of the monochrome
    ``GroupedSuite``). ColorOfMaximum/Median/Minimum, ColorSpread,
    PerBandFeature and MultiColorBins evaluate with reduceat/GroupedSuite
    kernels — no per-conversation Python; features without a vectorized
    path (MultiColorPeriodogram) fall back to a per-series loop over ONLY
    that feature, exactly mirroring their scalar ``eval_or_fill``."""

    def __init__(self, features, fill_value: float = np.nan):
        self.extractor = (
            features
            if isinstance(features, MultiColorExtractor)
            else MultiColorExtractor(features)
        )
        self.fill_value = float(fill_value)

    def names(self):
        return self.extractor.names()

    def eval(self, ctx: _MCSegments) -> dict:
        out: dict = {}
        for f in self.extractor.features:
            out.update(self._eval_feature(f, ctx))
        return out

    # -- per-kind vectorized kernels ----------------------------------------

    def _eval_feature(self, f, ctx: _MCSegments) -> dict:
        fill = self.fill_value
        if isinstance(f, _ColorOf):
            stat = ctx.stat_matrix(
                {"max": "max", "min": "min", "median": "median"}[f.stat]
            )
            a, b = f.bands
            ok = ctx.presence_ok(f.bands, f.min_ts_length)
            ca, cb = ctx.code_of.get(a), ctx.code_of.get(b)
            if ca is None or cb is None:
                return {f.names[0]: np.full(ctx.nconv, fill)}
            col = stat[:, ca] - stat[:, cb]
            return {f.names[0]: np.where(ok, col, fill)}
        if isinstance(f, ColorSpread):
            ok = ctx.presence_ok(f.bands, f.min_ts_length)
            mus = ctx.stat_matrix("weighted_mean")
            codes = [ctx.code_of.get(b) for b in f.bands]
            if any(c is None for c in codes):
                return {"color_spread": np.full(ctx.nconv, fill)}
            sub = mus[:, codes]
            with np.errstate(invalid="ignore"):
                spread = np.sqrt(
                    np.mean((sub - sub.mean(axis=1, keepdims=True)) ** 2, axis=1)
                )
            return {"color_spread": np.where(ok, spread, fill)}
        if isinstance(f, PerBandFeature):
            from .extractor import FeatureExtractor
            from .grouped import GroupedSuite

            ok = ctx.presence_ok(f.bands, f.min_ts_length)
            suite = GroupedSuite(FeatureExtractor([f.feature]), fill)
            cols: dict = {}
            for b in f.bands:
                code = ctx.code_of.get(b)
                if code is None:
                    for n in f.feature.names:
                        cols[f"{n}_{b}"] = np.full(ctx.nconv, fill)
                    continue
                tb, mb, wb, starts_b, convs_b = ctx.band_arrays(code)
                if starts_b.shape[0] == 0:
                    vals = {n: np.empty(0) for n in f.feature.names}
                else:
                    vals = suite.eval(tb, mb, wb, starts_b)
                for n in f.feature.names:
                    col = np.full(ctx.nconv, fill)
                    col[convs_b] = vals[n]
                    cols[f"{n}_{b}"] = col
            for n in list(cols):
                cols[n] = np.where(ok, cols[n], fill)
            return cols
        if isinstance(f, MultiColorBins):
            ok = ctx.presence_ok(
                sorted(f.passband_set), f.min_ts_length
            )
            inner = GroupedMultiColor(f.extractor, fill)
            bctx = ctx.binned(f.window, f.offset)
            inner_cols = inner.eval(bctx)
            pre = f"bins_window{f.window:.1f}_offset{f.offset:.1f}_"
            return {
                pre + n: np.where(ok, col, fill)
                for n, col in inner_cols.items()
            }
        return self._fallback(f, ctx)

    def _fallback(self, f, ctx: _MCSegments) -> dict:
        """Per-conversation loop for features with no vectorized kernel
        (inherently per-series, e.g. MultiColorPeriodogram)."""
        fill = self.fill_value
        nseg = ctx.seg_starts.shape[0]
        seg_end = np.r_[ctx.seg_starts[1:], ctx.t.shape[0]]
        conv_first = (
            np.flatnonzero(np.r_[True, ctx.conv_of_seg[1:] != ctx.conv_of_seg[:-1]])
            if nseg
            else np.empty(0, dtype=np.int64)
        )
        conv_last = np.r_[conv_first[1:], nseg]
        rows = np.full((ctx.nconv, f.size), fill)
        for lo, hi in zip(conv_first, conv_last):
            mcts = {}
            for k in range(lo, hi):
                s0, s1 = ctx.seg_starts[k], seg_end[k]
                mcts[ctx.band_names[ctx.band_of_seg[k]]] = Series(
                    ctx.t[s0:s1], ctx.m[s0:s1], ctx.w[s0:s1], check=False
                )
            rows[ctx.conv_of_seg[lo]] = f.eval_or_fill(mcts, fill)
        return {n: rows[:, i] for i, n in enumerate(f.names)}
