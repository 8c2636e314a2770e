"""Bins meta-feature: tumbling-window downsample, then sub-extract.

Analog of /root/reference/src/features/bins.rs:171-201 (``bin_time_series``):
bin index j = floor((t - offset)/window); per bin

- t* = (j + 1/2) * window          (as implemented by the reference code;
                                    its doc adds +offset, the code does not)
- m* = sum(m*w)/sum(w)             (weighted mean)
- w* = sum(w)/N_j

This is THE tier-cascade primitive: the rollup engine's 1m/1h/1d continuous
aggregates use exactly these semantics (see stages/rollup.py).
"""

from __future__ import annotations

import numpy as np

from .base import Feature, register
from .extractor import FeatureExtractor
from .kernel import Series


def bin_series(
    t: np.ndarray,
    m: np.ndarray,
    w: np.ndarray,
    window: float,
    offset: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized Bins transform over a time-sorted series.

    Returns (t*, m*, w*) arrays, one row per non-empty bin, in time order.
    """
    j = np.floor((t - offset) / window)
    # time-sorted input => j is non-decreasing; find bin boundaries
    starts = np.flatnonzero(np.r_[True, j[1:] != j[:-1]])
    bin_j = j[starts]
    mw = m * w
    cum_w = np.r_[0.0, np.cumsum(w)]
    cum_mw = np.r_[0.0, np.cumsum(mw)]
    ends = np.r_[starts[1:], t.shape[0]]
    sum_w = cum_w[ends] - cum_w[starts]
    sum_mw = cum_mw[ends] - cum_mw[starts]
    n_j = (ends - starts).astype(np.float64)
    bin_t = (bin_j + 0.5) * window
    bin_m = sum_mw / sum_w
    bin_w = sum_w / n_j
    return bin_t, bin_m, bin_w


@register
class Bins(Feature):
    """Tumbling-window downsample wrapper around a sub-extractor."""

    kind = "bins"

    def __init__(self, features, window: float = 1.0, offset: float = 0.0):
        assert window > 0, "window must be positive"
        self.window = float(window)
        self.offset = float(offset)
        if isinstance(features, FeatureExtractor):
            self.extractor = features
        else:
            self.extractor = FeatureExtractor.from_config(features)

    @property
    def size(self):
        return self.extractor.size

    @property
    def min_ts_length(self):
        return max(1, self.extractor.min_ts_length)

    t_required = True
    m_required = True
    w_required = True
    sorting_required = True

    @property
    def variability_required(self):
        return self.extractor.variability_required

    @property
    def names(self):
        w, o = self.window, self.offset
        return [
            f"bins_window{w:g}_offset{o:g}_{n}" for n in self.extractor.names()
        ]

    def _params(self):
        return {
            "features": self.extractor.to_config(),
            "window": self.window,
            "offset": self.offset,
        }

    def transform(self, s: Series) -> Series:
        bt, bm, bw = bin_series(s.t, s.m, s.w, self.window, self.offset)
        return Series(bt, bm, bw, check=False)

    def _eval(self, s: Series):
        return self.extractor.eval(self.transform(s))

    def eval_or_fill(self, s: Series, fill_value: float = np.nan):
        try:
            self.check(s)
            binned = self.transform(s)
        except Exception:
            return np.full(self.size, fill_value, dtype=np.float64)
        return self.extractor.eval_or_fill(binned, fill_value)
