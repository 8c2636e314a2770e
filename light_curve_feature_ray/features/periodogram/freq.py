"""Frequency grids and Nyquist strategies for the periodogram.

Analog of /root/reference/src/periodogram/freq.rs:

- Nyquist strategies (:70-130): Average = pi*(N-1)/span, Median = pi/median(dt),
  Quantile = pi/ppf_R5(dt, q), Fixed.
- Dynamic params (:408-419): step = 2*pi*(N-1)/(N*resolution*duration),
  max_freq = nyquist * max_freq_factor.
- ZeroBasedPow2 grid (:220-268): freqs i*step, size 2^k+1 with
  k = round(log2(max_freq/step)).
- Linear grid (:293-332): start = 4*pi/duration,
  size = round(max(1, (max_freq-start)/step)).

All frequencies are angular (rad / time-unit).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..kernel import ppf_r5


@dataclass(frozen=True)
class NyquistFreq:
    """strategy: 'average' | 'median' | 'quantile' | 'fixed'."""

    strategy: str = "average"
    quantile: float = 0.0
    value: float = 0.0

    def __call__(self, t: np.ndarray) -> float:
        n = t.shape[0]
        if self.strategy == "average":
            return np.pi * (n - 1) / (t[-1] - t[0])
        if self.strategy == "median":
            dt = float(np.median(np.diff(t)))
            return np.pi / dt
        if self.strategy == "quantile":
            dt = ppf_r5(np.sort(np.diff(t)), self.quantile)
            return np.pi / dt
        if self.strategy == "fixed":
            return self.value
        raise ValueError(f"unknown nyquist strategy {self.strategy!r}")

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"strategy": self.strategy}
        if self.strategy == "quantile":
            d["quantile"] = self.quantile
        if self.strategy == "fixed":
            d["value"] = self.value
        return d

    @classmethod
    def from_dict(cls, d) -> "NyquistFreq":
        if isinstance(d, str):
            return cls(strategy=d)
        return cls(**d)


@dataclass(frozen=True)
class DynamicFreqParams:
    resolution: float = 10.0
    max_freq_factor: float = 1.0
    nyquist: NyquistFreq = field(default_factory=NyquistFreq)

    def duration_step_max_freq(self, t: np.ndarray) -> tuple[float, float, float]:
        n = t.shape[0]
        duration = float(t[-1] - t[0])
        step = 2.0 * np.pi * (n - 1) / (n * self.resolution * duration)
        max_freq = self.nyquist(t) * self.max_freq_factor
        return duration, step, max_freq


class FreqGrid:
    """Base: a sorted grid of angular frequencies."""

    @property
    def size(self) -> int:
        raise NotImplementedError

    def freqs(self) -> np.ndarray:
        raise NotImplementedError


class ZeroBasedPow2FreqGrid(FreqGrid):
    """freqs = i*step for i in 0..2^k; required by the FFT power path."""

    def __init__(self, step: float, log2_size_m1: int):
        assert step > 0 and np.isfinite(step)
        self.step = float(step)
        self.log2_size_m1 = int(log2_size_m1)
        self._size = (1 << self.log2_size_m1) + 1

    @property
    def size(self) -> int:
        return self._size

    def freqs(self) -> np.ndarray:
        return self.step * np.arange(self._size, dtype=np.float64)

    @classmethod
    def from_t(cls, t: np.ndarray, params: DynamicFreqParams):
        _, step, max_freq = params.duration_step_max_freq(t)
        # round-to-nearest of log2(max_freq/step), ties-to-even like the
        # reference's RoundToNearest conversion
        log2_size = int(np.rint(np.log2(max_freq / step)))
        return cls(step, max(log2_size, 0))

    @classmethod
    def with_size(cls, step: float, size: int):
        size_m1 = size - 1
        assert size_m1 > 0 and (size_m1 & (size_m1 - 1)) == 0, "size must be 2^k+1"
        return cls(step, int(np.log2(size_m1)))


class LinearFreqGrid(FreqGrid):
    def __init__(self, start: float, step: float, size: int):
        assert start >= 0 and step > 0 and size > 0
        self.start = float(start)
        self.step = float(step)
        self._size = int(size)

    @property
    def size(self) -> int:
        return self._size

    def freqs(self) -> np.ndarray:
        return self.start + self.step * np.arange(self._size, dtype=np.float64)

    @classmethod
    def from_t(cls, t: np.ndarray, params: DynamicFreqParams):
        duration, step, max_freq = params.duration_step_max_freq(t)
        start = 4.0 * np.pi / duration  # half-duration period
        sizef = (max_freq - start) / step
        size = int(np.rint(sizef)) if sizef >= 1.0 else 1
        return cls(start, step, max(size, 1))


class ArbitraryFreqGrid(FreqGrid):
    def __init__(self, freqs: np.ndarray):
        self._freqs = np.ascontiguousarray(freqs, dtype=np.float64)

    @property
    def size(self) -> int:
        return self._freqs.shape[0]

    def freqs(self) -> np.ndarray:
        return self._freqs
