"""Lomb-Scargle power: direct O(N*Nw) and FFT O(M log M) evaluators.

Both produce the reference's "Psd" normalization: raw power divided by the
sample variance of m; power is exactly 0 for degenerate frequencies and for
plateau series.

Direct path — analog of /root/reference/src/periodogram/power_direct.rs:21-103:
classic Lomb-Scargle with per-frequency tau:
  cos(2wtau) = C2/hypot(S2, C2) with S2 = sum sin(2wt), C2 = sum cos(2wt),
  half-angle recovery of sin/cos(wtau) (sign of S2), then
  P = 1/2 * (S^2/sum_sin2 + C^2/sum_cos2) / var  with sum_cos2 = N - sum_sin2.

FFT path — analog of /root/reference/src/periodogram/power_fft.rs:91-275
(Press & Rybicki extirpolation, NR §13.8): spread (m - mean) and unit counts
onto a uniform grid of M = 2*(Nw-1) points with LINEAR interpolation and
index wraparound modulo M (the count series is spread at 2x so its FFT bin i
directly yields the 2w sums), then one real FFT of each array recovers all
sums per frequency. Requires a ZeroBasedPow2 grid. The last bin aliases for
off-grid t; the direct-vs-FFT equivalence contract excludes it
(/root/reference/src/periodogram/mod.rs:221-251).
"""

from __future__ import annotations

import numpy as np

from .freq import FreqGrid, ZeroBasedPow2FreqGrid

_FREQ_CHUNK = 512


def power_direct(
    t: np.ndarray, m: np.ndarray, freqs: np.ndarray, m_std2: float | None = None
) -> np.ndarray:
    """Direct Lomb-Scargle power over an arbitrary angular-frequency grid."""
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    n = t.shape[0]
    m_mean = float(np.mean(m))
    if m_std2 is None:
        m_std2 = float(np.var(m, ddof=1)) if n > 1 else 0.0
    h = m - m_mean
    out = np.empty(freqs.shape[0], dtype=np.float64)
    for lo in range(0, freqs.shape[0], _FREQ_CHUNK):
        w = freqs[lo : lo + _FREQ_CHUNK, None]  # (F, 1)
        wt = w * t[None, :]  # (F, N)
        sin_wt = np.sin(wt)
        cos_wt = np.cos(wt)
        # sums of sin/cos(2wt) via double-angle (avoids a second trig pass)
        s2 = 2.0 * np.sum(sin_wt * cos_wt, axis=1)
        c2 = np.sum(cos_wt * cos_wt - sin_wt * sin_wt, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2wtau = c2 / np.hypot(s2, c2)
        cos_wtau = np.sqrt(0.5 * (1.0 + cos_2wtau))
        sin_wtau = np.copysign(1.0, s2) * np.sqrt(0.5 * (1.0 - cos_2wtau))
        # sin/cos of w*(t - tau)
        sin_shift = sin_wt * cos_wtau[:, None] - cos_wt * sin_wtau[:, None]
        cos_shift = cos_wt * cos_wtau[:, None] + sin_wt * sin_wtau[:, None]
        sum_m_sin = sin_shift @ h
        sum_m_cos = cos_shift @ h
        sum_sin2 = np.sum(sin_shift * sin_shift, axis=1)
        sum_cos2 = n - sum_sin2
        degenerate = (
            ((sum_m_sin == 0.0) & (sum_sin2 == 0.0))
            | ((sum_m_cos == 0.0) & (sum_cos2 == 0.0))
            | (m_std2 == 0.0)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            p = 0.5 * (
                sum_m_sin * sum_m_sin / sum_sin2 + sum_m_cos * sum_m_cos / sum_cos2
            ) / m_std2
        out[lo : lo + _FREQ_CHUNK] = np.where(degenerate, 0.0, p)
    return out


def _spread_linear(positions: np.ndarray, weights: np.ndarray, size: int) -> np.ndarray:
    """Linear extirpolation with modulo-size wraparound
    (analog of ``spread``, /root/reference/src/periodogram/power_fft.rs:235-251)."""
    lo = np.floor(positions)
    frac = positions - lo
    i_lo = lo.astype(np.int64) % size
    i_hi = np.ceil(positions).astype(np.int64) % size
    # frac == 0 => full weight lands on i_lo, nothing on i_hi (i_hi == i_lo)
    out = np.bincount(i_lo, weights=weights * (1.0 - frac), minlength=size)
    out += np.bincount(i_hi, weights=weights * frac, minlength=size)
    return out


class FftPowerEvaluator:
    """FFT power path with reusable scratch state (the actor-held analog of
    the reference's per-thread FFT plan cache,
    /root/reference/src/periodogram/power_fft.rs:39-41)."""

    def __init__(self):
        self._scratch: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def power(
        self,
        t: np.ndarray,
        m: np.ndarray,
        grid: ZeroBasedPow2FreqGrid,
        m_std2: float | None = None,
    ) -> np.ndarray:
        t = np.asarray(t, dtype=np.float64)
        m = np.asarray(m, dtype=np.float64)
        n = t.shape[0]
        if m_std2 is None:
            m_std2 = float(np.var(m, ddof=1)) if n > 1 else 0.0
        nw = grid.size
        if m_std2 == 0.0:
            return np.zeros(nw, dtype=np.float64)
        size = (nw - 1) << 1  # M = 2*(Nw - 1)
        max_freq = grid.step * (nw - 1)
        dt_grid = np.pi / max_freq
        x = (t - t[0]) / dt_grid
        h = m - float(np.mean(m))
        a_h = _spread_linear(x, h, size)
        a_2 = _spread_linear(2.0 * x, np.ones_like(x), size)
        f_h = np.fft.rfft(a_h)  # bins 0..M/2 == 0..Nw-1
        f_2 = np.fft.rfft(a_2)
        sum_cos_h = f_h.real
        sum_sin_h = -f_h.imag
        sum_cos_2 = f_2.real
        sum_sin_2 = -f_2.imag
        both_zero = (sum_cos_2 == 0.0) & (sum_sin_2 == 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2wtau = np.where(
                both_zero, 1.0, sum_cos_2 / np.hypot(sum_cos_2, sum_sin_2)
            )
        cos_wtau = np.sqrt(0.5 * (1.0 + cos_2wtau))
        sin_wtau = np.copysign(1.0, sum_sin_2) * np.sqrt(0.5 * (1.0 - cos_2wtau))
        sum_h_cos = sum_cos_h * cos_wtau + sum_sin_h * sin_wtau
        sum_h_sin = sum_sin_h * cos_wtau - sum_cos_h * sin_wtau
        sum_cos2_wt_tau = 0.5 * (n + sum_cos_2 * cos_wtau + sum_sin_2 * sin_wtau)
        sum_sin2_wt_tau = n - sum_cos2_wt_tau
        with np.errstate(divide="ignore", invalid="ignore"):
            frac_cos = np.where(
                sum_cos2_wt_tau == 0.0, 0.0, sum_h_cos**2 / sum_cos2_wt_tau
            )
            frac_sin = np.where(
                sum_sin2_wt_tau == 0.0, 0.0, sum_h_sin**2 / sum_sin2_wt_tau
            )
        # reference special-cases a vanishing component by doubling the other
        sum_frac = np.where(
            frac_cos == 0.0,
            2.0 * frac_sin,
            np.where(frac_sin == 0.0, 2.0 * frac_cos, frac_sin + frac_cos),
        )
        return 0.5 / m_std2 * sum_frac


_DEFAULT_FFT = FftPowerEvaluator()


def power_fft(t, m, grid: ZeroBasedPow2FreqGrid, m_std2=None) -> np.ndarray:
    return _DEFAULT_FFT.power(t, m, grid, m_std2)
