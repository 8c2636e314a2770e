"""Batched Lomb-Scargle over many segments at once (the rollup fast path).

Key observation: with the dynamic ZeroBasedPow2 grid (resolution R, max
frequency factor F, AverageNyquist), the grid SIZE class depends only on
the segment length N:

    max_freq / step = (pi*(N-1)*F/dur) / (2*pi*(N-1)/(N*R*dur)) = N*R*F/2
    k = round(log2(N*R*F/2)),   grid size = 2^k + 1,   M = 2^(k+1)

so segments can be grouped by k and processed with ONE batched
``np.fft.rfft`` per class: the spread (extirpolation) step becomes a single
global ``np.bincount`` with row offsets, and the tau/power recovery is 2-D
vectorized. Per-segment math is identical to power.FftPowerEvaluator /
the reference FFT path (/root/reference/src/periodogram/power_fft.rs:91-275);
results match the per-series evaluator to float roundoff.

Only the (default) spectrum feature set [PeriodogramPeaks(k)] is supported
here; configs with extra spectrum features fall back to the per-series
loop in GroupedSuite.
"""

from __future__ import annotations

import numpy as np


def batched_periodogram_peaks(
    t: np.ndarray,
    m: np.ndarray,
    starts: np.ndarray,
    *,
    peaks: int = 1,
    resolution: float = 10.0,
    max_freq_factor: float = 1.0,
    normalization: str = "psd",
    fill_value: float = np.nan,
) -> np.ndarray:
    """Returns (nseg, 2*peaks) array of (period_i, s_to_n_i) pairs.

    Segment semantics match Periodogram.eval + PeriodogramPeaks:
    - n < 2  -> fill_value row (ShortTimeSeries)
    - plateau / zero-duration -> all-zero power -> zero-padded peaks row
    """
    nseg = starts.shape[0]
    ends = np.r_[starts[1:], t.shape[0]]
    n = ends - starts
    out = np.full((nseg, 2 * peaks), fill_value, dtype=np.float64)

    seg_id = np.repeat(np.arange(nseg), n)
    nn = n.astype(np.float64)
    mean = np.add.reduceat(m, starts) / nn
    d = m - mean[seg_id]
    with np.errstate(invalid="ignore", divide="ignore"):
        std2 = np.add.reduceat(d * d, starts) / (nn - 1.0)
    t0 = t[starts]
    duration = t[ends - 1] - t0

    valid = (n >= 2) & (duration > 0.0)  # zero span -> NaN (typed error)
    out[valid] = 0.0  # plateau rows stay all-zero (reference fixture)
    live = valid & (std2 > 0.0)
    if not live.any():
        return out

    # grid class by segment length
    k = np.rint(np.log2(np.maximum(n * resolution * max_freq_factor / 2.0, 1.0))).astype(
        np.int64
    )
    k = np.maximum(k, 0)

    for kk in np.unique(k[live]):
        rows = np.flatnonzero(live & (k == kk))
        _power_class(
            t,
            m,
            d,
            starts,
            ends,
            rows,
            int(kk),
            mean,
            std2,
            nn,
            t0,
            duration,
            resolution,
            max_freq_factor,
            normalization,
            peaks,
            out,
        )
    return out


def _power_class(
    t,
    m,
    d,
    starts,
    ends,
    rows,
    k,
    mean,
    std2,
    nn,
    t0,
    duration,
    resolution,
    max_freq_factor,
    normalization,
    npeaks,
    out,
):
    nw = (1 << k) + 1
    msize = (nw - 1) << 1  # FFT length M
    nrows = rows.shape[0]

    n_r = nn[rows]
    dur_r = duration[rows]
    step = 2.0 * np.pi * (n_r - 1.0) / (n_r * resolution * dur_r)
    max_freq = step * (nw - 1)
    dt_grid = np.pi / max_freq  # per-row uniform grid spacing

    # ---- global spread (linear extirpolation with wraparound) ----
    counts = (ends - starts)[rows]
    row_of_point = np.repeat(np.arange(nrows), counts)
    # gather the points of the selected segments
    point_idx = _ranges(starts[rows], ends[rows])
    tt = t[point_idx]
    hh = d[point_idx]
    x = (tt - t0[rows][row_of_point]) / dt_grid[row_of_point]

    def spread(positions, weights):
        lo = np.floor(positions)
        frac = positions - lo
        i_lo = lo.astype(np.int64) % msize
        i_hi = np.ceil(positions).astype(np.int64) % msize
        base = row_of_point * msize
        acc = np.bincount(
            base + i_lo, weights=weights * (1.0 - frac), minlength=nrows * msize
        )
        acc += np.bincount(
            base + i_hi, weights=weights * frac, minlength=nrows * msize
        )
        return acc.reshape(nrows, msize)

    a_h = spread(x, hh)
    a_2 = spread(2.0 * x, np.ones_like(x))

    f_h = np.fft.rfft(a_h, axis=1)  # (nrows, nw)
    f_2 = np.fft.rfft(a_2, axis=1)

    # fused tau/power recovery: minimize temporaries (this inner loop is
    # memory-bandwidth bound; every avoided pass matters)
    sum_cos_h = np.ascontiguousarray(f_h.real)
    sum_sin_h = np.negative(f_h.imag)
    sum_cos_2 = np.ascontiguousarray(f_2.real)
    sum_sin_2 = np.negative(f_2.imag)
    del f_h, f_2
    hyp = np.hypot(sum_cos_2, sum_sin_2)
    both_zero = hyp == 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        cos_2wtau = np.divide(sum_cos_2, hyp, out=hyp)
    np.copyto(cos_2wtau, 1.0, where=both_zero)
    # cos_wtau = sqrt((1+c)/2) computed in place on a reused buffer
    cos_wtau = cos_2wtau + 1.0
    cos_wtau *= 0.5
    np.sqrt(cos_wtau, out=cos_wtau)
    sin_wtau = np.subtract(1.0, cos_2wtau, out=cos_2wtau)
    sin_wtau *= 0.5
    np.sqrt(sin_wtau, out=sin_wtau)
    neg = sum_sin_2 < 0.0
    np.negative(sin_wtau, out=sin_wtau, where=neg)
    sum_h_cos = sum_cos_h * cos_wtau
    sum_h_cos += sum_sin_h * sin_wtau
    sum_h_sin = np.multiply(sum_sin_h, cos_wtau, out=sum_sin_h)
    sum_h_sin -= np.multiply(sum_cos_h, sin_wtau, out=sum_cos_h)
    ncol = n_r[:, None]
    sum_cos2_wt_tau = np.multiply(sum_cos_2, cos_wtau, out=sum_cos_2)
    sum_cos2_wt_tau += np.multiply(sum_sin_2, sin_wtau, out=sum_sin_2)
    sum_cos2_wt_tau += ncol
    sum_cos2_wt_tau *= 0.5
    sum_sin2_wt_tau = np.subtract(ncol, sum_cos2_wt_tau, out=cos_wtau)
    with np.errstate(divide="ignore", invalid="ignore"):
        frac_cos = np.divide(
            np.multiply(sum_h_cos, sum_h_cos, out=sum_h_cos),
            sum_cos2_wt_tau,
            out=sum_h_cos,
        )
        np.copyto(frac_cos, 0.0, where=sum_cos2_wt_tau == 0.0)
        frac_sin = np.divide(
            np.multiply(sum_h_sin, sum_h_sin, out=sum_h_sin),
            sum_sin2_wt_tau,
            out=sum_h_sin,
        )
        np.copyto(frac_sin, 0.0, where=sum_sin2_wt_tau == 0.0)
    sum_frac = np.where(
        frac_cos == 0.0,
        2.0 * frac_sin,
        np.where(frac_sin == 0.0, 2.0 * frac_cos, frac_sin + frac_cos),
    )
    power = sum_frac
    power *= (0.5 / std2[rows])[:, None]

    if normalization != "psd":
        factor = (2.0 / (n_r - 1.0))[:, None]
        p_std = power * factor
        if normalization == "standard":
            power = p_std
        elif normalization == "model":
            with np.errstate(divide="ignore", invalid="ignore"):
                power = np.where(p_std >= 1.0, np.inf, p_std / (1.0 - p_std))
        elif normalization == "log":
            with np.errstate(divide="ignore", invalid="ignore"):
                power = np.where(p_std >= 1.0, np.inf, -np.log1p(-p_std))
        else:
            raise ValueError(f"unknown normalization {normalization!r}")

    # ---- peaks: strict local maxima, descending power ----
    # rising[i] = p[i+1] > p[i]; peak at j in 1..nw-2
    rising = power[:, 1:] > power[:, :-1]
    is_peak = np.zeros_like(power, dtype=bool)
    if nw >= 3:
        is_peak[:, 1:-1] = rising[:, :-1] & ~rising[:, 1:]
    p_mean = power.mean(axis=1)
    p_std = power.std(axis=1, ddof=1)

    masked = np.where(is_peak, power, -np.inf)
    if npeaks == 1:
        idx = np.argmax(masked, axis=1)
        has = np.take_along_axis(is_peak, idx[:, None], axis=1)[:, 0]
        freq = idx * step
        with np.errstate(divide="ignore"):
            period = np.where(has, 2.0 * np.pi / freq, 0.0)
        pk = np.take_along_axis(power, idx[:, None], axis=1)[:, 0]
        with np.errstate(invalid="ignore", divide="ignore"):
            snr = np.where(
                has & (p_std != 0.0), (pk - p_mean) / p_std, 0.0
            )
        out[rows, 0] = period
        out[rows, 1] = snr
    else:
        order = np.argsort(np.where(is_peak, -power, np.inf), axis=1, kind="stable")
        for j in range(npeaks):
            idx = order[:, j]
            has = np.take_along_axis(is_peak, idx[:, None], axis=1)[:, 0]
            freq = idx * step
            with np.errstate(divide="ignore"):
                period = np.where(has, 2.0 * np.pi / freq, 0.0)
            pk = np.take_along_axis(power, idx[:, None], axis=1)[:, 0]
            with np.errstate(invalid="ignore", divide="ignore"):
                snr = np.where(has & (p_std != 0.0), (pk - p_mean) / p_std, 0.0)
            out[rows, 2 * j] = period
            out[rows, 2 * j + 1] = snr


def _ranges(starts, ends):
    """Concatenated ranges [s0,e0) [s1,e1) ... without a Python loop."""
    counts = ends - starts
    total = int(counts.sum())
    out = np.ones(total, dtype=np.int64)
    run_starts = np.r_[0, np.cumsum(counts)[:-1]]
    out[run_starts] = starts - np.r_[0, ends[:-1] - 1]
    out[0] = starts[0]
    return np.cumsum(out)
