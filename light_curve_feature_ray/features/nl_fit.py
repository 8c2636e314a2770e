"""Non-linear curve-fit features (SURVEY.md §2.5, optional tier).

Analog of the reference's nl_fit subsystem (/root/reference/src/nl_fit/):
a deterministic, dependency-free fitting stack —

- data normalization to zero-mean/unit-std t and m before fitting
  (NormalizedData, /root/reference/src/nl_fit/data.rs:16-76);
- an affine-invariant ensemble sampler (Goodman & Weare stretch move, the
  algorithm behind emcee) with a FIXED seed, 4*NPARAMS walkers and 128
  iterations by default, tracking the best posterior sample — mirroring
  McmcCurveFit (/root/reference/src/nl_fit/mcmc.rs:100-140, fixed
  StdRng::from_seed so retries are safe);
- a deterministic Nelder-Mead polish of the best sample (our stand-in for
  the reference's optional LMSDER/Ceres fine-tuning, which are
  feature-gated native optimizers there).

Implemented models: BazinFit (/root/reference/src/features/bazin_fit.rs)
and LinexpFit (/root/reference/src/features/linexp_fit.rs); VillarFit is
future work. Output = parameters in original units + reduced chi2
(chi2 / (N - NPARAMS)). Inside the Ray rollup these run as actor-pool
stages (state: RNG + scratch), like every heavy feature.
"""

from __future__ import annotations

import numpy as np

from .base import Feature, register
from .kernel import Series


def _stretch_move_sample(
    ln_prob, x0: np.ndarray, lower: np.ndarray, upper: np.ndarray,
    nwalkers: int, niter: int, rng: np.random.Generator,
):
    """Goodman & Weare (2010) stretch-move ensemble sampler; returns the
    best-ln-prob position seen (point estimate, as the reference's
    McmcCurveFit does)."""
    ndim = x0.shape[0]
    span = (upper - lower) * 0.01
    walkers = x0[None, :] + span[None, :] * rng.standard_normal((nwalkers, ndim))
    walkers = np.clip(walkers, lower, upper)
    lp = np.array([ln_prob(w) for w in walkers])
    best_i = int(np.argmax(lp))
    best_x, best_lp = walkers[best_i].copy(), lp[best_i]
    a = 2.0
    half = nwalkers // 2
    for _ in range(niter):
        for first in (True, False):
            s = slice(0, half) if first else slice(half, nwalkers)
            o = slice(half, nwalkers) if first else slice(0, half)
            group = walkers[s]
            others = walkers[o]
            nw = group.shape[0]
            z = (1.0 + (a - 1.0) * rng.random(nw)) ** 2 / a
            partners = others[rng.integers(0, others.shape[0], nw)]
            proposal = partners + z[:, None] * (group - partners)
            inside = np.all((proposal >= lower) & (proposal <= upper), axis=1)
            lp_new = np.full(nw, -np.inf)
            for i in np.flatnonzero(inside):
                lp_new[i] = ln_prob(proposal[i])
            ln_accept = (ndim - 1.0) * np.log(z) + lp_new - lp[s]
            accept = np.log(rng.random(nw)) < ln_accept
            group[accept] = proposal[accept]
            lp_s = lp[s]
            lp_s[accept] = lp_new[accept]
            lp[s] = lp_s
            walkers[s] = group
            i_best = int(np.argmax(lp))
            if lp[i_best] > best_lp:
                best_lp = lp[i_best]
                best_x = walkers[i_best].copy()
    return best_x, best_lp


def _nelder_mead(f, x0, lower, upper, maxiter=300, scale=1e-2):
    """Tiny deterministic Nelder-Mead (minimization) with box clipping."""
    n = x0.shape[0]
    simplex = np.tile(x0, (n + 1, 1))
    step = scale * (upper - lower)
    for i in range(n):
        simplex[i + 1, i] = np.clip(x0[i] + step[i], lower[i], upper[i])
        if simplex[i + 1, i] == x0[i]:
            simplex[i + 1, i] = np.clip(x0[i] - step[i], lower[i], upper[i])
    fv = np.array([f(x) for x in simplex])
    for _ in range(maxiter):
        order = np.argsort(fv)
        simplex, fv = simplex[order], fv[order]
        if abs(fv[-1] - fv[0]) <= 1e-12 * (abs(fv[0]) + 1e-12):
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = np.clip(centroid + (centroid - simplex[-1]), lower, upper)
        fr = f(xr)
        if fr < fv[0]:
            xe = np.clip(centroid + 2.0 * (centroid - simplex[-1]), lower, upper)
            fe = f(xe)
            if fe < fr:
                simplex[-1], fv[-1] = xe, fe
            else:
                simplex[-1], fv[-1] = xr, fr
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = np.clip(centroid + 0.5 * (simplex[-1] - centroid), lower, upper)
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:
                simplex[1:] = simplex[0] + 0.5 * (simplex[1:] - simplex[0])
                fv[1:] = [f(x) for x in simplex[1:]]
    i = int(np.argmin(fv))
    return simplex[i], fv[i]


class _FitFeatureBase(Feature):
    """Shared machinery: normalize, sample, polish, denormalize."""

    NPARAMS: int = 0
    t_required = True
    m_required = True
    w_required = True
    sorting_required = True
    variability_required = True

    def __init__(self, niterations: int = 128, seed: int = 0, polish: bool = True):
        self.niterations = int(niterations)
        self.seed = int(seed)
        self.polish = bool(polish)

    def _params(self):
        return {
            "niterations": self.niterations,
            "seed": self.seed,
            "polish": self.polish,
        }

    # subclasses: model(t, params) vectorized over t; init/bounds from data
    def model(self, t: np.ndarray, p: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def init_and_bounds(self, s: Series):
        raise NotImplementedError

    def _eval(self, s: Series):
        t, m, w = s.t, s.m, s.w
        init, lower, upper = self.init_and_bounds(s)

        def chi2(p):
            r = self.model(t, p) - m
            return float(np.sum(w * r * r))

        def ln_prob(p):
            c = chi2(p)
            return -0.5 * c if np.isfinite(c) else -np.inf

        rng = np.random.default_rng(self.seed)
        best, _ = _stretch_move_sample(
            ln_prob, init, lower, upper, 4 * self.NPARAMS, self.niterations, rng
        )
        if self.polish:
            # multi-start polish: the sampler's best + the data-driven init
            # (the chi2 surface of these models has deceptive local basins)
            candidates = [best, init]
            best_c, best_v = None, np.inf
            for c in candidates:
                x, v = _nelder_mead(chi2, np.asarray(c, dtype=np.float64), lower, upper)
                x, v = _nelder_mead(chi2, x, lower, upper, scale=1e-3)
                if v < best_v:
                    best_c, best_v = x, v
            best = best_c
        rchi2 = chi2(best) / (s.n - self.NPARAMS)
        return np.r_[best, rchi2]


@register
class BazinFit(_FitFeatureBase):
    """f(t) = B + A * exp(-(t-t0)/tau_fall) / (1 + exp(-(t-t0)/tau_rise)) —
    /root/reference/src/features/bazin_fit.rs:165-217; init/bounds
    :362-391. Params: [A, B, t0, tau_rise, tau_fall]."""

    kind = "bazin_fit"
    NPARAMS = 5
    size = 6
    min_ts_length = 6

    @property
    def names(self):
        return [
            "bazin_fit_amplitude",
            "bazin_fit_baseline",
            "bazin_fit_reference_time",
            "bazin_fit_rise_time",
            "bazin_fit_fall_time",
            "bazin_fit_reduced_chi2",
        ]

    def model(self, t, p):
        a, b, t0, rise, fall = p
        minus_dt = t0 - t
        with np.errstate(over="ignore"):
            return b + a * np.exp(minus_dt / fall) / (np.exp(minus_dt / rise) + 1.0)

    def init_and_bounds(self, s: Series):
        t_min, t_max = s.minimum("t"), s.maximum("t")
        t_amp = t_max - t_min
        m_min, m_max = s.minimum(), s.maximum()
        m_amp = m_max - m_min
        t_peak = s.t_max_m()
        init = np.array([0.5 * m_amp, m_min, t_peak, 0.5 * t_amp, 0.5 * t_amp])
        lower = np.array(
            [0.0, m_min - 100.0 * m_amp, t_min - 10.0 * t_amp, 1e-4 * t_amp, 1e-4 * t_amp]
        )
        upper = np.array(
            [
                100.0 * m_amp,
                m_max + 100.0 * m_amp,
                t_max + 10.0 * t_amp,
                10.0 * t_amp,
                10.0 * t_amp,
            ]
        )
        return init, lower, upper


@register
class VillarFit(_FitFeatureBase):
    """Villar et al. 2019 supernova model (nu-parametrized) —
    /root/reference/src/features/villar_fit.rs:12-36, :440-467:

        f(t) = c + A * logistic(dt/tau_rise)
                     * (1 - nu*min(dt/gamma, 1))
                     * (1 if t <= t0+gamma else exp(-(t-t0-gamma)/tau_fall))

    Params: [A, c, t0, tau_rise, tau_fall, nu, gamma], nu in [0, 1)."""

    kind = "villar_fit"
    NPARAMS = 7
    size = 8
    min_ts_length = 8

    @property
    def names(self):
        return [
            "villar_fit_amplitude",
            "villar_fit_baseline",
            "villar_fit_reference_time",
            "villar_fit_rise_time",
            "villar_fit_fall_time",
            "villar_fit_plateau_rel_amplitude",
            "villar_fit_plateau_duration",
            "villar_fit_reduced_chi2",
        ]

    def model(self, t, p):
        a, c, t0, rise, fall, nu, gamma = p
        dt = t - t0
        with np.errstate(over="ignore"):
            rise_f = 1.0 / (1.0 + np.exp(-dt / rise))
            plateau = 1.0 - nu * np.minimum(dt / gamma, 1.0)
            fall_f = np.where(dt <= gamma, 1.0, np.exp(-(dt - gamma) / fall))
        return c + a * rise_f * plateau * fall_f

    def init_and_bounds(self, s: Series):
        t_min, t_max = s.minimum("t"), s.maximum("t")
        t_amp = t_max - t_min
        m_min, m_max = s.minimum(), s.maximum()
        m_amp = m_max - m_min
        t_peak = s.t_max_m()
        init = np.array(
            [m_amp, m_min, t_peak, 0.3 * t_amp, 0.3 * t_amp, 0.3, 0.1 * t_amp]
        )
        lower = np.array(
            [
                0.0,
                m_min - 100.0 * m_amp,
                t_min - 10.0 * t_amp,
                1e-4 * t_amp,
                1e-4 * t_amp,
                0.0,
                1e-4 * t_amp,
            ]
        )
        upper = np.array(
            [
                100.0 * m_amp,
                m_max + 100.0 * m_amp,
                t_max + 10.0 * t_amp,
                10.0 * t_amp,
                10.0 * t_amp,
                0.99,
                10.0 * t_amp,
            ]
        )
        return init, lower, upper


@register
class LinexpFit(_FitFeatureBase):
    """f(t) = B + A * dt * exp(-dt), dt = (t - t0)/tau —
    /root/reference/src/features/linexp_fit.rs:153-200.
    Params: [A, t0, tau, B]."""

    kind = "linexp_fit"
    NPARAMS = 4
    size = 5
    min_ts_length = 5

    @property
    def names(self):
        return [
            "linexp_fit_amplitude",
            "linexp_fit_reference_time",
            "linexp_fit_fall_time",
            "linexp_fit_baseline",
            "linexp_fit_reduced_chi2",
        ]

    def model(self, t, p):
        a, t0, tau, b = p
        dt = (t - t0) / tau
        with np.errstate(over="ignore"):
            return b + a * dt * np.exp(-dt)

    def init_and_bounds(self, s: Series):
        t_min, t_max = s.minimum("t"), s.maximum("t")
        t_amp = t_max - t_min
        m_min, m_max = s.minimum(), s.maximum()
        m_amp = m_max - m_min
        t_peak = s.t_max_m()
        init = np.array([m_amp, t_peak - 0.1 * t_amp, 0.5 * t_amp, m_min])
        lower = np.array(
            [0.0, t_min - 10.0 * t_amp, 1e-4 * t_amp, m_min - 100.0 * m_amp]
        )
        upper = np.array(
            [100.0 * m_amp, t_max + 10.0 * t_amp, 10.0 * t_amp, m_max + 100.0 * m_amp]
        )
        return init, lower, upper
