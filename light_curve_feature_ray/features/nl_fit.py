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
- a deterministic Nelder-Mead polish of the best sample, and a
  deterministic Levenberg-Marquardt trust-region least-squares solver
  (``algorithm={"name": "lsq"}``, aliases 'lmsder'/'ceres') standing in for
  the reference's feature-gated native LMSDER/Ceres optimizers
  (/root/reference/src/nl_fit/lmsder.rs, curve_fit.rs:41-52) — usable
  standalone or as the MCMC/NUTS ``fine_tuning`` algorithm.

Implemented models: BazinFit (/root/reference/src/features/bazin_fit.rs),
VillarFit (villar_fit.rs) and LinexpFit (linexp_fit.rs). Output =
parameters in original units + reduced chi2 (chi2 / (N - NPARAMS)).
Optional ln-priors over external parameters (prior/ln_prior_1d.rs
families) and a CurveFitAlgorithm-style config surface with two samplers:
'mcmc' (seeded stretch-move ensemble) and 'nuts' (No-U-Turn HMC with
dual-averaged step size; gradients by central differences — the honest
dependency-free stand-in for the reference's analytic model derivatives,
nuts.rs:150-170). Inside the Ray rollup these run as actor-pool stages
(state: RNG + scratch), like every heavy feature.
"""

from __future__ import annotations

import numpy as np

from .base import Feature, register
from .kernel import Series

_LN_TAU = float(np.log(2.0 * np.pi))


def ln_prior_1d_fn(spec):
    """Build a 1-D ln-prior callable from a JSON-able spec — the families of
    /root/reference/src/nl_fit/prior/ln_prior_1d.rs:25-60:

    ``none`` | ``normal(mu, std)`` | ``log_normal(mu, std)`` |
    ``uniform(left, right)`` | ``log_uniform(left, right)`` |
    ``mix([[weight, spec], ...])`` (weights normalized by their sum).
    """
    if isinstance(spec, str):
        spec = {"name": spec}
    name = spec["name"]
    if name == "none":
        return lambda x: 0.0
    if name == "normal":
        mu, std = float(spec["mu"]), float(spec["std"])
        coeff = -np.log(std) - 0.5 * _LN_TAU
        inv2 = std**-2
        return lambda x: coeff - 0.5 * (x - mu) ** 2 * inv2
    if name == "log_normal":
        # ln_prob_coeff - (mu - ln x)^2/(2 std^2) - ln x  (ln_prior_1d.rs:116-134)
        mu, std = float(spec["mu"]), float(spec["std"])
        coeff = -np.log(std) - 0.5 * _LN_TAU
        inv2 = std**-2

        def f(x):
            if x <= 0.0:
                return -np.inf
            lnx = np.log(x)
            return coeff - 0.5 * (mu - lnx) ** 2 * inv2 - lnx

        return f
    if name == "uniform":
        left, right = float(spec["left"]), float(spec["right"])
        coeff = -np.log(right - left)
        return lambda x: coeff if left <= x <= right else -np.inf
    if name == "log_uniform":
        # p(x) = 1/(x * ln(right/left)) inside [left, right] (ln_prior_1d.rs:185-215)
        left, right = float(spec["left"]), float(spec["right"])
        ln_l, ln_r = np.log(left), np.log(right)
        coeff = -np.log(ln_r - ln_l)

        def f(x):
            if x <= 0.0:
                return -np.inf
            lnx = np.log(x)
            return coeff - lnx if ln_l <= lnx <= ln_r else -np.inf

        return f
    if name == "mix":
        pairs = [(float(w), ln_prior_1d_fn(sub)) for w, sub in spec["pairs"]]
        total = sum(w for w, _ in pairs)
        pairs = [(w / total, f) for w, f in pairs]

        def f(x):
            p = sum(w * np.exp(g(x)) for w, g in pairs)
            return float(np.log(p)) if p > 0.0 else -np.inf

        return f
    raise ValueError(f"unknown ln_prior family {name!r}")


def ln_prior_fn(spec, nparams: int):
    """N-dim prior over EXTERNAL parameters — ``none`` or
    ``ind_components`` (one 1-D prior per parameter,
    /root/reference/src/nl_fit/prior/ln_prior.rs:40-63)."""
    if spec is None or spec == "none":
        return None
    if isinstance(spec, (list, tuple)):
        spec = {"name": "ind_components", "components": list(spec)}
    if spec["name"] == "none":
        return None
    if spec["name"] == "ind_components":
        comps = [ln_prior_1d_fn(c) for c in spec["components"]]
        if len(comps) != nparams:
            # explicit raise: under -O an assert would vanish and zip()
            # would silently truncate the prior to the first components
            raise ValueError(
                f"ln_prior needs {nparams} components, got {len(comps)}"
            )

        def f(x):
            return sum(g(v) for g, v in zip(comps, x))

        return f
    raise ValueError(f"unknown ln_prior {spec!r}")


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


def _nuts_sample(
    ln_prob_grad,
    x0: np.ndarray,
    lower: np.ndarray,
    upper: np.ndarray,
    num_tune: int,
    num_draws: int,
    rng: np.random.Generator,
    max_depth: int = 6,
    target_accept: float = 0.8,
):
    """No-U-Turn Sampler (Hoffman & Gelman 2014, the Alg. 3 tree with
    dual-averaged step size during tuning; unit diagonal metric).

    ``ln_prob_grad(x) -> (lp, grad)``; positions outside the box get
    lp = -inf and are never accepted, mirroring the reference's bounds
    check in its logp (nuts.rs:131-138). Deterministic for a given rng.
    Returns the best-lp position seen across tune + draw phases — the
    reference's maximum-likelihood point-estimate semantics (nuts.rs
    doc: "chooses the guess corresponding to the minimum sum of squared
    deviations")."""
    ndim = x0.shape[0]

    def leapfrog(x, r, grad, eps):
        r1 = r + 0.5 * eps * grad
        x1 = x + eps * r1
        lp1, g1 = ln_prob_grad(x1)
        r1 = r1 + 0.5 * eps * g1
        return x1, r1, lp1, g1

    x = x0.copy()
    lp, grad = ln_prob_grad(x)
    best_x, best_lp = x.copy(), lp
    eps = 0.1
    # dual averaging state (Alg. 6 constants)
    mu = np.log(10.0 * eps)
    log_eps_bar, h_bar = 0.0, 0.0
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def build_tree(x, r, g, logu, v, depth, eps, joint0):
        # returns (x-, r-, g-, x+, r+, g+, x', n', s', alpha, n_alpha)
        nonlocal best_x, best_lp
        if depth == 0:
            x1, r1, lp1, g1 = leapfrog(x, r, g, v * eps)
            joint = lp1 - 0.5 * float(r1 @ r1)
            n1 = int(logu <= joint)
            s1 = int(logu < joint + 1000.0)
            if lp1 > best_lp:
                best_lp, best_x = lp1, x1.copy()
            alpha = min(1.0, np.exp(joint - joint0)) if np.isfinite(joint) else 0.0
            return x1, r1, g1, x1, r1, g1, x1, lp1, n1, s1, alpha, 1
        xm, rm, gm, xp, rp, gp, x1, lp1, n1, s1, a1, na1 = build_tree(
            x, r, g, logu, v, depth - 1, eps, joint0
        )
        if s1:
            if v == -1:
                xm, rm, gm, _, _, _, x2, lp2, n2, s2, a2, na2 = build_tree(
                    xm, rm, gm, logu, v, depth - 1, eps, joint0
                )
            else:
                _, _, _, xp, rp, gp, x2, lp2, n2, s2, a2, na2 = build_tree(
                    xp, rp, gp, logu, v, depth - 1, eps, joint0
                )
            if n1 + n2 > 0 and rng.random() < n2 / (n1 + n2):
                x1, lp1 = x2, lp2
            dx = xp - xm
            s1 = s2 * int(dx @ rm >= 0) * int(dx @ rp >= 0)
            n1 += n2
            a1 += a2
            na1 += na2
        return xm, rm, gm, xp, rp, gp, x1, lp1, n1, s1, a1, na1

    total = num_tune + num_draws
    for it in range(total):
        if it == num_tune:
            # install the dual-averaged step BEFORE the first draw
            # (Hoffman & Gelman Alg. 6: eps = exp(log_eps_bar) for every
            # post-warmup iteration)
            eps = float(np.exp(log_eps_bar))
        r0 = rng.standard_normal(ndim)
        joint0 = lp - 0.5 * float(r0 @ r0)
        if not np.isfinite(joint0):
            # re-anchor at the best point if we got stuck at -inf
            x = best_x.copy()
            lp, grad = ln_prob_grad(x)
            continue
        logu = joint0 + np.log(rng.random())
        xm = xp = x
        rm = rp = r0
        gm = gp = grad
        depth, n, s = 0, 1, 1
        alpha, n_alpha = 0.0, 1
        x_new, lp_new = x, lp
        while s and depth < max_depth:
            v = 1 if rng.random() < 0.5 else -1
            if v == -1:
                xm, rm, gm, _, _, _, x1, lp1, n1, s1, a1, na1 = build_tree(
                    xm, rm, gm, logu, v, depth, eps, joint0
                )
            else:
                _, _, _, xp, rp, gp, x1, lp1, n1, s1, a1, na1 = build_tree(
                    xp, rp, gp, logu, v, depth, eps, joint0
                )
            if s1 and rng.random() < min(1.0, n1 / max(n, 1)):
                x_new, lp_new = x1, lp1
            n += n1
            alpha, n_alpha = a1, na1
            dx = xp - xm
            s = s1 * int(dx @ rm >= 0) * int(dx @ rp >= 0)
            depth += 1
        x, lp = x_new, lp_new
        _, grad = ln_prob_grad(x)
        if it < num_tune:
            # dual averaging toward the target acceptance statistic
            m = it + 1
            h_bar = (1 - 1 / (m + t0)) * h_bar + (
                target_accept - alpha / max(n_alpha, 1)
            ) / (m + t0)
            log_eps = mu - np.sqrt(m) / gamma * h_bar
            w = m ** (-kappa)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
            eps = float(np.exp(log_eps))
    return best_x, best_lp


def _numeric_grad(f, x, lower, upper, rel=1e-6):
    """Central-difference gradient clipped to the box (the reference uses
    analytic model derivatives; numeric differences are the honest
    dependency-free stand-in and are exact enough for HMC guidance)."""
    g = np.zeros_like(x)
    for i in range(x.shape[0]):
        h = rel * max(abs(x[i]), 1e-3)
        hi = min(x[i] + h, upper[i])
        lo = max(x[i] - h, lower[i])
        if hi <= lo:
            continue
        xp = x.copy()
        xp[i] = hi
        xm = x.copy()
        xm[i] = lo
        g[i] = (f(xp) - f(xm)) / (hi - lo)
    return g


def _lm_least_squares(resid, x0, lower, upper, maxiter=30, ftol=1e-12):
    """Deterministic Levenberg-Marquardt trust-region least squares with
    Marquardt diagonal scaling and box projection — the dependency-free
    analog of the reference's feature-gated LMSDER (GSL ``lmsder``) and
    Ceres solvers (/root/reference/src/nl_fit/lmsder.rs,
    curve_fit.rs:41-52). ``resid(x) -> np.ndarray`` of weighted residuals;
    minimizes ``sum(resid**2)``. The Jacobian is central-difference
    (the reference uses analytic model derivatives; numeric differences
    are the honest stand-in, as with NUTS). Steps solve
    ``(J'J + lam*diag(J'J)) dx = -J'r`` and trial points are projected
    into the bounds box. Fully deterministic: no RNG anywhere."""
    x = np.clip(np.asarray(x0, dtype=np.float64), lower, upper)
    r = resid(x)
    cost = float(r @ r)
    if not np.isfinite(cost):
        return x, cost
    n = x.shape[0]
    lam = 1e-3
    for _ in range(maxiter):
        jac = np.empty((r.shape[0], n))
        for i in range(n):
            h = 1e-6 * max(abs(x[i]), 1e-3)
            hi = min(x[i] + h, upper[i])
            lo = max(x[i] - h, lower[i])
            if hi <= lo:
                jac[:, i] = 0.0
                continue
            xp = x.copy()
            xp[i] = hi
            xm = x.copy()
            xm[i] = lo
            jac[:, i] = (resid(xp) - resid(xm)) / (hi - lo)
        jtj = jac.T @ jac
        jtr = jac.T @ r
        d = np.diag(jtj).copy()
        d[d <= 0.0] = 1.0  # flat/frozen directions still get damping
        rel = 0.0
        improved = False
        for _ in range(16):
            try:
                step = np.linalg.solve(jtj + lam * np.diag(d), -jtr)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            x_new = np.clip(x + step, lower, upper)
            r_new = resid(x_new)
            c_new = float(r_new @ r_new)
            if np.isfinite(c_new) and c_new < cost:
                rel = (cost - c_new) / max(cost, 1e-300)
                x, r, cost = x_new, r_new, c_new
                lam = max(lam * 0.25, 1e-12)
                improved = True
                break
            lam *= 10.0
        if not improved or rel < ftol:
            break
    return x, cost


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
    """Shared machinery: normalize, sample, polish, denormalize.

    Data is normalized to zero-mean/unit-std t and m before fitting
    (reference ``NormalizedData``, /root/reference/src/nl_fit/data.rs:16-76;
    weights scale by m_std^2 since w = 1/sigma_m^2), the sampler and polish
    run in normalized space, and parameters are mapped back to original
    units via each model's parameter kinds (``PARAM_KINDS``) — the analog
    of the reference's internal/dimensionless/external spaces
    (/root/reference/src/nl_fit/mod.rs:9-67).

    The algorithm surface mirrors ``CurveFitAlgorithm``
    (/root/reference/src/nl_fit/curve_fit.rs:41-52): config
    ``{"name": "mcmc", "niterations": N, "fine_tuning": bool|'lsq'}`` —
    'mcmc' is the seeded stretch-move ensemble; fine_tuning True runs the
    deterministic Nelder-Mead polish, fine_tuning='lsq' runs the
    Levenberg-Marquardt fine-tuner (the reference's
    fine_tuning_algorithm=LMSDER). ``{"name": "lsq", "niterations": N}``
    (aliases 'lmsder'/'ceres') is the standalone deterministic trust-region
    least squares replacing the reference's feature-gated native solvers.

    ``ln_prior`` is an optional prior over EXTERNAL parameters
    (reference priors apply to external params via transformation,
    /root/reference/src/nl_fit/prior/ln_prior.rs:67-110).
    """

    NPARAMS: int = 0
    #: per-parameter unit kind: 'm' (scales with m_std), 'm+mean',
    #: 't' (scales with t_std), 't+mean', 'u' (unitless)
    PARAM_KINDS: tuple = ()
    t_required = True
    m_required = True
    w_required = True
    sorting_required = True
    variability_required = True

    def __init__(
        self,
        niterations: int = 128,
        seed: int = 0,
        polish: bool = True,
        algorithm: dict | None = None,
        ln_prior=None,
    ):
        self.algorithm_name = "mcmc"
        # NUTS defaults mirror the reference (nuts.rs:44-53)
        self.num_tune, self.num_draws = 200, 200
        self.lsq_niterations = 30
        if algorithm is not None:
            name = algorithm.get("name", "mcmc")
            if name == "mcmc":
                niterations = int(algorithm.get("niterations", niterations))
                polish = algorithm.get("fine_tuning", polish)
            elif name == "nuts":
                self.algorithm_name = "nuts"
                self.num_tune = int(algorithm.get("num_tune", 200))
                self.num_draws = int(algorithm.get("num_draws", 200))
                # reference default fine_tuning_algorithm = None
                polish = algorithm.get("fine_tuning", False)
            elif name in ("lsq", "lmsder", "ceres"):
                # standalone deterministic least squares — the reference's
                # LmsderCurveFit / CeresCurveFit (curve_fit.rs:41-52); both
                # native backends map to the same pure-Python LM here. Pure
                # least squares: ln_prior is ignored, as in the reference's
                # LMSDER. No fine_tuning field (it IS the fine-tuner).
                self.algorithm_name = "lsq"
                self.lsq_niterations = int(algorithm.get("niterations", 30))
                polish = False
            else:
                raise NotImplementedError(
                    f"curve-fit algorithm {name!r} is unknown — use "
                    "'mcmc', 'nuts' or 'lsq' (aliases 'lmsder'/'ceres')"
                )
        self.niterations = int(niterations)
        self.seed = int(seed)
        # polish: False | True (Nelder-Mead) | 'lsq' (LM fine-tuning, the
        # reference's fine_tuning_algorithm=LMSDER semantics)
        if polish not in (False, True, "lsq", "lmsder", "ceres"):
            raise ValueError(f"fine_tuning must be bool or 'lsq', got {polish!r}")
        self.polish = "lsq" if polish in ("lsq", "lmsder", "ceres") else bool(polish)
        self.ln_prior_spec = ln_prior
        self._ln_prior = ln_prior_fn(ln_prior, self.NPARAMS)

    def _params(self):
        if self.algorithm_name == "lsq":
            algorithm = {"name": "lsq", "niterations": self.lsq_niterations}
        elif self.algorithm_name == "nuts":
            algorithm = {
                "name": "nuts",
                "num_tune": self.num_tune,
                "num_draws": self.num_draws,
                "fine_tuning": self.polish,
            }
        else:
            algorithm = {
                "name": "mcmc",
                "niterations": self.niterations,
                "fine_tuning": self.polish,
            }
        return {
            "algorithm": algorithm,
            "seed": self.seed,
            "ln_prior": self.ln_prior_spec,
        }

    # subclasses: model(t, params) vectorized over t; init/bounds from data
    def model(self, t: np.ndarray, p: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def init_and_bounds(self, s: Series):
        raise NotImplementedError

    def _denorm(self, p: np.ndarray, t_mean, t_std, m_mean, m_std) -> np.ndarray:
        out = np.asarray(p, dtype=np.float64).copy()
        for i, kind in enumerate(self.PARAM_KINDS):
            if kind == "m":
                out[i] *= m_std
            elif kind == "m+mean":
                out[i] = m_mean + out[i] * m_std
            elif kind == "t":
                out[i] *= t_std
            elif kind == "t+mean":
                out[i] = t_mean + out[i] * t_std
        return out

    def _eval(self, s: Series):
        assert len(self.PARAM_KINDS) == self.NPARAMS
        t_mean, m_mean = s.mean("t"), s.mean("m")
        t_std = s.std("t") or 1.0
        m_std = s.std("m") or 1.0
        tn = (s.t - t_mean) / t_std
        mn = (s.m - m_mean) / m_std
        wn = s.w * (m_std * m_std)
        sn = Series(tn, mn, wn, check=False)
        init, lower, upper = self.init_and_bounds(sn)

        def chi2(p):
            r = self.model(tn, p) - mn
            return float(np.sum(wn * r * r))

        prior = self._ln_prior
        norms = (t_mean, t_std, m_mean, m_std)

        def ln_prob(p):
            c = chi2(p)
            if not np.isfinite(c):
                return -np.inf
            lp = -0.5 * c
            if prior is not None:
                lp += prior(self._denorm(p, *norms))
            return lp

        def neg_ln_prob(p):
            return -ln_prob(p)

        sqrt_wn = np.sqrt(wn)

        def resid(p):
            return sqrt_wn * (self.model(tn, p) - mn)

        rng = np.random.default_rng(self.seed)
        if self.algorithm_name == "lsq":
            best, _ = _lm_least_squares(
                resid, init, lower, upper, self.lsq_niterations
            )
        elif self.algorithm_name == "nuts":

            def ln_prob_b(p):
                if np.any(p < lower) or np.any(p > upper):
                    return -np.inf
                return ln_prob(p)

            def ln_prob_grad(p):
                lp = ln_prob_b(p)
                if not np.isfinite(lp):
                    return lp, np.zeros_like(p)
                return lp, _numeric_grad(ln_prob_b, p, lower, upper)

            best, _ = _nuts_sample(
                ln_prob_grad, init, lower, upper,
                self.num_tune, self.num_draws, rng,
            )
        else:
            best, _ = _stretch_move_sample(
                ln_prob, init, lower, upper, 4 * self.NPARAMS,
                self.niterations, rng,
            )
        if self.polish:
            # multi-start polish: the sampler's best + the data-driven init
            # (the chi2 surface of these models has deceptive local basins).
            # polish == 'lsq' runs the deterministic LM fine-tuner (the
            # reference's fine_tuning_algorithm = LMSDER, pure least squares);
            # polish is True runs Nelder-Mead on the negative ln posterior so
            # priors keep their pull.
            candidates = [best, init]
            best_c, best_v = None, np.inf
            if self.polish == "lsq":
                for c in candidates:
                    x, v = _lm_least_squares(
                        resid, np.asarray(c, dtype=np.float64), lower, upper
                    )
                    if v < best_v:
                        best_c, best_v = x, v
            else:
                objective = chi2 if prior is None else neg_ln_prob
                for c in candidates:
                    x, v = _nelder_mead(
                        objective, np.asarray(c, dtype=np.float64), lower, upper
                    )
                    x, v = _nelder_mead(objective, x, lower, upper, scale=1e-3)
                    if v < best_v:
                        best_c, best_v = x, v
            if best_c is not None:
                # both candidates non-finite (e.g. overflowing exp at every
                # probed point): keep the sampler's best instead of None
                best = best_c
        # reduced chi2 is reported in ORIGINAL units (identical by
        # construction: wn * rn^2 == w * r^2), recomputed for exactness
        ext = self._denorm(best, *norms)
        r = self.model(s.t, ext) - s.m
        rchi2 = float(np.sum(s.w * r * r)) / (s.n - self.NPARAMS)
        return np.r_[ext, rchi2]


@register
class BazinFit(_FitFeatureBase):
    """f(t) = B + A * exp(-(t-t0)/tau_fall) / (1 + exp(-(t-t0)/tau_rise)) —
    /root/reference/src/features/bazin_fit.rs:165-217; init/bounds
    :362-391. Params: [A, B, t0, tau_rise, tau_fall]."""

    kind = "bazin_fit"
    NPARAMS = 5
    PARAM_KINDS = ("m", "m+mean", "t+mean", "t", "t")
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
    PARAM_KINDS = ("m", "m+mean", "t+mean", "t", "t", "u", "t")
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
    PARAM_KINDS = ("m", "t+mean", "t", "m+mean")
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
