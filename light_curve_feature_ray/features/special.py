"""Special functions needed by feature evaluators (no scipy in this env).

- ``ln_erfc``: numerically-stable log of the complementary error function
  (analog of /root/reference/src/lnerfc.rs), used by AndersonDarlingNormal.
- ``gammainc_p`` / ``gammainc_q``: regularized incomplete gamma functions
  P(a, x), Q(a, x) via series / continued fraction (Numerical Recipes §6.2),
  used by Chi2Pvar.
"""

from __future__ import annotations

import math

import numpy as np

_SQRT_PI = math.sqrt(math.pi)


def _ln_erfc_scalar(x: float) -> float:
    if x < 8.0:
        # math.erfc is accurate down to ~1e-308; log is safe here
        return math.log(math.erfc(x))
    # asymptotic expansion: erfc(x) ~ exp(-x^2)/(x*sqrt(pi)) * S,
    # S = 1 - 1/(2x^2) + 3/(4x^4) - 15/(8x^6) + 105/(16 x^8) - ...
    inv2 = 1.0 / (x * x)
    s = 1.0
    term = 1.0
    for k in range(1, 9):
        term *= -(2 * k - 1) * 0.5 * inv2
        s += term
    return -x * x - math.log(x * _SQRT_PI) + math.log(s)


def ln_erfc(x):
    """Elementwise ln(erfc(x)), stable for large positive x."""
    xs = np.asarray(x, dtype=np.float64)
    if xs.ndim == 0:
        return _ln_erfc_scalar(float(xs))
    out = np.empty_like(xs)
    small = xs < 8.0
    # vectorized branch for the common range
    out[small] = np.log(np.vectorize(math.erfc)(xs[small])) if small.any() else 0.0
    big = ~small
    if big.any():
        xb = xs[big]
        inv2 = 1.0 / (xb * xb)
        s = np.ones_like(xb)
        term = np.ones_like(xb)
        for k in range(1, 9):
            term = term * (-(2 * k - 1) * 0.5 * inv2)
            s = s + term
        out[big] = -xb * xb - np.log(xb * _SQRT_PI) + np.log(s)
    return out


def _gser(a: float, x: float, itmax: int = 500, eps: float = 3e-14) -> float:
    """Series representation of P(a, x) (NR gser)."""
    ap = a
    summ = 1.0 / a
    delt = summ
    for _ in range(itmax):
        ap += 1.0
        delt *= x / ap
        summ += delt
        if abs(delt) < abs(summ) * eps:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf(a: float, x: float, itmax: int = 500, eps: float = 3e-14) -> float:
    """Continued-fraction representation of Q(a, x) (NR gcf)."""
    fpmin = 1e-300
    b = x + 1.0 - a
    c = 1.0 / fpmin
    d = 1.0 / b
    h = d
    for i in range(1, itmax + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < fpmin:
            d = fpmin
        c = b + an / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < eps:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0.0 or a <= 0.0:
        raise ValueError("invalid arguments to gammainc_p")
    if x == 0.0:
        return 0.0
    if x < a + 1.0:
        return _gser(a, x)
    return 1.0 - _gcf(a, x)


def gammainc_q(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0.0 or a <= 0.0:
        raise ValueError("invalid arguments to gammainc_q")
    if x == 0.0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gser(a, x)
    return _gcf(a, x)
