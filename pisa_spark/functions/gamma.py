"""Regularized incomplete gamma functions (no scipy in the runtime).

Standard series / continued-fraction evaluation (Abramowitz & Stegun 6.5;
the same classical algorithms behind scipy.special.gammaincc), needed by
the Taily shard-selection model (reference include/pisa/taily_stats.hpp,
tools/taily_thresholds.cpp — the reference links the taily library, which
models per-term score distributions as Gamma(k, theta)).
"""

from __future__ import annotations

import math


def gammaincc(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = Γ(a,x)/Γ(a)."""
    if x < 0 or a <= 0:
        raise ValueError("require x >= 0, a > 0")
    if x == 0.0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_p_series(a, x)
    return _gamma_q_contfrac(a, x)


def _gamma_p_series(a: float, x: float) -> float:
    """P(a, x) by series expansion (converges fast for x < a+1)."""
    ap = a
    total = term = 1.0 / a
    for _ in range(500):
        ap += 1.0
        term *= x / ap
        total += term
        if abs(term) < abs(total) * 1e-15:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))

def _gamma_q_contfrac(a: float, x: float) -> float:
    """Q(a, x) by modified Lentz continued fraction (for x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def gamma_tail_count(any_count: float, k: float, theta: float,
                     score: float) -> float:
    """Expected number of docs scoring above `score` when `any_count` docs
    have scores ~ Gamma(k, theta) (the Taily tail estimate)."""
    if any_count <= 0 or k <= 0 or theta <= 0:
        return 0.0
    return any_count * gammaincc(k, score / theta)


def gamma_tail_inverse(any_count: float, k: float, theta: float,
                       n_c: float, hi: float | None = None) -> float:
    """Score s_c with any_count * Q(k, s_c/theta) == n_c (bisection on the
    monotone tail) — taily's global score cutoff for the n_c-th document.
    Returns 0 when fewer than n_c docs exist at any score."""
    if any_count <= n_c:
        return 0.0
    lo, hi_ = 0.0, hi if hi is not None else theta * (k + 1.0)
    while gamma_tail_count(any_count, k, theta, hi_) > n_c:
        hi_ *= 2.0
        if hi_ > 1e12:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi_)
        if gamma_tail_count(any_count, k, theta, mid) > n_c:
            lo = mid
        else:
            hi_ = mid
        if hi_ - lo < 1e-9 * max(1.0, hi_):
            break
    return 0.5 * (lo + hi_)
