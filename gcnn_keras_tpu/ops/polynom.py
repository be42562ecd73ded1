"""Spherical Bessel and Legendre polynomials (parity: ``kgcnn/ops/polynom.py``).

Used by the DimeNet++ spherical basis. Implemented with stable jit-friendly
recursions (static order ``n`` unrolled at trace time, no data-dependent
control flow).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _jl_series(x, l: int, terms: int = 10):
    """Taylor series j_l(x) = x^l/(2l+1)!! * sum_k (-x^2/2)^k / (k! (2l+3)(2l+5)...).

    Accurate (and float32-stable) for small x where the upward recursion
    suffers catastrophic cancellation.
    """
    x = jnp.asarray(x)
    x2h = -0.5 * x * x
    dfact = 1.0
    for m in range(1, 2 * l + 2, 2):
        dfact *= m
    acc = jnp.zeros_like(x)
    term = jnp.ones_like(x)
    for k in range(terms):
        if k > 0:
            term = term * x2h / (k * (2 * l + 1 + 2 * k))
        acc = acc + term
    return (x**l) / dfact * acc


def spherical_bessel_jn_all(x, n_max: int):
    """Stack [j_0(x) ... j_{n_max-1}(x)] along a trailing axis.

    Uses upward recursion for x above a per-order threshold and a Taylor
    series below it (upward recursion amplifies float32 rounding by
    ~prod (2k+1)/x when x << l).
    """
    x = jnp.asarray(x)
    xs = jnp.where(jnp.abs(x) < 1e-8, 1e-8, x)
    rec = []
    j0 = jnp.sin(xs) / xs
    rec.append(j0)
    if n_max > 1:
        j1 = jnp.sin(xs) / xs**2 - jnp.cos(xs) / xs
        rec.append(j1)
        jm, jc = j0, j1
        for k in range(1, n_max - 1):
            jn = (2 * k + 1) / xs * jc - jm
            jm, jc = jc, jn
            rec.append(jc)
    out = []
    for l in range(n_max):
        thresh = 1.0 + 0.75 * l
        out.append(jnp.where(jnp.abs(x) < thresh, _jl_series(xs, l), rec[l]))
    return jnp.stack(out, axis=-1)


def spherical_bessel_jn(x, n: int):
    """Spherical Bessel function of the first kind j_n(x) for static order n."""
    return spherical_bessel_jn_all(x, n + 1)[..., n]


def legendre_pn(x, n: int):
    """Legendre polynomial P_n(x) via Bonnet's recursion (static n)."""
    x = jnp.asarray(x)
    p0 = jnp.ones_like(x)
    if n == 0:
        return p0
    p1 = x
    for k in range(1, n):
        p2 = ((2 * k + 1) * x * p1 - k * p0) / (k + 1)
        p0, p1 = p1, p2
    return p1


def legendre_pn_all(x, n_max: int):
    """Stack [P_0(x) ... P_{n_max-1}(x)] along a trailing axis."""
    x = jnp.asarray(x)
    out = [jnp.ones_like(x)]
    if n_max > 1:
        out.append(x)
        for k in range(1, n_max - 1):
            p2 = ((2 * k + 1) * x * out[-1] - k * out[-2]) / (k + 1)
            out.append(p2)
    return jnp.stack(out, axis=-1)


def spherical_bessel_zeros(n: int, k: int) -> np.ndarray:
    """First ``k`` positive zeros of j_l for l = 0..n-1, shape (n, k).

    Computed on host with numpy (bisection from sign changes); used as static
    constants in the DimeNet spherical basis.
    """
    from scipy.special import spherical_jn  # scipy ships with the image

    zeros = np.zeros((n, k))
    # j_0 zeros are m*pi
    grid = np.arange(1, k + n + 2) * np.pi
    zeros_l = grid[:k].copy()
    zeros[0] = zeros_l
    points = grid
    for l in range(1, n):
        f = lambda x: spherical_jn(l, x)
        # zeros of j_l interlace those of j_{l-1}
        new_pts = []
        prev = points
        for i in range(len(prev) - 1):
            a, b = prev[i], prev[i + 1]
            fa, fb = f(a), f(b)
            if fa * fb > 0:
                continue
            for _ in range(80):
                m = 0.5 * (a + b)
                fm = f(m)
                if fa * fm <= 0:
                    b, fb = m, fm
                else:
                    a, fa = m, fm
            new_pts.append(0.5 * (a + b))
        points = np.asarray(new_pts)
        zeros[l] = points[:k]
    return zeros
