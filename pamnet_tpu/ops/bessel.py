"""Numeric (numpy, float64) build-time tables for spherical-Bessel bases.

The reference generates these symbolically with sympy + scipy at model
construction (reference: utils/sbf.py, layers/basic.py:89-105).  We instead
compute, once and cached:

* closed-form coefficient tables for the spherical Bessel functions
  j_l(x) = S_l(1/x) * sin(x) + C_l(1/x) * cos(x)  (integer-coefficient
  polynomials in u = 1/x, obtained from the standard upward recurrence
  j_{l+1}(x) = (2l+1)/x * j_l(x) - j_{l-1}(x)),
* the first k positive zeros z_{l,n} of j_l (bisection on interlaced
  brackets, same interlacing strategy as reference utils/sbf.py:14-26),
* the DimeNet-style normalizers 1/sqrt(0.5 * j_{l+1}(z_{l,n})^2)
  (reference: utils/sbf.py:41-49).

Everything here is host-side float64 numpy; the JAX evaluation lives in
``pamnet_tpu.ops.basis``.
"""

from __future__ import annotations

import functools

import numpy as np


def sph_jn_coeffs(lmax: int) -> tuple[np.ndarray, np.ndarray]:
    """Coefficient tables (S, C), each of shape (lmax+1, lmax+2).

    j_l(x) = sum_p S[l, p] * u**p * sin(x) + sum_p C[l, p] * u**p * cos(x)
    with u = 1/x.  Exact integer coefficients (stored as float64).
    """
    P = lmax + 2
    S = np.zeros((lmax + 1, P), dtype=np.float64)
    C = np.zeros((lmax + 1, P), dtype=np.float64)
    # j_0 = sin(x)/x
    S[0, 1] = 1.0
    if lmax >= 1:
        # j_1 = sin(x)/x^2 - cos(x)/x
        S[1, 2] = 1.0
        C[1, 1] = -1.0
    for l in range(1, lmax):
        # j_{l+1} = (2l+1) * u * j_l - j_{l-1}
        S[l + 1, 1:] = (2 * l + 1) * S[l, :-1]
        S[l + 1] -= S[l - 1]
        C[l + 1, 1:] = (2 * l + 1) * C[l, :-1]
        C[l + 1] -= C[l - 1]
    return S, C


def sph_jn(l: int, x: np.ndarray) -> np.ndarray:
    """Evaluate j_l(x) in float64 via the closed-form coefficient table."""
    S, C = sph_jn_coeffs(l)
    x = np.asarray(x, dtype=np.float64)
    u = 1.0 / x
    powers = u[..., None] ** np.arange(S.shape[1])
    return np.sin(x) * (powers @ S[l]) + np.cos(x) * (powers @ C[l])


def _bisect_zero(l: int, lo: float, hi: float, iters: int = 200) -> float:
    flo = sph_jn(l, np.array(lo))
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        fm = sph_jn(l, np.array(mid))
        if fm == 0.0:
            return mid
        if (flo < 0) == (fm < 0):
            lo, flo = mid, fm
        else:
            hi = mid
        if hi - lo < 1e-14 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)


@functools.lru_cache(maxsize=None)
def sph_jn_zeros(n: int, k: int) -> np.ndarray:
    """First k positive zeros of j_l for l = 0..n-1, shape (n, k).

    Uses the interlacing property: zeros of j_l lie strictly between
    consecutive zeros of j_{l-1} (same bracketing as reference
    utils/sbf.py:14-26, with bisection instead of scipy brentq).
    """
    zeros = np.zeros((n, k), dtype=np.float64)
    zeros[0] = np.arange(1, k + 1) * np.pi
    points = np.arange(1, k + n) * np.pi  # zeros of j_0 as initial brackets
    racines = np.zeros(k + n - 1, dtype=np.float64)
    for i in range(1, n):
        for j in range(k + n - 1 - i):
            racines[j] = _bisect_zero(i, points[j], points[j + 1])
        points = racines.copy()
        zeros[i, :k] = racines[:k]
    return zeros


@functools.lru_cache(maxsize=None)
def bessel_basis_tables(num_spherical: int, num_radial: int):
    """All constants needed to evaluate the normalized 2D spherical basis.

    Returns a dict of numpy arrays:
      ``zeros``  (ns, nr)  z_{l,n}: n-th zero of j_l
      ``norm``   (ns, nr)  1/sqrt(0.5 * j_{l+1}(z_{l,n})^2)
      ``S``, ``C`` (ns, ns+1) closed-form coefficients of j_l, l < ns
      ``sph_pref`` (ns,)   sqrt((2l+1)/(4*pi)) prefactors of Y_l0
    """
    zeros = sph_jn_zeros(num_spherical, num_radial)
    norm = np.zeros_like(zeros)
    for l in range(num_spherical):
        jl1 = sph_jn(l + 1, zeros[l])
        norm[l] = 1.0 / np.sqrt(0.5 * jl1**2)
    S, C = sph_jn_coeffs(num_spherical - 1)
    ls = np.arange(num_spherical, dtype=np.float64)
    sph_pref = np.sqrt((2.0 * ls + 1.0) / (4.0 * np.pi))
    return {
        "zeros": zeros,
        "norm": norm,
        "S": S,
        "C": C,
        "sph_pref": sph_pref,
    }
