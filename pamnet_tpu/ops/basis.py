"""JAX evaluation of the physics basis functions (envelope, Bessel RBF,
spherical basis).

Semantics match the reference layers exactly (reference: layers/basic.py:36-116)
but are evaluated from precomputed closed-form coefficient tables
(``pamnet_tpu.ops.bessel``) instead of runtime-lambdified sympy expressions.

Masking convention: callers must sanitize padded distances *before* the basis
(e.g. set them to ``2 * cutoff``) so that the scaled coordinate x = d/cutoff
is >= 1 there; the smooth-cutoff envelope is exactly zero for x >= 1, which
zeroes every radial channel of padded entries.  The 1/x term in the envelope
and the 1/x^k terms of the Bessel closed forms are then always evaluated at
safely-positive arguments (reference never evaluates them at 0 either, since
self-loops are removed; see SURVEY.md hard part #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pamnet_tpu.ops.bessel import bessel_basis_tables


def envelope(x: jax.Array, exponent: int = 5) -> jax.Array:
    """Smooth cutoff polynomial u(x) = 1/x + a x^p + b x^(p+1) + c x^(p+2),
    zero for x >= 1 (reference: layers/basic.py:36-51)."""
    p = exponent
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2)
    c = -p * (p + 1) / 2.0
    x_pow_p0 = x**p
    x_pow_p1 = x_pow_p0 * x
    env_val = 1.0 / x + a * x_pow_p0 + b * x_pow_p1 + c * x_pow_p1 * x
    return jnp.where(x < 1.0, env_val, jnp.zeros_like(x))


def bessel_rbf(
    dist: jax.Array, freq: jax.Array, cutoff: float, exponent: int = 5
) -> jax.Array:
    """1D radial basis with trainable frequencies (reference:
    layers/basic.py:59-76): envelope(d/c) * sin(freq * d/c).

    Args:
      dist: (E,) distances; padded entries must be >= cutoff.
      freq: (num_radial,) trainable frequencies (init n*pi).
    Returns: (E, num_radial).
    """
    x = dist[..., None] / cutoff
    return envelope(x, exponent) * jnp.sin(freq * x)


def spherical_jn_all(arg: jax.Array, lmax: int) -> jax.Array:
    """Numerically stable j_l(arg) for l = 0..lmax, vectorized over ``arg``.

    Three regimes, selected elementwise (all branches NaN-free everywhere):

    * ``arg < 1``: 3-term ascending series around 0 (relative error < 1e-6
      for lmax <= 7).
    * ``1 <= arg < lmax + 2``: Miller downward recurrence (stable where the
      upward recurrence and the 1/x^k closed forms cancel catastrophically
      in float32 -- an accuracy improvement over the reference, whose
      lambdified closed forms lose ~3 digits here in f32).
    * ``arg >= lmax + 2``: closed form S_l(1/x) sin x + C_l(1/x) cos x
      (well-conditioned once arg exceeds the order).

    Returns: arg.shape + (lmax + 1,).
    """
    from pamnet_tpu.ops.bessel import sph_jn_coeffs

    dtype = arg.dtype
    safe = jnp.maximum(arg, jnp.asarray(1e-6, dtype))

    # --- ascending series (3 terms), for arg < 1 ---
    ls = np.arange(lmax + 1)
    dfact = np.array(
        [np.prod(np.arange(1, 2 * l + 2, 2, dtype=np.float64)) for l in ls]
    )  # (2l+1)!!
    x2 = (safe * safe)[..., None]
    c1 = 1.0 / (2.0 * (2.0 * ls + 3.0))
    c2 = 1.0 / (8.0 * (2.0 * ls + 3.0) * (2.0 * ls + 5.0))
    series = (
        safe[..., None] ** ls
        / jnp.asarray(dfact, dtype)
        * (1.0 - x2 * jnp.asarray(c1, dtype) + x2 * x2 * jnp.asarray(c2, dtype))
    )

    # --- Miller downward recurrence, for the midrange ---
    xm = jnp.clip(safe, 1.0, float(lmax + 2))
    L = lmax + 12
    jp = jnp.zeros_like(xm)
    jc = jnp.full_like(xm, 1e-8)
    down_cols = [None] * (lmax + 1)
    for l in range(L, -1, -1):
        if l <= lmax:
            down_cols[l] = jc
        jm = (2.0 * l + 1.0) / xm * jc - jp
        jp, jc = jc, jm
    down = jnp.stack(down_cols, axis=-1)
    # Normalize against whichever of j0/j1 is larger in magnitude (they have
    # no common zeros, so the chosen denominator is never near zero).
    j0t = jnp.sin(xm) / xm
    j1t = jnp.sin(xm) / (xm * xm) - jnp.cos(xm) / xm
    use0 = jnp.abs(j0t) >= jnp.abs(j1t)
    d0 = jnp.where(use0, down_cols[0], 1.0)
    d1 = jnp.where(use0, 1.0, down_cols[1] if lmax >= 1 else down_cols[0])
    scale = jnp.where(use0, j0t / d0, j1t / d1)
    down = down * scale[..., None]

    # --- closed form, for large arg ---
    S, C = sph_jn_coeffs(lmax)
    P = S.shape[1]
    u = 1.0 / safe
    powers = u[..., None] ** jnp.arange(P, dtype=dtype)
    closed = jnp.sin(safe)[..., None] * (powers @ jnp.asarray(S.T, dtype)) + jnp.cos(
        safe
    )[..., None] * (powers @ jnp.asarray(C.T, dtype))

    a = arg[..., None]
    return jnp.where(a < 1.0, series, jnp.where(a < float(lmax + 2), down, closed))


def spherical_basis_edge_rbf(
    dist: jax.Array,
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    exponent: int = 5,
) -> jax.Array:
    """Per-edge normalized spherical-Bessel radial table for the 2D basis.

    Computes env(x) * norm[l,n] * j_l(z[l,n] * x) for x = dist/cutoff
    (reference: layers/basic.py:107-110, formulas from utils/sbf.py:41-61),
    using the stable evaluator :func:`spherical_jn_all`.

    Returns: (E, num_spherical, num_radial).
    """
    t = bessel_basis_tables(num_spherical, num_radial)
    zeros = jnp.asarray(t["zeros"], dtype=dist.dtype)  # (ns, nr)
    norm = jnp.asarray(t["norm"], dtype=dist.dtype)  # (ns, nr)

    x = dist / cutoff  # (E,)
    arg = x[:, None, None] * zeros[None]  # (E, ns, nr)
    j_all = spherical_jn_all(arg, num_spherical - 1)  # (E, ns, nr, ns)
    # Channel (l, n) needs order l: take the diagonal over the basis axis.
    l_idx = jnp.arange(num_spherical)
    j = j_all[:, l_idx, :, l_idx]  # (ns, E, nr) -- advanced indexing moves axis
    j = jnp.moveaxis(j, 0, 1)  # (E, ns, nr)
    env = envelope(x, exponent)[:, None, None]
    return env * norm[None] * j


def legendre_cbf(angle: jax.Array, num_spherical: int) -> jax.Array:
    """Real spherical harmonics Y_l0(theta) = pref_l * P_l(cos theta) for
    l = 0..num_spherical-1 via the Legendre recurrence (reference:
    utils/sbf.py:69-91,94-139 generates the same polynomials symbolically).

    Returns: (T, num_spherical).
    """
    t = bessel_basis_tables(num_spherical, 1)
    pref = np.asarray(t["sph_pref"])
    c = jnp.cos(angle)
    polys = [jnp.ones_like(c)]
    if num_spherical > 1:
        polys.append(c)
    for l in range(2, num_spherical):
        polys.append(((2 * l - 1) * c * polys[l - 1] - (l - 1) * polys[l - 2]) / l)
    cbf = jnp.stack(polys, axis=-1)  # (T, ns)
    return cbf * jnp.asarray(pref, dtype=angle.dtype)


def spherical_basis(
    dist: jax.Array,
    angle: jax.Array,
    idx_edge: jax.Array,
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    exponent: int = 5,
) -> jax.Array:
    """Full 2D distance x angle basis (reference: layers/basic.py:107-116).

    Args:
      dist: (E,) local-edge distances (padded entries sanitized >= cutoff).
      angle: (T,) triplet angles.
      idx_edge: (T,) index of the *radial* edge for each triplet (gathers the
        per-edge rbf table; reference passes idx_kj / idx_jj_pair).
    Returns: (T, num_spherical * num_radial).
    """
    rbf = spherical_basis_edge_rbf(dist, num_spherical, num_radial, cutoff, exponent)
    cbf = legendre_cbf(angle, num_spherical)  # (T, ns)
    # Gather the flattened (E, ns*nr) table: gathering a (E, ns, nr) view
    # materializes (T, ns, nr) arrays whose minor dims tile-pad to (8, 128)
    # on TPU — a 24x memory blowup.
    rbf_flat = rbf.reshape(rbf.shape[0], num_spherical * num_radial)
    return rbf_flat[idx_edge] * jnp.repeat(cbf, num_radial, axis=1)
