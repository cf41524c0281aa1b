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


def spherical_basis_edge_rbf(
    dist: jax.Array,
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    exponent: int = 5,
) -> jax.Array:
    """Per-edge normalized spherical-Bessel radial table for the 2D basis.

    Computes env(x) * norm[l,n] * j_l(z[l,n] * x) for x = dist/cutoff
    (reference: layers/basic.py:107-110, formulas from utils/sbf.py:41-61).

    Returns: (E, num_spherical, num_radial).
    """
    t = bessel_basis_tables(num_spherical, num_radial)
    zeros = jnp.asarray(t["zeros"], dtype=dist.dtype)  # (ns, nr)
    norm = jnp.asarray(t["norm"], dtype=dist.dtype)  # (ns, nr)
    S = jnp.asarray(t["S"], dtype=dist.dtype)  # (ns, P)
    C = jnp.asarray(t["C"], dtype=dist.dtype)  # (ns, P)
    P = S.shape[1]

    x = dist / cutoff  # (E,)
    arg = x[:, None, None] * zeros[None]  # (E, ns, nr)
    u = 1.0 / arg
    powers = u[..., None] ** jnp.arange(P, dtype=dist.dtype)  # (E, ns, nr, P)
    j = jnp.sin(arg) * jnp.einsum("elrp,lp->elr", powers, S) + jnp.cos(
        arg
    ) * jnp.einsum("elrp,lp->elr", powers, C)
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
    out = rbf[idx_edge] * cbf[:, :, None]  # (T, ns, nr)
    return out.reshape(out.shape[0], num_spherical * num_radial)
