"""Lane packing for narrow feature dims (building block; see docs/DESIGN.md
section 4 and DEVNOTES.md round-2 roadmap).

TPU tiles the last array dimension to 128 lanes, so a (R, D) array with
D < 128 physically occupies R x 128 lanes — e.g. the RNA model's dim-16 edge
pipelines pay 8x HBM traffic on every elementwise pass.  Packing folds
P = 128 // D consecutive rows into one 128-lane row:

    pack:    (R, D) -> (R/P, P*D)     [row-major reshape]
    linear:  y_packed = x_packed @ kron(I_P, W)   (exact per-row W matmul)
    unpack:  (R/P, P*D) -> (R, D)

Elementwise chains (silu, multiplies, masked ops) run on the packed layout
at full lane utilization; gathers and segment reductions operate on the
unpacked layout (their indices address individual rows), so pack/unpack
passes sit at those boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_factor(dim: int, lanes: int = 128) -> int:
    """Rows per 128-lane row (1 = packing is a no-op)."""
    return max(lanes // dim, 1) if dim <= lanes else 1


def pack(x: jax.Array, p: int) -> jax.Array:
    """(R, D) -> (R/P, P*D); R must be a multiple of P (pad buckets are)."""
    r, d = x.shape
    assert r % p == 0, f"rows {r} not divisible by pack factor {p}"
    return x.reshape(r // p, p * d)


def unpack(x: jax.Array, p: int) -> jax.Array:
    """(R/P, P*D) -> (R, D)."""
    rp, pd = x.shape
    return x.reshape(rp * p, pd // p)


def packed_weight(w: jax.Array, p: int) -> jax.Array:
    """kron(I_P, W): block-diagonal weight so a packed row (P rows of D)
    multiplies by W per block.  (D_in, D_out) -> (P*D_in, P*D_out)."""
    d_in, d_out = w.shape
    eye = jnp.eye(p, dtype=w.dtype)
    return jnp.einsum("pq,io->piqo", eye, w).reshape(p * d_in, p * d_out)


def packed_linear(x_packed: jax.Array, w: jax.Array, b: jax.Array | None,
                  p: int) -> jax.Array:
    """Per-row linear on the packed layout: equals unpack -> x@w+b -> pack."""
    y = x_packed @ packed_weight(w, p)
    if b is not None:
        y = y + jnp.tile(b, p)
    return y


def pack_mask(mask: jax.Array, dim: int, p: int) -> jax.Array:
    """Per-row 0/1 mask -> packed per-lane mask (each row's bit repeated
    over its D lanes)."""
    r = mask.shape[0]
    return jnp.repeat(mask, dim).reshape(r // p, p * dim)
