"""Pallas TPU kernel for the fused triplet aggregation — the hot op of the
local message-passing layer (reference: local_message_passing.py:49-54,
SURVEY.md section 3.2):

    out[e, :] = sum_{t : seg[t] == e} a[idx[t], :] * b[t, :]

i.e. gather edge messages ``a`` at the triplet's neighbor edge, modulate by
the angular-basis message ``b``, and scatter-add onto the center edge.

Design (MXU-oriented): the gather and the scatter are both expressed as
one-hot matmuls so the systolic array does the data movement:

    per T-tile:  G = onehot(idx_tile) @ a        (BT,E)x(E,D) on MXU
                 P = G * b_tile                   VPU
                 out += onehot(seg_tile)^T @ P    (E,BT)x(BT,D) on MXU

The output block stays resident in VMEM across the (serial) TPU grid, so
accumulation needs no atomics.  Padded triplets must carry b == 0 (the model
masks them), so they contribute exact zeros wherever their indices point.

This layout holds the full ``a`` and ``out`` in VMEM and is therefore gated
to QM9-scale edge counts (E*D*8 bytes + 2*BT*E*4 bytes <~ 12 MB); larger
problems (RNA/PDBbind batches) fall back to the XLA gather + segment_sum
path, which is also the default (``use_pallas=None`` auto-selects).

The op is differentiable via a custom VJP:
    d_a = fused(g, b, seg, idx)   (role-swap of the same kernel)
    d_b = a[idx] * g[seg]         (two gathers, left to XLA)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pamnet_tpu.ops.segment import segment_sum

# VMEM gate: full a + out + two one-hot tiles must fit comfortably.
_MAX_VMEM_BYTES = 12 * 1024 * 1024
_BT = 256  # triplet-tile rows


def _kernel(idx_ref, seg_ref, a_ref, b_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    e = a_ref.shape[0]
    idx = idx_ref[:, 0]  # (BT,)
    seg = seg_ref[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (_BT, e), 1)
    onehot_idx = (idx[:, None] == cols).astype(jnp.float32)
    onehot_seg = (seg[:, None] == cols).astype(jnp.float32)
    # HIGHEST precision: the one-hot matmuls implement exact gathers/scatters,
    # so the data must not round to bf16 on the MXU.
    gathered = jnp.dot(
        onehot_idx, a_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    prod = gathered * b_ref[:]
    out_ref[:] += jnp.dot(
        onehot_seg.T, prod, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pallas_forward(a: jax.Array, b: jax.Array, idx: jax.Array, seg: jax.Array,
                    num_out: int, interpret: bool = False) -> jax.Array:
    t, d = b.shape
    assert t % _BT == 0, f"triplet count {t} must be a multiple of {_BT}"
    grid = (t // _BT,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_out, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_out, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_out, d), jnp.float32),
        interpret=interpret,
    )(idx[:, None].astype(jnp.int32), seg[:, None].astype(jnp.int32), a, b)


def _xla_forward(a, b, idx, seg, num_out):
    return segment_sum(a[idx] * b, seg, num_out)


def fits_pallas(num_edges: int, num_triplets: int, dim: int) -> bool:
    vmem = 2 * num_edges * dim * 4 + 2 * _BT * num_edges * 4 + _BT * dim * 4
    return (
        num_triplets % _BT == 0
        and dim % 128 == 0
        and vmem <= _MAX_VMEM_BYTES
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_triplet_aggregate(a, b, idx, seg, num_out, use_pallas=False,
                            interpret=False):
    """out[e] = sum_{t: seg[t]==e} a[idx[t]] * b[t]; shapes a (E,D), b (T,D),
    idx/seg (T,) -> (num_out, D).  ``use_pallas`` selects the MXU kernel."""
    if use_pallas:
        return _pallas_forward(a, b, idx, seg, num_out, interpret)
    return _xla_forward(a, b, idx, seg, num_out)


def _fwd(a, b, idx, seg, num_out, use_pallas, interpret):
    out = fused_triplet_aggregate(a, b, idx, seg, num_out, use_pallas, interpret)
    return out, (a, b, idx, seg)


def _bwd(num_out, use_pallas, interpret, res, g):
    a, b, idx, seg = res
    # d_a[e] = sum_{t: idx[t]==e} b[t] * g[seg[t]]  == same fused op, roles
    # swapped (gather from g at seg, scatter to idx).
    d_a = fused_triplet_aggregate(
        g, b, seg, idx, a.shape[0], use_pallas, interpret
    )
    d_b = a[idx] * g[seg]
    return d_a, d_b, None, None


fused_triplet_aggregate.defvjp(_fwd, _bwd)
