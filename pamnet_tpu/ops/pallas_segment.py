"""Pallas TPU kernels for gather / segment-sum as MXU one-hot matmuls.

Motivation (measured on v5e): XLA lowers scatter-add (``segment_sum``) to a
serialized update loop (~400 us for (23k,128)->(1k,128)), and the backward of
every gather is another scatter.  A one-hot matmul runs on the MXU instead,
but materializing the (E, N) one-hot in HBM makes XLA's version bandwidth
bound.  These kernels build the one-hot tiles *in VMEM on the fly*, so the
only HBM traffic is the data itself:

  gather_rows:     out[e, :] = x[idx[e], :]        (one-hot @ x per E-tile)
  segment_sum_mxu: out[n, :] = sum_{e: seg[e]==n} data[e, :]
                   (one-hot^T @ data per E-tile, output resident in VMEM)

The pair is closed under differentiation (gather's VJP is segment-sum with
the same indices and vice versa), so backward passes also run on the MXU.

Matmul precision: the one-hot operand is exactly representable, so
``Precision.HIGHEST`` keeps f32-exact results for the data operand.

VMEM gates: the full (N, D) table must fit on-chip alongside one
(BT, N) one-hot tile; callers use :func:`fits` (QM9-scale batches qualify;
RNA/PDBbind-scale fall back to XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 512
_MAX_VMEM_BYTES = 12 * 1024 * 1024


def fits(n_rows: int, dim: int) -> bool:
    """Whether the (n_rows, dim) resident table + one-hot tiles fit VMEM."""
    vmem = n_rows * dim * 4 + 2 * _BT * n_rows * 4 + 2 * _BT * dim * 4
    return dim % 128 == 0 and n_rows % 8 == 0 and vmem <= _MAX_VMEM_BYTES


def _gather_kernel(idx_ref, x_ref, out_ref):
    n = x_ref.shape[0]
    idx = idx_ref[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (_BT, n), 1)
    onehot = (idx[:, None] == cols).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        onehot, x_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _segment_kernel(seg_ref, data_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    n = out_ref.shape[0]
    seg = seg_ref[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (_BT, n), 1)
    onehot = (seg[:, None] == cols).astype(jnp.float32)
    out_ref[:] += jnp.dot(
        onehot.T, data_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather_pallas(x, idx):
    e = idx.shape[0]
    n, d = x.shape
    assert e % _BT == 0
    return pl.pallas_call(
        _gather_kernel,
        grid=(e // _BT,),
        in_specs=[
            pl.BlockSpec((_BT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BT, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), jnp.float32),
    )(idx[:, None].astype(jnp.int32), x)


def _segment_pallas(data, seg, num_segments):
    e, d = data.shape
    assert e % _BT == 0
    return pl.pallas_call(
        _segment_kernel,
        grid=(e // _BT,),
        in_specs=[
            pl.BlockSpec((_BT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_segments, d), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
    )(seg[:, None].astype(jnp.int32), data)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(x, idx, use_pallas=True):
    """out[e] = x[idx[e]]; MXU kernel when it fits, else plain XLA gather."""
    if use_pallas:
        return _gather_pallas(x, idx)
    return x[idx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_mxu(data, seg, num_segments, use_pallas=True):
    """Segment sum on the MXU (exact in f32)."""
    if use_pallas:
        return _segment_pallas(data, seg, num_segments)
    return jax.ops.segment_sum(data, seg, num_segments=num_segments)


def _gather_fwd(x, idx, use_pallas):
    return gather_rows(x, idx, use_pallas), (x.shape[0], idx)


def _gather_bwd(use_pallas, res, g):
    n, idx = res
    return segment_sum_mxu(g, idx, n, use_pallas), None


gather_rows.defvjp(_gather_fwd, _gather_bwd)


def _segment_fwd(data, seg, num_segments, use_pallas):
    return segment_sum_mxu(data, seg, num_segments, use_pallas), seg


def _segment_bwd(num_segments, use_pallas, seg, g):
    return gather_rows(g, seg, use_pallas), None


segment_sum_mxu.defvjp(_segment_fwd, _segment_bwd)
