"""Pallas fused triplet-aggregation kernel vs XLA reference (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pamnet_tpu.ops.pallas_triplet import (
    _BT,
    fits_pallas,
    fused_triplet_aggregate,
)


def _case(rng, e=256, t=2 * _BT, d=128):
    a = jnp.asarray(rng.standard_normal((e, d)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, t), jnp.int32)
    # sorted segments with a masked (zero) tail, like real batches
    seg = np.sort(rng.integers(0, e, t)).astype(np.int32)
    n_pad = t // 4
    b = b.at[-n_pad:].set(0.0)  # padded triplets carry zero values
    return a, b, jnp.asarray(seg), idx, e


def test_kernel_matches_xla(rng):
    a, b, seg, idx, e = _case(rng)
    want = np.asarray(fused_triplet_aggregate(a, b, idx, seg, e, False))
    got = np.asarray(
        fused_triplet_aggregate(a, b, idx, seg, e, True, True)  # interpret
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kernel_gradients_match(rng):
    a, b, seg, idx, e = _case(rng, e=128, t=_BT, d=128)

    def loss(variant):
        def f(a_, b_):
            out = fused_triplet_aggregate(a_, b_, idx, seg, e, variant, variant)
            return jnp.sum(out**2)

        return jax.grad(f, argnums=(0, 1))(a, b)

    da_x, db_x = loss(False)
    da_p, db_p = loss(True)
    np.testing.assert_allclose(np.asarray(da_p), np.asarray(da_x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_x), rtol=1e-3, atol=1e-3)


def test_fits_pallas_gate():
    assert fits_pallas(2048, 4096, 128)
    assert not fits_pallas(90000, 512000, 128)  # RNA-scale: VMEM overflow
    assert not fits_pallas(1024, 1000, 128)  # non-multiple of tile
