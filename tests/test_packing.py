"""Lane-packing primitives: exact equivalence with the unpacked pipeline."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu import nn
from pamnet_tpu.ops.packing import (
    pack,
    pack_factor,
    pack_mask,
    packed_linear,
    unpack,
)


def test_pack_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    p = pack_factor(16)
    assert p == 8
    xp = pack(x, p)
    assert xp.shape == (8, 128)
    np.testing.assert_array_equal(np.asarray(unpack(xp, p)), np.asarray(x))


def test_packed_linear_matches_unpacked(rng):
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    p = pack_factor(16)
    want = np.asarray(x @ w + b)
    got = np.asarray(unpack(packed_linear(pack(x, p), w, b, p), p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_elementwise_chain(rng):
    """A mini edge pipeline (silu(x@w+b) * (e@v) * mask) packed == unpacked."""
    e = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    mask = jnp.asarray((rng.random(64) > 0.3).astype(np.float32))
    p = pack_factor(16)

    want = nn.silu(x @ w + b) * (e @ v) * mask[:, None]
    got = unpack(
        nn.silu(packed_linear(pack(x, p), w, b, p))
        * packed_linear(pack(e, p), v, None, p)
        * pack_mask(mask, 16, p),
        p,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pack_factor_wide_dim():
    assert pack_factor(128) == 1
    assert pack_factor(256) == 1  # wider than lanes: no packing
    assert pack_factor(32) == 4
