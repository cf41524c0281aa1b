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


def test_model_lane_pack_equivalence(rng):
    """Full RNA-kind model: lane_pack on == off (values)."""
    import dataclasses

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.data.batch import build_graph_batch
    from pamnet_tpu.models import apply_pamnet, init_pamnet

    cfg = PAMNetConfig(dataset="rna_x", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=8.0, flow="target_to_source")
    mols = [
        dict(z=rng.integers(0, 3, 30).astype(np.int32),
             pos=(rng.random((30, 3)) * 8).astype(np.float32),
             y=float(rng.random()))
        for _ in range(2)
    ]
    gb = jax.tree.map(jnp.asarray, build_graph_batch(mols, "rna", 2.6, 8.0))
    params = init_pamnet(jax.random.PRNGKey(9), cfg)
    out_off = np.asarray(apply_pamnet(params, gb, cfg))
    cfg_on = dataclasses.replace(cfg, lane_pack=True)
    out_on = np.asarray(apply_pamnet(params, gb, cfg_on))
    np.testing.assert_allclose(out_on, out_off, rtol=2e-5, atol=1e-5)
