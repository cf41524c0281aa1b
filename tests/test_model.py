"""Model property tests: physics invariances (rotation/translation), index
invariances (node permutation), and padding invariance (more padding must not
change outputs) — the property-test strategy from SURVEY.md section 4."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import PadSizes, build_graph_batch
from pamnet_tpu.models import apply_pamnet, count_parameters, init_pamnet


def _mols_qm9(rng, n_mols=3):
    mols = []
    for _ in range(n_mols):
        n = int(rng.integers(5, 12))
        pos = (rng.random((n, 3)) * 3.0).astype(np.float32)
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        mols.append(
            dict(
                z=rng.integers(0, 5, n).astype(np.int32),
                pos=pos,
                edge_index=np.stack([src, dst]),
                y=float(rng.random()),
            )
        )
    return mols


def _forward(cfg, mols, pads=None):
    gb = build_graph_batch(
        mols, cfg.dataset_kind, cfg.cutoff_l, cfg.cutoff_g, pads=pads,
        variant=cfg.variant,
    )
    params = init_pamnet(jax.random.PRNGKey(0), cfg)
    out = apply_pamnet(params, jax.tree.map(jnp.asarray, gb), cfg)
    return np.asarray(out)[: len(mols)], params


CFG_QM9 = PAMNetConfig(dataset="QM9", dim=16, n_layer=2, cutoff_l=5.0, cutoff_g=5.0)


def test_forward_runs_and_is_finite(rng):
    mols = _mols_qm9(rng)
    out, params = _forward(CFG_QM9, mols)
    assert out.shape == (3,)
    assert np.all(np.isfinite(out))
    # Parameter count comparable to reference scale (dim=16, 2 layers).
    assert count_parameters(params) > 10_000


def test_padding_invariance(rng):
    """Doubling every pad bucket must not change predictions (masks work)."""
    mols = _mols_qm9(rng)
    small = PadSizes(n=128, eg=1024, el=128, t2=256, t1=256, g=8)
    big = PadSizes(n=256, eg=2048, el=512, t2=1024, t1=1024, g=16)
    out1, _ = _forward(CFG_QM9, mols, pads=small)
    out2, _ = _forward(CFG_QM9, mols, pads=big)
    np.testing.assert_allclose(out1, out2, rtol=2e-5, atol=2e-6)


def test_rotation_translation_invariance(rng):
    """Distance/angle-only featurization => rigid-motion invariant
    (reference: models.py:62-66,164-177)."""
    mols = _mols_qm9(rng)
    out1, _ = _forward(CFG_QM9, mols)
    # Random rotation (QR of a Gaussian) + translation.
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    rotated = [
        {**m, "pos": (m["pos"] @ q.astype(np.float32) + np.float32([10, -5, 3]))}
        for m in mols
    ]
    out2, _ = _forward(CFG_QM9, rotated)
    np.testing.assert_allclose(out1, out2, rtol=1e-3, atol=1e-4)


def test_node_permutation_invariance(rng):
    mols = _mols_qm9(rng, n_mols=2)
    out1, _ = _forward(CFG_QM9, mols)
    permuted = []
    for m in mols:
        n = m["pos"].shape[0]
        perm = rng.permutation(n)
        inv = np.argsort(perm)
        permuted.append(
            dict(
                z=m["z"][perm],
                pos=m["pos"][perm],
                edge_index=inv[m["edge_index"]],
                y=m["y"],
            )
        )
    out2, _ = _forward(CFG_QM9, permuted)
    np.testing.assert_allclose(out1, out2, rtol=1e-3, atol=1e-4)


def test_rna_branch(rng):
    cfg = PAMNetConfig(
        dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6, cutoff_g=20.0,
        flow="target_to_source",
    )
    mols = [
        dict(
            z=rng.integers(0, 3, 40).astype(np.int32),
            pos=(rng.random((40, 3)) * 10).astype(np.float32),
            y=1.0,
        ),
        dict(
            z=rng.integers(0, 3, 25).astype(np.int32),
            pos=(rng.random((25, 3)) * 10).astype(np.float32),
            y=2.0,
        ),
    ]
    out, params = _forward(cfg, mols)
    assert out.shape == (2,) and np.all(np.isfinite(out))
    assert "init_linear" not in params  # RNA uses embeddings only


def test_pdbbind_branch_energy_difference(rng):
    cfg = PAMNetConfig(dataset="PDBbind", dim=16, n_layer=2, cutoff_l=2.0, cutoff_g=6.0)
    # Two identical subgraphs, one shifted past x=40: contributions cancel.
    n = 10
    pos_a = (rng.random((n, 3)) * 4).astype(np.float32)
    pos_b = pos_a + np.float32([100.0, 0, 0])  # x > 40 -> negative sign
    feat = rng.random((n, 18)).astype(np.float32)
    mol = dict(
        feat=np.concatenate([feat, feat]),
        pos=np.concatenate([pos_a, pos_b]),
        y=0.0,
    )
    out, _ = _forward(cfg, [mol])
    # E(copy at +x) cancels E(original): ~0 (exact up to float assoc.)
    np.testing.assert_allclose(out, 0.0, atol=1e-3)


def test_pamnet_s_variant(rng):
    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=2, variant="s")
    mols = _mols_qm9(rng)
    out, params = _forward(cfg, mols)
    assert out.shape == (3,) and np.all(np.isfinite(out))
    assert "mlp_sbf" in params and "mlp_sbf1" not in params
    assert "mlp_m_jj" in params["local_layers"][0]


def test_scan_layers_matches_unrolled(rng):
    import dataclasses

    mols = _mols_qm9(rng)
    cfg_unrolled = dataclasses.replace(CFG_QM9, n_layer=3)
    cfg_scan = dataclasses.replace(cfg_unrolled, scan_layers=True)
    gb = build_graph_batch(mols, "qm9", 5.0, 5.0)
    gb = jax.tree.map(jnp.asarray, gb)
    params = init_pamnet(jax.random.PRNGKey(5), cfg_unrolled)
    out_a = np.asarray(apply_pamnet(params, gb, cfg_unrolled))
    out_b = np.asarray(apply_pamnet(params, gb, cfg_scan))
    np.testing.assert_allclose(out_b, out_a, rtol=2e-5, atol=1e-5)

    def loss(p, cfg):
        return jnp.sum(jnp.abs(apply_pamnet(p, gb, cfg) - gb.y) * gb.graph_mask)

    ga = jax.grad(lambda p: loss(p, cfg_unrolled))(params)
    gs = jax.grad(lambda p: loss(p, cfg_scan))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_bfloat16_compute_close_to_f32(rng):
    import dataclasses

    mols = _mols_qm9(rng)
    out32, _ = _forward(CFG_QM9, mols)
    cfg16 = dataclasses.replace(CFG_QM9, compute_dtype="bfloat16")
    out16, _ = _forward(cfg16, mols)
    np.testing.assert_allclose(out16, out32, rtol=5e-2, atol=5e-2)


def test_gradients_finite(rng):
    mols = _mols_qm9(rng, n_mols=2)
    cfg = CFG_QM9
    gb = build_graph_batch(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g)
    gb = jax.tree.map(jnp.asarray, gb)
    params = init_pamnet(jax.random.PRNGKey(1), cfg)

    def loss(p):
        pred = apply_pamnet(p, gb, cfg)
        return jnp.sum(jnp.abs(pred - gb.y) * gb.graph_mask)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # Gradients reach every parameter family (embeddings, freqs, both plexes).
    assert float(jnp.abs(grads["embeddings"]).sum()) > 0
    assert float(jnp.abs(grads["rbf_g"]["freq"]).sum()) > 0
    assert float(jnp.abs(grads["rbf_l"]["freq"]).sum()) > 0
