"""The folded sbf projection (apply_pamnet fold_sbf path: 1-layer sbf MLP
pushed through the triplet gather; auto-on when num_spherical*dim <= 128)
must be an exact reassociation of the unfolded table path — same params,
same batch, outputs equal to float tolerance — for both the RNA (one-hop +
two-hop at dim 16) and PAMNet_s shapes."""

import dataclasses

import numpy as np

import jax
import jax.flatten_util
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import (
    attach_basis,
    collate_structures,
    precompute_structure,
)
from pamnet_tpu.models import apply_pamnet, init_pamnet


def _rna_batch(rng, cfg, variant="full"):
    mols = [
        dict(
            z=rng.integers(0, 3, n := int(rng.integers(8, 14))).astype(np.int32),
            pos=(rng.random((n, 3)) * 6.0).astype(np.float32),
            y=float(rng.random()),
        )
        for _ in range(3)
    ]
    structs = [precompute_structure(m, "rna", cfg.cutoff_l, cfg.cutoff_g,
                                    variant) for m in mols]
    for s in structs:
        attach_basis(s, cfg.cutoff_l)
    return jax.tree.map(jnp.asarray, collate_structures(structs)), len(mols)


def _ab(cfg, gb):
    params = init_pamnet(jax.random.PRNGKey(0), cfg)
    fold = dataclasses.replace(cfg, fold_sbf=True)
    flat = dataclasses.replace(cfg, fold_sbf=False)
    a = np.asarray(jax.jit(apply_pamnet, static_argnums=2)(params, gb, fold))
    b = np.asarray(jax.jit(apply_pamnet, static_argnums=2)(params, gb, flat))
    return a, b


def test_folded_matches_unfolded_rna(rng):
    cfg = PAMNetConfig(dataset="rna_t", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    assert cfg.num_spherical * cfg.dim <= 128  # auto gate would fire too
    gb, n = _rna_batch(rng, cfg)
    a, b = _ab(cfg, gb)
    assert np.isfinite(a[:n]).all()
    np.testing.assert_allclose(a[:n], b[:n], rtol=2e-5, atol=2e-6)


def test_folded_matches_unfolded_s_variant(rng):
    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=2, cutoff_l=5.0,
                       cutoff_g=5.0, variant="s")
    mols = [
        dict(
            z=rng.integers(0, 5, n := int(rng.integers(6, 10))).astype(np.int32),
            pos=(rng.random((n, 3)) * 3.0).astype(np.float32),
            edge_index=np.stack([
                np.concatenate([np.arange(n - 1), np.arange(1, n)]),
                np.concatenate([np.arange(1, n), np.arange(n - 1)]),
            ]),
            y=float(rng.random()),
        )
        for _ in range(3)
    ]
    structs = [precompute_structure(m, "qm9", cfg.cutoff_l, cfg.cutoff_g, "s")
               for m in mols]
    for s in structs:
        attach_basis(s, cfg.cutoff_l)
    gb = jax.tree.map(jnp.asarray, collate_structures(structs))
    a, b = _ab(cfg, gb)
    np.testing.assert_allclose(a[:3], b[:3], rtol=2e-5, atol=2e-6)


def test_fused_matches_split_fold(rng):
    """fuse_sbf_gather=True (one concatenated lane-row gather per triplet)
    vs =False (separate projected-table and message gathers) must be an
    exact reassociation on the fold path."""
    cfg = PAMNetConfig(dataset="rna_t", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    gb, n = _rna_batch(rng, cfg)
    params = init_pamnet(jax.random.PRNGKey(1), cfg)
    split = dataclasses.replace(cfg, fold_sbf=True, fuse_sbf_gather=False)
    fused = dataclasses.replace(cfg, fold_sbf=True, fuse_sbf_gather=True)
    a = np.asarray(jax.jit(apply_pamnet, static_argnums=2)(params, gb, fused))
    b = np.asarray(jax.jit(apply_pamnet, static_argnums=2)(params, gb, split))
    np.testing.assert_allclose(a[:n], b[:n], rtol=2e-5, atol=2e-6)


def test_fold_gradients_match_unfolded(rng):
    """The fold/fuse path is live in small-dim TRAINING (RNA recipe:
    dim=16, no ELL tables when --no_ell_tables / device data): parameter
    gradients through the folded+fused forward must match the unfolded
    table path."""
    cfg = PAMNetConfig(dataset="rna_t", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    gb, n = _rna_batch(rng, cfg)
    params = init_pamnet(jax.random.PRNGKey(2), cfg)

    def loss(p, c):
        return apply_pamnet(p, gb, c)[:n].sum()

    gfold = jax.grad(loss)(params, dataclasses.replace(cfg, fold_sbf=True,
                                                       fuse_sbf_gather=True))
    gflat = jax.grad(loss)(params, dataclasses.replace(cfg, fold_sbf=False))
    flat_a, _ = jax.flatten_util.ravel_pytree(gfold)
    flat_b, _ = jax.flatten_util.ravel_pytree(gflat)
    scale = np.maximum(np.abs(np.asarray(flat_b)), 1e-3)
    np.testing.assert_allclose(np.asarray(flat_a) / scale,
                               np.asarray(flat_b) / scale,
                               rtol=0, atol=5e-4)


def test_auto_gate_off_with_ell_tables():
    """Training batches carry ELL triplet tables; auto-folding there would
    route mlp_sbf weight gradients through a plain triplet gather whose
    backward is a T-axis scatter-add (the op the ELL machinery removes), so
    the gate must be off — while inference batches (offsets only) and a
    forced cfg.fold_sbf=True still fold."""
    from pamnet_tpu.models.pamnet import _fold_gate

    cfg = PAMNetConfig(dataset="rna_t", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=12.0, flow="target_to_source")
    ell_tables = {"t1_jj": object(), "t1_jj_mask": object()}
    offsets_only = {"t1_ji_off": object()}
    assert not _fold_gate(cfg, ell_tables)
    assert _fold_gate(cfg, offsets_only)
    assert _fold_gate(cfg, None)
    assert _fold_gate(dataclasses.replace(cfg, fold_sbf=True), ell_tables)
    assert not _fold_gate(dataclasses.replace(cfg, fold_sbf=False), None)
    # dim 32 -> ns*dim = 224 > 128: never auto-folds regardless of tables.
    assert not _fold_gate(dataclasses.replace(cfg, dim=32), None)


def test_auto_gate_by_width():
    """dim=32 -> ns*dim = 224 > 128: auto must not fold (fold_sbf=None)."""
    cfg = PAMNetConfig(dataset="rna_t", dim=32, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    assert cfg.num_spherical * cfg.dim > 128
    assert cfg.fold_sbf is None
