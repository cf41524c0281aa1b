"""End-to-end equivalence of the on-device graph-construction path
(PAMNetConfig.device_graph=True -> models/device_graph.py, wiring
ops/neighbors.py) against the host-precomputed production path: same
molecules, same params, outputs must match to float tolerance for every
dataset branch."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.models import apply_pamnet, init_pamnet
from pamnet_tpu.models.device_graph import structure_counts_device


def _mols_qm9(rng, n_mols=3):
    mols = []
    for _ in range(n_mols):
        n = int(rng.integers(5, 12))
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        mols.append(dict(
            z=rng.integers(0, 5, n).astype(np.int32),
            pos=(rng.random((n, 3)) * 3.0).astype(np.float32),
            edge_index=np.stack([src, dst]),
            y=float(rng.random()),
        ))
    return mols


def _mols_pdbbind(rng, n_mols=3):
    mols = []
    for _ in range(n_mols):
        n = int(rng.integers(8, 14))
        pos = (rng.random((n, 3)) * 4.0).astype(np.float32)
        pos[n // 2:] += np.float32([100.0, 0, 0])  # exercise the sign mask
        mols.append(dict(
            pos=pos,
            feat=rng.random((n, 18)).astype(np.float32),
            y=float(rng.random()),
        ))
    return mols


def _mols_rna(rng, n_mols=3):
    return [
        dict(
            z=rng.integers(0, 3, n := int(rng.integers(6, 12))).astype(np.int32),
            pos=(rng.random((n, 3)) * 6.0).astype(np.float32),
            y=float(rng.random()),
        )
        for _ in range(n_mols)
    ]


_CASES = {
    "qm9": (_mols_qm9, PAMNetConfig(dataset="QM9", dim=16, n_layer=2,
                                    cutoff_l=5.0, cutoff_g=5.0)),
    "pdbbind": (_mols_pdbbind, PAMNetConfig(dataset="PDBbind", dim=16,
                                            n_layer=2, cutoff_l=2.0,
                                            cutoff_g=6.0)),
    "rna": (_mols_rna, PAMNetConfig(dataset="rna_test", dim=16, n_layer=1,
                                    cutoff_l=2.6, cutoff_g=20.0,
                                    flow="target_to_source")),
}


@pytest.mark.parametrize("kind", list(_CASES))
def test_device_graph_matches_host_path(rng, kind):
    mols_fn, cfg = _CASES[kind]
    mols = mols_fn(rng)
    gb = build_graph_batch(mols, cfg.dataset_kind, cfg.cutoff_l, cfg.cutoff_g,
                           variant=cfg.variant)
    gb = jax.tree.map(jnp.asarray, gb)
    params = init_pamnet(jax.random.PRNGKey(0), cfg)

    host_out = np.asarray(jax.jit(apply_pamnet, static_argnums=2)(params, gb, cfg))
    cfg_dev = dataclasses.replace(cfg, device_graph=True)
    dev_out = np.asarray(jax.jit(apply_pamnet, static_argnums=2)(params, gb, cfg_dev))

    assert np.isfinite(dev_out[: len(mols)]).all()
    # Same edge/triplet SETS, different enumeration order -> identical up to
    # float summation order.
    np.testing.assert_allclose(dev_out[: len(mols)], host_out[: len(mols)],
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kind", list(_CASES))
def test_structure_counts_audit(rng, kind):
    """The jit-compatible count audit must match the host structure exactly
    (counts == number of valid host edges, all within the batch pads)."""
    mols_fn, cfg = _CASES[kind]
    mols = mols_fn(rng)
    gb = build_graph_batch(mols, cfg.dataset_kind, cfg.cutoff_l, cfg.cutoff_g,
                           variant=cfg.variant)
    counts = jax.jit(structure_counts_device, static_argnums=1)(
        jax.tree.map(jnp.asarray, gb), cfg
    )
    assert int(counts["eg"]) == int(np.asarray(gb.eg_mask).sum())
    assert int(counts["el"]) == int(np.asarray(gb.el_mask).sum())
    assert int(counts["eg"]) <= gb.eg_src.shape[0]
    assert int(counts["el"]) <= gb.el_src.shape[0]
