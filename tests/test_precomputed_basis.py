"""Host-precomputed spherical basis == on-device evaluation (the float64
host path is the oracle; agreement bounds the device path's f32 error)."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import attach_basis, collate_structures, precompute_structure
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.models import apply_pamnet, init_pamnet

CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=2)


def _mols(rng, n_mols=3):
    out = []
    for _ in range(n_mols):
        n = int(rng.integers(6, 12))
        pos = (rng.random((n, 3)) * 3.0).astype(np.float32)
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        out.append(
            dict(z=rng.integers(0, 5, n).astype(np.int32), pos=pos,
                 edge_index=np.stack([src, dst]), y=float(n))
        )
    return out


def test_precomputed_basis_matches_device_eval(rng):
    mols = _mols(rng)
    structs = [precompute_structure(m, "qm9", 5.0, 5.0) for m in mols]
    gb_device = collate_structures(structs)
    for s in structs:
        attach_basis(s, 5.0)
    gb_host = collate_structures(structs)
    assert gb_host.sbf_radial is not None and gb_device.sbf_radial is None

    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    out_dev = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gb_device), CFG))
    out_host = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gb_host), CFG))
    np.testing.assert_allclose(out_host, out_dev, rtol=1e-3, atol=1e-4)


def test_loader_attaches_basis_by_default(rng):
    loader = GraphLoader(_mols(rng, 6), "qm9", 5.0, 5.0, batch_size=3)
    gb = next(iter(loader))
    assert gb.sbf_radial is not None
    assert gb.sbf_radial.shape == (loader.pads.el, 42)
    assert gb.cbf2.shape == (loader.pads.t2, 7)
    # Padded rows carry zeros.
    el_real = int(gb.el_mask.sum())
    assert np.all(gb.sbf_radial[el_real:] == 0)


def test_rna_parity_with_precomputed_basis(rng):
    """Precomputed-basis path on real RNA data matches the device path."""
    import os
    import pytest

    if not os.path.isdir("/root/reference/data"):
        pytest.skip("reference not mounted")
    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint

    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    ds = TUDataset("/root/reference/data/RNA-Puzzles", "rna_native")
    mols = ds.molecules()
    mol = mols[int(np.argmin([m["pos"].shape[0] for m in mols]))]
    params = load_torch_checkpoint("/root/reference/save/pamnet_rna.pt")

    s = precompute_structure(mol, "rna", 2.6, 20.0)
    out_dev = float(apply_pamnet(params, jax.tree.map(jnp.asarray, collate_structures([s])), cfg)[0])
    attach_basis(s, 2.6)
    out_host = float(apply_pamnet(params, jax.tree.map(jnp.asarray, collate_structures([s])), cfg)[0])
    assert abs(out_host - out_dev) < 2e-3, (out_host, out_dev)
