"""Parity against the REFERENCE PROGRAM ITSELF (VERDICT r3 next-round #1).

tests/refexec.py shims the reference's missing CUDA-wheel deps
(torch_scatter / torch_sparse / torch_cluster-via-PyG / PyG) in pure torch
and imports ``/root/reference/models.py`` unmodified; these tests then

* load the bundled ``pamnet_rna.pt`` into the reference PAMNet and check it
  reproduces the committed 21 GOLDEN scores (README.md:107-109 claim,
  executed through the reference's own forward at f64),
* export random-init pamnet_tpu params into the reference QM9 / PDBbind /
  RNA / PAMNet_s branches and check forward AND autograd-gradient parity
  against ``apply_pamnet`` / ``jax.grad``,
* check the reference's SparseTensor triplet/pair enumeration
  (models.py:68-98) emits the same index multiset as graphbuild's
  triplets_np/pairs_np.

Until now every parity claim was anchored to the repo's own f64 oracle
(tests/oracle_numpy.py); this closes the loop to the reference's own code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_available
from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset, synthetic_rna_dataset
from pamnet_tpu.models import apply_pamnet, init_pamnet

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.skipif(
        not reference_available(), reason="reference artifacts not mounted"
    ),
    pytest.mark.slow,
]


def _reference():
    from refexec import load_reference_models

    return load_reference_models()


def _ref_model(cfg: PAMNetConfig, sd_numpy: dict):
    """Build the reference PAMNet/PAMNet_s at f64 holding the given
    (numpy, torch-layout) state dict."""
    ref = _reference()
    rc = ref.Config(
        dataset=cfg.dataset, dim=cfg.dim, n_layer=cfg.n_layer,
        cutoff_l=cfg.cutoff_l, cutoff_g=cfg.cutoff_g, flow=cfg.flow,
    )
    model = (ref.PAMNet_s if cfg.variant == "s" else ref.PAMNet)(rc).double()
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)).double() for k, v in sd_numpy.items()}
    )
    return model


def _export_sd(params) -> dict:
    from pamnet_tpu.train.checkpoint import params_to_torch

    return params_to_torch(params)


def _jax_forward(params, mol, cfg) -> float:
    gb = build_graph_batch(
        [mol], cfg.dataset_kind, cfg.cutoff_l, cfg.cutoff_g, variant=cfg.variant
    )
    return float(apply_pamnet(params, jax.tree.map(jnp.asarray, gb), cfg)[0])


def _ref_forward(model, mol, kind) -> float:
    from refexec import mol_to_data

    with torch.no_grad():
        return float(model(mol_to_data(mol, kind)))


def _tol(want):
    return 1e-3 * max(1.0, abs(want))


# ---------------------------------------------------------------------------
# 1. The bundled checkpoint through the reference's own forward
# ---------------------------------------------------------------------------


def test_reference_reproduces_rna_golden():
    """pamnet_rna.pt + the reference PAMNet (f64) == the committed GOLDEN
    vector for all 21 bundled natives.  The goldens were computed by the
    repo's independent f64 oracle, so this cross-locks reference-code
    execution, the oracle, and (transitively, via test_rna_parity) the JAX
    model."""
    import os

    from conftest import REFERENCE_ROOT
    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.train.checkpoint import load_torch_state_dict
    from test_rna_parity import CFG, GOLDEN, _name

    sd = load_torch_state_dict(os.path.join(REFERENCE_ROOT, "save", "pamnet_rna.pt"))
    model = _ref_model(CFG, sd)
    ds = TUDataset(os.path.join(REFERENCE_ROOT, "data", "RNA-Puzzles"), "rna_native")
    mols = ds.molecules()
    assert len(mols) == 21
    deltas = {}
    for i, m in enumerate(mols):
        name = _name(ds.names[i])
        got = _ref_forward(model, m, "rna")
        deltas[name] = abs(got - GOLDEN[name])
    assert max(deltas.values()) < 1e-6, deltas


# ---------------------------------------------------------------------------
# 2. Random-init forward + gradient parity per dataset branch
# ---------------------------------------------------------------------------

QM9_CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=2)
QM9_S_CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=2, variant="s")
PDB_CFG = PAMNetConfig(dataset="PDBbind", dim=16, n_layer=2, cutoff_l=2.0, cutoff_g=6.0)
RNA_CFG = PAMNetConfig(
    dataset="rna_synth", dim=16, n_layer=2, cutoff_l=2.6, cutoff_g=20.0,
    flow="target_to_source",
)


def _pdbbind_mol(rng, n_per=10):
    base = rng.uniform(0.0, 6.0, size=(n_per, 3))
    pos = np.concatenate(
        [base, base + [100.0, 0, 0], base + [200.0, 0, 0]]
    ).astype(np.float32)
    feat = rng.normal(0, 1, size=(3 * n_per, 18)).astype(np.float32)
    return dict(pos=pos, feat=feat, y=rng.normal())


def _rna_mol(g):
    return dict(pos=g["attrs"], z=g["labels"].astype(np.int32), y=g["y"])


def _grad_parity(params, cfg, mol, rtol=2e-3):
    """jax.grad of apply_pamnet == torch autograd of the reference model, for
    every parameter tensor (compared in the torch key layout)."""
    from refexec import mol_to_data
    from pamnet_tpu.train.checkpoint import params_to_torch

    sd = _export_sd(params)
    model = _ref_model(cfg, sd)
    loss = model(mol_to_data(mol, cfg.dataset_kind)).sum()
    loss.backward()
    ref_grads = {
        k: p.grad.detach().numpy() for k, p in model.named_parameters()
        if p.grad is not None
    }

    gb = build_graph_batch(
        [mol], cfg.dataset_kind, cfg.cutoff_l, cfg.cutoff_g, variant=cfg.variant
    )
    gb = jax.tree.map(jnp.asarray, gb)
    grads = jax.grad(lambda p: apply_pamnet(p, gb, cfg).sum())(params)
    # params_to_torch only walks structure + transposes => maps grads correctly.
    got_grads = params_to_torch(grads)

    # Parameters unused by a branch (e.g. init_linear in the QM9 forward,
    # models.py:119 only) get grad=None in torch but exact zeros from
    # jax.grad; they must be zero on our side, all others must match.
    for key in set(got_grads) - set(ref_grads):
        assert float(np.abs(np.asarray(got_grads[key])).max()) == 0.0, key
    assert set(ref_grads) <= set(got_grads)
    for key, want in ref_grads.items():
        got = np.asarray(got_grads[key], np.float64)
        scale = float(np.abs(want).max())
        np.testing.assert_allclose(
            got, want, rtol=rtol, atol=rtol * max(scale, 1e-6),
            err_msg=f"grad mismatch at {key}",
        )


def test_reference_qm9_forward_and_grad():
    params = init_pamnet(jax.random.PRNGKey(31), QM9_CFG)
    model = _ref_model(QM9_CFG, _export_sd(params))
    mols = synthetic_qm9_dataset(4, seed=51)
    for mol in mols:
        got = _jax_forward(params, mol, QM9_CFG)
        want = _ref_forward(model, mol, "qm9")
        assert abs(got - want) < _tol(want), (got, want)
    _grad_parity(params, QM9_CFG, mols[0])


def test_reference_qm9_s_forward_and_grad():
    params = init_pamnet(jax.random.PRNGKey(32), QM9_S_CFG)
    model = _ref_model(QM9_S_CFG, _export_sd(params))
    mols = synthetic_qm9_dataset(4, seed=52)
    for mol in mols:
        got = _jax_forward(params, mol, QM9_S_CFG)
        want = _ref_forward(model, mol, "qm9")
        assert abs(got - want) < _tol(want), (got, want)
    _grad_parity(params, QM9_S_CFG, mols[0])


def test_reference_pdbbind_forward_and_grad():
    params = init_pamnet(jax.random.PRNGKey(33), PDB_CFG)
    model = _ref_model(PDB_CFG, _export_sd(params))
    rng = np.random.default_rng(53)
    mols = [_pdbbind_mol(rng) for _ in range(3)]
    for mol in mols:
        got = _jax_forward(params, mol, PDB_CFG)
        want = _ref_forward(model, mol, "pdbbind")
        assert abs(got - want) < _tol(want), (got, want)
    _grad_parity(params, PDB_CFG, mols[0])


def test_reference_rna_forward_and_grad():
    params = init_pamnet(jax.random.PRNGKey(34), RNA_CFG)
    model = _ref_model(RNA_CFG, _export_sd(params))
    mols = [_rna_mol(g) for g in synthetic_rna_dataset(3, seed=54)]
    for mol in mols:
        got = _jax_forward(params, mol, RNA_CFG)
        want = _ref_forward(model, mol, "rna")
        assert abs(got - want) < _tol(want), (got, want)
    _grad_parity(params, RNA_CFG, mols[0])


# ---------------------------------------------------------------------------
# 3. Triplet/pair index enumeration vs the reference's SparseTensor path
# ---------------------------------------------------------------------------


def _ref_indices(edge_index, num_nodes, variant):
    """Run the reference indices() (models.py:68-98 / 263-283) standalone."""
    ref = _reference()
    ei = torch.from_numpy(edge_index.astype(np.int64))
    if variant == "full":
        cls = ref.PAMNet
    else:
        cls = ref.PAMNet_s
    # indices() touches no parameters; call it unbound on a bare instance.
    out = cls.indices(object.__new__(cls), ei, num_nodes)
    return [o.numpy() for o in out]


def test_reference_indices_match_graphbuild():
    from pamnet_tpu.data import graphbuild

    rng = np.random.default_rng(77)
    for trial in range(5):
        n = int(rng.integers(4, 16))
        # Random directed edge list without self loops, unique pairs.
        dense = rng.random((n, n)) < 0.35
        np.fill_diagonal(dense, False)
        src, dst = np.nonzero(dense)
        if len(src) == 0:
            continue
        edge_index = np.stack([src, dst]).astype(np.int32)

        (idx_i, idx_j, idx_k, idx_kj, idx_ji,
         p_i, p_j1, p_j2, p_jj, p_ji) = _ref_indices(edge_index, n, "full")

        t2 = graphbuild.triplets_np(edge_index, n)
        t1 = graphbuild.pairs_np(edge_index, n)

        def key5(a, b, c, d, e):
            return set(zip(a.tolist(), b.tolist(), c.tolist(),
                           d.tolist(), e.tolist()))

        assert key5(idx_i, idx_j, idx_k, idx_kj, idx_ji) == key5(
            t2["idx_i"], t2["idx_j"], t2["idx_k"], t2["idx_kj"], t2["idx_ji"]
        )
        assert key5(p_i, p_j1, p_j2, p_jj, p_ji) == key5(
            t1["idx_i"], t1["idx_j1"], t1["idx_j2"], t1["idx_jj"], t1["idx_ji"]
        )

        # PAMNet_s.indices (models.py:263-283) = the pair half only.
        (s_i, s_j1, s_j2, s_jj, s_ji) = _ref_indices(edge_index, n, "s")
        assert key5(s_i, s_j1, s_j2, s_jj, s_ji) == key5(
            p_i, p_j1, p_j2, p_jj, p_ji
        )
