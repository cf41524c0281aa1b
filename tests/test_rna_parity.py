"""End-to-end parity: the bundled reference checkpoint ``pamnet_rna.pt``
scoring the bundled rna_native structures must match an independent float64
oracle (the only offline end-to-end oracle available; SURVEY.md section 4
strategy 2)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available
from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.data.tu import TUDataset
from pamnet_tpu.models import apply_pamnet
from pamnet_tpu.train.checkpoint import load_torch_checkpoint, load_torch_state_dict

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference artifacts not mounted"
)

CKPT = os.path.join(REFERENCE_ROOT, "save", "pamnet_rna.pt")
DATA = os.path.join(REFERENCE_ROOT, "data", "RNA-Puzzles")

CFG = PAMNetConfig(
    dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6, cutoff_g=20.0,
    flow="target_to_source",
)


@pytest.fixture(scope="module")
def rna_smallest():
    ds = TUDataset(DATA, "rna_native")
    mols = ds.molecules()
    order = np.argsort([m["pos"].shape[0] for m in mols])
    return [mols[i] for i in order[:2]]


def test_checkpoint_tree_matches_init():
    from pamnet_tpu.models import init_pamnet
    import jax.tree_util as jtu

    params = load_torch_checkpoint(CKPT)
    ref = init_pamnet(jax.random.PRNGKey(0), CFG)
    ka = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(params)}
    kb = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(ref)}
    assert ka == kb


def test_rna_scores_match_f64_oracle(rna_smallest):
    from oracle_numpy import rna_forward

    params = load_torch_checkpoint(CKPT)
    sd = load_torch_state_dict(CKPT)
    for mol in rna_smallest:
        gb = build_graph_batch([mol], "rna", CFG.cutoff_l, CFG.cutoff_g)
        got = float(apply_pamnet(params, jax.tree.map(jnp.asarray, gb), CFG)[0])
        want = rna_forward(sd, mol)
        assert abs(got - want) < 2e-3 * max(1.0, abs(want)), (got, want)
