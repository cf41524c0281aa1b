"""End-to-end parity: the bundled reference checkpoint ``pamnet_rna.pt``
scoring ALL 21 bundled rna_native structures must match an independent
float64 oracle (the only offline end-to-end oracle available; SURVEY.md
section 4 strategy 2; reference reproduction claim README.md:107-109).

The oracle scores are committed as a golden vector (f64, computed by
``oracle_numpy.rna_forward``), so three independent implementations are
cross-locked: the committed golden, a live oracle recompute (guards
graphbuild/oracle drift), and the JAX model (guards model drift) — plus the
shipped inference CSV.
"""

import csv
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

pytestmark = [
    pytest.mark.skipif(
        not reference_available(), reason="reference artifacts not mounted"
    ),
    pytest.mark.slow,
]

CKPT = os.path.join(REFERENCE_ROOT, "save", "pamnet_rna.pt")
DATA = os.path.join(REFERENCE_ROOT, "data", "RNA-Puzzles")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = PAMNetConfig(
    dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6, cutoff_g=20.0,
    flow="target_to_source",
)

# Golden f64 oracle scores for the 21 bundled natives, keyed by graph name
# (file-order of data/RNA-Puzzles/rna_native); computed by
# oracle_numpy.rna_forward with pamnet_rna.pt.
GOLDEN = {
    "rna_puzzle_20_NATIVE_5y87_RNA": 2.6659686397,
    "rna_puzzle_14_free_NATIVE_14_5ddo_free_solution_rpr": 3.6808147103,
    "rna_puzzle_14_bound_NATIVE_14_5ddp_bound_solution_rpr": 3.6471790443,
    "rna_puzzle_10_NATIVE_10_0_solution_4LCK_rpr": 3.2907221407,
    "rna_puzzle_1_NATIVE_1_solution_0_rpr": 2.2482176574,
    "rna_puzzle_7_NATIVE_7_0_solution_4r4v_rpr": 3.3068014733,
    "rna_puzzle_21_NATIVE_21_5nwq_solution_0_rpr": 2.9127039032,
    "rna_puzzle_6_NATIVE_6_0_solution_4GXY_rpr": 3.5250271515,
    "rna_puzzle_19_NATIVE_19_5t5a_solution_0_rpr": 2.6695739053,
    "rna_puzzle_15_NATIVE_15_solution_0_rpr": 3.2711548648,
    "rna_puzzle_12_NATIVE_12_4qln_solution_rpr": 2.9577856653,
    "rna_puzzle_17_NATIVE_17_5k7c_solution_rpr": 3.2964646624,
    "rna_puzzle_4_with_3IQP_NATIVE_4_0_solution_3V7E_rpr": 3.3117302924,
    "rna_puzzle_2_NATIVE_hacked_on": 3.4877025287,
    "rna_puzzle_18_with_4PQV_NATIVE_18_0_solution_5TPY_rpr": 3.1076575025,
    "rna_puzzle_9_2xnw_NATIVE_5kpy": 3.2751892423,
    "rna_puzzle_3_NATIVE_3_solution_0_rpr": 2.8389164004,
    "rna_puzzle_11_NATIVE": 2.8011017858,
    "rna_puzzle_5_homology_NATIVE_5_0_solution_4p8z_rpr": 3.0769630456,
    "rna_puzzle_8_NATIVE_8_0_solution_4L81_rpr": 3.4548084350,
    "rna_puzzle_13_NATIVE_13_0_solution_4XW7_rpr": 3.2016335180,
}


def _name(raw: str) -> str:
    return raw[:-4] if raw.endswith(".pdb") else raw


@pytest.fixture(scope="module")
def rna_dataset():
    return TUDataset(DATA, "rna_native")


def test_checkpoint_tree_matches_init():
    from pamnet_tpu.models import init_pamnet
    import jax.tree_util as jtu

    params = load_torch_checkpoint(CKPT)
    ref = init_pamnet(jax.random.PRNGKey(0), CFG)
    ka = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(params)}
    kb = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(ref)}
    assert ka == kb


def test_oracle_recompute_matches_golden(rna_dataset):
    """Live f64 oracle == committed golden for every structure (locks the
    host graph builders and the oracle math; f64 end to end, so exact to
    float-print precision)."""
    from oracle_numpy import rna_forward

    sd = load_torch_state_dict(CKPT)
    mols = rna_dataset.molecules()
    for i, m in enumerate(mols):
        name = _name(rna_dataset.names[i])
        got = rna_forward(sd, m)
        assert abs(got - GOLDEN[name]) < 1e-8, (name, got, GOLDEN[name])


def test_rna_scores_match_f64_oracle_all_21(rna_dataset):
    """JAX model (f32, highest matmul precision) == golden oracle vector on
    ALL 21 bundled natives; measured max |delta| 8.9e-6, locked at 5e-5."""
    params = load_torch_checkpoint(CKPT)
    mols = rna_dataset.molecules()
    assert len(mols) == 21
    deltas = {}
    for i, m in enumerate(mols):
        name = _name(rna_dataset.names[i])
        gb = build_graph_batch([m], "rna", CFG.cutoff_l, CFG.cutoff_g)
        got = float(apply_pamnet(params, jax.tree.map(jnp.asarray, gb), CFG)[0])
        deltas[name] = abs(got - GOLDEN[name])
    assert max(deltas.values()) < 5e-5, deltas


def test_production_inference_path_matches_golden(rna_dataset):
    """The DEFAULT driver scoring path — GraphLoader with precomputed f64
    basis, no ELL tables, per-batch EXACT pads, batch 16, fold_sbf +
    fuse_sbf_gather auto-on — must match the golden oracle vector.  This is
    the configuration inference_rna_puzzles.py actually runs, distinct from
    the per-molecule build_graph_batch path above (which has no sbf_radial
    and therefore never takes the folded/fused code)."""
    from pamnet_tpu.data.loader import GraphLoader

    params = load_torch_checkpoint(CKPT)
    mols = rna_dataset.molecules()
    loader = GraphLoader(mols, "rna", CFG.cutoff_l, CFG.cutoff_g,
                         batch_size=16, build_tables=False,
                         ladder_pads="exact")
    fwd = jax.jit(apply_pamnet, static_argnums=2)
    scores = []
    for gb in loader:
        out = fwd(params, jax.tree.map(jnp.asarray, gb), CFG)
        scores.extend(np.asarray(out)[: int(gb.graph_mask.sum())].tolist())
    assert len(scores) == 21
    deltas = {
        _name(rna_dataset.names[i]): abs(s - GOLDEN[_name(rna_dataset.names[i])])
        for i, s in enumerate(scores)
    }
    assert max(deltas.values()) < 5e-5, deltas


def test_shipped_csv_matches_golden():
    """The committed inference CSV (produced by inference_rna_puzzles.py)
    carries the same 21 scores, the CSV contract columns, and the
    reference's quirky ``dataset[5:]`` puzzle_number
    (inference_rna_puzzles.py:70-74)."""
    path = os.path.join(REPO, "rna_puzzles_predictions", "rna_native.csv")
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 21
    seen = set()
    for row in rows:
        assert set(row) == {"PAMNet", "tag", "puzzle_number"}
        assert row["puzzle_number"] == "ative"  # "rna_native"[5:]
        name = _name(row["tag"])
        assert abs(float(row["PAMNet"]) - GOLDEN[name]) < 5e-4, row
        seen.add(name)
    assert seen == set(GOLDEN)
