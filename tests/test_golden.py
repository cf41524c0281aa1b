"""Golden-output regression lock: fixed seeds + fixed synthetic molecules
must reproduce these CPU f32 outputs.  Catches accidental semantic drift in
future refactors (any intentional math change must update the goldens AND
re-pass the RNA f64-oracle parity tests)."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
from pamnet_tpu.models import apply_pamnet, init_pamnet

GOLDEN = {
    "qm9_full": [1.883246, 1.401642, 0.987483, 0.670974, 1.207995, 1.528298],
    "qm9_s": [1.876311, 1.400859, 0.987213, 0.670474, 1.204339, 1.529283],
}


def _run(variant):
    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=2, variant=variant)
    mols = synthetic_qm9_dataset(6, seed=1234)
    gb = build_graph_batch(mols, "qm9", 5.0, 5.0, variant=variant)
    params = init_pamnet(jax.random.PRNGKey(7), cfg)
    return np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gb), cfg))[:6]


def test_golden_qm9_full():
    np.testing.assert_allclose(_run("full"), GOLDEN["qm9_full"], rtol=3e-4, atol=3e-5)


def test_golden_qm9_s():
    np.testing.assert_allclose(_run("s"), GOLDEN["qm9_s"], rtol=3e-4, atol=3e-5)
