"""Torch-export interop: params -> torch state_dict -> params roundtrip, and
byte-parity against the reference checkpoint's own keys."""

import os

import numpy as np
import pytest

import jax

from conftest import REFERENCE_ROOT, reference_available
from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.models import init_pamnet
from pamnet_tpu.train.checkpoint import (
    load_torch_state_dict,
    torch_to_params,
)
from pamnet_tpu.train.export import params_to_torch_state_dict, save_torch_checkpoint

torch = pytest.importorskip("torch")

RNA_CFG = PAMNetConfig(
    dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6, cutoff_g=20.0,
    flow="target_to_source",
)


def _assert_tree_equal(a, b):
    import jax.tree_util as jtu

    la = jtu.tree_leaves_with_path(a)
    lb = jtu.tree_leaves_with_path(b)
    assert [jtu.keystr(k) for k, _ in la] == [jtu.keystr(k) for k, _ in lb]
    for (_, xa), (_, xb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_roundtrip_fresh_params(tmp_path):
    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=2)
    params = init_pamnet(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "export.pt")
    save_torch_checkpoint(path, params)
    restored = torch_to_params(load_torch_state_dict(path))
    _assert_tree_equal(params, restored)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reference_checkpoint_roundtrip():
    """Reference pamnet_rna.pt -> our pytree -> torch dict: same keys, same
    bytes (proves both directions of the name/layout mapping)."""
    src = load_torch_state_dict(
        os.path.join(REFERENCE_ROOT, "save", "pamnet_rna.pt")
    )
    params = torch_to_params(src)
    back = params_to_torch_state_dict(params)
    assert set(back.keys()) == set(src.keys())
    for k in src:
        np.testing.assert_array_equal(back[k].numpy(), src[k])
