"""Packed host->device staging (utils/wirepack.py): must reproduce the
leaf-by-leaf transfer exactly for GraphBatch-shaped pytrees (mixed dtypes,
dicts, None fields) and stacked groups."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.utils import wirepack


def _assert_tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _mols(rng, n):
    out = []
    for _ in range(n):
        k = int(rng.integers(5, 12))
        src = np.concatenate([np.arange(k - 1), np.arange(1, k)])
        dst = np.concatenate([np.arange(1, k), np.arange(k - 1)])
        out.append(dict(z=rng.integers(0, 5, k).astype(np.int32),
                        pos=(rng.random((k, 3)) * 3).astype(np.float32),
                        edge_index=np.stack([src, dst]), y=float(k)))
    return out


def test_stage_matches_leafwise(rng):
    gb = build_graph_batch(_mols(rng, 4), "qm9", 5.0, 5.0)
    want = jax.tree.map(jnp.asarray, gb)
    got = wirepack.stage(gb)
    _assert_tree_equal(got, want)


def test_stage_stacked_group(rng):
    gb = build_graph_batch(_mols(rng, 4), "qm9", 5.0, 5.0)
    group = jax.tree.map(lambda *xs: np.stack(xs), gb, gb)
    _assert_tree_equal(wirepack.stage(group), jax.tree.map(jnp.asarray, group))


def test_stage_mixed_plain_tree(rng):
    tree = {
        "a": np.arange(7, dtype=np.int32),
        "b": (rng.random((3, 5)).astype(np.float32), None),
        "c": np.asarray(2.5, np.float32),
    }
    got = wirepack.stage(tree)
    np.testing.assert_array_equal(np.asarray(got["a"]), tree["a"])
    np.testing.assert_allclose(np.asarray(got["b"][0]), tree["b"][0])
    assert got["b"][1] is None
    assert float(got["c"]) == 2.5
