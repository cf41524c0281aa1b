"""Mixed-precision (compute_dtype=bfloat16) regression locks.

Guards the f32-accumulation contract of the segment ops (a bf16 prefix scan
over long batches once collapsed RNA scores to ~half — DEVNOTES.md round-2
findings) and bounds the bf16-vs-f32 forward drift on every dataset branch.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
from pamnet_tpu.models import apply_pamnet, init_pamnet
from pamnet_tpu.ops.ell import segment_sum_sorted
from pamnet_tpu.ops.segment import segment_sum


def test_sorted_prefix_scan_accumulates_f32():
    """A long bf16 segment via the sorted path must match the f64 sum to
    bf16 output precision — a bf16 cumsum would be off by orders more."""
    rng = np.random.default_rng(0)
    n = 200_000
    vals = rng.uniform(0.5, 1.5, size=(n, 4)).astype(np.float32)
    offsets = jnp.array([0, n], jnp.int32)
    ids = jnp.zeros(n, jnp.int32)
    mask = jnp.ones(n, jnp.float32)
    exact = vals.astype(np.float64).sum(0)
    got = segment_sum_sorted(
        jnp.asarray(vals).astype(jnp.bfloat16), ids, mask, offsets
    )
    rel = np.abs(np.asarray(got, np.float64)[0] - exact) / exact
    # bf16 *output* rounding is ~4e-3; a bf16 accumulator stalls once the
    # running sum exceeds ~256 (adding 1 to 65536 is a no-op in bf16) and
    # ends up ~1000x too small here.
    assert rel.max() < 8e-3, rel


def test_segment_sum_bf16_accumulates_f32():
    rng = np.random.default_rng(1)
    n = 100_000
    vals = rng.uniform(0.5, 1.5, size=(n, 4)).astype(np.float32)
    exact = vals.astype(np.float64).sum(0)
    got = segment_sum(
        jnp.asarray(vals).astype(jnp.bfloat16), jnp.zeros(n, jnp.int32), 1
    )
    assert got.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(got, np.float64)[0] - exact) / exact
    assert rel.max() < 8e-3, rel


@pytest.mark.parametrize("variant", ["full", "s"])
def test_qm9_forward_bf16_close_to_f32(variant):
    cfg = PAMNetConfig(dataset="QM9", dim=32, n_layer=2, variant=variant)
    mols = synthetic_qm9_dataset(6, seed=99)
    gb = jax.tree.map(jnp.asarray,
                      build_graph_batch(mols, "qm9", 5.0, 5.0, variant=variant))
    params = init_pamnet(jax.random.PRNGKey(3), cfg)
    f32 = np.asarray(apply_pamnet(params, gb, cfg))[:6]
    b16 = np.asarray(apply_pamnet(
        params, gb, dataclasses.replace(cfg, compute_dtype="bfloat16")))[:6]
    np.testing.assert_allclose(b16, f32, rtol=3e-2)


def test_batched_sorted_path_matches_tables_path_bf16():
    """The catastrophic-accumulation bug was ONLY on the sorted-offsets
    (inference) path; lock the two aggregation paths to each other in bf16."""
    cfg = PAMNetConfig(dataset="QM9", dim=32, n_layer=2,
                       compute_dtype="bfloat16")
    mols = synthetic_qm9_dataset(6, seed=7)
    with_tables = build_graph_batch(mols, "qm9", 5.0, 5.0)
    params = init_pamnet(jax.random.PRNGKey(5), cfg)
    a = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, with_tables), cfg))
    no_tables = with_tables._replace(
        tables={k: v for k, v in with_tables.tables.items() if k.endswith("_off")}
    )
    b = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, no_tables), cfg))
    np.testing.assert_allclose(a[:6], b[:6], rtol=3e-2)
