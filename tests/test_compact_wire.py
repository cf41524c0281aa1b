"""Compact wire: int16 index tables + count-derived masks/node_graph,
hydrated inside the compiled step (data/batch.py::hydrate_batch).  The full
wire is the oracle — outputs, losses, and gradients must be identical (the
narrowing is lossless and the derived masks equal the host masks on every
real row)."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import hydrate_batch
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.models import apply_pamnet, init_pamnet

CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=2)


def _mols(rng, n_mols=7):
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


def _loaders(rng, **kw):
    mols = _mols(rng)
    full = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3,
                       build_tables="derive", build_perms=True,
                       wire_geometry="derive", **kw)
    compact = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3,
                          build_tables="derive", build_perms=True,
                          wire_geometry="derive", compact_wire=True, **kw)
    return full, compact


def test_compact_wire_shrinks_and_hydrates_identically(rng):
    full, compact = _loaders(rng)
    for gf, gc in zip(full, compact):
        # Masks/node_graph gone; indices narrowed; counts present.
        assert gc.node_mask is None and gc.graph_mask is None
        assert gc.node_graph is None
        assert gc.eg_src.dtype == np.int16
        assert gc.counts is not None and gc.n_per is not None
        wire_f = sum(x.nbytes for x in jax.tree.leaves(gf))
        wire_c = sum(x.nbytes for x in jax.tree.leaves(gc))
        assert wire_c < 0.75 * wire_f, (wire_c, wire_f)
        # Hydration reproduces the host wire on every field (node_graph
        # differs only on padded rows, where the host pads with 0).
        h = hydrate_batch(jax.tree.map(jnp.asarray, gc))
        for f in gf._fields:
            if f in ("tables", "counts", "n_per"):
                continue
            a, b = getattr(gf, f), getattr(h, f)
            if a is None:
                assert b is None, f
                continue
            b = np.asarray(b)
            if f == "node_graph":
                real = int(gf.node_mask.sum())
                np.testing.assert_array_equal(a[:real], b[:real])
            else:
                np.testing.assert_array_equal(a, b, err_msg=f)
        for k, v in gf.tables.items():
            np.testing.assert_array_equal(v, np.asarray(h.tables[k]),
                                          err_msg=k)


def test_compact_wire_forward_identical(rng):
    full, compact = _loaders(rng)
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    run = jax.jit(apply_pamnet, static_argnums=2)
    for gf, gc in zip(full, compact):
        a = np.asarray(run(params, jax.tree.map(jnp.asarray, gf), CFG))
        b = np.asarray(run(params, jax.tree.map(jnp.asarray, gc), CFG))
        np.testing.assert_array_equal(a, b)


def test_compact_wire_train_step_identical(rng):
    """Full fwd+bwd+Adam+EMA train step: losses and updated params must be
    BIT-identical (hydration is lossless; no numeric path changes)."""
    from pamnet_tpu.train.loop import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from pamnet_tpu.train.schedules import warmup_exponential

    full, compact = _loaders(rng)
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=4),
                               clip_norm=1000.0)
    step = make_train_step(CFG, optimizer, "l1", ema_decay=0.999)
    outs = {}
    for name, loader in (("full", full), ("compact", compact)):
        st = init_train_state(params, optimizer, use_ema=True)
        losses = []
        for gb in loader:
            st, loss = step(st, jax.tree.map(jnp.asarray, gb))
            losses.append(float(loss))
        outs[name] = (losses, st.params)
    assert outs["full"][0] == outs["compact"][0]
    for a, b in zip(jax.tree.leaves(outs["full"][1]),
                    jax.tree.leaves(outs["compact"][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compact_wire_epoch_runner(rng):
    """EpochRunner over compact batches: host-side loss accounting uses
    counts (graph_mask is None on the wire), scan blocks stack the compact
    pytree, losses finite."""
    from pamnet_tpu.train.loop import EpochRunner, init_train_state, make_optimizer
    from pamnet_tpu.train.schedules import constant

    _, compact = _loaders(rng)
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(constant(1e-4))
    runner = EpochRunner(CFG, optimizer, "l1", ema_decay=0.999, scan_steps=2)
    st = init_train_state(params, optimizer, use_ema=True)
    to_device = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    st, loss_sum, ng, nb = runner.run(st, iter(compact), to_device)
    assert ng == 7 and nb == 3
    assert np.isfinite(loss_sum)


def test_hydrate_is_idempotent_and_noop_on_full(rng):
    full, _ = _loaders(rng)
    gf = jax.tree.map(jnp.asarray, next(iter(full)))
    assert hydrate_batch(gf) is gf
