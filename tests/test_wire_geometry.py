"""Derive-mode geometry wire: batches ship positions + integer tables only;
distances/angles/bases are recomputed inside the compiled step (the model's
device fallbacks — the reference recomputes geometry per forward too,
models.py:104-188).  The host-f64 path is the oracle; agreement bounds the
device-f32 geometry error."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import collate_structures, precompute_structure
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.models import apply_pamnet, init_pamnet

CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=2)


def _mols(rng, n_mols=6):
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


def test_derive_geometry_drops_float_payloads(rng):
    mols = _mols(rng)
    host = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3,
                       build_tables="derive", build_perms=True)
    derive = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3,
                         build_tables="derive", build_perms=True,
                         wire_geometry="derive")
    gh = next(iter(host))
    gd = next(iter(derive))
    # Float geometry gone from the wire...
    for f in ("dist_g", "dist_l", "sbf_radial", "cbf2", "cbf1"):
        assert getattr(gd, f) is None, f
        assert getattr(gh, f) is not None, f
    # ...and every integer/label/mask field identical.
    for f in gh._fields:
        if f in ("dist_g", "dist_l", "sbf_radial", "cbf2", "cbf1", "tables"):
            continue
        np.testing.assert_array_equal(getattr(gh, f), getattr(gd, f))
    for k in gh.tables:
        np.testing.assert_array_equal(gh.tables[k], gd.tables[k])
    wire_h = sum(x.nbytes for x in jax.tree.leaves(gh))
    wire_d = sum(x.nbytes for x in jax.tree.leaves(gd))
    assert wire_d < 0.7 * wire_h, (wire_d, wire_h)


def test_derive_geometry_forward_matches_host(rng):
    mols = _mols(rng)
    structs = [precompute_structure(m, "qm9", 5.0, 5.0) for m in mols]
    from pamnet_tpu.data.batch import attach_basis

    for s in structs:
        attach_basis(s, 5.0)
    gh = collate_structures(structs)
    gd = collate_structures(structs, wire_geometry="derive")
    assert gd.sbf_radial is None and gd.dist_g is None
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    out_h = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gh), CFG))
    out_d = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gd), CFG))
    np.testing.assert_allclose(out_h, out_d, rtol=1e-3, atol=1e-4)


def test_derive_geometry_train_step_matches_host(rng):
    """One full train step (fwd+bwd+Adam+EMA) with derived geometry tracks
    the host-geometry step within f32-geometry tolerance."""
    from pamnet_tpu.train.loop import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from pamnet_tpu.train.schedules import warmup_exponential

    mols = _mols(rng)
    host = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3,
                       build_tables="derive", build_perms=True)
    derive = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3,
                         build_tables="derive", build_perms=True,
                         wire_geometry="derive")
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=4),
                               clip_norm=1000.0)
    step = make_train_step(CFG, optimizer, "l1", ema_decay=0.999)
    outs = {}
    for name, loader in (("host", host), ("derive", derive)):
        st = init_train_state(params, optimizer, use_ema=True)
        gb = jax.tree.map(jnp.asarray, next(iter(loader)))
        st, loss = step(st, gb)
        outs[name] = (float(loss), st.params)
    assert abs(outs["host"][0] - outs["derive"][0]) < 1e-4 * max(
        1.0, abs(outs["host"][0])
    )
    for ph, pd in zip(jax.tree.leaves(outs["host"][1]),
                      jax.tree.leaves(outs["derive"][1])):
        np.testing.assert_allclose(np.asarray(ph), np.asarray(pd),
                                   rtol=5e-3, atol=5e-4)


def test_derive_geometry_skips_basis_precompute(rng):
    loader = GraphLoader(_mols(rng), "qm9", 5.0, 5.0, batch_size=3,
                         wire_geometry="derive")
    assert all("sbf_radial" not in s for s in loader.structs)


def test_derive_geometry_plan_path_matches_numpy(rng):
    """Native CollatePlan collation under wire_geometry='derive' equals the
    numpy fallback field-for-field."""
    from pamnet_tpu.data import native
    from pamnet_tpu.data.batch import CollatePlan, PadSizes

    if not native.has_collate():
        import pytest

        pytest.skip("native collate unavailable")
    mols = _mols(rng)
    structs = [precompute_structure(m, "qm9", 5.0, 5.0) for m in mols]
    pads = PadSizes.for_counts(128, 256, 128, 256, 256, 8)
    plan = CollatePlan(structs)
    idxs = [1, 3, 4]
    g_plan = collate_structures(None, pads, plan=plan, idxs=idxs,
                                wire_geometry="derive")
    g_np = collate_structures([structs[i] for i in idxs], pads,
                              wire_geometry="derive")
    for f in g_np._fields:
        a, b = getattr(g_np, f), getattr(g_plan, f)
        if f == "tables":
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        elif a is None:
            assert b is None, f
        else:
            np.testing.assert_array_equal(a, b)
