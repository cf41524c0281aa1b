"""Device-derived ELL tables (collate build_tables="derive"): the wired
(G, K) table + mask pairs are replaced by tiny shape markers next to the
scan aux arrays, and ops/ell.py::materialize_tables expands them inside the
compiled program.  These tests lock BIT-exactness against the host builder
at every level: raw op, collate output, and the full forward/grad."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.models import apply_pamnet, init_pamnet
from pamnet_tpu.ops.ell import (
    build_ell_table_np,
    build_offsets_np,
    build_perm_np,
    derive_ell_table,
    materialize_tables,
)

TABLE_KEYS = ("eg_dst", "eg_src", "el_dst", "el_src",
              "t2_ji", "t2_kj", "t1_ji", "t1_jj")


def _mols(rng, n):
    out = []
    for _ in range(n):
        k = int(rng.integers(5, 14))
        pos = (rng.random((k, 3)) * 3.0).astype(np.float32)
        src = np.concatenate([np.arange(k - 1), np.arange(1, k)])
        dst = np.concatenate([np.arange(1, k), np.arange(k - 1)])
        out.append(
            dict(z=rng.integers(0, 5, k).astype(np.int32), pos=pos,
                 edge_index=np.stack([src, dst]), y=float(k))
        )
    return out


@pytest.mark.parametrize("n_valid", [0, 1, 150, 200])
def test_derive_matches_host_unsorted(rng, n_valid):
    r, g, k = 200, 32, 16
    ids = rng.integers(0, g, r).astype(np.int32)
    # keep every group below the table width
    counts = np.bincount(ids[:n_valid], minlength=g)
    assert counts.max(initial=0) <= k
    want_t, want_m = build_ell_table_np(ids, n_valid, g, k)
    perm, poff = build_perm_np(ids, n_valid, g, r)
    got_t, got_m = derive_ell_table(jnp.asarray(poff), k, jnp.asarray(perm))
    np.testing.assert_array_equal(np.asarray(got_t), want_t)
    np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_derive_matches_host_sorted(rng):
    r, g, k = 200, 32, 16
    n_valid = 170
    ids = np.sort(rng.integers(0, g, r)).astype(np.int32)
    ids[n_valid:] = 0  # padding convention: parked at 0, masked
    ids[:n_valid] = np.sort(ids[:n_valid])
    want_t, want_m = build_ell_table_np(ids, n_valid, g, k)
    off = build_offsets_np(ids, n_valid, g)
    got_t, got_m = derive_ell_table(jnp.asarray(off), k)
    np.testing.assert_array_equal(np.asarray(got_t), want_t)
    np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_derive_wide_table_and_empty_groups(rng):
    # K much wider than any group + groups with zero rows: pad slots must be
    # exact zeros in table AND mask, like the host builder's zeros-init.
    r, g, k = 64, 16, 40
    ids = rng.integers(0, 4, r).astype(np.int32)  # groups 4..15 empty
    n_valid = 40
    want_t, want_m = build_ell_table_np(ids, n_valid, g, k)
    perm, poff = build_perm_np(ids, n_valid, g, r)
    got_t, got_m = derive_ell_table(jnp.asarray(poff), k, jnp.asarray(perm))
    np.testing.assert_array_equal(np.asarray(got_t), want_t)
    np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_collate_derive_matches_host_tables(rng):
    mols = _mols(rng, 23)
    host = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                       build_tables=True, build_perms=True)
    drv = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                      build_tables="derive")
    for hb, db in zip(host, drv):
        # The derive-mode wire carries markers + aux, never the tables.
        for key in TABLE_KEYS:
            assert key not in db.tables and key + "_mask" not in db.tables
            assert key + "_dk" in db.tables
        mat = materialize_tables(
            {k: jnp.asarray(v) for k, v in db.tables.items()}
        )
        for key in TABLE_KEYS:
            np.testing.assert_array_equal(
                np.asarray(mat[key]), hb.tables[key], err_msg=key
            )
            np.testing.assert_array_equal(
                np.asarray(mat[key + "_mask"]), hb.tables[key + "_mask"],
                err_msg=key,
            )
        assert not any(k.endswith("_dk") for k in mat)
        # Scan-routing aux wired by build_perms is also present (superset).
        for key in ("el_src", "t2_kj", "t1_jj"):
            assert key + "_perm" in db.tables


def test_forward_and_grad_identical_to_host_mode(rng):
    mols = _mols(rng, 16)
    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=2, cutoff_l=5.0,
                       cutoff_g=5.0)
    params = init_pamnet(jax.random.PRNGKey(0), cfg)
    host = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                       build_tables=True, build_perms=True)
    drv = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                      build_tables="derive")

    @jax.jit
    def loss(p, gb):
        pred = apply_pamnet(p, gb, cfg)
        return (pred * gb.graph_mask).sum()

    for hb, db in zip(host, drv):
        hbj = jax.tree.map(jnp.asarray, hb)
        dbj = jax.tree.map(jnp.asarray, db)
        # Tables are bit-identical, so forward AND gradients must be too.
        np.testing.assert_array_equal(
            np.asarray(apply_pamnet(params, hbj, cfg)),
            np.asarray(apply_pamnet(params, dbj, cfg)),
        )
        gh = jax.grad(loss)(params, hbj)
        gd = jax.grad(loss)(params, dbj)
        for (ph, lh), (pd, ld) in zip(
            jax.tree_util.tree_leaves_with_path(gh),
            jax.tree_util.tree_leaves_with_path(gd),
        ):
            assert ph == pd
            np.testing.assert_array_equal(
                np.asarray(lh), np.asarray(ld),
                err_msg=jax.tree_util.keystr(ph),
            )


def test_derive_overflow_raises(rng):
    import dataclasses

    from pamnet_tpu.data.batch import collate_structures, precompute_structure

    mols = _mols(rng, 8)
    structs = [precompute_structure(m, "qm9", 5.0, 5.0) for m in mols]
    auto = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8).pads
    tiny = dataclasses.replace(auto, kg_dst=1)
    with pytest.raises(ValueError, match="ELL overflow"):
        collate_structures(structs, pads=tiny, build_tables="derive")
