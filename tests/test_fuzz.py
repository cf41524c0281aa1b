"""Randomized robustness: arbitrary molecule shapes/sizes (including
degenerate single-atom and disconnected cases) through the full
precompute -> collate -> model pipeline must produce finite outputs, and the
model must be invariant to the padding bucket (masks correct under fuzz)."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import PadSizes, build_graph_batch
from pamnet_tpu.models import apply_pamnet, init_pamnet

CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=2)
CFG_RNA = PAMNetConfig(dataset="rna_x", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=8.0, flow="target_to_source")


def _random_mol(rng):
    n = int(rng.integers(1, 16))  # includes single-atom molecules
    pos = (rng.random((n, 3)) * rng.uniform(0.5, 8.0)).astype(np.float32)
    if n == 1 or rng.random() < 0.2:
        edges = np.zeros((2, 0), np.int64)  # no bonds at all
    else:
        k = int(rng.integers(1, n))
        src = rng.integers(0, n, 2 * k)
        dst = rng.integers(0, n, 2 * k)
        keep = src != dst
        edges = np.stack([src[keep], dst[keep]])
    return dict(z=rng.integers(0, 5, n).astype(np.int32), pos=pos,
                edge_index=edges, y=float(rng.normal()))


def test_fuzz_qm9_pipeline(rng):
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    fwd = jax.jit(lambda p, g: apply_pamnet(p, g, CFG))
    for trial in range(6):
        mols = [_random_mol(rng) for _ in range(int(rng.integers(1, 5)))]
        gb = build_graph_batch(mols, "qm9", 5.0, 5.0)
        out = np.asarray(fwd(params, jax.tree.map(jnp.asarray, gb)))
        assert np.all(np.isfinite(out)), f"trial {trial}: non-finite output"
        assert np.all(out[len(mols):] == 0)  # padded graphs give exact zero


def test_fuzz_padding_invariance(rng):
    params = init_pamnet(jax.random.PRNGKey(1), CFG)
    mols = [_random_mol(rng) for _ in range(3)]
    gb1 = build_graph_batch(mols, "qm9", 5.0, 5.0)
    big = PadSizes(n=256, eg=2048, el=512, t2=1024, t1=1024, g=16,
                   kg_dst=32, kg_src=32, kl_dst=16, kl_src=16,
                   k2_ji=16, k2_kj=16, k1_ji=24, k1_jj=24)
    gb2 = build_graph_batch(mols, "qm9", 5.0, 5.0, pads=big)
    out1 = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gb1), CFG))[:3]
    out2 = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gb2), CFG))[:3]
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-5)


def test_fuzz_rna_kind(rng):
    params = init_pamnet(jax.random.PRNGKey(2), CFG_RNA)
    for _ in range(3):
        mols = []
        for _ in range(2):
            n = int(rng.integers(1, 30))
            mols.append(dict(z=rng.integers(0, 3, n).astype(np.int32),
                             pos=(rng.random((n, 3)) * 10).astype(np.float32),
                             y=float(rng.random())))
        gb = build_graph_batch(mols, "rna", 2.6, 8.0)
        out = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gb), CFG_RNA))
        assert np.all(np.isfinite(out))


def test_fuzz_routing_matrix(rng):
    """Every aggregation/fold/fuse route through the model must agree on
    random RNA-kind inputs: ELL tables (training batches), sorted offsets
    (inference batches), plain scatter (tables stripped), folded sbf
    projection, fused single-row gather, and bf16 compute — all against the
    scatter-fallback f32 reference.  Guards the routing gates in
    models/pamnet.py (_fold_gate, fuse auto) and models/layers.py (_agg/_gath)
    as a matrix, not just the paths the drivers happen to take."""
    import dataclasses

    from pamnet_tpu.data.batch import attach_basis, collate_structures, \
        precompute_structure

    cfg = CFG_RNA
    params = init_pamnet(jax.random.PRNGKey(4), cfg)
    mols = []
    for _ in range(3):
        n = int(rng.integers(4, 24))
        mols.append(dict(z=rng.integers(0, 3, n).astype(np.int32),
                         pos=(rng.random((n, 3)) * 9).astype(np.float32),
                         y=float(rng.random())))
    structs = [precompute_structure(m, "rna", cfg.cutoff_l, cfg.cutoff_g)
               for m in mols]
    for s in structs:
        attach_basis(s, cfg.cutoff_l)
    gb_tables = jax.tree.map(jnp.asarray, collate_structures(
        structs, build_tables=True))
    gb_offsets = jax.tree.map(jnp.asarray, collate_structures(
        structs, build_tables=False))
    gb_plain = gb_offsets._replace(tables={})

    def run(gb, c):
        return np.asarray(
            jax.jit(apply_pamnet, static_argnums=2)(params, gb, c)
        )[:3]

    ref = run(gb_plain, dataclasses.replace(cfg, fold_sbf=False))
    cases = {
        "ell_tables_auto": (gb_tables, cfg),          # fold auto-off
        "offsets_auto": (gb_offsets, cfg),            # fold+fuse auto-on
        "fold_nofuse": (gb_offsets, dataclasses.replace(
            cfg, fold_sbf=True, fuse_sbf_gather=False)),
        "forced_fold_with_tables": (gb_tables, dataclasses.replace(
            cfg, fold_sbf=True)),
        "scatter_fold": (gb_plain, dataclasses.replace(cfg, fold_sbf=True)),
    }
    for name, (gb, c) in cases.items():
        np.testing.assert_allclose(
            run(gb, c), ref, rtol=2e-4, atol=2e-5, err_msg=name
        )
    # agg_forward="sorted": forward sums via the blocked scan while gathers
    # keep their ELL backward (both table kinds present) — the tpu_ab aggfwd
    # route, now a hashable PAMNetConfig field (part of the jit key).
    from pamnet_tpu.models import layers

    # The shipped default routing is the measured per-key mix.
    assert cfg.agg_forward == layers.DEFAULT_AGG_FORWARD == frozenset(
        {"t2_ji", "t1_ji", "el_dst"}
    )
    np.testing.assert_allclose(
        run(gb_tables, dataclasses.replace(
            cfg, fold_sbf=False, agg_forward="sorted")), ref,
        rtol=2e-4, atol=2e-5, err_msg="sorted_forward_with_ell_tables",
    )
    # Per-key mix (the tpu_ab aggmix route, the shipped default): the
    # skew-padded reductions (triplets + local edge->node) go through the
    # scan; everything else keeps the ELL K-sum.  Also cover the all-ELL
    # route and the twosum scan scheme.
    np.testing.assert_allclose(
        run(gb_tables, dataclasses.replace(cfg, fold_sbf=False)), ref,
        rtol=2e-4, atol=2e-5, err_msg="mixed_forward_routing",
    )
    np.testing.assert_allclose(
        run(gb_tables, dataclasses.replace(
            cfg, fold_sbf=False, agg_forward="ell")), ref,
        rtol=2e-4, atol=2e-5, err_msg="all_ell_forward_routing",
    )
    np.testing.assert_allclose(
        run(gb_tables, dataclasses.replace(
            cfg, fold_sbf=False, agg_forward="sorted",
            sorted_scan_impl="twosum")), ref,
        rtol=2e-4, atol=2e-5, err_msg="twosum_scan_impl",
    )
    bf16 = run(gb_offsets, dataclasses.replace(cfg, compute_dtype="bfloat16"))
    np.testing.assert_allclose(bf16, ref, rtol=5e-2, atol=5e-2,
                               err_msg="bf16_offsets")

    # Gather-BACKWARD routing (PAMNetConfig.gather_backward): cotangents of
    # routed gathers aggregate via the blocked scan (gather_sorted/
    # gather_perm over host-built permutations) instead of the ELL table —
    # the GRADIENT trees must match the plain-scatter reference either way.
    gb_perms = jax.tree.map(jnp.asarray, collate_structures(
        structs, build_tables=True, build_perms=True))
    for key in ("el_src_perm", "el_src_poff", "t2_kj_perm", "t1_jj_perm"):
        assert key in gb_perms.tables, key

    def grads(gb, c):
        def loss(p):
            return jnp.sum(jnp.abs(apply_pamnet(p, gb, c)) * gb.graph_mask)
        return jax.grad(loss)(params)

    # The shipped default routes the four skew-padded gather keys.
    routed = frozenset({"el_dst", "el_src", "t2_kj", "t1_jj"})
    assert cfg.gather_backward == layers.DEFAULT_GATHER_BACKWARD == routed

    g_ref = grads(gb_plain, dataclasses.replace(cfg, fold_sbf=False))
    for name, gb, c in (
        ("ell_backward", gb_perms, dataclasses.replace(
            cfg, fold_sbf=False, gather_backward=frozenset())),
        ("scan_backward", gb_perms, dataclasses.replace(
            cfg, fold_sbf=False, gather_backward=routed)),
        ("scan_backward_no_perms", gb_tables, dataclasses.replace(
            cfg, fold_sbf=False, gather_backward=routed)),  # falls back
    ):
        g_got = grads(gb, c)
        for (path, want), got in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree.leaves(g_got),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-5,
                err_msg=f"{name}: {jax.tree_util.keystr(path)}",
            )


def test_fuzz_gradients_finite(rng):
    params = init_pamnet(jax.random.PRNGKey(3), CFG)
    mols = [_random_mol(rng) for _ in range(3)]
    gb = jax.tree.map(jnp.asarray, build_graph_batch(mols, "qm9", 5.0, 5.0))

    def loss(p):
        return jnp.sum(jnp.abs(apply_pamnet(p, gb, CFG) - gb.y) * gb.graph_mask)

    grads = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))
