"""Scatter-free ELL aggregation: equivalence with segment ops (values and
gradients), table construction, and full-model equivalence."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.ops.ell import (
    build_ell_table_np,
    gather_ell,
    segment_sum_ell,
)
from pamnet_tpu.ops.segment import segment_sum


def _case(rng, r=200, g=32, d=8, n_valid=150):
    ids = np.sort(rng.integers(0, g, r)).astype(np.int32)
    ids[n_valid:] = 0  # padded rows point at group 0 but are masked
    row_mask = np.zeros(r, np.float32)
    row_mask[:n_valid] = 1.0
    values = rng.standard_normal((r, d)).astype(np.float32)
    table, tmask = build_ell_table_np(ids, n_valid, g, k=32)
    return (
        jnp.asarray(values), jnp.asarray(ids), jnp.asarray(row_mask),
        jnp.asarray(table), jnp.asarray(tmask),
    )


def test_segment_sum_ell_matches_segment_sum(rng):
    values, ids, row_mask, table, tmask = _case(rng)
    got = np.asarray(segment_sum_ell(values, ids, row_mask, table, tmask))
    want = np.asarray(segment_sum(values * row_mask[:, None], ids, 32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_segment_sum_ell_gradient(rng):
    values, ids, row_mask, table, tmask = _case(rng)

    def f_ell(v):
        return (segment_sum_ell(v, ids, row_mask, table, tmask) ** 2).sum()

    def f_ref(v):
        return (segment_sum(v * row_mask[:, None], ids, 32) ** 2).sum()

    g_ell = np.asarray(jax.grad(f_ell)(values))
    g_ref = np.asarray(jax.grad(f_ref)(values))
    np.testing.assert_allclose(g_ell, g_ref, rtol=1e-4, atol=1e-5)


def test_gather_ell_and_gradient(rng):
    x = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    values, ids, row_mask, table, tmask = _case(rng)

    got = np.asarray(gather_ell(x, ids, table, tmask))
    np.testing.assert_array_equal(got, np.asarray(x)[np.asarray(ids)])

    # Gradient parity vs plain gather, with padded rows masked downstream
    # (the gather_ell contract).
    def f_ell(x_):
        return ((gather_ell(x_, ids, table, tmask) * row_mask[:, None]) ** 2).sum()

    def f_ref(x_):
        return ((x_[ids] * row_mask[:, None]) ** 2).sum()

    g_ell = np.asarray(jax.grad(f_ell)(x))
    g_ref = np.asarray(jax.grad(f_ref)(x))
    np.testing.assert_allclose(g_ell, g_ref, rtol=1e-4, atol=1e-5)


def test_segment_sum_sorted_matches(rng):
    from pamnet_tpu.ops.ell import build_offsets_np, segment_sum_sorted

    values, ids, row_mask, _, _ = _case(rng)
    offsets = jnp.asarray(build_offsets_np(np.asarray(ids), 150, 32))
    got = np.asarray(segment_sum_sorted(values, ids, row_mask, offsets))
    want = np.asarray(segment_sum(values * row_mask[:, None], ids, 32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # Gradient parity.
    def f_sorted(v):
        return (segment_sum_sorted(v, ids, row_mask, offsets) ** 2).sum()

    def f_ref(v):
        return (segment_sum(v * row_mask[:, None], ids, 32) ** 2).sum()

    g_a = np.asarray(jax.grad(f_sorted)(values))
    g_b = np.asarray(jax.grad(f_ref)(values))
    np.testing.assert_allclose(g_a, g_b, rtol=1e-3, atol=1e-4)


def test_gather_sorted_and_perm_backward(rng):
    """gather_sorted / gather_perm forward == plain gather; their scan
    backwards must match the plain-gather (scatter) gradient, including a
    nonzero cotangent on padded rows (the perm parks those past
    offsets[-1], so they never enter a group)."""
    from pamnet_tpu.ops.ell import (
        build_offsets_np,
        build_perm_np,
        gather_perm,
        gather_sorted,
    )

    g_src, r, n_valid, d = 32, 200, 150, 8
    x = jnp.asarray(rng.standard_normal((g_src, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    row_mask = np.zeros(r, np.float32)
    row_mask[:n_valid] = 1.0

    # Group-sorted idx (the el_dst case).
    ids = np.sort(rng.integers(0, g_src, r)).astype(np.int32)
    ids[n_valid:] = 0
    offsets = jnp.asarray(build_offsets_np(ids, n_valid, g_src))
    got = np.asarray(gather_sorted("blocked", x, jnp.asarray(ids), offsets))
    np.testing.assert_array_equal(got, np.asarray(x)[ids])
    # Padded rows get an UNMASKED cotangent on purpose (no row_mask in the
    # gather_sorted closure): offsets[-1] == n_valid must exclude them from
    # every group without any mask multiply.
    for impl in ("blocked", "twosum"):
        g_a = np.asarray(jax.grad(lambda x_: (
            gather_sorted(impl, x_, jnp.asarray(ids), offsets) * w
        ).sum())(x))
        g_b = np.asarray(jax.grad(lambda x_: (
            x_[ids] * row_mask[:, None] * w).sum())(x))
        np.testing.assert_allclose(g_a, g_b, rtol=1e-4, atol=1e-5,
                                   err_msg=f"sorted/{impl}")

    # Arbitrary idx + host permutation (the t2_kj/t1_jj/el_src case).
    ids2 = rng.integers(0, g_src, r).astype(np.int32)
    ids2[n_valid:] = 0
    perm, poff = build_perm_np(ids2, n_valid, g_src, r)
    assert sorted(perm.tolist()) == list(range(r))  # valid permutation
    assert poff[-1] == n_valid
    got = np.asarray(
        gather_perm("blocked", x, jnp.asarray(ids2), jnp.asarray(perm),
                    jnp.asarray(poff))
    )
    np.testing.assert_array_equal(got, np.asarray(x)[ids2])
    # Padded rows get an UNMASKED cotangent here on purpose: the perm/offsets
    # must exclude them without any mask multiply.
    g_a = np.asarray(jax.grad(lambda x_: (
        gather_perm("blocked", x_, jnp.asarray(ids2), jnp.asarray(perm),
                    jnp.asarray(poff)) * w).sum())(x))
    g_b = np.asarray(jax.grad(lambda x_: (
        x_[ids2] * row_mask[:, None] * w).sum())(x))
    np.testing.assert_allclose(g_a, g_b, rtol=1e-4, atol=1e-5)


def test_segment_sum_sorted_keeps_f64_accumulation(rng):
    """Under jax x64 an f64 stream must accumulate in f64, not be silently
    downcast to the f32 scan used for low-precision inputs (ADVICE r2): the
    group [1e9, 1e-3, -1e9] sums to 1e-3 only with >f32 mantissa."""
    from pamnet_tpu.ops.ell import build_offsets_np, segment_sum_sorted

    with jax.enable_x64():
        values = jnp.array([[1e9], [1e-3], [-1e9]], dtype=jnp.float64)
        ids = jnp.zeros(3, jnp.int32)
        offsets = jnp.asarray(build_offsets_np(np.zeros(3, np.int32), 3, 1))
        out = segment_sum_sorted(values, ids, jnp.ones(3, bool), offsets)
        assert out.dtype == jnp.float64
        # f64 rounding at 1e9 magnitude leaves ~5e-8 abs error; an f32 scan
        # would return exactly 0.0 here (1e9 + 1e-3 == 1e9 in f32).
        np.testing.assert_allclose(np.asarray(out), [[1e-3]], rtol=1e-3)


def test_sorted_scan_impls_compensate_prefix_cancellation(rng):
    """Both sub-f64 scan schemes (blocked two-level and global TwoSum) must
    hold group sums at scatter-add accuracy on an adversarial stream where a
    plain f32 prefix difference loses ~log2(R/K) mantissa bits: many rows,
    large same-sign values, tiny per-group sums late in the stream.  Sizes
    straddle block boundaries (R % _SCAN_BLOCK != 0)."""
    from pamnet_tpu.ops import ell

    R, D, G = 16310, 4, 37  # R >> ell._SCAN_BLOCK and not a multiple of it
    assert R % ell._SCAN_BLOCK != 0, "R must exercise the partial tail block"
    vals = (rng.standard_normal((R, D)) * 100.0 + 300.0).astype(np.float32)
    ids = np.sort(rng.integers(0, G, size=R)).astype(np.int32)
    offsets = jnp.asarray(ell.build_offsets_np(ids, R, G))
    want = np.zeros((G, D), np.float64)
    np.add.at(want, ids, vals.astype(np.float64))

    outs = {}
    for impl in ("blocked", "twosum"):
        outs[impl] = np.asarray(
            jax.jit(ell.segment_sum_sorted, static_argnames="impl")(
                jnp.asarray(vals), jnp.asarray(ids),
                jnp.ones(R, jnp.float32), offsets, impl=impl
            )
        ).astype(np.float64)

    # Error models: the global TwoSum scan is scatter-parity (compensation
    # holds the pair to ~doubled precision); the blocked scheme's intra-block
    # prefix differences cancel at BLOCK-local magnitudes, so its bound is
    # eps * _SCAN_BLOCK * max|v| — a factor R/_SCAN_BLOCK better than the
    # plain f32 global scan, whose error this test also pins down.
    scatter = np.zeros((G, D), np.float32)
    np.add.at(scatter, ids, vals)
    scatter_err = np.abs(scatter.astype(np.float64) - want).max()
    plain = np.concatenate(
        [np.zeros((1, D), np.float32), np.cumsum(vals, axis=0, dtype=np.float32)]
    ).astype(np.float64)
    off = np.asarray(offsets)
    plain_err = np.abs((plain[off[1:]] - plain[off[:-1]]) - want).max()
    eps = np.finfo(np.float32).eps
    blocked_bound = 4.0 * eps * ell._SCAN_BLOCK * np.abs(vals).max()

    err_two = np.abs(outs["twosum"] - want).max()
    assert err_two <= max(scatter_err * 4.0, 1e-2), f"twosum: {err_two}"
    err_blk = np.abs(outs["blocked"] - want).max()
    assert err_blk <= blocked_bound, f"blocked: {err_blk} > {blocked_bound}"
    assert plain_err > 10 * err_blk, (
        f"stream not adversarial enough: plain {plain_err} vs blocked {err_blk}"
    )


def test_unsorted_offsets_raise(rng):
    from pamnet_tpu.ops.ell import build_offsets_np

    ids = np.array([3, 1, 2], np.int32)
    try:
        build_offsets_np(ids, 3, 4)
        raise AssertionError("expected sortedness error")
    except ValueError as e:
        assert "sorted" in str(e)


def test_table_overflow_raises(rng):
    ids = np.zeros(20, np.int32)  # all one group
    try:
        build_ell_table_np(ids, 20, 4, k=8)
        raise AssertionError("expected overflow")
    except ValueError as e:
        assert "ELL overflow" in str(e)


def test_model_scatter_free_equivalence(rng):
    """Full model: scatter-free path == segment-op path (fwd + grads)."""
    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.data.batch import build_graph_batch
    from pamnet_tpu.models import apply_pamnet, init_pamnet

    mols = []
    for _ in range(3):
        n = int(rng.integers(6, 12))
        pos = (rng.random((n, 3)) * 3.0).astype(np.float32)
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        mols.append(
            dict(z=rng.integers(0, 5, n).astype(np.int32), pos=pos,
                 edge_index=np.stack([src, dst]), y=float(n))
        )
    cfg_on = PAMNetConfig(dataset="QM9", dim=16, n_layer=2, scatter_free=True)
    cfg_off = dataclasses.replace(cfg_on, scatter_free=False)
    gb = jax.tree.map(jnp.asarray, build_graph_batch(mols, "qm9", 5.0, 5.0))
    assert gb.tables is not None
    params = init_pamnet(jax.random.PRNGKey(0), cfg_on)

    out_on = np.asarray(apply_pamnet(params, gb, cfg_on))
    out_off = np.asarray(apply_pamnet(params, gb, cfg_off))
    np.testing.assert_allclose(out_on, out_off, rtol=2e-5, atol=1e-5)

    def loss(p, cfg):
        pred = apply_pamnet(p, gb, cfg)
        return jnp.sum(jnp.abs(pred - gb.y) * gb.graph_mask)

    g_on = jax.grad(lambda p: loss(p, cfg_on))(params)
    g_off = jax.grad(lambda p: loss(p, cfg_off))(params)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
