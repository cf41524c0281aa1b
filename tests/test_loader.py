"""GraphLoader behavior: fixed worst-case pads, shuffle determinism,
prefetch equivalence, partial-batch handling."""

import numpy as np

from pamnet_tpu.data.loader import GraphLoader


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


def test_single_compiled_shape_and_no_overflow(rng):
    loader = GraphLoader(_mols(rng, 23), "qm9", 5.0, 5.0, batch_size=8)
    shapes = set()
    n_graphs = 0
    for gb in loader:  # includes the trailing partial batch
        shapes.add(tuple(x.shape for x in [gb.z, gb.eg_src, gb.el_src, gb.t2_kj, gb.t1_jj]))
        shapes.add(tuple(v.shape for k, v in sorted(gb.tables.items())))
        n_graphs += int(gb.graph_mask.sum())
    assert len(shapes) == 2  # one batch-field shape set + one table shape set
    assert n_graphs == 23


def test_shuffle_determinism_and_coverage(rng):
    mols = _mols(rng, 16)
    a = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, shuffle=True, seed=7)
    b = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, shuffle=True, seed=7)
    assert a.batches() == b.batches()
    flat = [i for chunk in a.batches() for i in chunk]
    assert sorted(flat) == list(range(16))
    # Different epoch -> different order (advancing RNG).
    assert a.batches() != b.batches() or True  # second call advances a's RNG
    assert a.batches() != b.batches()


def test_prefetch_equivalent_to_iter(rng):
    mols = _mols(rng, 10)
    l1 = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4)
    l2 = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4)
    for gb_a, gb_b in zip(l1, l2.prefetch()):
        np.testing.assert_array_equal(gb_a.z, gb_b.z)
        np.testing.assert_array_equal(gb_a.eg_src, gb_b.eg_src)
        np.testing.assert_array_equal(gb_a.y, gb_b.y)


def test_prefetch_propagates_worker_errors(rng, monkeypatch):
    import pamnet_tpu.data.loader as loader_mod

    loader = GraphLoader(_mols(rng, 6), "qm9", 5.0, 5.0, batch_size=3)

    def boom(*a, **k):
        raise ValueError("synthetic overflow in worker")

    monkeypatch.setattr(loader_mod, "collate_structures", boom)
    try:
        list(loader.prefetch())
        raise AssertionError("expected worker error to propagate")
    except ValueError as e:
        assert "overflow" in str(e)


def test_undersized_pads_are_widened(rng):
    """Explicit pads are a minimum bucket: a split whose molecules exceed
    them (e.g. a test split sharing the train bucket) must widen instead of
    crashing mid-run with an overflow."""
    from pamnet_tpu.data.batch import PadSizes

    mols = _mols(rng, 6)
    tiny = PadSizes(n=8, eg=8, el=8, t2=8, t1=8, g=8)
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3, pads=tiny)
    assert loader.pads.n >= 8 and loader.pads.eg > 8
    batches = list(loader)  # must not raise
    assert len(batches) == 2
    # And pads at least as large as the auto bucket in every dimension.
    auto = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3).pads
    import dataclasses

    for f in dataclasses.fields(PadSizes):
        assert getattr(loader.pads, f.name) >= getattr(auto, f.name)


def test_strict_pads_raises_instead_of_widening(rng):
    """strict_pads=True: undersized explicit pads are an error (multi-process
    DP callers must not silently diverge their compiled batch shapes)."""
    import pytest

    from pamnet_tpu.data.batch import PadSizes

    mols = _mols(rng, 6)
    tiny = PadSizes(n=8, eg=8, el=8, t2=8, t1=8, g=8)
    with pytest.raises(ValueError, match="strict_pads"):
        GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3, pads=tiny,
                    strict_pads=True)
    # Covering pads pass through unchanged under strict mode.
    auto = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3).pads
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3, pads=auto,
                         strict_pads=True)
    assert loader.pads == auto


def test_widening_emits_warning(rng):
    import warnings as _w

    from pamnet_tpu.data.batch import PadSizes

    mols = _mols(rng, 6)
    tiny = PadSizes(n=8, eg=8, el=8, t2=8, t1=8, g=8)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3, pads=tiny)
    assert any("widening" in str(r.message) for r in rec)


def test_drop_last(rng):
    loader = GraphLoader(_mols(rng, 10), "qm9", 5.0, 5.0, batch_size=4,
                         drop_last=True)
    assert len(loader) == 2
    assert sum(1 for _ in loader) == 2


def test_ladder_pads_shrink_tail_and_match_fixed(rng):
    """ladder_pads=True: the trailing partial batch pads to a smaller
    bucket than the fixed worst case, every bucket stays within the fixed
    pads, and model outputs per graph are unchanged."""
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.models import apply_pamnet, init_pamnet

    mols = _mols(rng, 11)  # 8 + 3 tail at batch_size=8
    fixed = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                        build_tables=False, align=8)
    ladder = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                         build_tables=False, ladder_pads=True, align=8)
    fb = list(fixed)
    lb = list(ladder)
    assert len(fb) == len(lb) == 2
    # The tail bucket must be no larger anywhere and strictly smaller in
    # the triplet dim (3 small molecules vs the 8-largest worst case).
    assert lb[1].z.shape[0] <= fb[1].z.shape[0]
    assert lb[1].t1_jj.shape[0] < fb[1].t1_jj.shape[0]

    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=1, cutoff_l=5.0,
                       cutoff_g=5.0)
    params = init_pamnet(jax.random.PRNGKey(0), cfg)
    run = jax.jit(apply_pamnet, static_argnums=2)
    preds_f, preds_l = [], []
    for fgb, lgb in zip(fb, lb):
        nf = int(fgb.graph_mask.sum())
        nl = int(lgb.graph_mask.sum())
        assert nf == nl
        preds_f.append(np.asarray(run(params, jax.tree.map(jnp.asarray, fgb),
                                      cfg))[:nf])
        preds_l.append(np.asarray(run(params, jax.tree.map(jnp.asarray, lgb),
                                      cfg))[:nl])
    np.testing.assert_allclose(np.concatenate(preds_l),
                               np.concatenate(preds_f), rtol=2e-5, atol=2e-6)


def test_exact_pads_tighter_than_ladder_and_match(rng):
    """ladder_pads="exact": per-batch pads are the align-rounded counts —
    never larger than the geometric buckets, always covering the counts,
    with per-graph model outputs unchanged."""
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.models import apply_pamnet, init_pamnet

    mols = _mols(rng, 11)
    ladder = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                         build_tables=False, ladder_pads=True, align=8)
    exact = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8,
                        build_tables=False, ladder_pads="exact", align=8)
    lb, eb = list(ladder), list(exact)
    for lgb, egb in zip(lb, eb):
        for f in ("z", "eg_src", "el_src", "t2_ji", "t1_ji"):
            assert getattr(egb, f).shape[0] <= getattr(lgb, f).shape[0], f
        # Exact pads still cover every real row (mask count < pad size).
        for m, f in (("eg_mask", "eg_src"), ("t1_mask", "t1_ji")):
            assert int(getattr(egb, m).sum()) <= getattr(egb, f).shape[0]
    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=1, cutoff_l=5.0,
                       cutoff_g=5.0)
    params = init_pamnet(jax.random.PRNGKey(0), cfg)
    run = jax.jit(apply_pamnet, static_argnums=2)
    for lgb, egb in zip(lb, eb):
        n = int(lgb.graph_mask.sum())
        a = np.asarray(run(params, jax.tree.map(jnp.asarray, lgb), cfg))[:n]
        b = np.asarray(run(params, jax.tree.map(jnp.asarray, egb), cfg))[:n]
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_plan_pads_fixed_composition_and_coverage(rng):
    """plan_pads: pads pinned to the frozen plan's maxima (never larger
    than worst case), composition identical across epochs (order may
    shuffle), every molecule covered exactly once."""
    mols = _mols(rng, 37)
    worst = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8, align=8)
    plan = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8, align=8,
                       plan_pads=True, shuffle=True, seed=3)
    for d in ("n", "eg", "el", "t2", "t1"):
        assert getattr(plan.pads, d) <= getattr(worst.pads, d)
    # ELL widths stay the dataset-global maxima.
    for d in ("kg_dst", "kg_src", "k2_ji", "k1_jj"):
        assert getattr(plan.pads, d) == getattr(worst.pads, d)
    e1 = plan.batches()
    e2 = plan.batches()
    comp1 = sorted(tuple(sorted(b)) for b in e1)
    comp2 = sorted(tuple(sorted(b)) for b in e2)
    assert comp1 == comp2  # composition frozen
    assert sorted(i for b in e1 for i in b) == list(range(37))
    n_graphs = sum(int(gb.graph_mask.sum()) for gb in plan)
    assert n_graphs == 37


def test_balanced_batches_tighten_pads_and_preserve_outputs(rng):
    """balanced_batches: LPT packing lowers (or matches) the plan maxima vs
    the sequential plan, covers every molecule, and per-graph model outputs
    equal the unbalanced loader's (same molecules, different grouping)."""
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.models import apply_pamnet, init_pamnet

    mols = _mols(rng, 32)
    seq = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8, align=8,
                      build_tables=False)
    bal = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8, align=8,
                      build_tables=False, balanced_batches=True)
    for d in ("n", "eg", "el", "t2", "t1"):
        assert getattr(bal.pads, d) <= getattr(seq.pads, d)
    order = [i for b in bal.batches() for i in b]
    assert sorted(order) == list(range(32))

    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=1, cutoff_l=5.0,
                       cutoff_g=5.0)
    params = init_pamnet(jax.random.PRNGKey(0), cfg)
    run = jax.jit(apply_pamnet, static_argnums=2)

    def scores(loader):
        out = {}
        for idxs, gb in zip(loader.batches(), loader):
            pred = np.asarray(run(params, jax.tree.map(jnp.asarray, gb), cfg))
            for k, i in enumerate(idxs):
                out[i] = pred[k]
        return np.array([out[i] for i in range(32)])

    np.testing.assert_allclose(scores(bal), scores(seq), rtol=2e-5, atol=2e-6)


def test_balanced_drop_last_drops_random_not_smallest(rng):
    """drop_last + balanced_batches must not bias the kept set toward large
    molecules: over several seeds, at least one smallest-quartile molecule
    survives in every plan (dropping by cost would always drop them)."""
    mols = _mols(rng, 19)  # batch_size 4 -> 4 batches of 4, 3 dropped
    sizes = np.array([len(m["z"]) for m in mols])
    smallest3 = frozenset(np.argsort(sizes)[:3].tolist())  # = the drop count
    dropped_sets = set()
    import warnings

    for seed in range(4):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # frozen-remainder warning
            ld = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, align=8,
                             balanced_batches=True, drop_last=True, seed=seed)
        kept = {i for b in ld.batches() for i in b}
        assert len(kept) == 16
        dropped_sets.add(frozenset(range(19)) - frozenset(kept))
    # A drop-the-cheapest implementation would drop the SAME 3 smallest
    # molecules every seed; random dropping gives seed-dependent sets that
    # are (essentially) never exactly the 3 smallest.
    assert len(dropped_sets) > 1, "dropped set identical across seeds"
    assert any(d != smallest3 for d in dropped_sets), (
        "always drops the smallest molecules -> biased"
    )


def test_plan_drop_last_smaller_than_batch(rng):
    """drop_last with fewer molecules than one batch: every plan mode must
    agree with the streaming path (zero batches, len 0) instead of crashing
    at construction (non-balanced plan) or yielding a phantom partial batch
    (balanced)."""
    mols = _mols(rng, 3)
    for kw in (dict(plan_pads=True, shuffle=True), dict(balanced_batches=True)):
        ld = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, align=8,
                         drop_last=True, **kw)
        assert len(ld) == 0
        assert ld.batches() == []
        assert list(ld) == []


def test_build_perms_follows_build_tables(rng):
    """Gather-backward perm/offset aux arrays: training loaders
    (build_tables=True) build them by default, inference/eval loaders
    (build_tables=False) skip them (no backward to route), and the
    --no_ell_tables training case opts in explicitly with build_perms=True
    (tiny next to ELL tables; keeps the routed backwards scatter-free)."""
    mols = _mols(rng, 6)
    perm_keys = {"el_src_perm", "el_src_poff", "t2_kj_perm", "t2_kj_poff",
                 "t1_jj_perm", "t1_jj_poff"}
    for bt, bp, expect in ((True, None, True), (False, None, False),
                           (False, True, True), (True, False, False)):
        ld = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3, align=8,
                         build_tables=bt, build_perms=bp)
        gb = next(iter(ld))
        got = perm_keys & set(gb.tables)
        assert (got == perm_keys) == expect and (got or not expect), (bt, bp)


def test_cache_collate_bit_identical_and_hit(rng):
    """cache_collate: epoch 2 yields the SAME (cached) objects and their
    arrays are bit-identical to an uncached loader's — collation is a pure
    function of the frozen batch composition."""
    mols = _mols(rng, 12)
    kw = dict(batch_size=4, align=8, balanced_batches=True, shuffle=True,
              seed=3, compact_wire=True, wire_geometry="derive",
              build_tables="derive")
    cached = GraphLoader(mols, "qm9", 5.0, 5.0, cache_collate=True, **kw)
    plain = GraphLoader(mols, "qm9", 5.0, 5.0, **kw)
    e1 = {tuple(np.asarray(gb.y).tolist()): gb for gb in cached}
    assert len(cached._collate_cache) == 3
    # Epoch 2: every yield is an identity hit on the epoch-1 object.
    for gb in cached:
        assert gb is e1[tuple(np.asarray(gb.y).tolist())]
    ref = {tuple(np.asarray(gb.y).tolist()): gb for gb in plain}
    assert set(ref) == set(e1)
    for k, gb in e1.items():
        for a, b in zip(gb, ref[k]):
            if isinstance(a, np.ndarray):
                np.testing.assert_array_equal(a, b)
            elif isinstance(a, dict):
                assert set(a) == set(b)
                for t in a:
                    np.testing.assert_array_equal(a[t], b[t])


def test_cache_collate_requires_frozen_composition(rng):
    import pytest

    with pytest.raises(ValueError, match="frozen batch composition"):
        GraphLoader(_mols(rng, 8), "qm9", 5.0, 5.0, batch_size=4, align=8,
                    shuffle=True, cache_collate=True)
    # shuffle=False streaming chunks are frozen too — allowed.
    ld = GraphLoader(_mols(rng, 8), "qm9", 5.0, 5.0, batch_size=4, align=8,
                     cache_collate=True)
    list(ld)
    assert len(ld._collate_cache) == 2


def test_cache_collate_budget_partial(rng):
    """A tiny cache_collate_max_mb stops inserts past the budget (warns
    once) while iteration output stays identical."""
    import warnings

    mols = _mols(rng, 12)
    ld = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, align=8,
                     balanced_batches=True, cache_collate=True,
                     cache_collate_max_mb=1e-5)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        e1 = list(ld)
        e2 = list(ld)
    assert any("budget reached" in str(x.message) for x in w)
    assert len(ld._collate_cache) < 3
    for a, b in zip(e1, e2):
        np.testing.assert_array_equal(a.z, b.z)
        np.testing.assert_array_equal(a.y, b.y)
