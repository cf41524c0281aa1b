"""Parallel package tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import PadSizes, build_graph_batch
from pamnet_tpu.models import apply_pamnet, init_pamnet
from pamnet_tpu.parallel import make_dp_eval_step, make_mesh, shard_batch

CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=1)
PADS = PadSizes(n=128, eg=1024, el=128, t2=512, t1=512, g=8,
                kg_dst=32, kg_src=32, kl_dst=8, kl_src=8,
                k2_ji=16, k2_kj=16, k1_ji=16, k1_jj=16)


def _batch(rng, n_mols=3):
    mols = []
    for _ in range(n_mols):
        n = int(rng.integers(5, 10))
        pos = (rng.random((n, 3)) * 3.0).astype(np.float32)
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        mols.append(
            dict(z=rng.integers(0, 5, n).astype(np.int32), pos=pos,
                 edge_index=np.stack([src, dst]), y=float(n))
        )
    return build_graph_batch(mols, "qm9", 5.0, 5.0, pads=PADS)


def test_shard_batch_places_data_sharded(rng):
    mesh = make_mesh(8)
    micro = [_batch(rng) for _ in range(8)]
    stacked = shard_batch(micro, mesh)
    leaf = stacked.pos
    assert leaf.shape[0] == 8
    # Each device holds one microbatch (leading dim sharded 8 ways).
    assert len(leaf.sharding.device_set) == 8


def test_dp_eval_matches_single(rng):
    mesh = make_mesh(8)
    micro = [_batch(rng) for _ in range(8)]
    stacked = shard_batch(micro, mesh)
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    dp_fwd = make_dp_eval_step(CFG, mesh)
    preds = np.asarray(dp_fwd(params, stacked))  # (8, G)
    for d, gb in enumerate(micro):
        want = np.asarray(apply_pamnet(params, jax.tree.map(jnp.asarray, gb), CFG))
        np.testing.assert_allclose(preds[d], want, rtol=2e-5, atol=1e-5)


def test_dp_stacked_eval_matches_single(rng):
    """StackedEval(dp=D) over make_dp_multistep_eval: a whole split with a
    batch count NOT divisible by D (dummy-padded) must reproduce the
    single-device StackedEval predictions and y alignment exactly."""
    from pamnet_tpu.train.loop import (
        StackedEval,
        make_dp_multistep_eval,
        make_multistep_eval,
    )
    from pamnet_tpu.train.loop import make_mesh as make_loop_mesh

    class _Loader:
        def __init__(self, batches):
            self._b = batches

        def __iter__(self):
            return iter(self._b)

    batches = [_batch(rng, n_mols=int(rng.integers(2, 4))) for _ in range(11)]
    to_device = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    params = init_pamnet(jax.random.PRNGKey(1), CFG)

    single = StackedEval(make_multistep_eval(CFG), _Loader(batches),
                         to_device, verbose=False)
    dp = StackedEval(make_dp_multistep_eval(CFG, make_loop_mesh(4)),
                     _Loader(batches), to_device, verbose=False, dp=4)
    np.testing.assert_array_equal(single.y, dp.y)
    np.testing.assert_allclose(dp.predict(params), single.predict(params),
                               rtol=2e-5, atol=1e-5)


def test_device_data_rotation_rotates_and_accounts_exactly(rng):
    """--device_data --dp cross-shard rotation (DeviceDataTrainer
    rotate_every): after each rotated epoch the staged shards hold the
    previous shard's batches (np.roll on the stacked batch axis), the
    counts-based loss accounting follows the rotation (exact n_graphs), and
    training losses stay finite.  Also pins rotate_every=0 == frozen
    assignment (pre-rotation behavior)."""
    from pamnet_tpu.train.loop import (
        DeviceDataTrainer,
        init_train_state,
        make_optimizer,
        stack_microbatches_host,
    )
    from pamnet_tpu.train.schedules import constant

    D = 4
    # Distinct per-batch molecule counts so accounting errors are visible.
    batches = [_batch(rng, n_mols=2 + (i % 3)) for i in range(2 * D)]
    host_stack = stack_microbatches_host(batches)
    to_device = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731

    optimizer = make_optimizer(constant(1e-3))
    trainer = DeviceDataTrainer(
        PAMNetConfig(dataset="QM9", dim=16, n_layer=1), optimizer, "l1",
        batches, to_device, ema_decay=0.999, seed=3, dp=D, rotate_every=1,
    )
    params = init_pamnet(jax.random.PRNGKey(2), trainer_cfg())
    state = init_train_state(params, optimizer, use_ema=True)

    total = sum(float(np.asarray(b.graph_mask).sum()) for b in batches)
    for epoch in range(D + 1):  # a full rotation cycle and back to identity
        state, loss_sum, ng, nb = trainer.run(state)
        assert ng == total
        assert np.isfinite(loss_sum)
        # Shard contents roll one shard per epoch after the first.
        want = np.roll(np.asarray(host_stack.z), 2 * (epoch % D), axis=0)
        np.testing.assert_array_equal(np.asarray(trainer.staged.z), want)


def _branch_setup(kind, rng, n_micro, per, build_tables=True):
    """(cfg, loss_kind, micro_batches) for the PDBbind / RNA forward
    branches — uniform shapes via one GraphLoader over all microbatch
    molecules (reference branch semantics: models.py:117-157)."""
    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.synthetic import (
        synthetic_pdbbind_graph,
        synthetic_rna_graph,
    )

    mols = []
    if kind == "pdbbind":
        for _ in range(n_micro * per):
            g = synthetic_pdbbind_graph(rng)
            mols.append(dict(pos=g["attrs"], feat=g["labels"], y=g["y"]))
        cfg = PAMNetConfig(dataset="PDBbind", dim=16, n_layer=1,
                           cutoff_l=2.0, cutoff_g=6.0)
        loss_kind = "mse"
    else:
        for _ in range(n_micro * per):
            g = synthetic_rna_graph(rng)
            mols.append(dict(pos=g["attrs"], z=g["labels"].astype(np.int32),
                             y=g["y"]))
        cfg = PAMNetConfig(dataset="rna_dp", dim=16, n_layer=1,
                           cutoff_l=2.6, cutoff_g=20.0,
                           flow="target_to_source")
        loss_kind = "smooth_l1"
    loader = GraphLoader(mols, kind, cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=per, build_tables=build_tables,
                         build_perms=build_tables)
    return cfg, loss_kind, list(loader)


import pytest  # noqa: E402


@pytest.mark.parametrize("kind", ["pdbbind", "rna"])
def test_dp_step_matches_single_device_branches(rng, kind):
    """4-way DP == single big batch for the PDBbind (signed ΔE pooling) and
    RNA (mean pool + target_to_source flow) branches — QM9 is covered by
    tests/test_train.py::test_dp_step_matches_single_device; these two
    branches previously ran DP only on paper (VERDICT r4 #3)."""
    import optax

    from pamnet_tpu.train.loop import (
        _loss_terms,
        init_train_state,
        make_dp_train_step,
        make_mesh as make_loop_mesh,
        stack_microbatches,
    )

    D = 4
    cfg, loss_kind, micro = _branch_setup(kind, rng, D, 2)
    micro = [jax.tree.map(jnp.asarray, b) for b in micro]
    stacked = stack_microbatches(micro)
    params = init_pamnet(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(0.1)  # linear in grads: well-conditioned comparison
    mesh = make_loop_mesh(D)
    dp_step = make_dp_train_step(cfg, opt, loss_kind, mesh)
    state0 = init_train_state(params, opt)
    state_dp, loss_dp = dp_step(state0, stacked)

    def big_loss(p):
        totals, counts = [], []
        for b in micro:
            pred = apply_pamnet(p, b, cfg)
            t, c = _loss_terms(pred, b.y, b.graph_mask, loss_kind)
            totals.append(t)
            counts.append(c)
        return sum(totals) / sum(counts)

    loss_ref, grads_ref = jax.value_and_grad(big_loss)(params)
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
    updates, _ = opt.update(grads_ref, state0.opt_state, params)
    import optax as _optax

    params_ref = _optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("kind", ["pdbbind", "rna"])
def test_dp_stacked_eval_matches_single_branches(rng, kind):
    """StackedEval(dp=2) equals the single-device evaluator on the PDBbind
    and RNA branches (batch count NOT divisible by D: dummy-pad path)."""
    from pamnet_tpu.train.loop import (
        StackedEval,
        make_dp_multistep_eval,
        make_multistep_eval,
    )
    from pamnet_tpu.train.loop import make_mesh as make_loop_mesh

    cfg, _, batches = _branch_setup(kind, rng, 5, 2, build_tables=False)

    class _Loader:
        def __iter__(self):
            return iter(batches)

    to_device = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    params = init_pamnet(jax.random.PRNGKey(1), cfg)
    single = StackedEval(make_multistep_eval(cfg), _Loader(), to_device,
                         verbose=False)
    dp = StackedEval(make_dp_multistep_eval(cfg, make_loop_mesh(2)),
                     _Loader(), to_device, verbose=False, dp=2)
    np.testing.assert_array_equal(single.y, dp.y)
    np.testing.assert_allclose(dp.predict(params), single.predict(params),
                               rtol=2e-5, atol=1e-5)


def test_device_data_resume_keeps_rotation_and_rng_phase(rng):
    """--resume into --device_data --dp: a freshly constructed trainer with
    a mid-run state fast-forwards its permutation stream and rotation phase
    (DeviceDataTrainer._sync_phase), so the resumed epochs reproduce an
    uninterrupted run exactly — same losses, same staged shard contents
    (ADVICE r4: the rotation cycle previously restarted at zero)."""
    from pamnet_tpu.train.loop import (
        DeviceDataTrainer,
        init_train_state,
        make_optimizer,
    )
    from pamnet_tpu.train.schedules import constant

    D = 4
    batches = [_batch(rng, n_mols=2 + (i % 3)) for i in range(2 * D)]
    to_device = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    optimizer = make_optimizer(constant(1e-3))
    cfg = trainer_cfg()
    params = init_pamnet(jax.random.PRNGKey(2), cfg)

    def fresh_trainer():
        return DeviceDataTrainer(cfg, optimizer, "l1", batches, to_device,
                                 ema_decay=0.999, seed=3, dp=D,
                                 rotate_every=1)

    # Uninterrupted: 4 epochs in one trainer.
    a = fresh_trainer()
    sa = init_train_state(params, optimizer, use_ema=True)
    ref = []
    for _ in range(4):
        sa, loss_sum, ng, nbd = a.run(sa)
        ref.append(loss_sum)

    # Interrupted: 2 epochs, then a NEW trainer resumes from the state.
    b = fresh_trainer()
    sb = init_train_state(params, optimizer, use_ema=True)
    for _ in range(2):
        sb, *_ = b.run(sb)
    c = fresh_trainer()  # simulates a restarted process + --resume
    got = []
    for _ in range(2):
        sb, loss_sum, *_ = c.run(sb)
        got.append(loss_sum)
    np.testing.assert_allclose(got, ref[2:], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(c.staged.z),
                                  np.asarray(a.staged.z))


def trainer_cfg():
    return PAMNetConfig(dataset="QM9", dim=16, n_layer=1)
