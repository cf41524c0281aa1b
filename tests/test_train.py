"""Training-loop tests: loss descends on a tiny problem, EMA matches the
reference recurrence, schedules match the reference drivers' shapes,
checkpoints roundtrip, and the data-parallel step equals the single-device
step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import PadSizes, build_graph_batch
from pamnet_tpu.models import apply_pamnet, init_pamnet
from pamnet_tpu.train import ema_init, ema_update
from pamnet_tpu.train.loop import (
    TrainState,
    init_train_state,
    make_dp_train_step,
    make_eval_step,
    make_mesh,
    make_optimizer,
    make_train_step,
    stack_microbatches,
)
from pamnet_tpu.train.schedules import constant, multistep, warmup_exponential

CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=1, cutoff_l=5.0, cutoff_g=5.0)


def _mols(rng, n_mols, seed_y=True):
    mols = []
    for _ in range(n_mols):
        n = int(rng.integers(5, 10))
        pos = (rng.random((n, 3)) * 3.0).astype(np.float32)
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        mols.append(
            dict(
                z=rng.integers(0, 5, n).astype(np.int32),
                pos=pos,
                edge_index=np.stack([src, dst]),
                y=float(n) if seed_y else 0.0,  # learnable target: atom count
            )
        )
    return mols


PADS = PadSizes(n=128, eg=1024, el=128, t2=512, t1=512, g=8,
                kg_dst=32, kg_src=32, kl_dst=8, kl_src=8,
                k2_ji=16, k2_kj=16, k1_ji=16, k1_jj=16)


def _batch(rng, n_mols=4):
    gb = build_graph_batch(_mols(rng, n_mols), "qm9", 5.0, 5.0, pads=PADS)
    return jax.tree.map(jnp.asarray, gb)


def test_loss_decreases(rng):
    batch = _batch(rng)
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(constant(1e-3), clip_norm=1000.0)
    state = init_train_state(params, opt)
    step = make_train_step(CFG, opt, "l1")
    losses = []
    for _ in range(30):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_ema_recurrence_matches_reference(rng):
    params = {"a": jnp.asarray([1.0, 2.0]), "b": {"c": jnp.asarray([3.0])}}
    shadow = ema_init(params)
    new = {"a": jnp.asarray([2.0, 0.0]), "b": {"c": jnp.asarray([1.0])}}
    shadow = ema_update(shadow, new, decay=0.9, num_updates=99999)
    # d = min(0.9, 100000/100009) = 0.9 -> shadow = 0.1*new + 0.9*old
    np.testing.assert_allclose(np.asarray(shadow["a"]), [1.1, 1.8], rtol=1e-6)
    # Early-step bias correction: n=0 -> d = min(0.9, 1/10) = 0.1
    shadow2 = ema_update(ema_init(params), new, decay=0.9, num_updates=0)
    np.testing.assert_allclose(np.asarray(shadow2["a"]), [1.9, 0.2], rtol=1e-6)


def test_warmup_exponential_schedule():
    # Sequence-exact torch semantics (tests/test_schedule_torch_parity.py):
    # update k trains at the lr the reference scheduler set after update k-1.
    sched = warmup_exponential(1e-4, steps_per_epoch=100)
    # Linear ramp during epoch 0 (shifted one step: lr(k) = base*(k-1)/N).
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(51)), 0.5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(101)), 1e-4, rtol=1e-6)
    # Exponential decay afterwards: gamma^(t-1).
    np.testing.assert_allclose(
        float(sched(301)), 1e-4 * 0.9961697**2, rtol=1e-5
    )


def test_multistep_schedule():
    sched = multistep(1e-3, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(10 * 50)) == pytest.approx(1e-3 * 0.2)
    assert float(sched(10 * 100)) == pytest.approx(1e-3 * 0.04)


def test_checkpoint_roundtrip(tmp_path, rng):
    from pamnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(constant(1e-3))
    state = init_train_state(params, opt)
    step = make_train_step(CFG, opt, "l1")
    state, _ = step(state, _batch(rng))

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state)
    template = init_train_state(init_pamnet(jax.random.PRNGKey(7), CFG), opt)
    restored = load_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dp_step_matches_single_device(rng):
    """8-way data parallel on the virtual CPU mesh == single big batch."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    micro = [_batch(rng, n_mols=2) for _ in range(8)]
    stacked = stack_microbatches(micro)

    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    # SGD: params diff is linear in grads, so the comparison is well
    # conditioned (Adam's g/sqrt(v) amplifies float reassociation when g~0).
    import optax

    opt = optax.sgd(0.1)
    mesh = make_mesh(8)
    dp_step = make_dp_train_step(CFG, opt, "l1", mesh)
    state0 = init_train_state(params, opt)
    state_dp, loss_dp = dp_step(state0, stacked)

    # Single-device equivalent: average the per-shard normalized losses by
    # computing the same global-count normalization manually.
    from pamnet_tpu.train.loop import _loss_terms

    def big_loss(p):
        totals, counts = [], []
        for b in micro:
            pred = apply_pamnet(p, b, CFG)
            t, c = _loss_terms(pred, b.y, b.graph_mask, "l1")
            totals.append(t)
            counts.append(c)
        return sum(totals) / sum(counts)

    loss_ref, grads_ref = jax.value_and_grad(big_loss)(params)
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)

    updates, _ = opt.update(grads_ref, state0.opt_state, params)
    params_ref = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(state_dp.params), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_multistep_scan_matches_sequential(rng):
    from pamnet_tpu.train.loop import make_multistep_train_step

    batches = [_batch(rng, n_mols=3) for _ in range(4)]
    params = init_pamnet(jax.random.PRNGKey(2), CFG)
    opt = make_optimizer(constant(1e-3), clip_norm=1000.0)

    state_a = init_train_state(params, opt)
    step = make_train_step(CFG, opt, "l1")
    seq_losses = []
    for b in batches:
        state_a, loss = step(state_a, b)
        seq_losses.append(float(loss))

    state_b = init_train_state(params, opt)
    run = make_multistep_train_step(CFG, opt, "l1")
    state_b, losses = run(state_b, stack_microbatches(batches))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    assert int(state_b.step) == 4
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_device_data_epoch_matches_sequential(rng):
    """HBM-resident epoch scan (make_device_data_epoch) over a permutation
    == sequential single steps in that order: same losses, same params."""
    from pamnet_tpu.train.loop import make_device_data_epoch

    batches = [_batch(rng, n_mols=3) for _ in range(5)]
    params = init_pamnet(jax.random.PRNGKey(2), CFG)
    opt = make_optimizer(constant(1e-3), clip_norm=1000.0)
    perm = np.array([3, 0, 4, 1, 2], np.int32)

    state_a = init_train_state(params, opt)
    step = make_train_step(CFG, opt, "l1")
    seq_losses = []
    for i in perm:
        state_a, loss = step(state_a, batches[int(i)])
        seq_losses.append(float(loss))

    state_b = init_train_state(params, opt)
    epoch = make_device_data_epoch(CFG, opt, "l1")
    staged = stack_microbatches(batches)
    state_b, losses = epoch(state_b, staged, jnp.asarray(perm))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    assert int(state_b.step) == 5
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_device_data_epoch_matches_dp_steps(rng):
    """DP over an HBM-resident sharded dataset (make_dp_device_data_epoch,
    D=2) == the tested make_dp_train_step applied sequentially to the same
    per-step batch pairs."""
    from pamnet_tpu.train.loop import (
        make_dp_device_data_epoch,
        make_dp_train_step,
        make_mesh,
    )

    assert len(jax.devices()) >= 2
    batches = [_batch(rng, n_mols=2) for _ in range(6)]  # dev0: 0-2, dev1: 3-5
    params = init_pamnet(jax.random.PRNGKey(3), CFG)
    opt = make_optimizer(constant(1e-3), clip_norm=1000.0)
    mesh = make_mesh(2)
    perm = np.array([[2, 0], [0, 2], [1, 1]], np.int32)  # (S=3, D=2) local

    state_a = init_train_state(params, opt)
    dp_step = make_dp_train_step(CFG, opt, "l1", mesh)
    seq_losses = []
    for t in range(perm.shape[0]):
        pair = stack_microbatches(
            [batches[perm[t, 0]], batches[3 + perm[t, 1]]]
        )
        state_a, loss = dp_step(state_a, pair)
        seq_losses.append(float(loss))

    state_b = init_train_state(params, opt)
    epoch = make_dp_device_data_epoch(CFG, opt, "l1", mesh)
    staged = stack_microbatches(batches)  # (6, ...) -> sharded by in_specs
    state_b, losses = epoch(state_b, staged, jnp.asarray(perm))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_dp_multistep_matches_dp_sequential(rng):
    """(S=3 scan) x (D=8 data parallel) == 3 sequential DP steps."""
    from pamnet_tpu.train.loop import (
        make_dp_multistep_train_step,
        stack_step_blocks,
    )

    blocks = [[_batch(rng, n_mols=2) for _ in range(8)] for _ in range(3)]
    params = init_pamnet(jax.random.PRNGKey(4), CFG)
    import optax

    opt = optax.sgd(0.1)
    mesh = make_mesh(8)

    state_a = init_train_state(params, opt)
    dp_step = make_dp_train_step(CFG, opt, "l1", mesh)
    seq_losses = []
    for block in blocks:
        state_a, loss = dp_step(state_a, stack_microbatches(block))
        seq_losses.append(float(loss))

    state_b = init_train_state(params, opt)
    run = make_dp_multistep_train_step(CFG, opt, "l1", mesh)
    state_b, losses = run(state_b, stack_step_blocks(blocks))
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_eval_step(rng):
    params = init_pamnet(jax.random.PRNGKey(0), CFG)
    ev = make_eval_step(CFG)
    batch = _batch(rng)
    pred = ev(params, batch)
    assert pred.shape == batch.y.shape
    assert np.all(np.isfinite(np.asarray(pred)))


@pytest.mark.parametrize("mode", [{"dp": 2}, {"scan_steps": 2}])
def test_epoch_runner_trailing_group_matches_sequential(rng, mode):
    """EpochRunner with 5 batches and group size 2 (2 full groups + 1
    trailing single) must produce the same final params and weighted loss
    accounting as plain sequential single-batch stepping."""
    import optax

    from pamnet_tpu.train.loop import EpochRunner

    batches = [_batch(rng, n_mols=2) for _ in range(5)]
    params = init_pamnet(jax.random.PRNGKey(1), CFG)
    opt = optax.sgd(0.05)

    runner = EpochRunner(CFG, opt, "l1", ema_decay=None, **mode)
    state, loss_sum, ng, nb = runner.run(
        init_train_state(params, opt, use_ema=False), iter(batches),
        lambda gb: jax.tree.map(jnp.asarray, gb),
    )

    seq = make_train_step(CFG, opt, "l1", ema_decay=None)
    state_ref = init_train_state(params, opt, use_ema=False)
    ref_loss_sum = ref_ng = 0.0
    for gb in batches:
        c = float(np.asarray(gb.graph_mask).sum())
        state_ref, loss = seq(state_ref, jax.tree.map(jnp.asarray, gb))
        ref_loss_sum += float(loss) * c
        ref_ng += c
    # dp groups D batches into ONE optimizer step; scan replays each batch
    # as its own step.
    expected_steps = 3 if "dp" in mode else 5
    assert int(state.step) == expected_steps and ng == ref_ng
    if "scan_steps" in mode:
        # Identical math, identical order -> near-bitwise.
        np.testing.assert_allclose(loss_sum, ref_loss_sum, rtol=1e-6)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(state_ref.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    else:
        # DP groups average two batches per step (different but equally
        # valid accounting); just require the run to have stepped sanely.
        assert nb == 3 and np.isfinite(loss_sum)


@pytest.mark.parametrize("mode", [{}, {"dp": 2}, {"scan_steps": 2}])
def test_epoch_runner_deferred_fetch_bit_identical(rng, mode):
    """The deferred epoch-end loss fetch (one device_get per epoch, the
    default — saves one tunnel RTT per dispatch on the remote-TPU pool)
    must reproduce the synchronous per-dispatch fetch EXACTLY: same replay
    order, same float arithmetic."""
    import optax

    from pamnet_tpu.train.loop import EpochRunner

    batches = [_batch(rng, n_mols=2) for _ in range(5)]
    params = init_pamnet(jax.random.PRNGKey(3), CFG)
    opt = optax.sgd(0.05)
    to_dev = lambda gb: jax.tree.map(jnp.asarray, gb)  # noqa: E731

    results = []
    for defer in (True, False):
        runner = EpochRunner(CFG, opt, "l1", ema_decay=None, **mode)
        state, loss_sum, ng, nb = runner.run(
            init_train_state(params, opt, use_ema=False), iter(batches),
            to_dev, defer_fetch=defer)
        results.append((state, loss_sum, ng, nb))
    (st_a, ls_a, ng_a, nb_a), (st_b, ls_b, ng_b, nb_b) = results
    assert ls_a == ls_b and ng_a == ng_b and nb_a == nb_b
    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
