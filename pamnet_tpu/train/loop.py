"""Jitted training/eval steps, single-chip and data-parallel (shard_map).

The data-parallel path is the TPU-native replacement for the parallelism the
reference lacks entirely (SURVEY.md section 2.3): a 1-D device mesh with the
batch dimension sharded, gradients reduced with ``psum`` over ICI, parameters
replicated.  The same compiled program runs on a virtual CPU mesh (tests) and
a real TPU pod slice.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import GraphBatch, hydrate_batch, valid_graphs_np
from pamnet_tpu.models import apply_pamnet
from pamnet_tpu.train.ema import ema_init, ema_update


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: Any
    step: jax.Array


def _loss_terms(pred, y, graph_mask, kind: str):
    """Masked per-graph error sum + count (losses match the drivers:
    l1 for QM9 main_qm9.py:108, mse for PDBbind main_pdbbind.py:95,
    smooth_l1 for RNA main_rna_puzzles.py:92)."""
    err = pred - y
    if kind == "l1":
        e = jnp.abs(err)
    elif kind == "mse":
        e = err * err
    elif kind == "smooth_l1":
        a = jnp.abs(err)
        e = jnp.where(a < 1.0, 0.5 * err * err, a - 0.5)
    else:
        raise ValueError(kind)
    return jnp.sum(e * graph_mask), jnp.sum(graph_mask)


def make_optimizer(schedule, weight_decay: float = 0.0, clip_norm: float | None = None):
    """Adam (+ optional global-norm clip, reference main_qm9.py:111) matching
    torch.optim.Adam defaults (b1=0.9, b2=0.999, eps=1e-8, L2-style wd)."""
    tx = []
    if clip_norm is not None:
        tx.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.scale_by_adam())
    tx.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*tx)


def init_train_state(params, optimizer, use_ema: bool = True) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        ema=ema_init(params) if use_ema else None,
        step=jnp.zeros((), jnp.int32),
    )


def _make_step_body(cfg: PAMNetConfig, optimizer, loss_kind: str,
                    ema_decay: float | None):
    """Shared un-jitted step body: (state, batch) -> (state, loss)."""

    def loss_fn(params, batch: GraphBatch):
        batch = hydrate_batch(batch)  # compact-wire: masks from counts
        pred = apply_pamnet(params, batch, cfg)
        total, count = _loss_terms(pred, batch.y, batch.graph_mask, loss_kind)
        return total / jnp.maximum(count, 1.0)

    def step(state: TrainState, batch: GraphBatch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            ema_update(state.ema, params, ema_decay)
            if state.ema is not None
            else None
        )
        return TrainState(params, opt_state, ema, state.step + 1), loss

    return step


def make_train_step(cfg: PAMNetConfig, optimizer, loss_kind: str,
                    ema_decay: float | None = 0.999):
    """Single-device jitted train step: state, batch -> state, loss."""
    return jax.jit(_make_step_body(cfg, optimizer, loss_kind, ema_decay))


def make_multistep_train_step(cfg: PAMNetConfig, optimizer, loss_kind: str,
                              ema_decay: float | None = 0.999):
    """On-device multi-step training: ``state, batches -> state, losses``
    where ``batches`` is a GraphBatch pytree with a leading scan axis S
    (see ``stack_microbatches``).

    One device dispatch executes S optimizer steps via ``lax.scan`` — this
    removes per-step host dispatch latency entirely (measured ~6 ms/step over
    this pool's TPU tunnel vs 0.7 ms/step true device time at the QM9
    batch-32 recipe) and is the recommended training mode when batches are
    prebuilt/prefetched.
    """
    body = _make_step_body(cfg, optimizer, loss_kind, ema_decay)

    @jax.jit
    def steps(state: TrainState, batches: GraphBatch):
        return jax.lax.scan(body, state, batches)

    return steps


def make_device_data_epoch(cfg: PAMNetConfig, optimizer, loss_kind: str,
                           ema_decay: float | None = 0.999):
    """Whole-epoch training over a DEVICE-RESIDENT dataset:
    ``state, staged, perm -> state, losses`` where ``staged`` is the full
    stacked batch tree (Nb, ...) living in HBM and ``perm`` (Nb,) int32 is
    this epoch's batch visitation order.

    The idiomatic TPU mode for datasets that fit HBM (QM9's 110k-molecule
    split is ~6 GB without ELL tables): the data is transferred ONCE, and
    every epoch is a single device dispatch — a ``lax.scan`` over ``perm``
    that gathers batch ``perm[t]`` from HBM (a ~MB-scale device-local copy)
    and runs the usual step body.  Removes ALL per-epoch host->device
    traffic, which is the dominant cost both over this pool's tunnel
    (~2-40 MB/s; DEVNOTES.md) and, more mildly, over PCIe on local hosts.

    Shuffle semantics: batch COMPOSITION is fixed at staging time (one
    molecule-level shuffle); epochs reshuffle the batch ORDER only.  The
    reference reshuffles molecules into new batches every epoch — a documented
    approximation of this mode (use the streaming path for exact parity).
    """
    body = _make_step_body(cfg, optimizer, loss_kind, ema_decay)

    @jax.jit
    def epoch(state: TrainState, staged: GraphBatch, perm):
        def step(st, idx):
            gb = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), staged)
            return body(st, gb)

        return jax.lax.scan(step, state, perm)

    return epoch


def make_dp_device_data_epoch(cfg: PAMNetConfig, optimizer, loss_kind: str,
                              mesh: Mesh, ema_decay: float | None = 0.999,
                              axis: str = "dp"):
    """Data-parallel whole-epoch training over a DEVICE-RESIDENT dataset:
    ``state, staged, perm -> state, losses`` where ``staged`` (Nb, ...) is
    sharded on its batch axis across the mesh (Nb divisible by D) and
    ``perm`` (S, D) int32 holds each scan step's LOCAL batch index per
    device.  Each of the S steps is one synchronized DP optimizer step:
    device d gathers its HBM-local batch ``perm[t, d]``, gradients arrive
    psum-reduced via shard_map's replication typing (see
    ``make_dp_train_step``), and the loss is the global mean.  Composes the
    two scaling mechanisms: zero per-epoch host->device traffic AND ICI
    data parallelism."""

    def local_loss(params, batch: GraphBatch):
        batch = hydrate_batch(batch)  # compact-wire: masks from counts
        pred = apply_pamnet(params, batch, cfg)
        total, count = _loss_terms(pred, batch.y, batch.graph_mask, loss_kind)
        global_count = jax.lax.psum(count, axis)
        return total / jnp.maximum(global_count, 1.0)

    def shard_epoch(state: TrainState, staged: GraphBatch, perm):
        # staged: local (Nb/D, ...); perm: local (S, 1).
        def step(st, idx):
            gb = jax.tree.map(lambda x: jnp.take(x, idx[0], axis=0), staged)
            local, grads = jax.value_and_grad(local_loss)(st.params, gb)
            loss = jax.lax.psum(local, axis)
            updates, opt_state = optimizer.update(grads, st.opt_state,
                                                  st.params)
            params = optax.apply_updates(st.params, updates)
            ema = (
                ema_update(st.ema, params, ema_decay)
                if st.ema is not None
                else None
            )
            return TrainState(params, opt_state, ema, st.step + 1), loss

        return jax.lax.scan(step, state, perm)

    sharded = shard_map(
        shard_epoch,
        mesh=mesh,
        in_specs=(P(), P(axis), P(None, axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


class DeviceDataTrainer:
    """Driver-facing wrapper for :func:`make_device_data_epoch`: stages the
    whole train split in HBM at construction, then ``run(state)`` executes
    one epoch in a single device dispatch with a fresh batch-order
    permutation and returns the same ``(state, loss_sum, n_graphs,
    n_dispatches)`` accounting as ``EpochRunner.run``."""

    def __init__(self, cfg: PAMNetConfig, optimizer, loss_kind: str,
                 train_loader, to_device, *, ema_decay: float | None = None,
                 seed: int = 0, dp: int = 0, rotate_every: int = 1):
        import sys
        import time

        import numpy as np

        self.dp = max(dp, 0)
        t0 = time.time()
        batches = list(train_loader)
        if self.dp > 1 and len(batches) % self.dp:
            # Shards must be equal; drop the tail batches (same semantics as
            # EpochRunner's trailing-partial handling under DP).
            batches = batches[: len(batches) - (len(batches) % self.dp)]
        self.counts = np.array(
            [valid_graphs_np(b) for b in batches], np.float64,
        )
        stacked = stack_microbatches_host(batches)
        if self.dp > 1:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            mesh = make_mesh(self.dp)
            self.epoch_fn = make_dp_device_data_epoch(
                cfg, optimizer, loss_kind, mesh, ema_decay=ema_decay
            )
            shard = NamedSharding(mesh, _P("dp"))
            self.staged = jax.tree.map(
                lambda x: jax.device_put(x, shard), stacked
            )
        else:
            self.epoch_fn = make_device_data_epoch(
                cfg, optimizer, loss_kind, ema_decay
            )
            self.staged = to_device(stacked)
        jax.block_until_ready(self.staged)
        nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(stacked))
        print(
            f"Device-resident train data: {len(batches)} batches, "
            f"{nbytes / 1e6:.0f} MB staged in {time.time() - t0:.1f}s"
            + (f" (sharded {self.dp}-way)" if self.dp > 1 else ""),
            file=sys.stderr,
        )
        self._rng = np.random.default_rng(seed + 1)
        # Cross-shard rotation (DP only): device-data epochs freeze BOTH the
        # batch composition and the batch->device assignment (each device
        # permutes only its own HBM shard), so two batches living in the
        # same shard can never share an optimizer step — one notch beyond
        # the single-device composition freeze, and a divergence from the
        # reference's per-epoch re-batching (main_qm9.py:74-81).  Rolling
        # the staged batch axis by one shard every ``rotate_every`` epochs
        # (a single on-device collective-permute per leaf, riding ICI)
        # rotates every batch through every device, so cross-shard step
        # pairings vary over epochs.  0 disables.
        self.rotate_every = max(int(rotate_every), 0)
        self._epochs_run = 0
        self._rot = 0
        if self.dp > 1 and self.rotate_every:
            local = len(batches) // self.dp

            # Donate the staged pytree so the rotation reuses its HBM
            # buffers: device_data stages the full train split, and without
            # donation each rotation transiently holds TWO copies of it —
            # an OOM for splits sized near half of per-chip HBM.  (Round-1
            # DEVNOTES recorded donation failing on the axon tunnel; a
            # round-4 re-probe shows the current stack accepts it.  CPU
            # ignores donation with a warning.)
            self._rotate = jax.jit(
                lambda st: jax.tree.map(
                    lambda x: jnp.roll(x, local, axis=0), st
                ),
                out_shardings=shard,
                donate_argnums=(0,),
            )

    def _sync_phase(self, state: TrainState, nb: int) -> None:
        """``--resume`` support: a freshly constructed trainer holding a
        state with a non-zero optimizer step means earlier epochs ran in a
        previous process.  Fast-forward the permutation stream and the
        cross-shard rotation phase to where an uninterrupted run would be,
        so resumed runs keep the intended randomization/rotation cadence
        (the loss accounting was always exact either way)."""
        spe = (nb // self.dp) if self.dp > 1 else nb
        done = int(state.step) // spe if spe else 0
        if not done:
            return
        self._epochs_run = done
        d = self.dp
        for _ in range(done):  # replay the per-epoch permutation draws
            if d > 1:
                for _ in range(d):
                    self._rng.permutation(nb // d)
            else:
                self._rng.permutation(nb)
        if d > 1 and self.rotate_every:
            # Rotations fired at the starts of completed epochs 1..done-1;
            # the start-of-epoch check in run() adds epoch ``done``'s own.
            r = ((done - 1) // self.rotate_every) % d
            for _ in range(r):
                self.staged = self._rotate(self.staged)
            self._rot = r

    def run(self, state: TrainState):
        import numpy as np

        nb = len(self.counts)
        if self._epochs_run == 0:
            self._sync_phase(state, nb)
        if self.dp > 1:
            d = self.dp
            local = nb // d
            if (self.rotate_every and self._epochs_run
                    and self._epochs_run % self.rotate_every == 0):
                self.staged = self._rotate(self.staged)
                self._rot = (self._rot + 1) % d
            self._epochs_run += 1
            # Per-device permutation of its OWN HBM shard.  After r
            # rotations, shard dev holds the batches originally staged on
            # shard (dev - r) mod d, i.e. global rows
            # [((dev - r) mod d) * local, ...) — the counts lookup below
            # tracks that so the loss accounting stays exact.
            perm = np.stack(
                [self._rng.permutation(local) for _ in range(d)], axis=1
            ).astype(np.int32)  # (S, D) local indices
            state, losses = self.epoch_fn(state, self.staged,
                                          jnp.asarray(perm))
            losses = np.asarray(losses, np.float64)  # (S,) global means
            origin = ((np.arange(d) - self._rot) % d) * local
            global_rows = perm + origin[None, :]
            step_counts = self.counts[global_rows].sum(axis=1)  # (S,)
            loss_sum = float(losses @ step_counts)
            return state, loss_sum, float(self.counts.sum()), len(losses)
        self._epochs_run += 1
        perm = self._rng.permutation(nb).astype(np.int32)
        state, losses = self.epoch_fn(state, self.staged, jnp.asarray(perm))
        losses = np.asarray(losses, np.float64)
        loss_sum = float(losses @ self.counts[perm])
        return state, loss_sum, float(self.counts.sum()), nb


def make_multistep_eval(cfg: PAMNetConfig):
    """One-dispatch evaluation: batches stacked on a leading scan axis S ->
    (S, G) predictions (pairs with ``stack_microbatches``; removes per-batch
    dispatch latency like the multistep train step)."""

    @jax.jit
    def run(params, batches: GraphBatch):
        def body(carry, b):
            return carry, apply_pamnet(params, b, cfg)

        _, preds = jax.lax.scan(body, None, batches)
        return preds

    return run


def make_dp_multistep_eval(cfg: PAMNetConfig, mesh: Mesh, axis: str = "dp"):
    """Data-parallel one-dispatch evaluation: batches carry a leading scan
    axis S and a device axis D (leaves (S, D, ...), sharded on axis 1);
    device d scans its own S local batches, so the whole split evaluates in
    S sequential forwards instead of S*D.  Returns (S, D, G) predictions
    where (s, d) is batch ``s*D + d`` — ``StackedEval(dp=D)`` builds exactly
    that layout and flattens it back to batch order.  Params replicated;
    no collectives needed (predictions are independent)."""

    def shard_run(params, batches: GraphBatch):
        local = jax.tree.map(lambda x: x[:, 0], batches)  # (S, ...)

        def body(carry, b):
            return carry, apply_pamnet(params, b, cfg)

        _, preds = jax.lax.scan(body, None, local)
        return preds[:, None]  # (S, 1, G) local slice of the device axis

    sharded = shard_map(
        shard_run,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
    )
    return jax.jit(sharded)


def make_eval_step(cfg: PAMNetConfig):
    """Masked prediction: returns (pred, graph_mask) for metric accumulation
    on host (under EMA weights when the caller passes state.ema)."""

    @jax.jit
    def step(params, batch: GraphBatch):
        return apply_pamnet(params, batch, cfg)

    return step


# ---------------------------------------------------------------------------
# Data parallel over a 1-D mesh
# ---------------------------------------------------------------------------


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"mesh needs {n_devices} devices, have {len(devs)} "
                "(on CPU set jax_num_cpu_devices first)"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def stack_microbatches(batches: list[GraphBatch]) -> GraphBatch:
    """Stack D same-shaped microbatches into leading dim D for sharding."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *batches)


def stack_microbatches_host(batches: list[GraphBatch]) -> GraphBatch:
    """np.stack variant for HOST batches: one numpy array per leaf, so a
    later device transfer is one copy per leaf instead of a jnp.stack
    dispatch per leaf per group (each dispatch pays a round-trip on this
    pool's remote-TPU tunnel)."""
    import numpy as np

    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *batches)


class StackedEval:
    """Pre-staged one-dispatch evaluation over a whole split: batches are
    static, so they are collated once, stacked ON HOST (one numpy array per
    leaf), and transferred in one copy per leaf — per-batch dispatch latency
    and per-leaf transfer round-trips both vanish (DEVNOTES.md: every
    un-batched fetch pays a tunnel RTT on this pool).

    Shared by the three training drivers, which wrap :meth:`predict` with
    their dataset metric (QM9 MAE, PDBbind RMSE/MAE/SD/Pearson quad, RNA
    SmoothL1 — reference main_qm9.py:29-37, main_pdbbind.py:25-39,
    main_rna_puzzles.py:23-42).

    With ``dp > 1`` the split evaluates data-parallel: pass
    ``make_dp_multistep_eval(cfg, make_mesh(dp))`` as ``eval_run``; the
    batch list is padded to a multiple of ``dp`` with zero-mask copies of
    the last batch, stacked to (S, D, ...), and staged sharded on the
    device axis — the scan runs S = ceil(nb/D) forwards instead of nb."""

    def __init__(self, eval_run, loader, to_device, verbose: bool = True,
                 dp: int = 0):
        import sys
        import time

        import numpy as np

        t0 = time.time()
        batches = list(loader)  # host batches; stack on host, transfer once
        self.dp = max(dp, 0)
        if self.dp > 1 and len(batches) % self.dp:
            # Pad with zero-mask dummies (their predictions are masked out;
            # graph_mask=0 also keeps self.mask/self.y aligned below).
            # Compact-wire batches carry counts instead of a mask: zero the
            # valid-graph count (hydrate_batch derives an all-zero mask).
            last = batches[-1]
            if last.graph_mask is not None:
                dummy = last._replace(
                    graph_mask=np.zeros_like(np.asarray(last.graph_mask))
                )
            else:
                c = np.asarray(last.counts).copy()
                c[5] = 0
                dummy = last._replace(counts=c)
            batches = batches + [dummy] * (-len(batches) % self.dp)
        t1 = time.time()
        stacked = stack_microbatches_host(batches)
        if self.dp > 1:
            # (S*D, ...) -> (S, D, ...): element (s, d) = batch s*D + d.
            # Explicit S: a -1 dim is ambiguous for zero-size leaves (e.g.
            # empty feat fields).
            s_len = len(batches) // self.dp
            stacked = jax.tree.map(
                lambda x: x.reshape((s_len, self.dp) + x.shape[1:]), stacked
            )
        t2 = time.time()
        if self.dp > 1:
            from jax.sharding import NamedSharding

            shard = NamedSharding(make_mesh(self.dp), P(None, "dp"))
            self.stacked = jax.tree.map(
                lambda x: jax.device_put(x, shard), stacked
            )
        else:
            self.stacked = to_device(stacked)
        # Force the transfer now so staging cost is attributable (and not
        # folded into the first eval dispatch).  NOTE: on this pool
        # block_until_ready can return at enqueue time (DEVNOTES.md), so
        # the printed transfer split is a lower bound; epoch walls ending
        # in host fetches are the honest total.
        jax.block_until_ready(self.stacked)
        t3 = time.time()
        if verbose:
            nbytes = sum(
                x.nbytes for x in jax.tree_util.tree_leaves(stacked)
            )
            print(
                f"StackedEval: {len(batches)} batches, {nbytes / 1e6:.0f} MB "
                f"(collate {t1 - t0:.1f}s, stack {t2 - t1:.1f}s, "
                f"transfer {t3 - t2:.1f}s)",
                file=sys.stderr,
            )
        def host_mask(b):
            if b.graph_mask is not None:
                return np.asarray(b.graph_mask)
            c = np.asarray(b.counts)  # compact wire: derive from counts
            return (np.arange(b.y.shape[0]) < c[5]).astype(np.float32)

        self.mask = np.concatenate([host_mask(b) for b in batches]) > 0
        self.y = np.concatenate([np.asarray(b.y) for b in batches])[self.mask]
        self.run = eval_run

    def predict(self, params):
        """(valid_graphs,) predictions, aligned with ``self.y``."""
        import numpy as np

        return np.asarray(self.run(params, self.stacked)).reshape(-1)[self.mask]


def make_dp_train_step(cfg: PAMNetConfig, optimizer, loss_kind: str, mesh: Mesh,
                       ema_decay: float | None = 0.999, axis: str = "dp"):
    """Data-parallel train step: batch has leading device axis D; gradients
    are psum-reduced over ICI; params/optimizer state replicated."""

    def local_loss(params, batch: GraphBatch):
        batch = hydrate_batch(batch)  # compact-wire: masks from counts
        pred = apply_pamnet(params, batch, cfg)
        total, count = _loss_terms(pred, batch.y, batch.graph_mask, loss_kind)
        global_count = jax.lax.psum(count, axis)
        return total / jnp.maximum(global_count, 1.0)

    def shard_step(state: TrainState, batch: GraphBatch):
        batch = jax.tree.map(lambda x: x[0], batch)  # strip device axis
        # NOTE: params are replicated (in_spec P()), so under shard_map's
        # replication typing jax.grad already psums the cotangents across the
        # mesh axis — grads arrive globally reduced; do NOT psum again.
        local, grads = jax.value_and_grad(local_loss)(state.params, batch)
        loss = jax.lax.psum(local, axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            ema_update(state.ema, params, ema_decay)
            if state.ema is not None
            else None
        )
        return TrainState(params, opt_state, ema, state.step + 1), loss

    sharded = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def make_dp_multistep_train_step(cfg: PAMNetConfig, optimizer, loss_kind: str,
                                 mesh: Mesh, ema_decay: float | None = 0.999,
                                 axis: str = "dp"):
    """Data-parallel + on-device multi-step: batches carry a leading scan
    axis S and a device axis D, i.e. every leaf is (S, D, ...).  One dispatch
    executes S synchronized DP steps (psum-reduced grads each step)."""

    def local_loss(params, batch: GraphBatch):
        batch = hydrate_batch(batch)  # compact-wire: masks from counts
        pred = apply_pamnet(params, batch, cfg)
        total, count = _loss_terms(pred, batch.y, batch.graph_mask, loss_kind)
        global_count = jax.lax.psum(count, axis)
        return total / jnp.maximum(global_count, 1.0)

    def shard_steps(state: TrainState, batches: GraphBatch):
        batches = jax.tree.map(lambda x: x[:, 0], batches)  # strip device axis

        def body(s, b):
            local, grads = jax.value_and_grad(local_loss)(s.params, b)
            loss = jax.lax.psum(local, axis)
            updates, opt_state = optimizer.update(grads, s.opt_state, s.params)
            params = optax.apply_updates(s.params, updates)
            ema = (
                ema_update(s.ema, params, ema_decay)
                if s.ema is not None
                else None
            )
            return TrainState(params, opt_state, ema, s.step + 1), loss

        return jax.lax.scan(body, state, batches)

    sharded = shard_map(
        shard_steps,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def stack_step_blocks(blocks: list[list[GraphBatch]]) -> GraphBatch:
    """Stack S blocks of D microbatches into (S, D, ...) leaves for
    ``make_dp_multistep_train_step``."""
    stacked_blocks = [stack_microbatches(b) for b in blocks]
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *stacked_blocks)


def _staged(items, stack_host, to_device, depth: int = 2):
    """Map ('block', group, c) -> ('block', staged_device_group, c) and
    ('one', gb, c) -> ('one', device_batch, c) in a background thread so
    host stacking + device transfer overlap the dispatch thread's compute.
    Worker exceptions re-raise in the consumer."""
    import queue as _queue
    import threading as _threading

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for kind, payload, c in items:
                staged = stack_host(payload) if kind == "block" else to_device(payload)
                q.put((kind, staged, c))
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 - relayed to consumer
            q.put(e)

    t = _threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


class EpochRunner:
    """Drives one training epoch in any of the three execution modes shared
    by the CLI drivers (single-step, lax.scan multi-step blocks, shard_map
    data-parallel groups), with the reference's num_graphs-weighted loss
    accounting (reference main_qm9.py:109,119).

    Builds each jitted step exactly once (including the single-batch step
    used for trailing partial groups/blocks — re-jitting it per epoch would
    pay a fresh trace+compile every epoch).
    """

    def __init__(self, cfg: PAMNetConfig, optimizer, loss_kind: str, *,
                 ema_decay: float | None = None, dp: int = 0,
                 scan_steps: int = 1):
        self.dp = max(dp, 0)
        self.scan_steps = max(scan_steps, 1)
        if self.dp > 1:
            mesh = make_mesh(self.dp)
            self.step_fn = make_dp_train_step(cfg, optimizer, loss_kind, mesh,
                                              ema_decay=ema_decay)
        elif self.scan_steps > 1:
            self.step_fn = make_multistep_train_step(cfg, optimizer, loss_kind,
                                                     ema_decay=ema_decay)
        else:
            self.step_fn = make_train_step(cfg, optimizer, loss_kind,
                                           ema_decay=ema_decay)
        self._single = (
            self.step_fn
            if self.dp <= 1 and self.scan_steps <= 1
            else make_train_step(cfg, optimizer, loss_kind, ema_decay=ema_decay)
        )

    @property
    def group_size(self) -> int:
        """Optimizer steps per epoch divide by this under data parallelism."""
        return self.dp if self.dp > 1 else 1

    def run(self, state: TrainState, batches, to_device, *,
            defer_fetch: bool = True):
        """Consume an iterable of host batches; returns
        ``(state, loss_sum, n_graphs, n_dispatches)`` where ``loss_sum`` is
        the num-graphs-weighted sum of per-step mean losses.

        ``defer_fetch=False`` restores a synchronous loss fetch after every
        dispatch (A/B control; the deferred default is bit-identical and
        saves one tunnel round trip per dispatch).

        Groups are stacked on the HOST (np.stack) and transferred once —
        stacking device-resident microbatches issues one jnp.stack dispatch
        per pytree leaf per group, which dominated epoch time over this
        pool's remote-TPU tunnel (~40 s/epoch -> host-stacked ~4 s)."""
        import numpy as np

        def count(gb):
            return valid_graphs_np(gb)

        def stack_host(group):
            return to_device(
                jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                             *group)
            )

        # Groups are stacked AND transferred in a background thread
        # (_staged below), so wire time overlaps device compute — on
        # transfer-bound links the dispatch thread otherwise serializes
        # ~MBs/step of host->device traffic with execution (DEVNOTES.md
        # 110k-scale findings).
        #
        # Loss fetches are DEFERRED: each dispatch's loss stays a device
        # array in `pending`, fetched once at epoch end (one device_get =
        # one tunnel round trip).  A synchronous float(loss) per block pays
        # this pool's ~90 ms host<->device RTT *per dispatch*, which rivals
        # the 16-step block's own compute — dispatches now enqueue
        # asynchronously and the epoch syncs once.  Accounting replays in
        # dispatch order with the same float arithmetic, so loss_sum is
        # bit-identical to the per-block fetch.
        pending: list = []  # (kind, device_losses, counts)
        sync = (lambda x: jax.device_get(x)) if not defer_fetch else (lambda x: x)
        nb = 0
        if self.dp > 1:
            def gen():
                group, gcount = [], 0.0
                for gb in batches:
                    gcount += count(gb)
                    group.append(gb)
                    if len(group) == self.dp:
                        yield ("block", group, gcount)
                        group, gcount = [], 0.0
                for gb in group:  # trailing partial group, stepped singly
                    yield ("one", gb, count(gb))

            for kind, dev, c in _staged(gen(), stack_host, to_device):
                if kind == "block":
                    state, loss = self.step_fn(state, dev)
                else:
                    state, loss = self._single(state, dev)
                pending.append(("one", sync(loss), c)); nb += 1
        elif self.scan_steps > 1:
            def gen():
                group, counts = [], []
                for gb in batches:
                    counts.append(count(gb))
                    group.append(gb)
                    if len(group) == self.scan_steps:
                        yield ("block", group, counts)
                        group, counts = [], []
                for gb, c in zip(group, counts):  # trailing partial block
                    yield ("one", gb, c)

            for kind, dev, c in _staged(gen(), stack_host, to_device):
                if kind == "block":
                    state, losses = self.step_fn(state, dev)
                    pending.append(("block", sync(losses), c)); nb += len(c)
                else:
                    state, loss = self._single(state, dev)
                    pending.append(("one", sync(loss), c)); nb += 1
        else:
            def gen():
                for gb in batches:
                    yield ("one", gb, count(gb))

            for _, dev, c in _staged(gen(), stack_host, to_device):
                state, loss = self.step_fn(state, dev)
                pending.append(("one", sync(loss), c)); nb += 1
        # One batched fetch for every dispatch's loss (async copies under a
        # single device_get), then replay the accounting in dispatch order.
        fetched = jax.device_get([p[1] for p in pending])
        loss_sum, ng = 0.0, 0.0
        for (kind, _, c), host in zip(pending, fetched):
            if kind == "block":
                loss_sum += float(np.asarray(host) @ np.asarray(c))
                ng += sum(c)
            else:
                loss_sum += float(host) * c
                ng += c
        return state, loss_sum, ng, nb
