"""QM9 property-regression training driver (reference: main_qm9.py).

Flag surface mirrors the reference 1:1 (README.md:77-91) with TPU-native
additions: ``--dp N`` shards the batch over an N-device mesh, ``--synthetic``
trains on generated molecules when the QM9 raw files are absent (no network
egress here), ``--limit`` subsamples for smoke runs, ``--precision`` selects
MXU matmul precision.

Reference recipe: --model PAMNet --target=7 --epochs=900 --batch_size=32
                  --dim=128 --n_layer=6 --lr=1e-4  (README.md:95)
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

from pamnet_tpu.utils.runtime import enable_compilation_cache, set_seed


class StackedEval:
    """QM9 metric wrapper over the shared pre-staged evaluator
    (train/loop.py::StackedEval): MAE (reference main_qm9.py:29-37).
    Lazy import keeps jax out of module import time (--platform handling)."""

    def __init__(self, eval_run, loader, to_device, dp: int = 0):
        from pamnet_tpu.train.loop import StackedEval as _SE

        self._ev = _SE(eval_run, loader, to_device, dp=dp)

    def mae(self, params) -> float:
        ev = self._ev
        return float(np.abs(ev.predict(params) - ev.y).mean())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gpu', type=int, default=0, help='Device ordinal (CLI parity).')
    parser.add_argument('--seed', type=int, default=480, help='Random seed.')
    parser.add_argument('--dataset', type=str, default='QM9', help='Dataset to be used')
    parser.add_argument('--model', type=str, default='PAMNet',
                        choices=['PAMNet', 'PAMNet_s'], help='Model to be used')
    parser.add_argument('--epochs', type=int, default=300, help='Number of epochs to train.')
    parser.add_argument('--lr', type=float, default=1e-4, help='Initial learning rate.')
    parser.add_argument('--wd', type=float, default=0, help='Weight decay (L2 loss).')
    parser.add_argument('--n_layer', type=int, default=6, help='Number of hidden layers.')
    parser.add_argument('--dim', type=int, default=128, help='Size of input hidden units.')
    parser.add_argument('--batch_size', type=int, default=32, help='batch_size')
    parser.add_argument('--target', type=int, default=7, help='Index of target for prediction')
    parser.add_argument('--cutoff_l', type=float, default=5.0, help='cutoff in local layer')
    parser.add_argument('--cutoff_g', type=float, default=5.0, help='cutoff in global layer')
    # TPU-native extensions
    parser.add_argument('--dp', type=int, default=0,
                        help='Data-parallel devices (0 = single device)')
    parser.add_argument('--scan_steps', type=int, default=1,
                        help='Optimizer steps per device dispatch (lax.scan '
                             'block; removes per-step host dispatch latency)')
    parser.add_argument('--synthetic', action='store_true',
                        help='Train on synthetic molecules (no QM9 files needed)')
    parser.add_argument('--limit', type=int, default=0,
                        help='Subsample the dataset to N molecules (smoke runs)')
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['default', 'float32'])
    parser.add_argument('--platform', type=str, default='auto',
                        help='jax platform (auto|cpu|axon|tpu)')
    parser.add_argument('--save_dir', type=str, default='save')
    parser.add_argument('--resume', type=str, default='',
                        help='Checkpoint to resume full train state from '
                             '(params+optimizer+EMA+step)')
    parser.add_argument('--trace_dir', type=str, default='',
                        help='Capture a jax.profiler device trace of epoch 0 '
                             'into this directory')
    parser.add_argument('--metrics_csv', type=str, default='',
                        help='Append per-epoch metrics to this CSV file')
    parser.add_argument('--compute_dtype', type=str, default='bfloat16',
                        choices=['float32', 'bfloat16'],
                        help='Activation dtype for the message-passing stack. '
                             'Default bfloat16: +12.5%% throughput with '
                             'convergence indistinguishable from float32 on '
                             'matched 250-epoch runs (DEVNOTES.md '
                             'training-dynamics section); segment reductions '
                             'and the fusion softmax always accumulate in '
                             'f32. Use float32 for exactness-sensitive runs.')
    parser.add_argument('--device_data', action='store_true',
                        help='Stage the whole padded train split in device '
                             'HBM once and run each epoch as ONE device '
                             'dispatch (lax.scan over a per-epoch batch-order '
                             'permutation). The idiomatic TPU mode for '
                             'datasets that fit HBM (~6 GB for the 110k QM9 '
                             'split with --no_ell_tables); removes all '
                             'per-epoch host->device traffic. Batch '
                             'composition is fixed at staging (epochs '
                             'reshuffle batch order only); composes with '
                             '--dp (shards the staged batches across the '
                             'mesh, one synchronized DP step per scan step; '
                             'each device permutes its OWN shard, so the '
                             'batch->device assignment is also frozen — '
                             'see --shard_rotate)')
    parser.add_argument('--shard_rotate', type=int, default=1,
                        help='With --device_data --dp: roll the staged '
                             'batches one shard across the mesh every K '
                             'epochs (one on-device collective-permute per '
                             'epoch, riding ICI), so every batch rotates '
                             'through every device and cross-shard step '
                             'pairings vary over epochs instead of being '
                             'frozen at staging. 0 disables (pre-rotation '
                             'behavior). Loss accounting stays exact either '
                             'way')
    parser.add_argument('--device_basis', action='store_true',
                        help='Skip host-precomputed spherical-basis/distance '
                             'tables; evaluate geometry on device (~2%% '
                             'slower step, ~60%% smaller batches on the '
                             'wire — pair with --device_data staging)')
    parser.add_argument('--host_geometry', action='store_true',
                        help='Ship host-precomputed float geometry '
                             '(distances + spherical-basis tables) on the '
                             'streaming-train wire instead of the default '
                             'derive mode (positions + integer tables only; '
                             'geometry recomputed inside the compiled step — '
                             'the reference recomputes it per forward too, '
                             'models.py:104-188). Derive halves the '
                             'remaining wire bytes and won the streaming '
                             'epoch wall 2.02x same-process at ~3%% '
                             'device-step cost (tools/tpu_ab.py geo); '
                             '--device_data (wire paid once at staging) '
                             'always ships host geometry')
    parser.add_argument('--host_tables', action='store_true',
                        help='Ship host-built (G,K) ELL tables on the wire '
                             'for the streaming train path instead of the '
                             'default derive mode (tiny shape markers, '
                             'tables rebuilt bit-identically inside the '
                             'compiled step — ops/ell.py::'
                             'materialize_tables). Derive cuts staged bytes '
                             '~45%% and won the streaming epoch wall 1.69x '
                             'same-process (tools/tpu_ab.py derive); host '
                             'tables cost ~3%% less device step time, so '
                             '--device_data (wire paid once at staging) '
                             'always uses them')
    parser.add_argument('--no_ell_tables', action='store_true',
                        help='Skip host-built ELL aggregation tables '
                             '(sorted-offset prefix scans remain). Trades '
                             '~30%% device step speed for ~45%% less '
                             'host->device traffic per batch — wins on '
                             'transfer-bound links (DEVNOTES.md 110k-scale '
                             'findings); keep tables on local hardware')
    parser.add_argument('--device_graph', action='store_true',
                        help='Rebuild the radius graph on device inside the '
                             'compiled step (reference per-forward semantics, '
                             'models.py:110; for dynamic-geometry uses — the '
                             'host-precomputed path is faster for static '
                             'positions)')
    parser.add_argument('--balanced_batches', action='store_true',
                        help='Freeze batch composition via LPT size packing '
                             'and pin the padding bucket to the plan\'s true '
                             'maxima instead of the any-shuffle worst case '
                             '(+52%% step throughput at the headline recipe: '
                             'the worst-case bucket pads 1.4-1.8x more rows '
                             'than real batches use, and the step is '
                             'HBM-bound on padded edge gathers). Epochs '
                             'reshuffle batch ORDER only — the same '
                             'composition-vs-reference divergence as '
                             '--device_data (which it composes with)')
    parser.add_argument('--no_cache_collate', action='store_true',
                        help='Disable the cross-epoch collation cache that '
                             '--balanced_batches streaming runs use by '
                             'default (+28%% epoch wall: with a frozen plan '
                             'the collated wire per batch is a pure function '
                             'of its molecule set, so epochs 2+ skip host '
                             'collation; bit-identical arrays, tools/'
                             'tpu_ab.py colcache)')
    parser.add_argument('--cache_collate_mb', type=float, default=4096.0,
                        help='Collation-cache budget in MB (batches past the '
                             'budget keep collating per epoch)')
    parser.add_argument('--structure_cache', type=str, default='',
                        help='Directory for the on-disk precomputed-structure '
                             'cache (content-addressed, resumable; '
                             'data/structcache.py)')
    parser.add_argument('--cache_workers', type=int, default=0,
                        help='Process-pool size for building missing '
                             'structure-cache chunks (0 = in-process)')
    args = parser.parse_args()

    set_seed(args.seed)
    from pamnet_tpu.utils.runtime import (
        ensure_devices, set_matmul_precision, set_platform,
    )
    set_platform(args.platform)
    ensure_devices(args.dp)
    enable_compilation_cache()
    set_matmul_precision(args.precision)

    import jax
    import jax.numpy as jnp

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.models import count_parameters, init_pamnet
    from pamnet_tpu.train.checkpoint import save_checkpoint
    from pamnet_tpu.train.loop import init_train_state, make_optimizer
    from pamnet_tpu.train.schedules import warmup_exponential

    # ---- dataset (reference split: shuffle; 110k/10k/rest, main_qm9.py:71-76) ----
    if args.synthetic:
        from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
        mols = synthetic_qm9_dataset(args.limit or 2048, seed=args.seed)
        print("Using SYNTHETIC molecules (no QM9 raw files).", file=sys.stderr)
        n_train = int(len(mols) * 0.8)
        n_val = int(len(mols) * 0.1)
    else:
        from pamnet_tpu.data.qm9 import load_qm9, select_target
        # allow_download mirrors the reference's auto-download
        # (qm9_dataset.py:156-168); on no-egress hosts it raises with
        # staging instructions instead.
        mols = select_target(
            load_qm9(osp.join('.', 'data', args.dataset), allow_download=True),
            args.target,
        )
        rng = np.random.default_rng(args.seed)
        order = rng.permutation(len(mols))
        mols = [mols[i] for i in order]
        if args.limit:
            mols = mols[: args.limit]
            n_train = int(len(mols) * 0.8)
            n_val = int(len(mols) * 0.1)
        else:
            n_train, n_val = 110000, 10000

    variant = "s" if args.model == "PAMNet_s" else "full"
    cfg = PAMNetConfig(dataset='QM9', dim=args.dim, n_layer=args.n_layer,
                       cutoff_l=args.cutoff_l, cutoff_g=args.cutoff_g,
                       variant=variant, compute_dtype=args.compute_dtype,
                       device_graph=args.device_graph)

    train_mols = mols[:n_train]
    val_mols = mols[n_train:n_train + n_val]
    test_mols = mols[n_train + n_val:]

    common = dict(dataset_kind='qm9', cutoff_l=cfg.cutoff_l, cutoff_g=cfg.cutoff_g,
                  variant=variant,
                  build_tables=not args.no_ell_tables,
                  precompute_basis=not args.device_basis,
                  cache_dir=args.structure_cache or None,
                  cache_workers=args.cache_workers)
    dp = max(args.dp, 0)
    # Streaming train epochs re-ship every batch, so they default to
    # derive-mode ELL tables (markers on the wire, tables rebuilt
    # bit-identically on device — 1.69x epoch wall, tools/tpu_ab.py derive);
    # --device_data stages once and keeps the ~3% faster host tables.
    if args.no_ell_tables:
        train_tables = False
    elif args.device_data or args.host_tables:
        train_tables = True
    else:
        train_tables = "derive"
    # Streaming train batches also default to derive-mode GEOMETRY: the wire
    # ships positions + integer tables only and the compiled step recomputes
    # distances/bases (2.02x epoch wall, ~3% device-step cost; tools/
    # tpu_ab.py geo).  --device_data stages once, so it keeps host geometry.
    train_geometry = ("host" if (args.device_data or args.host_geometry)
                      else "derive")
    # Derive-wire batches also ship COMPACT: int16 indices + counts instead
    # of masks/node_graph, hydrated bit-identically inside the compiled
    # step (+19%% streaming epoch wall, wire 0.387 -> 0.160 MB/batch;
    # tools/tpu_ab.py wiremin).  --host_geometry restores the full wire.
    compact = train_geometry == "derive"
    # Frozen-plan streaming epochs re-collate identical batches every epoch;
    # the cross-epoch cache yields the same arrays instead (+27.6% epoch
    # wall same-process, loss bit-equal; tools/tpu_ab.py colcache).  Only
    # valid when composition is frozen (--balanced_batches); --device_data
    # iterates the loader once, so a cache would only waste RAM.
    cache_collate = (args.balanced_batches and not args.device_data
                     and not args.no_cache_collate)
    t_load = time.time()
    train_loader = GraphLoader(train_mols, batch_size=args.batch_size,
                               shuffle=True, seed=args.seed, drop_last=True,
                               balanced_batches=args.balanced_batches,
                               build_perms=True, wire_geometry=train_geometry,
                               compact_wire=compact,
                               cache_collate=cache_collate,
                               cache_collate_max_mb=args.cache_collate_mb,
                               **{**common, "build_tables": train_tables})
    # Eval composition is free — labels ride inside the batches and the
    # metric is a global mean over molecules — so the eval splits ALWAYS use
    # LPT-balanced packing with their own exact pads (each split compiles
    # its own forward shape): measured +4.3% eval throughput over plan pads
    # (and far more over the worst-case bucket) with bit-identical MAE, plus
    # ~10% less staged bytes (tools/tpu_ab.py evalpads, DEVNOTES round-3).
    val_loader = GraphLoader(val_mols, batch_size=args.batch_size,
                             balanced_batches=True, build_perms=False,
                             **common)
    test_loader = GraphLoader(test_mols, batch_size=args.batch_size,
                              balanced_batches=True, build_perms=False,
                              **common)
    print(f"Data loaded! train={len(train_mols)} val={len(val_mols)} "
          f"test={len(test_mols)} pads={train_loader.pads} "
          f"({time.time() - t_load:.1f}s structure build)")

    params = init_pamnet(jax.random.PRNGKey(args.seed), cfg)
    print("Number of model parameters:", count_parameters(params))

    steps_per_epoch = max(len(train_loader) // max(dp, 1), 1)
    # The reference advances the fractional epoch by step/(len(train)/bs)
    # (main_qm9.py:114), a float divisor distinct from the integer batch
    # count; pass it through so the lr-vs-epoch mapping matches even when
    # batch_size does not divide the dataset (single-process path only — DP
    # divides the step count instead).
    frac = len(train_mols) / args.batch_size if dp <= 1 else None
    optimizer = make_optimizer(
        warmup_exponential(args.lr, steps_per_epoch, frac_steps_per_epoch=frac),
        weight_decay=args.wd, clip_norm=1000.0,
    )
    state = init_train_state(params, optimizer, use_ema=True)
    if args.resume:
        from pamnet_tpu.train.checkpoint import load_checkpoint
        state = load_checkpoint(args.resume, state)
        print(f"Resumed full train state from {args.resume} at step {int(state.step)}")
    # Evaluation shards over the same mesh as training under --dp (the
    # stacked split scans ceil(nb/D) forwards instead of nb).
    if dp > 1:
        from pamnet_tpu.train.loop import make_dp_multistep_eval, make_mesh
        eval_run = make_dp_multistep_eval(cfg, make_mesh(dp))
    else:
        from pamnet_tpu.train.loop import make_multistep_eval
        eval_run = make_multistep_eval(cfg)

    # Packed staging: one wire buffer per dtype instead of one transfer per
    # pytree leaf (~35 leaves x ~90 ms RTT on tunneled pools; also fewer
    # DMA descriptors on local hardware).  See utils/wirepack.py.
    from pamnet_tpu.utils.wirepack import stage as to_device

    from pamnet_tpu.train.loop import EpochRunner
    runner = EpochRunner(cfg, optimizer, "l1", ema_decay=0.999, dp=dp,
                         scan_steps=args.scan_steps)

    device_trainer = None
    if args.device_data:
        from pamnet_tpu.train.loop import DeviceDataTrainer
        device_trainer = DeviceDataTrainer(
            cfg, optimizer, "l1", train_loader, to_device,
            ema_decay=0.999, seed=args.seed, dp=dp,
            rotate_every=args.shard_rotate,
        )

    save_folder = osp.join('.', args.save_dir, args.dataset)
    os.makedirs(save_folder, exist_ok=True)

    val_eval = StackedEval(eval_run, val_loader, to_device, dp=dp)
    test_eval = StackedEval(eval_run, test_loader, to_device, dp=dp)

    print("Start training!")
    best_val_loss, test_loss = None, float('nan')
    import contextlib

    from pamnet_tpu.utils.profiling import CSVLogger, trace

    metrics_log = (
        CSVLogger(args.metrics_csv,
                  ["epoch", "train_mae", "val_mae", "test_mae", "seconds",
                   "mol_per_sec"])
        if args.metrics_csv else None
    )

    for epoch in range(args.epochs):
        tracing = trace(args.trace_dir) if (args.trace_dir and epoch == 0) \
            else contextlib.nullcontext()
        t0 = time.time()
        # Per-batch losses are means over valid graphs; EpochRunner weights
        # them by the batch's valid-graph count so train MAE matches the
        # reference's num_graphs-weighted accounting (main_qm9.py:109,119)
        # even if batch sizes ever vary.
        with tracing:
            if device_trainer is not None:
                # One device dispatch for the whole epoch over the
                # HBM-resident dataset (batch-order reshuffle only).
                state, loss_sum, ng, nb = device_trainer.run(state)
            else:
                state, loss_sum, ng, nb = runner.run(
                    state, train_loader.prefetch(), to_device
                )
        train_loss = loss_sum / max(ng, 1.0)

        # Eval under EMA weights (reference: main_qm9.py:29-37,120).
        val_loss = val_eval.mae(state.ema)
        if best_val_loss is None or val_loss <= best_val_loss:
            test_loss = test_eval.mae(state.ema)
            best_val_loss = val_loss
            save_checkpoint(osp.join(save_folder, "best_model.msgpack"), state)

        dt = time.time() - t0
        print(f'Epoch: {epoch+1:03d}, Train MAE: {train_loss:.7f}, '
              f'Val MAE: {val_loss:.7f}, Test MAE: {test_loss:.7f} '
              f'({dt:.1f}s, {ng/dt:.0f} mol/s)')
        if metrics_log:
            metrics_log.log(epoch=epoch + 1, train_mae=train_loss,
                            val_mae=val_loss, test_mae=test_loss,
                            seconds=round(dt, 2),
                            mol_per_sec=round(ng / dt, 1))
    print('Best Validation MAE:', best_val_loss)
    print('Testing MAE:', test_loss)


if __name__ == "__main__":
    main()
