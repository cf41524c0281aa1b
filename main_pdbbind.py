"""PDBbind binding-affinity training driver (reference: main_pdbbind.py):
MSE loss, MultiStepLR(gamma=0.2, every 50 epochs), eval quad
RMSE/MAE/SD/Pearson on the core set, 90/10 non-shuffled train/val split.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import numpy as np

from pamnet_tpu.utils.metrics import mae, pearson, rmse, sd
from pamnet_tpu.utils.runtime import (
    enable_compilation_cache, resolve_path, set_seed,
)

REFERENCE_ROOT = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")


class StackedEval:
    """PDBbind metric wrapper over the shared pre-staged evaluator
    (train/loop.py::StackedEval): the RMSE/MAE/SD/Pearson quad (reference:
    main_pdbbind.py:25-39).  Lazy import keeps jax out of module import
    time (--platform handling)."""

    def __init__(self, eval_run, loader, to_device, dp: int = 0):
        from pamnet_tpu.train.loop import StackedEval as _SE

        self._ev = _SE(eval_run, loader, to_device, dp=dp)

    def __call__(self, params):
        preds = self._ev.predict(params)
        y = self._ev.y
        return rmse(y, preds), mae(y, preds), sd(y, preds), pearson(y, preds)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gpu', type=int, default=0, help='Device ordinal (CLI parity).')
    parser.add_argument('--seed', type=int, default=805, help='Random seed.')
    parser.add_argument('--dataset', type=str, default='PDBbind', help='Dataset to be used')
    parser.add_argument('--epochs', type=int, default=200, help='Number of epochs to train.')
    parser.add_argument('--lr', type=float, default=5e-4, help='Initial learning rate.')
    parser.add_argument('--wd', type=float, default=0, help='Weight decay (L2 loss).')
    parser.add_argument('--n_layer', type=int, default=2, help='Number of hidden layers.')
    parser.add_argument('--dim', type=int, default=128, help='Size of input hidden units.')
    parser.add_argument('--batch_size', type=int, default=32, help='batch_size')
    parser.add_argument('--cutoff_l', type=float, default=2.0, help='cutoff in local layer')
    parser.add_argument('--cutoff_g', type=float, default=6.0, help='cutoff in global layer')
    parser.add_argument('--data_root', type=str, default=None)
    parser.add_argument('--platform', type=str, default='auto')
    parser.add_argument('--structure_cache', type=str, default='',
                        help='Directory for the on-disk precomputed-structure '
                             'cache (data/structcache.py)')
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='Activation dtype for the message-passing stack')
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['default', 'float32'])
    parser.add_argument('--dp', type=int, default=0,
                        help='Data-parallel devices (0 = single device)')
    parser.add_argument('--scan_steps', type=int, default=1,
                        help='Optimizer steps per device dispatch')
    parser.add_argument('--balanced_batches', action='store_true',
                        help='Freeze batch composition via size packing and '
                             'pin pads to the plan maxima (epochs reshuffle '
                             'batch order only; see main_qm9.py)')
    parser.add_argument('--no_cache_collate', action='store_true',
                        help='Disable the cross-epoch collation cache used '
                             'by --balanced_batches streaming runs '
                             '(bit-identical arrays; see main_qm9.py)')
    parser.add_argument('--cache_collate_mb', type=float, default=4096.0,
                        help='Collation-cache budget in MB')
    parser.add_argument('--device_data', action='store_true',
                        help='Stage the whole padded train split in device '
                             'HBM once; each epoch is one dispatch (batch '
                             'order reshuffled per epoch; incompatible '
                             'with --dp)')
    parser.add_argument('--host_tables', action='store_true',
                        help='Build ELL aggregation tables (the QM9 default) '
                             'instead of the PDBbind default sorted-scan/'
                             'perm routing: the radius-6 A global graphs '
                             'carry ~40-80 neighbors/atom and the (G,K) ELL '
                             'gathers measured 2.8x SLOWER there '
                             '(tools/tpu_ab.py pdbbind)')
    parser.add_argument('--host_geometry', action='store_true',
                        help='Ship host-precomputed float geometry on the '
                             'streaming-train wire instead of the default '
                             'derive mode (positions + integer tables only; '
                             'geometry recomputed in the compiled step — '
                             '2.02x QM9 epoch wall, tools/tpu_ab.py geo). '
                             '--device_data always ships host geometry')
    parser.add_argument('--save_dir', type=str, default='',
                        help='Save the best-val full train state to '
                             '<save_dir>/PDBbind/best_model.msgpack (the '
                             'reference driver saves nothing, so this is '
                             'off by default)')
    parser.add_argument('--resume', type=str, default='',
                        help='Checkpoint to resume full train state from '
                             '(params+optimizer+step)')
    parser.add_argument('--metrics_csv', type=str, default='',
                        help='Append per-epoch metrics to this CSV file')
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
    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.models import count_parameters, init_pamnet
    from pamnet_tpu.train.loop import (
        EpochRunner, init_train_state, make_multistep_eval, make_optimizer,
    )
    from pamnet_tpu.train.schedules import multistep

    data_root = args.data_root or resolve_path(
        osp.join('.', 'data', args.dataset),
        osp.join(REFERENCE_ROOT, 'data', args.dataset),
    )
    refined = TUDataset(data_root, 'train_val').molecules()
    core = TUDataset(data_root, 'test').molecules()
    # The reference shuffles the refined set (main_pdbbind.py:62 .shuffle())
    # and THEN splits 90/10 without re-shuffling (main_pdbbind.py:66
    # train_test_split(shuffle=False); sklearn ceils the test fraction), so
    # the val set is a random 10%, not the file-order tail.
    import math
    perm = np.random.default_rng(args.seed).permutation(len(refined))
    refined = [refined[i] for i in perm]
    n_train = len(refined) - math.ceil(len(refined) * 0.1)
    train_mols, val_mols = refined[:n_train], refined[n_train:]
    print(f"Data loaded! train={len(train_mols)} val={len(val_mols)} test={len(core)}")

    cfg = PAMNetConfig(dataset='PDBbind', dim=args.dim, n_layer=args.n_layer,
                       cutoff_l=args.cutoff_l, cutoff_g=args.cutoff_g,
                       compute_dtype=args.compute_dtype)

    # NO ELL tables by default on PDBbind (train AND eval): the radius-6 A
    # global graphs carry ~40-80 neighbors/atom with 2-3x max-vs-mean skew,
    # and the (G, K) ELL gather-aggregation measured 2.8x SLOWER than the
    # sorted-scan/perm routing at realistic complexes (tools/tpu_ab.py
    # pdbbind) — the RNA wide-degree lesson extends to training.
    # --host_tables opts back into ELL (e.g. for narrow-degree data).
    common = dict(dataset_kind='pdbbind', cutoff_l=cfg.cutoff_l,
                  cache_dir=args.structure_cache or None,
                  cutoff_g=cfg.cutoff_g,
                  build_tables=bool(args.host_tables))
    train_tables = bool(args.host_tables)
    train_geometry = ("host" if (args.device_data or args.host_geometry)
                      else "derive")
    # Derive-wire batches also ship COMPACT: int16 indices + counts instead
    # of masks/node_graph, hydrated bit-identically inside the compiled
    # step (+19%% streaming epoch wall, wire 0.387 -> 0.160 MB/batch;
    # tools/tpu_ab.py wiremin).  --host_geometry restores the full wire.
    compact = train_geometry == "derive"
    # Cross-epoch collation cache for frozen-plan streaming runs (+27.6%
    # QM9 epoch wall same-process, bit-identical; tools/tpu_ab.py colcache).
    cache_collate = (args.balanced_batches and not args.device_data
                     and not args.no_cache_collate)
    train_loader = GraphLoader(train_mols, batch_size=args.batch_size,
                               shuffle=True, seed=args.seed,
                               balanced_batches=args.balanced_batches,
                               wire_geometry=train_geometry,
                               compact_wire=compact,
                               build_perms=True,
                               cache_collate=cache_collate,
                               cache_collate_max_mb=args.cache_collate_mb,
                               **{**common, "build_tables": train_tables})
    # Eval composition is free (labels ride in the batches; metrics are
    # global reductions), so eval splits always use LPT-balanced packing —
    # metric-identical, tighter pads (tools/tpu_ab.py evalpads).
    val_loader = GraphLoader(val_mols, batch_size=args.batch_size,
                             balanced_batches=True, build_perms=False,
                             **common)
    test_loader = GraphLoader(core, batch_size=args.batch_size,
                              balanced_batches=True, build_perms=False,
                              **common)

    params = init_pamnet(jax.random.PRNGKey(args.seed), cfg)
    print("Number of model parameters:", count_parameters(params))
    dp = max(args.dp, 0)
    optimizer = make_optimizer(
        multistep(args.lr,
                  steps_per_epoch=max(len(train_loader) // max(dp, 1), 1)),
        weight_decay=args.wd,
    )
    state = init_train_state(params, optimizer, use_ema=False)
    if args.resume:
        from pamnet_tpu.train.checkpoint import load_checkpoint
        state = load_checkpoint(args.resume, state)
        print(f"Resumed full train state from {args.resume} "
              f"at step {int(state.step)}")
    runner = EpochRunner(cfg, optimizer, "mse", ema_decay=None, dp=dp,
                         scan_steps=args.scan_steps)
    if dp > 1:  # eval shards over the same mesh as training
        from pamnet_tpu.train.loop import make_dp_multistep_eval, make_mesh
        eval_run = make_dp_multistep_eval(cfg, make_mesh(dp))
    else:
        eval_run = make_multistep_eval(cfg)

    from pamnet_tpu.utils.wirepack import stage as to_device

    device_trainer = None
    if args.device_data:
        if dp > 1:
            raise SystemExit("--device_data is incompatible with --dp")
        from pamnet_tpu.train.loop import DeviceDataTrainer
        device_trainer = DeviceDataTrainer(
            cfg, optimizer, "mse", train_loader, to_device, seed=args.seed,
        )

    train_eval = StackedEval(eval_run, train_loader, to_device, dp=dp)
    val_eval = StackedEval(eval_run, val_loader, to_device, dp=dp)
    test_eval = StackedEval(eval_run, test_loader, to_device, dp=dp)

    save_folder = None
    if args.save_dir:
        from pamnet_tpu.train.checkpoint import save_checkpoint
        save_folder = osp.join('.', args.save_dir, 'PDBbind')
        os.makedirs(save_folder, exist_ok=True)
    from pamnet_tpu.utils.profiling import CSVLogger

    metrics_log = (
        CSVLogger(args.metrics_csv,
                  ["epoch", "train_rmse", "train_mae", "train_sd",
                   "train_pearson", "test_rmse", "test_mae", "test_sd",
                   "test_pearson", "seconds"])
        if args.metrics_csv else None
    )

    print("Start training!")
    best_val_rmse = None
    test_metrics = (float('nan'),) * 4
    for epoch in range(args.epochs):
        t0 = time.time()
        if device_trainer is not None:
            state, _, _, _ = device_trainer.run(state)
        else:
            state, _, _, _ = runner.run(state, train_loader.prefetch(), to_device)
        train_m = train_eval(state.params)
        val_m = val_eval(state.params)
        if best_val_rmse is None or val_m[0] < best_val_rmse:
            test_metrics = test_eval(state.params)
            best_val_rmse = val_m[0]
            if save_folder is not None:
                save_checkpoint(osp.join(save_folder, 'best_model.msgpack'),
                                state)
        dt = time.time() - t0
        print(f'Epoch: {epoch+1:03d}, Train RMSE: {train_m[0]:.7f}, '
              f'Train MAE: {train_m[1]:.7f}, Train SD: {train_m[2]:.7f}, '
              f'Train P: {train_m[3]:.7f}, Test RMSE: {test_metrics[0]:.7f}, '
              f'Test MAE: {test_metrics[1]:.7f}, Test SD: {test_metrics[2]:.7f}, '
              f'Test P: {test_metrics[3]:.7f} ({dt:.1f}s)')
        if metrics_log:
            metrics_log.log(epoch=epoch + 1, train_rmse=train_m[0],
                            train_mae=train_m[1], train_sd=train_m[2],
                            train_pearson=train_m[3],
                            test_rmse=test_metrics[0],
                            test_mae=test_metrics[1],
                            test_sd=test_metrics[2],
                            test_pearson=test_metrics[3],
                            seconds=round(dt, 2))

    print('Testing RMSE:', test_metrics[0])
    print('Testing MAE:', test_metrics[1])
    print('Testing SD:', test_metrics[2])
    print('Testing P:', test_metrics[3])


if __name__ == "__main__":
    main()
