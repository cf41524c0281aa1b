"""RNA-Puzzles structure-scoring training driver (reference:
main_rna_puzzles.py:44-111): SmoothL1 on per-structure RMSD score,
flow='target_to_source', best-val checkpoint to save/pamnet_rna_best.msgpack.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import numpy as np

from pamnet_tpu.utils.runtime import (
    enable_compilation_cache, resolve_path, set_seed,
)

REFERENCE_ROOT = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")


def smooth_l1(pred, y):
    a = np.abs(pred - y)
    return float(np.where(a < 1.0, 0.5 * a * a, a - 0.5).mean())


class StackedEval:
    """RNA metric wrapper over the shared pre-staged evaluator
    (train/loop.py::StackedEval): SmoothL1 + predictions (reference:
    main_rna_puzzles.py:23-42).  Lazy import keeps jax out of module
    import time (--platform handling)."""

    def __init__(self, eval_run, loader, to_device, dp: int = 0):
        from pamnet_tpu.train.loop import StackedEval as _SE

        self._ev = _SE(eval_run, loader, to_device, dp=dp)

    def __call__(self, params):
        preds = self._ev.predict(params)
        return smooth_l1(preds, self._ev.y), preds


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gpu', type=int, default=0, help='Device ordinal (CLI parity).')
    parser.add_argument('--seed', type=int, default=40, help='Random seed.')
    parser.add_argument('--dataset', type=str, default='RNA-Puzzles', help='Dataset to be used')
    parser.add_argument('--epochs', type=int, default=150, help='Number of epochs to train.')
    parser.add_argument('--lr', type=float, default=5e-4, help='Initial learning rate.')
    parser.add_argument('--wd', type=float, default=0, help='Weight decay (L2 loss).')
    parser.add_argument('--n_layer', type=int, default=2, help='Number of hidden layers.')
    parser.add_argument('--dim', type=int, default=64, help='Size of input hidden units.')
    parser.add_argument('--batch_size', type=int, default=8, help='batch_size')
    parser.add_argument('--cutoff_l', type=float, default=2.6, help='cutoff in local layer')
    parser.add_argument('--cutoff_g', type=float, default=20.0, help='cutoff in global layer')
    parser.add_argument('--flow', type=str, default='target_to_source',
                        help='Flow direction of message passing')
    parser.add_argument('--data_root', type=str, default=None)
    parser.add_argument('--platform', type=str, default='auto')
    parser.add_argument('--dp', type=int, default=0,
                        help='Data-parallel devices (0 = single device)')
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
                             'instead of the RNA default sorted-scan/perm '
                             'routing: the knn(50) superset makes degrees '
                             'wide enough that the (G,K) ELL gathers '
                             'measured 1.16x slower at the reference '
                             'training recipe (tools/tpu_ab.py rnatables)')
    parser.add_argument('--host_geometry', action='store_true',
                        help='Ship host-precomputed float geometry on the '
                             'streaming-train wire instead of the default '
                             'derive mode (positions + integer tables only; '
                             'geometry recomputed in the compiled step — '
                             '2.02x QM9 epoch wall, tools/tpu_ab.py geo). '
                             '--device_data always ships host geometry')
    parser.add_argument('--scan_steps', type=int, default=1,
                        help='Optimizer steps per device dispatch')
    parser.add_argument('--structure_cache', type=str, default='',
                        help='Directory for the on-disk precomputed-structure '
                             'cache (data/structcache.py)')
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='Activation dtype for the message-passing stack')
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['default', 'float32'])
    parser.add_argument('--save_dir', type=str, default='save',
                        help='Directory for the best-val checkpoint '
                             '(pamnet_rna_best.msgpack)')
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
    from pamnet_tpu.train.checkpoint import save_checkpoint
    from pamnet_tpu.train.loop import (
        EpochRunner, init_train_state, make_optimizer,
    )
    from pamnet_tpu.train.schedules import constant

    data_root = args.data_root or resolve_path(
        osp.join('.', 'data', args.dataset),
        osp.join(REFERENCE_ROOT, 'data', args.dataset),
    )
    train_mols = TUDataset(data_root, 'train').molecules()
    val_mols = TUDataset(data_root, 'val').molecules()
    print(f"Data loaded! train={len(train_mols)} val={len(val_mols)}")

    cfg = PAMNetConfig(dataset=args.dataset if args.dataset[:3].lower() == 'rna'
                       else 'rna_train',
                       dim=args.dim, n_layer=args.n_layer,
                       cutoff_l=args.cutoff_l, cutoff_g=args.cutoff_g,
                       flow=args.flow, compute_dtype=args.compute_dtype)

    # NO ELL tables by default on RNA (train AND eval): the knn(50)
    # superset makes degrees as wide as PDBbind's radius-6 graphs, and the
    # sorted-scan/perm routing measured 1.16x faster than derive-mode ELL
    # tables at the reference training recipe (tools/tpu_ab.py rnatables;
    # inference had tables off since round 1).  --host_tables opts back in.
    common = dict(dataset_kind='rna', cutoff_l=cfg.cutoff_l, cutoff_g=cfg.cutoff_g,
                  cache_dir=args.structure_cache or None,
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
                               build_perms=True,
                               shuffle=True, seed=args.seed,
                               balanced_batches=args.balanced_batches,
                               wire_geometry=train_geometry,
                               compact_wire=compact,
                               cache_collate=cache_collate,
                               cache_collate_max_mb=args.cache_collate_mb,
                               **{**common, "build_tables": train_tables})
    # Eval composition is free (the SmoothL1 val loss is a global mean over
    # structures), so the val split always uses LPT-balanced packing —
    # metric-identical, tighter pads (tools/tpu_ab.py evalpads).
    val_loader = GraphLoader(val_mols, batch_size=args.batch_size,
                             balanced_batches=True, build_perms=False,
                             **common)

    params = init_pamnet(jax.random.PRNGKey(args.seed), cfg)
    print("Number of model parameters:", count_parameters(params))
    optimizer = make_optimizer(constant(args.lr), weight_decay=args.wd)
    state = init_train_state(params, optimizer, use_ema=False)
    if args.resume:
        from pamnet_tpu.train.checkpoint import load_checkpoint
        state = load_checkpoint(args.resume, state)
        print(f"Resumed full train state from {args.resume} "
              f"at step {int(state.step)}")
    runner = EpochRunner(cfg, optimizer, "smooth_l1", ema_decay=None,
                         dp=max(args.dp, 0), scan_steps=args.scan_steps)
    if args.dp > 1:  # eval shards over the same mesh as training
        from pamnet_tpu.train.loop import make_dp_multistep_eval, make_mesh
        eval_run = make_dp_multistep_eval(cfg, make_mesh(args.dp))
    else:
        from pamnet_tpu.train.loop import make_multistep_eval
        eval_run = make_multistep_eval(cfg)

    from pamnet_tpu.utils.wirepack import stage as to_device

    device_trainer = None
    if args.device_data:
        if args.dp > 1:
            raise SystemExit("--device_data is incompatible with --dp")
        from pamnet_tpu.train.loop import DeviceDataTrainer
        device_trainer = DeviceDataTrainer(
            cfg, optimizer, "smooth_l1", train_loader, to_device,
            seed=args.seed,
        )

    train_eval = StackedEval(eval_run, train_loader, to_device,
                             dp=max(args.dp, 0))
    val_eval = StackedEval(eval_run, val_loader, to_device,
                           dp=max(args.dp, 0))

    save_dir = osp.join('.', args.save_dir)
    os.makedirs(save_dir, exist_ok=True)
    from pamnet_tpu.utils.profiling import CSVLogger

    metrics_log = (
        CSVLogger(args.metrics_csv,
                  ["epoch", "train_loss", "val_loss", "seconds"])
        if args.metrics_csv else None
    )
    print("Start training!")
    best_val_loss = None
    for epoch in range(args.epochs):
        t0 = time.time()
        if device_trainer is not None:
            state, _, _, _ = device_trainer.run(state)
        else:
            state, _, _, _ = runner.run(state, train_loader.prefetch(), to_device)
        train_loss, _ = train_eval(state.params)
        val_loss, _ = val_eval(state.params)
        dt = time.time() - t0
        print(f'Epoch: {epoch+1:03d}, Train Loss: {train_loss:.7f}, '
              f'Val Loss: {val_loss:.7f} ({dt:.1f}s)')
        if metrics_log:
            metrics_log.log(epoch=epoch + 1, train_loss=train_loss,
                            val_loss=val_loss, seconds=round(dt, 2))
        if best_val_loss is None or val_loss < best_val_loss:
            best_val_loss = val_loss
            save_checkpoint(osp.join(save_dir, 'pamnet_rna_best.msgpack'), state)


if __name__ == "__main__":
    main()
