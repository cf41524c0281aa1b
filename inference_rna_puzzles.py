"""RNA-Puzzles candidate-structure scoring (the reference's "serve" path:
inference_rna_puzzles.py:21-86).

Loads a trained checkpoint (either the reference's legacy torch
``pamnet_rna.pt`` or a native pamnet_tpu checkpoint), scores every structure
in a TU-format dataset, and writes ``rna_puzzles_predictions/<dataset>.csv``
with columns ``PAMNet, tag, puzzle_number`` (the reference CSV contract).

Reproduction command (reference README.md:107-109):
    python inference_rna_puzzles.py --batch_size=16 --dataset='rna_native' \
        --saved_model='pamnet_rna.pt'
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.utils.runtime import enable_compilation_cache, resolve_path, set_seed

REFERENCE_ROOT = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--gpu', type=int, default=0,
                        help='Device ordinal (kept for reference CLI parity).')
    parser.add_argument('--seed', type=int, default=40, help='Random seed.')
    parser.add_argument('--dataset', type=str, default='rna_native', help='Dataset to be used')
    parser.add_argument('--epochs', type=int, default=150, help='(unused, CLI parity)')
    parser.add_argument('--lr', type=float, default=1e-4, help='(unused, CLI parity)')
    parser.add_argument('--wd', type=float, default=0, help='(unused, CLI parity)')
    parser.add_argument('--n_layer', type=int, default=1, help='Number of hidden layers.')
    parser.add_argument('--dim', type=int, default=16, help='Size of input hidden units.')
    parser.add_argument('--batch_size', type=int, default=8, help='batch_size')
    parser.add_argument('--cutoff_l', type=float, default=2.6, help='cutoff in local layer')
    parser.add_argument('--cutoff_g', type=float, default=20.0, help='cutoff in global layer')
    parser.add_argument('--flow', type=str, default='target_to_source',
                        help='Flow direction of message passing')
    parser.add_argument('--saved_model', type=str, default='pamnet_rna.pt',
                        help='Saved model for inference')
    parser.add_argument('--data_root', type=str, default=None,
                        help='Override dataset root (default ./data, falling back '
                             'to the mounted reference data)')
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['default', 'float32'],
                        help='MXU matmul precision; float32 reproduces the '
                             'reference f32 scores, default (bf16) is faster')
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='Activation dtype for the message-passing '
                             'stack (bf16 halves HBM traffic; scores '
                             'shift ~1e-3 relative — see DEVNOTES.md)')
    parser.add_argument('--platform', type=str, default='auto',
                        help='jax platform (auto|cpu|axon|tpu)')
    parser.add_argument('--fixed_pads', action='store_true',
                        help='Pad every batch to one fixed worst-case bucket '
                             '(single compiled shape) instead of per-batch '
                             'ladder buckets; slower but useful when compile '
                             'count matters more than throughput')
    args = parser.parse_args()

    set_seed(args.seed)
    from pamnet_tpu.utils.runtime import set_matmul_precision, set_platform
    set_platform(args.platform)
    enable_compilation_cache()
    set_matmul_precision(args.precision)

    import jax
    import jax.numpy as jnp

    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.models import apply_pamnet
    from pamnet_tpu.train.checkpoint import load_params, load_torch_checkpoint
    from pamnet_tpu.models import init_pamnet

    data_root = args.data_root or resolve_path(
        osp.join('.', 'data', 'RNA-Puzzles'),
        osp.join(REFERENCE_ROOT, 'data', 'RNA-Puzzles'),
    )
    ds = TUDataset(data_root, args.dataset)
    print(f"Data loaded! {len(ds)} structures from {data_root}")

    cfg = PAMNetConfig(
        dataset=args.dataset, dim=args.dim, n_layer=args.n_layer,
        cutoff_l=args.cutoff_l, cutoff_g=args.cutoff_g, flow=args.flow,
        compute_dtype=args.compute_dtype,
    )

    ckpt_path = resolve_path(
        osp.join('.', 'save', args.saved_model),
        osp.join(REFERENCE_ROOT, 'save', args.saved_model),
    )
    if args.saved_model.endswith('.pt'):
        params = load_torch_checkpoint(ckpt_path)
    else:
        # Native checkpoints may be a full train state (driver saves) or
        # bare parameters; load_params handles both.
        template = init_pamnet(jax.random.PRNGKey(0), cfg)
        params = load_params(ckpt_path, template)
    print(f"Model loaded from {ckpt_path}. Start prediction!")

    loader = GraphLoader(
        ds.molecules(), cfg.dataset_kind, cfg.cutoff_l, cfg.cutoff_g,
        batch_size=args.batch_size, shuffle=False,
        build_tables=False,  # inference: scatter-free tables don't pay here
        # Every batch runs at its own exact align-rounded pads: a fixed
        # dataset scored once per run compiles one program per distinct
        # batch shape and pays zero geometric-bucket overshoot (+42% over
        # one fixed bucket, +14% over the geometric ladder on the
        # 21-structure set; tools/tpu_ab.py ladder).  Scores are
        # pad-invariant (test_rna_parity goldens cover this path);
        # serve_rna.py keeps geometric buckets for compile reuse across
        # open-ended request streams.
        ladder_pads=False if args.fixed_pads else "exact",
    )
    fwd = jax.jit(lambda p, g: apply_pamnet(p, g, cfg))

    # Dispatches enqueue asynchronously; ONE device_get at the end fetches
    # every batch's scores (a synchronous np.asarray per batch pays one
    # host<->device round trip per dispatch — the same per-dispatch-sync
    # cost the training EpochRunner defers; DEVNOTES.md lossfetch entry).
    pending = []
    for gb in loader.prefetch():
        out = fwd(params, jax.tree.map(jnp.asarray, gb))
        pending.append((out, int(gb.graph_mask.sum())))
    fetched = jax.device_get([p[0] for p in pending])
    y_hat = np.concatenate([np.asarray(out)[:nb]
                            for out, (_, nb) in zip(fetched, pending)])

    # CSV contract (reference: inference_rna_puzzles.py:70-80): tag strips the
    # trailing 4 chars (".pdb"); puzzle_number strips the "rna_<x>_" prefix.
    name_list = [n[:-4] for n in (ds.names or [])]
    out_dir = osp.join('.', 'rna_puzzles_predictions')
    os.makedirs(out_dir, exist_ok=True)
    file_name = osp.join(out_dir, args.dataset + '.csv')
    puzzle_number = args.dataset[5:]
    with open(file_name, 'w') as f:
        f.write('PAMNet,tag,puzzle_number\n')
        for score, tag in zip(y_hat, name_list):
            f.write(f'{score},{tag},{puzzle_number}\n')
    print(f"Prediction saved. ({file_name}, {len(y_hat)} rows)")


if __name__ == "__main__":
    main()
