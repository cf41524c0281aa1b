"""Export a pamnet_tpu checkpoint as a reference-compatible torch .pt file.

The reverse of the torch-legacy ingestion path (train/checkpoint.py::
load_torch_checkpoint): models trained in this framework become loadable by
the reference implementation's `model.load_state_dict(torch.load(path))`
(reference inference_rna_puzzles.py:52-57).  Writes the torch zip format via
the first-party writer (utils/torchpickle.py::save_torch_pickle) — no torch
import needed; `torch.load(..., weights_only=True)` reads the result.

Usage:
  python tools/export_torch.py --checkpoint save/pamnet_rna_best.msgpack \
      --out pamnet_rna_export.pt --dataset RNA-Puzzles --dim 16 --n_layer 1

The model-shape flags must match the training run (they size the template
pytree that the msgpack restores into); pass a torch .pt as --checkpoint to
round-trip/re-serialize a reference checkpoint instead.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', required=True,
                        help='Native msgpack checkpoint (full train state or '
                             'bare params) or a torch .pt to re-serialize')
    parser.add_argument('--out', required=True, help='Output .pt path')
    parser.add_argument('--dataset', type=str, default='RNA-Puzzles')
    parser.add_argument('--model', type=str, default='PAMNet',
                        choices=['PAMNet', 'PAMNet_s'])
    parser.add_argument('--dim', type=int, default=16)
    parser.add_argument('--n_layer', type=int, default=1)
    parser.add_argument('--cutoff_l', type=float, default=2.6)
    parser.add_argument('--cutoff_g', type=float, default=20.0)
    parser.add_argument('--flow', type=str, default='target_to_source')
    parser.add_argument('--platform', type=str, default='cpu',
                        help='jax platform for template init (cpu is fine)')
    args = parser.parse_args()

    from pamnet_tpu.utils.runtime import set_platform
    set_platform(args.platform)

    import jax

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.models import init_pamnet
    from pamnet_tpu.train.checkpoint import (
        load_torch_checkpoint, params_to_torch,
    )
    from pamnet_tpu.utils.torchpickle import save_torch_pickle

    if args.checkpoint.endswith('.pt'):
        params = load_torch_checkpoint(args.checkpoint)
    else:
        from pamnet_tpu.train.checkpoint import load_params

        cfg = PAMNetConfig(
            dataset=args.dataset, dim=args.dim, n_layer=args.n_layer,
            cutoff_l=args.cutoff_l, cutoff_g=args.cutoff_g, flow=args.flow,
            variant='s' if args.model == 'PAMNet_s' else 'full',
        )
        template = init_pamnet(jax.random.PRNGKey(0), cfg)
        params = load_params(args.checkpoint, template)

    sd = params_to_torch(params)
    save_torch_pickle(args.out, sd)
    print(f"Wrote {args.out}: {len(sd)} tensors "
          f"({sum(v.size for v in sd.values()):,} parameters)")


if __name__ == "__main__":
    main()
