#!/usr/bin/env python
"""Stage synthetic PDBbind / RNA-Puzzles TU datasets for convergence runs.

The environment carries no PDBbind or RNA training data (DEVNOTES.md), so
training-dynamics validation of `main_pdbbind.py` (MSE + signed DeltaE
pooling + MultiStepLR) and `main_rna_puzzles.py` (SmoothL1,
target_to_source) runs on synthetic datasets with known noise floors
(data/synthetic.py: PDBbind RMSE floor 0.1, RNA SmoothL1 floor ~0.005),
written through the production TU writer so the drivers exercise their real
read path.

    python tools/stage_synthetic_tu.py --out /tmp/conv --pdbbind 512 --rna 512
    python main_pdbbind.py --data_root /tmp/conv/PDBbind ...
    python main_rna_puzzles.py --data_root /tmp/conv/RNA-Puzzles ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pamnet_tpu.data.synthetic import (  # noqa: E402
    synthetic_pdbbind_dataset,
    synthetic_rna_dataset,
)
from pamnet_tpu.data.tu_writer import write_tu_dataset  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--pdbbind", type=int, default=0,
                    help="total PDBbind graphs (split 80/20 train_val/test)")
    ap.add_argument("--rna", type=int, default=0,
                    help="total RNA graphs (split 80/20 train/val)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.pdbbind:
        graphs = synthetic_pdbbind_dataset(args.pdbbind, seed=805 + args.seed)
        cut = int(args.pdbbind * 0.8)
        root = os.path.join(args.out, "PDBbind")
        write_tu_dataset(root, "train_val", graphs[:cut])
        write_tu_dataset(root, "test", graphs[cut:])
        print(f"PDBbind: {cut} train_val + {args.pdbbind - cut} test -> {root}")
    if args.rna:
        graphs = synthetic_rna_dataset(args.rna, seed=40 + args.seed)
        cut = int(args.rna * 0.8)
        root = os.path.join(args.out, "RNA-Puzzles")
        write_tu_dataset(root, "train", graphs[:cut])
        write_tu_dataset(root, "val", graphs[cut:])
        print(f"RNA: {cut} train + {args.rna - cut} val -> {root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
