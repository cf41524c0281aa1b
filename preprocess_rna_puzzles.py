"""Offline RNA-Puzzles preprocessing: candidate-structure PDBs -> TU-format
graph files (reference: preprocess_rna_puzzles.py).

Per structure: parse atoms (first-party PDB parser, no RDKit), keep C/N/O
atoms mapped to labels {0,1,2} (reference :72-82), read the RMSD label from
the ``rms`` line (:33-42), and append to
``<save_dir>/<save_name>/raw/<save_name>_*.txt`` plus a ``_graph_names.txt``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pamnet_tpu.data.pdb import parse_pdb_atoms, parse_rms_label
from pamnet_tpu.data.tu_writer import write_tu_dataset

TYPES = {"C": 0, "N": 1, "O": 2}


def construct_graphs(data_dir: str, save_dir: str, data_name: str, save_name: str):
    print("Preprocessing", data_name)
    data_dir_full = os.path.join(data_dir, data_name)
    graphs = []
    for name in sorted(os.listdir(data_dir_full)):
        path = os.path.join(data_dir_full, name)
        elems, coords = parse_pdb_atoms(path)
        label = parse_rms_label(path)
        keep = [i for i, e in enumerate(elems) if e in TYPES]
        graphs.append(
            dict(
                attrs=coords[keep].astype(np.float32),
                labels=np.array([TYPES[elems[i]] for i in keep], dtype=np.int64),
                y=label,
                name=name,
            )
        )
    write_tu_dataset(save_dir, save_name, graphs)
    print(f"wrote {len(graphs)} graphs to {save_dir}/{save_name}/raw")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir",
                        default=os.path.join(".", "data", "RNA-Puzzles",
                                             "classics_train_val"))
    parser.add_argument("--save_dir",
                        default=os.path.join(".", "data", "RNA-Puzzles"))
    args = parser.parse_args()
    construct_graphs(args.data_dir, args.save_dir, "example_train", "train")
    construct_graphs(args.data_dir, args.save_dir, "example_val", "val")


if __name__ == "__main__":
    main()
