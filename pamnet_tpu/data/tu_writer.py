"""TU-format writer: emits the flat-text graph files consumed by
``pamnet_tpu.data.tu.TUDataset`` (and the reference loader).  Shared by the
PDBbind / RNA preprocessors (reference writes the same files at
preprocess_pdbbind.py:141-158 and preprocess_rna_puzzles.py:87-107).
"""

from __future__ import annotations

import os

import numpy as np


def write_tu_dataset(
    root: str,
    name: str,
    graphs: list[dict],
    float_fmt: str = "%.3f",
    label_fmt: str = "%.3f",
) -> str:
    """Write graphs to ``<root>/<name>/raw/<name>_*.txt``.

    Each graph dict: ``attrs`` (n, A) float (positions first),
    ``labels`` (n,) int or (n, L) float, ``y`` scalar, optional ``name`` str.
    Returns the raw directory path.
    """
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)

    def path(suffix):
        return os.path.join(raw, f"{name}_{suffix}.txt")

    with open(path("graph_indicator"), "w") as fi, open(
        path("node_attributes"), "w"
    ) as fa, open(path("node_labels"), "w") as fl, open(
        path("graph_labels"), "w"
    ) as fy:
        names = []
        for gi, g in enumerate(graphs):
            attrs = np.atleast_2d(np.asarray(g["attrs"]))
            labels = np.asarray(g["labels"])
            n = attrs.shape[0]
            fi.write("".join(f"{gi + 1}\n" for _ in range(n)))
            for row in attrs:
                fa.write(", ".join(float_fmt % v for v in row) + "\n")
            if labels.ndim == 1:
                for v in labels:
                    fl.write(f"{int(v)}\n")
            else:
                for row in labels:
                    fl.write(", ".join("%.4f" % v for v in row) + "\n")
            fy.write((label_fmt % float(g["y"])) + "\n")
            if "name" in g:
                names.append(g["name"])
        if names:
            with open(path("graph_names"), "w") as fn:
                fn.write("\n".join(names) + "\n")
    return raw
