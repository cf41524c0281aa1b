"""Shared fixtures for the multi-host smoke test: deterministic config,
pads, and per-device microbatches (identical in every process)."""

import numpy as np

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import PadSizes, build_graph_batch
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset

CFG = PAMNetConfig(dataset="QM9", dim=16, n_layer=1)

# Fully pinned pads (including ELL table widths) so every process compiles
# the identical program.
PADS = PadSizes(n=128, eg=2048, el=256, t2=512, t1=512, g=8,
                kg_dst=32, kg_src=32, kl_dst=16, kl_src=16,
                k2_ji=16, k2_kj=16, k1_ji=16, k1_jj=16)


def make_batches(n_devices: int = 2):
    mols = synthetic_qm9_dataset(2 * n_devices, seed=99)
    return [
        build_graph_batch(
            mols[2 * d: 2 * d + 2], "qm9", CFG.cutoff_l, CFG.cutoff_g, pads=PADS
        )
        for d in range(n_devices)
    ]
