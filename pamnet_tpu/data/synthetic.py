"""Synthetic QM9-like molecule generator.

The environment has no network egress, so the real QM9 download
(reference: datasets/qm9_dataset.py:156-168) is unavailable in CI; this
generates geometrically realistic stand-ins (bonded chains/branches with
~1.1-1.5 A bond lengths, 9-29 heavy+H atoms like gdb9) for benchmarks,
compile checks, and training-loop smoke tests.  The real QM9 pipeline lives
in ``pamnet_tpu.data.qm9`` and is used automatically when data is present.
"""

from __future__ import annotations

import numpy as np


def synthetic_qm9_molecule(rng: np.random.Generator, n_atoms: int | None = None) -> dict:
    if n_atoms is None:
        n_atoms = int(rng.integers(9, 30))
    # Grow a random tree: each new atom bonds to a random existing atom at
    # bond length ~1.1-1.54 A in a random direction (rejecting overlaps).
    pos = np.zeros((n_atoms, 3), dtype=np.float32)
    parent = np.zeros(n_atoms, dtype=np.int64)
    for i in range(1, n_atoms):
        p = int(rng.integers(0, i))
        for _ in range(20):
            d = rng.standard_normal(3)
            d /= np.linalg.norm(d) + 1e-12
            cand = pos[p] + d * rng.uniform(1.1, 1.54)
            if np.min(np.linalg.norm(pos[:i] - cand, axis=1)) > 0.95:
                break
        pos[i] = cand
        parent[i] = p
    src = np.concatenate([np.arange(1, n_atoms), parent[1:]])
    dst = np.concatenate([parent[1:], np.arange(1, n_atoms)])
    z = rng.choice(5, size=n_atoms, p=[0.51, 0.35, 0.06, 0.07, 0.01])  # ~QM9 mix
    # Pseudo-label loosely correlated with composition (for smoke training).
    y = float((z == 1).sum() * -10.0 + (z == 2).sum() * -15.0 + rng.normal(0, 0.1))
    return dict(
        z=z.astype(np.int32),
        pos=pos,
        edge_index=np.stack([src, dst]).astype(np.int64),
        y=y,
    )


def synthetic_qm9_dataset(n_molecules: int, seed: int = 480) -> list[dict]:
    rng = np.random.default_rng(seed)
    return [synthetic_qm9_molecule(rng) for _ in range(n_molecules)]
