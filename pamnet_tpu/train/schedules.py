"""Learning-rate schedules matching the reference drivers.

* QM9: 1-epoch linear warmup into per-step exponential decay with
  gamma = 0.9961697 per epoch, stepped fractionally every batch
  (reference: main_qm9.py:91-93,114-115 via GradualWarmupScheduler):
      lr(t) = base * t                 for t < 1 epoch
      lr(t) = base * gamma^(t - 1)     for t >= 1   (t in fractional epochs)
* PDBbind: MultiStepLR gamma=0.2 at epochs {50,100,...,500}
  (reference: main_pdbbind.py:83).
* RNA: constant lr (reference: main_rna_puzzles.py:80).
"""

from __future__ import annotations

import numpy as np


def warmup_exponential(base_lr: float, steps_per_epoch: int, gamma: float = 0.9961697):
    """QM9 schedule as an optax-compatible step -> lr function."""

    def schedule(step):
        import jax.numpy as jnp

        t = step / steps_per_epoch  # fractional epoch
        warm = base_lr * t
        decay = base_lr * gamma ** (t - 1.0)
        return jnp.where(t < 1.0, warm, decay)

    return schedule


def multistep(base_lr: float, steps_per_epoch: int,
              milestones=(50, 100, 150, 200, 250, 300, 350, 400, 450, 500),
              gamma: float = 0.2):
    """PDBbind schedule (per-epoch milestones, evaluated per step)."""
    ms = np.asarray(milestones, dtype=np.float32)

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.floor(step / steps_per_epoch)
        k = jnp.sum(epoch >= jnp.asarray(ms))
        return base_lr * gamma**k

    return schedule


def constant(base_lr: float):
    def schedule(step):
        return base_lr

    return schedule
