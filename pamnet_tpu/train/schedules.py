"""Learning-rate schedules matching the reference drivers.

* QM9: 1-epoch linear warmup into per-step exponential decay with
  gamma = 0.9961697 per epoch, stepped fractionally every batch
  (reference: main_qm9.py:91-93,114-115 via GradualWarmupScheduler).
* PDBbind: MultiStepLR gamma=0.2 at epochs {50,100,...,500}
  (reference: main_pdbbind.py:83).
* RNA: constant lr (reference: main_rna_puzzles.py:80).

``warmup_exponential`` reproduces the torch sequence ELEMENTWISE, including
the plumbing quirks of the reference's scheduler stack (locked against real
``torch.optim.lr_scheduler.ExponentialLR`` + a faithful ildoonet
GradualWarmupScheduler in tests/test_schedule_torch_parity.py):

* the scheduler is stepped AFTER each optimizer update with the PREVIOUS
  batch's fractional epoch (main_qm9.py:112-115), so update ``k`` trains at
  the lr computed from ``t = (k-1)/N`` — one step later than the naive
  ``t = k/N``;
* update 0 trains at lr 0 (GradualWarmupScheduler.__init__'s initial step
  evaluates the warmup at last_epoch=0 with multiplier=1.0);
* t = 1.0 exactly still takes the warmup branch (``last_epoch >
  total_epoch`` is strict), giving base_lr;
* the FIRST call with t > 1 flips the scheduler's ``finished`` flag and
  returns the after-scheduler's stored (never-stepped) lr = base_lr, so
  update N+2 trains at base_lr instead of base*gamma^(1/N);
* afterwards ExponentialLR.step(t-1) applies the closed form
  base*gamma^(t-1).

``frac_steps_per_epoch`` mirrors the reference's
``len(train_dataset)/batch_size`` divisor (a float when the batch size does
not divide the dataset, while the in-epoch step counter resets every
``steps_per_epoch`` = len(train_loader) batches; main_qm9.py:114).  Default
None treats the two as equal (exact whenever batch_size | dataset size).
"""

from __future__ import annotations

import numpy as np


def warmup_exponential(base_lr: float, steps_per_epoch: int, gamma: float = 0.9961697,
                       frac_steps_per_epoch: float | None = None):
    """QM9 schedule as an optax-compatible step -> lr function (see module
    docstring for the exact reference sequence being reproduced)."""
    B = steps_per_epoch
    N = float(frac_steps_per_epoch) if frac_steps_per_epoch else float(B)

    def schedule(step):
        import jax.numpy as jnp

        k = step - 1  # lr at update `step` was set after update `step-1`
        epoch = jnp.floor_divide(k, B)
        t = epoch + (k - epoch * B) / N  # fractional epoch, per-epoch reset
        warm = base_lr * t
        decay = base_lr * gamma ** (t - 1.0)
        lr = jnp.where(t <= 1.0, warm, decay)
        # finished-flag flip batch: first t>1 call returns base_lr (above).
        lr = jnp.where(k == B + 1, base_lr, lr)
        # update 0: warmup construction set lr to 0 before any step() call.
        return jnp.where(step == 0, 0.0, lr)

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
