"""The shipped QM9 benchmark recipe, single-sourced.

bench.py's device-step contract line, its epoch-wall line, and
tools/roofline.py all claim to measure "the shipped QM9 training program"
(reference headline configuration, README.md:95: dim=128, n_layer=6,
batch=32, Adam lr=1e-4 + 1-epoch warmup into ExponentialLR, grad clip 1000,
EMA 0.999).  This module is the one place that program's configuration and
training-state construction live, so a recipe change (dtype default, clip
norm, schedule) cannot silently fork the measured programs.

``PAMNET_BENCH_DTYPE`` overrides the activation dtype everywhere it is
honored (default bfloat16 — the banked QM9 training default, DEVNOTES.md).
"""

from __future__ import annotations

import os

from pamnet_tpu.config import PAMNetConfig

QM9_RECIPE = dict(batch_size=32, dim=128, n_layer=6, lr=1e-4,
                  clip_norm=1000.0, ema_decay=0.999)


def qm9_bench_dtype() -> str:
    return os.environ.get("PAMNET_BENCH_DTYPE", "bfloat16")


def qm9_bench_config(dim: int | None = None,
                     n_layer: int | None = None, variant: str = "full",
                     compute_dtype: str | None = None) -> PAMNetConfig:
    """The benchmark PAMNetConfig (cutoffs 5.0/5.0, reference main_qm9.py
    defaults); None fields take the recipe values."""
    return PAMNetConfig(
        dataset="QM9",
        dim=dim if dim is not None else QM9_RECIPE["dim"],
        n_layer=n_layer if n_layer is not None else QM9_RECIPE["n_layer"],
        cutoff_l=5.0, cutoff_g=5.0,
        compute_dtype=compute_dtype or qm9_bench_dtype(),
        variant=variant,
    )


def qm9_train_state(cfg: PAMNetConfig, steps_per_epoch: int, seed: int = 480):
    """(params, optimizer, state) for the recipe's training stack: Adam +
    warmup/exponential over ``steps_per_epoch``, global-norm clip, EMA."""
    import jax

    from pamnet_tpu.models import init_pamnet
    from pamnet_tpu.train.loop import init_train_state, make_optimizer
    from pamnet_tpu.train.schedules import warmup_exponential

    params = init_pamnet(jax.random.PRNGKey(seed), cfg)
    optimizer = make_optimizer(
        warmup_exponential(QM9_RECIPE["lr"], steps_per_epoch=steps_per_epoch),
        clip_norm=QM9_RECIPE["clip_norm"],
    )
    state = init_train_state(params, optimizer, use_ema=True)
    return params, optimizer, state
