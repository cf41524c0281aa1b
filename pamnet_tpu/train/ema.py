"""Exponential moving average of parameters (reference: utils/ema.py:3-33).

Functional core (`ema_init`/`ema_update`) suitable for use inside a jitted
train step, plus a stateful wrapper mirroring the reference's
``EMA(model, decay)`` / ``assign`` / ``resume`` API shape.
"""

from __future__ import annotations

import jax


def ema_init(params):
    """Shadow tree starts as a copy of the live parameters
    (reference: utils/ema.py:9-11)."""
    return jax.tree.map(lambda p: p, params)


def ema_update(shadow, params, decay: float = 0.999, num_updates: int = 99999):
    """shadow <- (1-d) * param + d * shadow with the bias-correction-style
    d = min(decay, (1 + n) / (10 + n)) (reference: utils/ema.py:13-20; the
    drivers always call with the default n=99999, so d == decay in practice).
    """
    d = min(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree.map(lambda s, p: (1.0 - d) * p + d * s, shadow, params)


class EMA:
    """Stateful convenience wrapper (reference API: utils/ema.py)."""

    def __init__(self, params, decay: float):
        self.decay = decay
        self.shadow = ema_init(params)

    def __call__(self, params, num_updates: int = 99999):
        self.shadow = ema_update(self.shadow, params, self.decay, num_updates)
        return self.shadow
