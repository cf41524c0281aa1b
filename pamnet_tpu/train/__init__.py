"""Training utilities: optimizer/schedule factories, EMA, checkpointing,
and the data-parallel train loop."""

from pamnet_tpu.train.ema import EMA, ema_init, ema_update
from pamnet_tpu.train.checkpoint import (
    load_torch_checkpoint,
    save_checkpoint,
    load_checkpoint,
)

__all__ = [
    "EMA",
    "ema_init",
    "ema_update",
    "load_torch_checkpoint",
    "save_checkpoint",
    "load_checkpoint",
]
