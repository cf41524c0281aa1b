"""Shared utilities: metrics, logging, reproducibility."""

from pamnet_tpu.utils.metrics import rmse, mae, sd, pearson

__all__ = ["rmse", "mae", "sd", "pearson"]
