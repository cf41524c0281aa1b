"""Runtime helpers: seeding, device selection, compilation cache."""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int) -> None:
    """Deterministic host RNGs (reference: main_qm9.py:18-24); device-side
    randomness is already explicit via jax.random keys."""
    np.random.seed(seed)
    random.seed(seed)


def enable_compilation_cache(path: str = "/tmp/pamnet_jax_cache") -> None:
    import jax

    # XLA:CPU AOT cache entries are machine-feature-specific (SIGILL risk on
    # a mixed-host pool); only cache accelerator compiles.
    if jax.config.jax_platforms == "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def set_platform(platform: str) -> None:
    """Select the JAX platform in-process.  NOTE: this environment's
    sitecustomize registers a remote-TPU PJRT plugin and sets
    JAX_PLATFORMS=axon before user code runs, so the env var alone cannot
    select CPU — jax.config must be updated before first backend use."""
    import jax

    if platform and platform != "auto":
        jax.config.update("jax_platforms", platform)


def ensure_devices(n: int) -> None:
    """Provide at least n devices (virtualizes CPU devices when on CPU)."""
    import jax

    if n > 1 and jax.config.jax_platforms == "cpu":
        try:
            jax.config.update("jax_num_cpu_devices", max(n, 1))
        except Exception:
            pass  # backends already initialized


def set_matmul_precision(precision: str) -> None:
    """Global MXU precision: "default" (bf16 inputs, fastest), "float32"
    (a.k.a. highest; needed for checkpoint-reproduction parity — bf16 shifts
    RNA scores by ~2%)."""
    import jax

    if precision not in ("default", "float32", "highest", "high", "bfloat16_3x"):
        raise ValueError(f"bad precision {precision}")
    if precision != "default":
        jax.config.update("jax_default_matmul_precision", precision)


def resolve_path(local: str, reference_fallback: str | None = None) -> str:
    """Prefer a repo-local artifact; fall back to the mounted reference copy
    (read-only) so the bundled RNA checkpoint/data work out of the box."""
    if os.path.exists(local):
        return local
    if reference_fallback and os.path.exists(reference_fallback):
        return reference_fallback
    return local
