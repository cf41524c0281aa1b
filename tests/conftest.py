"""Test configuration: force JAX onto a virtual 8-device CPU platform so the
multi-chip sharding path is testable without TPU hardware (the TPU-world
analog of a fake backend; see SURVEY.md section 4).

Note: this environment pre-imports jax and registers a remote-TPU PJRT plugin
via a sitecustomize hook, so setting env vars here is too late for jax's
config — we must call ``jax.config.update`` before any backend is touched.
"""

import os

# For subprocesses spawned by tests (if any).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NOTE: no persistent compilation cache here — XLA:CPU AOT cache entries are
# machine-feature-specific and this pool mixes host types (SIGILL risk).
# Drivers enable it for TPU runs, where it is safe and saves 20-40s compiles.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(480)


REFERENCE_ROOT = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
