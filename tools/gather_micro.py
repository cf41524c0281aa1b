"""Micro-benchmark: does XLA:TPU exploit ``indices_are_sorted`` on row
gathers?  The train step's biggest leaf cost is edge gathers whose indices
are group-sorted (dst-major) — if the hint wins here, it is worth changing
the pad-fill convention so padded index tails preserve sortedness.

Usage: python tools/gather_micro.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pamnet_tpu.utils.runtime import enable_compilation_cache


def bench(x, idx, sorted_hint, reps=200):
    @jax.jit
    def run(x, idx, acc):
        g = jnp.take(x, idx, axis=0, indices_are_sorted=sorted_hint)
        return acc + g.sum()

    acc = jnp.float32(0.0)
    acc = run(x, idx, acc)
    _ = float(acc)  # compile
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = run(x, idx, acc)
    _ = float(acc)
    dt = (time.time() - t0) / reps
    bytes_moved = idx.shape[0] * x.shape[1] * 4
    return dt, bytes_moved / dt / 1e9


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    for n, e, d in ((1024, 23808, 128), (186368, 1121664, 16)):
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        srt = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
        rnd = rng.integers(0, n, size=e).astype(np.int32)
        for tag, idx, hint in (
            ("sorted+hint", srt, True),
            ("sorted-nohint", srt, False),
            ("random-nohint", rnd, False),
        ):
            dt, gbps = bench(x, jnp.asarray(idx), hint)
            print(f"gather ({n},{d}) <- {e} rows [{tag}]: "
                  f"{dt*1e6:.0f} us, {gbps:.1f} GB/s effective")


if __name__ == "__main__":
    main()
