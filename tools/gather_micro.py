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


def rna_real():
    """Time pure gathers with the REAL RNA triplet indices (t2_kj vs t1_jj)
    to isolate why the t1 gather measured 5.6x slower in the full forward
    (tools/rna_profile.py fusion.12 vs fusion.11)."""
    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.tu import TUDataset

    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    mols = TUDataset(os.path.join(ref, "data", "RNA-Puzzles"),
                     "rna_native").molecules()
    loader = GraphLoader(mols, "rna", 2.6, 20.0, batch_size=16,
                         build_tables=False)
    gb = next(iter(loader))
    rng = np.random.default_rng(0)
    el, t2, t1 = gb.el_src.shape[0], gb.t2_kj.shape[0], gb.t1_jj.shape[0]
    for d in (16, 42):
        x = jnp.asarray(rng.normal(size=(el, d)).astype(np.float32))
        for tag, idx in (
            ("t2_kj", gb.t2_kj),
            ("t1_jj", gb.t1_jj),
            ("t1_jj_sorted", np.sort(gb.t1_jj)),
            ("uniform_random", rng.integers(0, el, size=t1).astype(np.int32)),
        ):
            dt, gbps = bench(x, jnp.asarray(idx), False, reps=30)
            print(f"gather ({el},{d}) <- {len(idx)} [{tag}]: "
                  f"{dt*1e3:.2f} ms, {gbps:.1f} GB/s effective")


if __name__ == "__main__":
    if "rna" in sys.argv[1:]:
        enable_compilation_cache()
        rna_real()
    else:
        main()
