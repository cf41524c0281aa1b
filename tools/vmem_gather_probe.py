#!/usr/bin/env python
"""Probe: can a Pallas kernel gather arbitrary rows from a VMEM-resident
table on this TPU/Mosaic version?  (VERDICT r2 #3: the dim-16 RNA gather
sources fit VMEM dense — x: 1.9 MB, m: 10.3 MB packed — so an on-chip
gather would sidestep the ~20-25 GB/s HBM random-row floor measured in
tools/gather_micro.py.)

Findings on jax 0.9.0 / v5e (run this to re-check on newer stacks):

1. `jnp.take(src, idx, axis=0)` inside a kernel: the Mosaic lowering rule
   (jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule) requires
   `in.shape == indices.shape[:-1] == out.shape` — the gather output must
   have the SOURCE's shape, so an arbitrary-length row gather is
   inexpressible.
2. The conforming `take_along_axis` form lowers to `tpu.dynamic_gather`,
   which fails Mosaic backend compile ("please report a bug") for any
   shape beyond a single (8, 128) vreg — only vreg-local sublane shuffles
   are supported.
3. A per-row `fori_loop` of dynamic sublane slices (indices in SMEM —
   dynamic LANE reads from VMEM are rejected outright) compiles and is
   correct, but measured **0.39 Mrows/s vs 19.5 Mrows/s for the XLA
   gather** on the same (8192,128)-source problem (v5e, same process) —
   50x slower, issue-rate bound.

Conclusion (DEVNOTES.md round-3): the VMEM-resident gather kernel is not
implementable on this stack; the XLA gather at the HBM row floor plus the
ELL/sorted-offset machinery (ops/ell.py) remains the production path.  The
round-2 one-hot MXU alternative (ops/pallas_triplet.py) already measured at
scatter-parity and stays opt-in.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_take_1d():
    """Form 1: plain jnp.take with a 1-D index vector."""
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(src_ref[:], idx_ref[0, :], axis=0)

    src = jnp.zeros((256, 128), jnp.float32)
    idx = jnp.zeros((1, 512), jnp.int32)
    try:
        jax.jit(lambda s, i: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        )(s, i))(src, idx).block_until_ready()
        print("take(1-D idx): LOWERS (new Mosaic? re-evaluate the kernel)")
    except Exception as e:  # noqa: BLE001
        print(f"take(1-D idx): FAILS ({str(e)[:120]})")


def probe_dynamic_gather(shape=(256, 128)):
    """Form 2: take_along_axis -> tpu.dynamic_gather at source shape."""
    m, n = shape

    def kernel(src_ref, idx_ref, out_ref):
        idxb = jnp.broadcast_to(idx_ref[0, :][:, None], (m, n))
        out_ref[:] = jnp.take_along_axis(
            src_ref[:], idxb, axis=0, mode="promise_in_bounds")

    src = jnp.zeros(shape, jnp.float32)
    idx = jnp.zeros((1, m), jnp.int32)
    try:
        jax.jit(lambda s, i: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(s, i))(src, idx).block_until_ready()
        print(f"dynamic_gather {shape}: OK")
    except Exception as e:  # noqa: BLE001
        print(f"dynamic_gather {shape}: FAILS ({str(e)[:120]})")


def probe_fori_rate(e_rows=4096, bt=256, t=65536):
    """Form 3: per-row fori_loop of dynamic sublane slices, timed vs XLA."""
    def kernel(src_ref, idx_ref, out_ref):
        def body(r, _):
            out_ref[r, :] = src_ref[idx_ref[0, r], :]
            return 0
        jax.lax.fori_loop(0, bt, body, 0)

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((e_rows, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, e_rows, t).astype(np.int32))

    def fn(s, i):
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(t, bt),),
            in_specs=[
                pl.BlockSpec((e_rows, 128), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bt), lambda k: (0, k),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, 128), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, 128), jnp.float32),
        )(s, i[None, :])

    for name, f in [("fori kernel", jax.jit(fn)),
                    ("xla gather ", jax.jit(lambda s, i: s[i]))]:
        try:
            _ = float(f(src, idx).sum())  # compile + correctness-ish
            t0 = time.time()
            acc = jnp.float32(0)
            for _ in range(5):
                acc = acc + f(src, idx)[0, 0]
            _ = float(acc)
            dt = (time.time() - t0) / 5
            print(f"{name}: {dt * 1e3:.2f} ms for {t} rows "
                  f"({t / dt / 1e6:.1f} Mrows/s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILS ({str(e)[:120]})")


if __name__ == "__main__":
    probe_take_1d()
    probe_dynamic_gather((8, 128))
    probe_dynamic_gather((256, 128))
    probe_fori_rate()
