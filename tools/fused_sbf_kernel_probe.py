"""Reproducible REFUTATION probe: a Pallas kernel for the RNA fused-sbf
modulate stage (slice-mul-accumulate over the (T, 128) gathered rows +
2-layer 16x16 sbf MLP + mask + modulate) vs XLA.

Motivation: the compiled RNA forward contains two large layout copies
(~530 MB + ~479 MB per batch-16 at fixed pads) converting the triplet
gather output from row-major {1,0} to batch-in-lanes {0,1} — XLA's chosen
layout for the tiny (T,16)@(16,16) sbf-MLP dots (~8% of leaf device time;
HLO evidence: copy ops annotated "EmitInputBatchInLanes" consumers).

Measured on v5e (T=258048, same-process, chained-accumulator timing):
  pallas(blk=1024)  1.85 ms   (blk=4096 exceeds the 16 MB scoped-vmem limit)
  xla               0.87 ms
  pallas again      1.93 ms
— the kernel is ~2.1x SLOWER than XLA *including* whatever relayouts XLA
chooses: Mosaic's 16-lane sub-vreg slicing costs more than the copies it
avoids.  A second alternative — expressing the 16x16 dots as broadcast
multiply-adds so XLA keeps row-major layout — measured 437.6 vs 461.0 g/s
in the full model (-5%).  CONCLUSION: the relayout copies are XLA's
cost-model-correct choice; thread closed (DEVNOTES round-3).
f64-referee note: pallas and xla read identically vs the float64 oracle
(1.584e-1 on this synthetic magnitude-inflated stream — pure f32 rounding,
identical for both backends).
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pamnet_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
NS, D = 7, 16

def make_kernel():
    def kernel(rows_ref, cbf_ref, mask_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        rows = rows_ref[...]
        cbf = cbf_ref[...]
        acc = jnp.broadcast_to(bias_ref[...], (rows.shape[0], D))
        for l in range(NS):
            acc = acc + cbf[:, l:l+1] * rows[:, l*D:(l+1)*D]
        h = acc * jax.nn.sigmoid(acc)
        h = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[...]
        h = h * jax.nn.sigmoid(h)
        h = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[...]
        h = h * jax.nn.sigmoid(h)
        h = h * mask_ref[...][:, :1]
        out_ref[...] = rows[:, NS*D:(NS+1)*D] * h
    return kernel

def fused(rows, cbf, mask, bias, w1, b1, w2, b2, blk):
    T = rows.shape[0]
    return pl.pallas_call(
        make_kernel(), grid=(T // blk,),
        in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0)),
                  pl.BlockSpec((blk, 8), lambda i: (i, 0)),
                  pl.BlockSpec((blk, 1), lambda i: (i, 0)),
                  pl.BlockSpec((D,), lambda i: (0,)),
                  pl.BlockSpec((D, D), lambda i: (0, 0)),
                  pl.BlockSpec((D,), lambda i: (0,)),
                  pl.BlockSpec((D, D), lambda i: (0, 0)),
                  pl.BlockSpec((D,), lambda i: (0,))],
        out_specs=pl.BlockSpec((blk, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, D), rows.dtype),
    )(rows, cbf, mask, bias, w1, b1, w2, b2)

def ref_impl(rows, cbf, mask, bias, w1, b1, w2, b2):
    acc = bias + sum(cbf[:, l:l+1] * rows[:, l*D:(l+1)*D] for l in range(NS))
    h = acc * jax.nn.sigmoid(acc)
    h = h @ w1 + b1; h = h * jax.nn.sigmoid(h)
    h = h @ w2 + b2; h = h * jax.nn.sigmoid(h)
    h = h * mask
    return rows[:, NS*D:(NS+1)*D] * h

rng = np.random.default_rng(0)
T = 258048
rows = jnp.asarray(rng.normal(size=(T, 128)).astype(np.float32))
cbf8 = jnp.asarray(np.concatenate([rng.normal(size=(T, NS)), np.zeros((T,1))], 1).astype(np.float32))
mask = jnp.asarray((rng.random(T) > 0.1).astype(np.float32))[:, None]
bias, b1, b2 = (jnp.asarray(rng.normal(size=(D,)).astype(np.float32)) for _ in range(3))
w1, w2 = (jnp.asarray((rng.normal(size=(D, D)) * 0.3).astype(np.float32)) for _ in range(2))

# f64 referee on a slice (CPU numpy)
sl = slice(0, 8192)
r64, c64 = np.asarray(rows[sl], np.float64), np.asarray(cbf8[sl, :NS], np.float64)
m64 = np.asarray(mask[sl], np.float64)
def sig(x): return 1/(1+np.exp(-x))
acc = np.asarray(bias, np.float64) + sum(c64[:, l:l+1]*r64[:, l*D:(l+1)*D] for l in range(NS))
h = acc*sig(acc); h = h@np.asarray(w1,np.float64)+np.asarray(b1,np.float64); h = h*sig(h)
h = h@np.asarray(w2,np.float64)+np.asarray(b2,np.float64); h = h*sig(h); h = h*m64
want = r64[:, NS*D:(NS+1)*D]*h
for name, f in (("pallas1024", lambda: fused(rows, cbf8, mask, bias, w1, b1, w2, b2, 1024)),
                
                ("xla", lambda: ref_impl(rows, cbf8[:, :NS], mask, bias, w1, b1, w2, b2))):
    got = np.asarray(f()[sl], np.float64)
    print(f"{name}: err vs f64 = {np.abs(got-want).max():.3e}", flush=True)

def timeit(make, reps=60):
    f = jax.jit(lambda acc_in: acc_in + make().sum())
    acc = jnp.float32(0.0); acc = f(acc); _ = float(acc)
    t0 = time.time(); acc = jnp.float32(0.0)
    for _ in range(reps): acc = f(acc)
    _ = float(acc)
    return (time.time()-t0)/reps
for name, mk in (("pallas1024", lambda: fused(rows, cbf8, mask, bias, w1, b1, w2, b2, 1024)),
                 
                 ("xla", lambda: ref_impl(rows, cbf8[:, :NS], mask, bias, w1, b1, w2, b2)),
                 ("pallas1024b", lambda: fused(rows, cbf8, mask, bias, w1, b1, w2, b2, 1024))):
    print(f"{name}: {timeit(mk)*1e3:.3f} ms", flush=True)
