"""Minimal functional NN blocks over explicit parameter pytrees.

Parameters are nested dicts/lists of jnp arrays, which keeps torch-checkpoint
ingestion (pamnet_tpu.train.checkpoint) and EMA shadow trees trivial.  Block
semantics mirror the reference (layers/basic.py:11-33):

* ``mlp``: stack of Linear -> SiLU (every layer activated).
* ``res``: two-layer MLP with identity skip.

Initialization distributions match torch defaults (kaiming-uniform Linear,
U(-sqrt(3), sqrt(3)) embeddings, glorot for attention vectors) so training
dynamics are comparable; exact RNG streams are not (and need not be) bitwise
equal to torch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in)).
    Weight stored (d_in, d_out) — transposed relative to torch."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": _uniform(kw, (d_in, d_out), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (d_out,), bound, dtype)
    return p


def linear(p, x):
    # Follow the activation dtype (mixed precision: f32 master weights,
    # bf16 compute when the caller casts activations down).
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def glorot(key, shape, dtype=jnp.float32):
    """Xavier-uniform (PyG ``glorot``), used for the attention vector W
    (reference: global_message_passing.py:30-31)."""
    fan = sum(shape[:2]) if len(shape) >= 2 else shape[0]
    bound = math.sqrt(6.0 / fan)
    return _uniform(key, shape, bound, dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def mlp_init(key, channels: list[int], dtype=jnp.float32):
    keys = jax.random.split(key, max(len(channels) - 1, 1))
    return [
        linear_init(keys[i], channels[i], channels[i + 1], dtype=dtype)
        for i in range(len(channels) - 1)
    ]


def mlp(p, x):
    """Linear + SiLU per stage (reference: layers/basic.py:19-22)."""
    for lin in p:
        x = silu(linear(lin, x))
    return x


def res_init(key, dim: int, dtype=jnp.float32):
    return {"mlp": mlp_init(key, [dim, dim, dim], dtype=dtype)}


def res(p, x):
    """Two-layer MLP + identity (reference: layers/basic.py:25-33)."""
    return mlp(p["mlp"], x) + x
