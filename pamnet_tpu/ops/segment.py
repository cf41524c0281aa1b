"""Segment reductions with static segment counts.

These are the TPU-native replacement for the reference's ``torch_scatter``
scatter-add calls (reference: layers/local_message_passing.py:4,50,54,107,111)
and PyG's pooling ops (reference: models.py:216-221).  All shapes are static;
validity is carried by explicit masks multiplied into the values *before*
reduction (padded rows contribute exact zeros).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets (scatter-add).

    bf16 streams accumulate in f32 (a bf16 scatter-add over wide segments
    loses mantissa bits per add); the result keeps the stream dtype."""
    out = jax.ops.segment_sum(
        data.astype(jnp.float32) if data.dtype == jnp.bfloat16 else data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return out.astype(data.dtype)


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Masked mean over segments.

    ``mask`` (same leading dim as data, float 0/1) marks valid rows; padded
    rows must already be zeroed in ``data`` (or be marked invalid here).
    """
    if mask is not None:
        data = data * mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        ones = mask
    else:
        ones = jnp.ones(data.shape[0], dtype=data.dtype)
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (data.ndim - count.ndim))
