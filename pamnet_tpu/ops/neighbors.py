"""On-device graph construction with static shapes (jit-compatible).

The production path builds structure on the host once per molecule
(coordinates are static in every supported dataset; see data/graphbuild.py),
but the capability to construct radius/knn graphs and triplet tables *on
device* matters for dynamic-geometry uses (e.g. relaxation/MD-style loops).
These implementations use masked dense candidate sets compacted with
``jnp.nonzero(..., size=...)`` so every shape is static; they are intended
for QM9-scale batches (N_pad up to a few thousand; the candidate sets are
O(N^2) / O(E^2)).

Semantics match the host builders / torch_cluster (reference: models.py:110,
143): self-pairs included (callers drop them), query-major order, knn ties
broken by index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def radius_edges(
    pos: jax.Array,
    node_graph: jax.Array,
    node_mask: jax.Array,
    cutoff: float,
    e_pad: int,
    max_num_neighbors: int = 1000,
    include_self: bool = False,
):
    """Radius graph over a padded node set -> (src=query, dst=source, mask).

    Returns index arrays of length ``e_pad`` (padded entries point at 0).
    """
    n = pos.shape[0]
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    valid = (node_mask[:, None] > 0) & (node_mask[None, :] > 0)
    same = node_graph[:, None] == node_graph[None, :]
    within = d2 <= cutoff * cutoff
    cand = valid & same & within
    if not include_self:
        cand &= ~jnp.eye(n, dtype=bool)
    # Per-query neighbor cap (torch_cluster max_num_neighbors).
    rank = jnp.cumsum(cand, axis=1) - 1
    cand &= rank < max_num_neighbors
    q, s = jnp.nonzero(cand, size=e_pad, fill_value=0)
    count = jnp.sum(cand)
    mask = (jnp.arange(e_pad) < count).astype(jnp.float32)
    return q.astype(jnp.int32), s.astype(jnp.int32), mask


def knn_edges(
    pos: jax.Array,
    node_graph: jax.Array,
    node_mask: jax.Array,
    k: int,
):
    """k-nearest-neighbor graph (self included, ties by index) ->
    (src=query, dst=neighbor, mask), each of length N*k."""
    n = pos.shape[0]
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    valid = (node_mask[:, None] > 0) & (node_mask[None, :] > 0)
    same = node_graph[:, None] == node_graph[None, :]
    big = jnp.asarray(jnp.inf, d2.dtype)
    keyed = jnp.where(valid & same, d2, big)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    # Stable sort by (distance, index): lax.sort with two keys.
    sorted_d, sorted_idx = jax.lax.sort((keyed, idx), num_keys=1, dimension=1)
    nbr = sorted_idx[:, :k]  # (N, k)
    nbr_d = sorted_d[:, :k]
    q = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    s = nbr.reshape(-1)
    mask = (jnp.isfinite(nbr_d).reshape(-1)) & (node_mask[q] > 0)
    return q, s.astype(jnp.int32), mask.astype(jnp.float32)


def device_triplets(el_src, el_dst, el_mask, t_pad: int):
    """Two-hop triplet table from a padded local edge list: for each edge
    e=(j->i), all edges e'=(k->j), k != i (reference: models.py:74-84).

    Returns dict(idx_i, idx_j, idx_k, idx_kj, idx_ji, mask) of length t_pad.
    """
    valid = (el_mask[:, None] > 0) & (el_mask[None, :] > 0)
    shares = el_dst[None, :] == el_src[:, None]  # dst[e'] == src[e]
    not_back = el_src[None, :] != el_dst[:, None]  # k != i
    cand = valid & shares & not_back
    ji, kj = jnp.nonzero(cand, size=t_pad, fill_value=0)
    count = jnp.sum(cand)
    mask = (jnp.arange(t_pad) < count).astype(jnp.float32)
    return {
        "idx_i": el_dst[ji],
        "idx_j": el_src[ji],
        "idx_k": el_src[kj],
        "idx_kj": kj.astype(jnp.int32),
        "idx_ji": ji.astype(jnp.int32),
        "mask": mask,
    }


def device_pairs(el_src, el_dst, el_mask, t_pad: int):
    """One-hop pair table: for each edge e=(row->col), all edges
    e''=(j2->col) with j2 != col (reference: models.py:85-97)."""
    valid = (el_mask[:, None] > 0) & (el_mask[None, :] > 0)
    shares = el_dst[None, :] == el_dst[:, None]  # dst[e''] == dst[e]
    not_self_node = el_src[None, :] != el_dst[:, None]  # j2 != col
    cand = valid & shares & not_self_node
    ji, jj = jnp.nonzero(cand, size=t_pad, fill_value=0)
    count = jnp.sum(cand)
    mask = (jnp.arange(t_pad) < count).astype(jnp.float32)
    return {
        "idx_i": el_src[ji],
        "idx_j1": el_dst[ji],
        "idx_j2": el_src[jj],
        "idx_jj": jj.astype(jnp.int32),
        "idx_ji": ji.astype(jnp.int32),
        "mask": mask,
    }
