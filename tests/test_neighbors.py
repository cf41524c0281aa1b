"""On-device (jit, static-shape) graph construction vs the host builders."""

import numpy as np

import jax
import jax.numpy as jnp

from pamnet_tpu.data import graphbuild
from pamnet_tpu.ops import neighbors


def _padded_cloud(rng, sizes, n_pad, scale=4.0):
    pos = np.zeros((n_pad, 3), np.float32)
    graph = np.zeros(n_pad, np.int32)
    mask = np.zeros(n_pad, np.float32)
    off = 0
    for gi, n in enumerate(sizes):
        pos[off : off + n] = rng.random((n, 3)) * scale
        graph[off : off + n] = gi
        mask[off : off + n] = 1.0
        off += n
    return pos, graph, mask, off


def test_device_radius_matches_host(rng):
    pos, graph, mask, n_real = _padded_cloud(rng, [17, 23], 64)
    fn = jax.jit(
        lambda p, g, m: neighbors.radius_edges(p, g, m, 2.0, e_pad=1024)
    )
    q, s, emask = fn(jnp.asarray(pos), jnp.asarray(graph), jnp.asarray(mask))
    k = int(np.asarray(emask).sum())
    got = set(zip(np.asarray(q)[:k].tolist(), np.asarray(s)[:k].tolist()))
    want = graphbuild.radius_graph_np(pos[:n_real], 2.0, graph[:n_real])
    want = graphbuild.remove_self_loops_np(want)
    assert got == set(zip(want[0].tolist(), want[1].tolist()))


def test_device_knn_matches_host(rng):
    pos, graph, mask, n_real = _padded_cloud(rng, [25, 9], 40)
    fn = jax.jit(lambda p, g, m: neighbors.knn_edges(p, g, m, 6))
    q, s, emask = fn(jnp.asarray(pos), jnp.asarray(graph), jnp.asarray(mask))
    valid = np.asarray(emask) > 0
    got = set(zip(np.asarray(q)[valid].tolist(), np.asarray(s)[valid].tolist()))
    want = graphbuild.knn_graph_np(pos[:n_real], 6, graph[:n_real])
    assert got == set(zip(want[0].tolist(), want[1].tolist()))


def test_device_triplets_match_host(rng):
    pos, graph, mask, n_real = _padded_cloud(rng, [20], 32, scale=3.0)
    edges = graphbuild.radius_graph_np(pos[:n_real], 1.8, None)
    edges = graphbuild.remove_self_loops_np(edges)
    e_pad = 256
    src = np.zeros(e_pad, np.int32)
    dst = np.zeros(e_pad, np.int32)
    emask = np.zeros(e_pad, np.float32)
    ne = edges.shape[1]
    src[:ne], dst[:ne], emask[:ne] = edges[0], edges[1], 1.0

    t2 = jax.jit(
        lambda s, d, m: neighbors.device_triplets(s, d, m, t_pad=2048)
    )(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(emask))
    t1 = jax.jit(
        lambda s, d, m: neighbors.device_pairs(s, d, m, t_pad=2048)
    )(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(emask))

    want_t2 = graphbuild.triplets_np(edges, n_real)
    want_t1 = graphbuild.pairs_np(edges, n_real)

    k2 = int(np.asarray(t2["mask"]).sum())
    got2 = set(
        zip(np.asarray(t2["idx_kj"])[:k2].tolist(), np.asarray(t2["idx_ji"])[:k2].tolist())
    )
    assert got2 == set(zip(want_t2["idx_kj"].tolist(), want_t2["idx_ji"].tolist()))

    k1 = int(np.asarray(t1["mask"]).sum())
    got1 = set(
        zip(np.asarray(t1["idx_jj"])[:k1].tolist(), np.asarray(t1["idx_ji"])[:k1].tolist())
    )
    assert got1 == set(zip(want_t1["idx_jj"].tolist(), want_t1["idx_ji"].tolist()))


def test_device_radius_max_neighbors(rng):
    pos, graph, mask, _ = _padded_cloud(rng, [30], 32, scale=0.5)
    q, s, emask = jax.jit(
        lambda p, g, m: neighbors.radius_edges(
            p, g, m, 5.0, e_pad=1024, max_num_neighbors=7
        )
    )(jnp.asarray(pos), jnp.asarray(graph), jnp.asarray(mask))
    k = int(np.asarray(emask).sum())
    counts = np.bincount(np.asarray(q)[:k], minlength=32)
    assert counts[:30].max() == 7
