"""Host-side (numpy) graph construction.

This is the TPU-native replacement for the CUDA extensions the reference
delegates to:

* ``torch_cluster.radius`` / ``torch_cluster.knn`` (reference: models.py:110,
  128, 143) -> :func:`radius_graph_np` / :func:`knn_graph_np`.
* ``torch_sparse.SparseTensor`` CSR triplet enumeration (reference:
  models.py:68-98) -> :func:`triplets_np` / :func:`pairs_np`.

Because the 3D coordinates of every dataset in the capability surface are
static, graph structure can be built once per molecule on the host and cached;
the device then consumes fixed-shape padded index tensors.  (An on-device
masked variant for small graphs lives in ``pamnet_tpu.ops.neighbors``.)

Index conventions follow the reference exactly: an edge list is a (2, E)
int array ``edge_index`` with ``src = edge_index[0]`` (called ``row``/``j``
in the reference) and ``dst = edge_index[1]`` (``col``/``i``).  Neighbor
searches emit (query, source) pairs in query-major order with the query in
row 0, matching ``torch_cluster``'s ``radius(pos, pos, ...)`` output that the
reference stacks as ``[row, col]`` (models.py:110-111).

If the optional C++ accelerator (csrc/graphbuild.cc) is built, the numpy
implementations transparently dispatch to it for large graphs.
"""

from __future__ import annotations

import numpy as np


def radius_graph_np(
    pos: np.ndarray,
    r: float,
    batch: np.ndarray | None = None,
    max_num_neighbors: int = 1000,
) -> np.ndarray:
    """All (query, source) pairs with ||pos[q] - pos[s]|| <= r in the same graph.

    Includes self-pairs (distance 0), like ``torch_cluster.radius``; callers
    remove self-loops downstream (reference: models.py:62-66).

    Returns (2, E) int32: row 0 = query index, row 1 = source index.
    """
    from pamnet_tpu.data import native

    pos = np.asarray(pos, dtype=np.float32)
    n = pos.shape[0]
    if batch is None:
        batch = np.zeros(n, dtype=np.int64)
    if native.available() and n > native.NATIVE_MIN_NODES:
        return native.radius_graph(pos, r, batch, max_num_neighbors)

    queries = []
    sources = []
    for g in np.unique(batch):
        idx = np.nonzero(batch == g)[0]
        p = pos[idx]
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        within = d2 <= r * r
        for qi in range(len(idx)):
            nbr = np.nonzero(within[qi])[0][:max_num_neighbors]
            queries.append(np.full(len(nbr), idx[qi], dtype=np.int64))
            sources.append(idx[nbr])
    if not queries:
        return np.zeros((2, 0), dtype=np.int32)
    return np.stack(
        [np.concatenate(queries), np.concatenate(sources)], axis=0
    ).astype(np.int32)


def knn_graph_np(
    pos: np.ndarray, k: int, batch: np.ndarray | None = None
) -> np.ndarray:
    """For each query, its k nearest sources in the same graph (self included,
    distance ties broken by index).  Matches ``torch_cluster.knn(pos, pos, k)``
    as used in the RNA branch (reference: models.py:143).

    Returns (2, E) int32: row 0 = query, row 1 = neighbor.
    """
    from pamnet_tpu.data import native

    pos = np.asarray(pos, dtype=np.float32)
    n = pos.shape[0]
    if batch is None:
        batch = np.zeros(n, dtype=np.int64)
    if native.available() and n > native.NATIVE_MIN_NODES:
        return native.knn_graph(pos, k, batch)

    queries = []
    sources = []
    for g in np.unique(batch):
        idx = np.nonzero(batch == g)[0]
        p = pos[idx].astype(np.float64)
        m = len(idx)
        kk = min(k, m)
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        if kk < m:
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            # Sort the selected k by (distance, index) for deterministic order.
            rows = np.arange(m)[:, None]
            order = np.lexsort((part, d2[rows, part]), axis=1)
            nbrs = part[rows, order]
        else:
            nbrs = np.argsort(d2, axis=1, kind="stable")
        queries.append(np.repeat(idx, kk))
        sources.append(idx[nbrs.reshape(-1)])
    if not queries:
        return np.zeros((2, 0), dtype=np.int32)
    return np.stack(
        [np.concatenate(queries), np.concatenate(sources)], axis=0
    ).astype(np.int32)


def remove_self_loops_np(edge_index: np.ndarray) -> np.ndarray:
    """Drop src == dst edges (reference: models.py:63 via PyG)."""
    mask = edge_index[0] != edge_index[1]
    return edge_index[:, mask]


def edge_distances_np(edge_index: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Per-edge Euclidean distance ||pos[dst] - pos[src]|| (reference:
    models.py:64-65: ``j, i = edge_index; dist = (pos[i]-pos[j]).norm``)."""
    src, dst = edge_index
    return np.sqrt(((pos[dst] - pos[src]) ** 2).sum(-1)).astype(np.float32)


def _in_edges_csr(edge_index: np.ndarray, num_nodes: int):
    """CSR of incoming edges per node: for node v, the edge ids e with
    dst[e] == v.  Equivalent to the reference's transposed SparseTensor
    (models.py:72-73: ``SparseTensor(row=col, col=row, value=edge_id)``)."""
    src, dst = edge_index
    order = np.argsort(dst, kind="stable")
    sorted_eids = order.astype(np.int64)
    counts = np.bincount(dst, minlength=num_nodes)
    offsets = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return sorted_eids, offsets


def _expand_incoming(edge_index: np.ndarray, num_nodes: int, anchor: np.ndarray):
    """For each edge e, enumerate all edge ids e' whose dst == anchor[e].

    Returns (outer_eids, inner_eids): flat arrays where outer_eids repeats
    each edge id once per incoming edge of its anchor node.
    """
    sorted_eids, offsets = _in_edges_csr(edge_index, num_nodes)
    counts = (offsets[anchor + 1] - offsets[anchor]).astype(np.int64)
    outer = np.repeat(np.arange(edge_index.shape[1], dtype=np.int64), counts)
    # Gather each anchor's in-edge list: build flat positions into sorted_eids.
    starts = np.repeat(offsets[anchor], counts)
    total = int(counts.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    inner = sorted_eids[starts + within]
    return outer, inner


def triplets_np(edge_index: np.ndarray, num_nodes: int) -> dict:
    """Two-hop triplet table: for each edge e = (j -> i), all edges
    e' = (k -> j) with k != i (reference: models.py:74-84).

    Returns dict with int32 arrays (all length T2):
      ``idx_i``, ``idx_j``, ``idx_k``: node ids,
      ``idx_kj``: edge id of (k -> j),  ``idx_ji``: edge id of (j -> i).
    """
    from pamnet_tpu.data import native

    if native.available() and edge_index.shape[1] > native.NATIVE_MIN_EDGES:
        return native.triplets(edge_index, num_nodes)

    src, dst = edge_index.astype(np.int64)
    outer, inner = _expand_incoming(edge_index, num_nodes, src)
    idx_i = dst[outer]
    idx_j = src[outer]
    idx_k = src[inner]
    mask = idx_i != idx_k  # Remove i == k triplets (reference: models.py:80).
    return {
        "idx_i": idx_i[mask].astype(np.int32),
        "idx_j": idx_j[mask].astype(np.int32),
        "idx_k": idx_k[mask].astype(np.int32),
        "idx_kj": inner[mask].astype(np.int32),
        "idx_ji": outer[mask].astype(np.int32),
    }


def pairs_np(edge_index: np.ndarray, num_nodes: int) -> dict:
    """One-hop pair table: for each edge e = (row -> col), all edges
    e'' = (j2 -> col) sharing e's destination, with j2 != col (reference:
    models.py:85-97; the j1 != j2 mask there compares j2 against col).

    Note the pair where e'' == e *is* included (angle pi), matching the
    reference.

    Returns dict with int32 arrays (all length T1):
      ``idx_i``: row (source of e), ``idx_j1``: col (dst of e),
      ``idx_j2``: source of e'',
      ``idx_jj``: edge id of e'' (j2 -> col), ``idx_ji``: edge id of e.
    """
    from pamnet_tpu.data import native

    if native.available() and edge_index.shape[1] > native.NATIVE_MIN_EDGES:
        return native.pairs(edge_index, num_nodes)

    src, dst = edge_index.astype(np.int64)
    outer, inner = _expand_incoming(edge_index, num_nodes, dst)
    idx_i = src[outer]
    idx_j1 = dst[outer]
    idx_j2 = src[inner]
    mask = idx_j1 != idx_j2  # Remove j == j' (reference: models.py:92).
    return {
        "idx_i": idx_i[mask].astype(np.int32),
        "idx_j1": idx_j1[mask].astype(np.int32),
        "idx_j2": idx_j2[mask].astype(np.int32),
        "idx_jj": inner[mask].astype(np.int32),
        "idx_ji": outer[mask].astype(np.int32),
    }
