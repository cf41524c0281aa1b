"""Graph construction vs. brute-force oracles (the correctness surface the
reference delegates to torch_cluster / torch_sparse; see SURVEY.md section 7
build step 3)."""

import numpy as np

from pamnet_tpu.data import graphbuild
from pamnet_tpu.data.batch import GraphBatch, PadSizes, build_graph_batch


def random_cloud(rng, n, scale=4.0):
    return (rng.random((n, 3)) * scale).astype(np.float32)


def test_radius_graph_bruteforce(rng):
    pos = np.concatenate([random_cloud(rng, 17), random_cloud(rng, 23)])
    batch = np.array([0] * 17 + [1] * 23)
    r = 2.0
    edges = graphbuild.radius_graph_np(pos, r, batch)
    got = set(zip(edges[0].tolist(), edges[1].tolist()))
    expected = set()
    for q in range(40):
        for s in range(40):
            if batch[q] == batch[s] and np.linalg.norm(pos[q] - pos[s]) <= r:
                expected.add((q, s))
    assert got == expected
    assert all((s, q) in got for q, s in got)  # symmetric (no cap hit)


def test_radius_graph_max_neighbors_cap(rng):
    pos = random_cloud(rng, 30, scale=0.5)  # everything within radius
    edges = graphbuild.radius_graph_np(pos, 5.0, None, max_num_neighbors=7)
    counts = np.bincount(edges[0], minlength=30)
    assert np.all(counts == 7)


def test_knn_graph_bruteforce(rng):
    pos = np.concatenate([random_cloud(rng, 25), random_cloud(rng, 9)])
    batch = np.array([0] * 25 + [1] * 9)
    k = 6
    edges = graphbuild.knn_graph_np(pos, k, batch)
    # Per query: exactly k neighbors (including self), and their max distance
    # is <= the true k-th smallest distance.
    for q in range(34):
        nbrs = edges[1][edges[0] == q]
        assert len(nbrs) == k
        same = np.nonzero(batch == batch[q])[0]
        d = np.linalg.norm(pos[same] - pos[q], axis=1)
        kth = np.sort(d)[k - 1]
        got_d = np.linalg.norm(pos[nbrs] - pos[q], axis=1)
        assert np.all(got_d <= kth + 1e-6)
        assert q in nbrs  # self included (reference removes it downstream)


def test_knn_smaller_graph_than_k(rng):
    pos = random_cloud(rng, 4)
    edges = graphbuild.knn_graph_np(pos, 50, None)
    assert edges.shape[1] == 16  # 4 queries x 4 available


def _brute_triplets(edge_index):
    src, dst = edge_index
    e = edge_index.shape[1]
    two_hop = set()
    pairs = set()
    for a in range(e):  # outer edge (j -> i)
        for b in range(e):
            if dst[b] == src[a] and src[b] != dst[a]:
                two_hop.add((b, a))  # (kj, ji)
            if dst[b] == dst[a] and src[b] != dst[a]:
                pairs.add((b, a))  # (jj, ji)
    return two_hop, pairs


def test_triplets_and_pairs_bruteforce(rng):
    pos = random_cloud(rng, 20, scale=3.0)
    edges = graphbuild.radius_graph_np(pos, 1.8, None)
    edges = graphbuild.remove_self_loops_np(edges)
    n = 20
    t2 = graphbuild.triplets_np(edges, n)
    t1 = graphbuild.pairs_np(edges, n)
    oracle_t2, oracle_t1 = _brute_triplets(edges)
    got_t2 = set(zip(t2["idx_kj"].tolist(), t2["idx_ji"].tolist()))
    got_t1 = set(zip(t1["idx_jj"].tolist(), t1["idx_ji"].tolist()))
    assert got_t2 == oracle_t2
    assert got_t1 == oracle_t1
    # Node columns must be consistent with the edge columns.
    src, dst = edges
    np.testing.assert_array_equal(t2["idx_i"], dst[t2["idx_ji"]])
    np.testing.assert_array_equal(t2["idx_j"], src[t2["idx_ji"]])
    np.testing.assert_array_equal(t2["idx_k"], src[t2["idx_kj"]])
    np.testing.assert_array_equal(t1["idx_i"], src[t1["idx_ji"]])
    np.testing.assert_array_equal(t1["idx_j1"], dst[t1["idx_ji"]])
    np.testing.assert_array_equal(t1["idx_j2"], src[t1["idx_jj"]])


def test_pairs_include_self_pair(rng):
    # The one-hop pair table includes e'' == e (angle pi), matching the
    # reference's mask which only removes j2 == dst (models.py:92).
    edges = np.array([[0, 1], [1, 0]], dtype=np.int32)  # 0->1, 1->0
    t1 = graphbuild.pairs_np(edges, 2)
    got = set(zip(t1["idx_jj"].tolist(), t1["idx_ji"].tolist()))
    assert (0, 0) in got and (1, 1) in got


def _toy_mols(rng, n_mols=3):
    mols = []
    for _ in range(n_mols):
        n = int(rng.integers(5, 12))
        pos = random_cloud(rng, n, scale=2.5)
        # chain bond graph, both directions
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        mols.append(
            dict(
                z=rng.integers(0, 5, n).astype(np.int32),
                pos=pos,
                edge_index=np.stack([src, dst]),
                y=float(rng.random()),
            )
        )
    return mols


def test_build_graph_batch_qm9_shapes(rng):
    mols = _toy_mols(rng)
    gb = build_graph_batch(mols, "qm9", cutoff_l=5.0, cutoff_g=5.0)
    assert gb.num_graphs >= 3 and gb.graph_mask.sum() == 3
    n_real = int(gb.node_mask.sum())
    assert n_real == sum(m["pos"].shape[0] for m in mols)
    # Local edges = bond chains (bidirectional), offsets applied per graph.
    el_real = int(gb.el_mask.sum())
    assert el_real == sum(2 * (m["pos"].shape[0] - 1) for m in mols)
    # Padded entries point at slot 0 and are masked.
    assert gb.el_src[el_real:].max(initial=0) == 0
    # Triplets never cross graphs.
    valid_t2 = gb.t2_mask.astype(bool)
    assert np.all(
        gb.node_graph[gb.t2_i[valid_t2]] == gb.node_graph[gb.t2_k[valid_t2]]
    )


def test_build_graph_batch_rna(rng):
    mols = []
    for _ in range(2):
        n = int(rng.integers(30, 40))
        mols.append(
            dict(
                z=rng.integers(0, 3, n).astype(np.int32),
                pos=random_cloud(rng, n, scale=8.0),
                y=float(rng.random()),
            )
        )
    gb = build_graph_batch(mols, "rna", cutoff_l=2.6, cutoff_g=20.0)
    # global edges: each node has <= 49 neighbors (knn 50 minus self)
    eg_real = int(gb.eg_mask.sum())
    counts = np.bincount(gb.eg_src[: eg_real], minlength=gb.num_nodes)
    assert counts.max() <= 49
    # local is a subset of the knn set with short distances
    el_real = int(gb.el_mask.sum())
    d = np.linalg.norm(
        gb.pos[gb.el_dst[:el_real]] - gb.pos[gb.el_src[:el_real]], axis=1
    )
    assert np.all(d <= 2.6)


def test_pad_overflow_raises(rng):
    mols = _toy_mols(rng)
    pads = PadSizes(n=8, eg=8, el=8, t2=8, t1=8, g=8)
    try:
        build_graph_batch(mols, "qm9", 5.0, 5.0, pads=pads)
        raise AssertionError("expected overflow")
    except ValueError as e:
        assert "overflow" in str(e)
