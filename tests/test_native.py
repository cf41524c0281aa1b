"""Native (C++) graph builder vs. numpy oracle on large random clouds.

The numpy implementations are themselves tested against brute force
(test_graph.py); here the C++ library must reproduce them exactly
(as *sets* of pairs — emission order may differ)."""

import numpy as np
import pytest

from pamnet_tpu.data import graphbuild, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libgraphbuild.so not built"
)


def _clouds(rng):
    pos = np.concatenate(
        [rng.random((600, 3)) * 15, rng.random((700, 3)) * 18]
    ).astype(np.float32)
    batch = np.array([0] * 600 + [1] * 700, dtype=np.int64)
    return pos, batch


def _pairs(e):
    return set(zip(e[0].tolist(), e[1].tolist()))


def test_native_radius_matches_numpy(rng):
    pos, batch = _clouds(rng)
    got = native.radius_graph(pos, 2.5, batch, 1000)
    import os

    os.environ["PAMNET_DISABLE_NATIVE"] = "1"
    try:
        want = graphbuild.radius_graph_np(pos, 2.5, batch, 1000)
    finally:
        del os.environ["PAMNET_DISABLE_NATIVE"]
    assert _pairs(got) == _pairs(want)


def test_native_knn_matches_numpy(rng):
    pos, batch = _clouds(rng)
    got = native.knn_graph(pos, 12, batch)
    # Compare against a direct numpy knn on the same inputs.
    qs = []
    for g in (0, 1):
        idx = np.nonzero(batch == g)[0]
        p = pos[idx].astype(np.float64)
        d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
        nn = np.argsort(d2, axis=1, kind="stable")[:, :12]
        for qi in range(len(idx)):
            for s in nn[qi]:
                qs.append((idx[qi], idx[s]))
    # knn sets can differ on exact distance ties; none expected with random
    # float coordinates.
    assert _pairs(got) == set(qs)


def test_native_ell_table_matches_numpy(rng):
    import os

    from pamnet_tpu.ops.ell import build_ell_table_np

    ids = np.sort(rng.integers(0, 512, 9000)).astype(np.int32)
    got_t, got_m = native.ell_table(ids, 8800, 512, 64)
    os.environ["PAMNET_DISABLE_NATIVE"] = "1"
    try:
        want_t, want_m = build_ell_table_np(ids, 8800, 512, 64)
    finally:
        del os.environ["PAMNET_DISABLE_NATIVE"]
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_array_equal(got_m, want_m)


def test_native_triplets_and_pairs_match_numpy(rng):
    pos = (rng.random((400, 3)) * 8).astype(np.float32)
    edges = graphbuild.radius_graph_np(pos, 1.5, None, 1000)
    edges = graphbuild.remove_self_loops_np(edges)
    got_t2 = native.triplets(edges, 400)
    got_t1 = native.pairs(edges, 400)
    import os

    os.environ["PAMNET_DISABLE_NATIVE"] = "1"
    try:
        want_t2 = graphbuild.triplets_np(edges, 400)
        want_t1 = graphbuild.pairs_np(edges, 400)
    finally:
        del os.environ["PAMNET_DISABLE_NATIVE"]
    assert set(zip(got_t2["idx_kj"], got_t2["idx_ji"])) == set(
        zip(want_t2["idx_kj"], want_t2["idx_ji"])
    )
    assert set(zip(got_t1["idx_jj"], got_t1["idx_ji"])) == set(
        zip(want_t1["idx_jj"], want_t1["idx_ji"])
    )
