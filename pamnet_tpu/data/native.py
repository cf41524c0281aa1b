"""ctypes binding to the optional C++ graph-builder (csrc/graphbuild.cc).

The C++ library accelerates host-side neighbor search and triplet enumeration
for large graphs (PDBbind / RNA scale); the numpy implementations in
``pamnet_tpu.data.graphbuild`` are the always-available fallback and the
correctness oracle.  Build with ``make -C csrc`` (see csrc/Makefile).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

NATIVE_MIN_NODES = 512
NATIVE_MIN_EDGES = 8192

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "libgraphbuild.so",
)

_lib = None
_load_attempted = False


def _try_build() -> None:
    """Build the shared library on first use if the toolchain is present."""
    import shutil
    import subprocess

    if shutil.which("make") is None:
        return
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(_LIB_PATH)],
            capture_output=True, timeout=120, check=False,
        )
    except Exception:
        pass


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("PAMNET_DISABLE_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH):
        _try_build()
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    lib.radius_graph.restype = ctypes.c_int64
    lib.radius_graph.argtypes = [
        f32p, i64p, ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
        i32p, ctypes.c_int64,
    ]
    lib.knn_graph.restype = ctypes.c_int64
    lib.knn_graph.argtypes = [
        f32p, i64p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int64,
    ]
    lib.expand_incoming.restype = ctypes.c_int64
    lib.expand_incoming.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, i32p, i32p,
        ctypes.c_int32, i32p, ctypes.c_int64,
    ]
    try:
        lib.ell_table.restype = ctypes.c_int64
        lib.ell_table.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, f32p,
        ]
    except AttributeError:  # older .so without the symbol
        pass
    _lib = lib
    return _lib


def available() -> bool:
    if os.environ.get("PAMNET_DISABLE_NATIVE"):
        return False
    return _load() is not None


def radius_graph(pos, r, batch, max_num_neighbors):
    lib = _load()
    n = pos.shape[0]
    cap = max(n * min(n, max_num_neighbors), 1)
    while True:
        out = np.empty(2 * cap, dtype=np.int32)
        m = lib.radius_graph(
            np.ascontiguousarray(pos, dtype=np.float32),
            np.ascontiguousarray(batch, dtype=np.int64),
            n, np.float32(r), max_num_neighbors, out, cap,
        )
        if m >= 0:
            return np.stack([out[:m], out[cap : cap + m]]).copy()
        cap *= 4


def knn_graph(pos, k, batch):
    lib = _load()
    n = pos.shape[0]
    cap = max(n * k, 1)
    out = np.empty(2 * cap, dtype=np.int32)
    m = lib.knn_graph(
        np.ascontiguousarray(pos, dtype=np.float32),
        np.ascontiguousarray(batch, dtype=np.int64),
        n, k, out, cap,
    )
    if m < 0:
        raise RuntimeError("native knn_graph capacity overflow")
    return np.stack([out[:m], out[cap : cap + m]]).copy()


def ell_table(ids, n_valid, num_groups, k):
    lib = _load()
    if not hasattr(lib, "ell_table"):
        raise RuntimeError("libgraphbuild.so lacks ell_table; rebuild csrc")
    table = np.empty((num_groups, k), dtype=np.int32)
    mask = np.empty((num_groups, k), dtype=np.float32)
    rc = lib.ell_table(
        np.ascontiguousarray(ids, dtype=np.int32), int(n_valid),
        int(num_groups), int(k), table, mask,
    )
    if rc == -1:
        raise ValueError(f"ELL overflow: a group exceeds table width {k}")
    if rc != 0:
        raise ValueError("group id out of range")
    return table, mask


def _expand(edge_index, num_nodes, anchor_is_src):
    """Shared body of triplets/pairs: enumerate (outer_eid, inner_eid) with
    dst[inner] == anchor[outer], where anchor = src or dst."""
    lib = _load()
    e = edge_index.shape[1]
    src = np.ascontiguousarray(edge_index[0], dtype=np.int32)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int32)
    # Capacity: sum over edges of in-degree(anchor) <= E * max_in_degree; grow on demand.
    cap = max(e * 8, 1 << 16)
    while True:
        out = np.empty(2 * cap, dtype=np.int32)
        m = lib.expand_incoming(
            src, e, num_nodes, dst, src if anchor_is_src else dst,
            1 if anchor_is_src else 0, out, cap,
        )
        if m >= 0:
            return out[:m].copy(), out[cap : cap + m].copy()
        cap *= 4


def triplets(edge_index, num_nodes):
    outer, inner = _expand(edge_index, num_nodes, True)
    src, dst = edge_index.astype(np.int64)
    idx_i, idx_j, idx_k = dst[outer], src[outer], src[inner]
    mask = idx_i != idx_k
    return {
        "idx_i": idx_i[mask].astype(np.int32),
        "idx_j": idx_j[mask].astype(np.int32),
        "idx_k": idx_k[mask].astype(np.int32),
        "idx_kj": inner[mask].astype(np.int32),
        "idx_ji": outer[mask].astype(np.int32),
    }


def pairs(edge_index, num_nodes):
    outer, inner = _expand(edge_index, num_nodes, False)
    src, dst = edge_index.astype(np.int64)
    idx_i, idx_j1, idx_j2 = src[outer], dst[outer], src[inner]
    mask = idx_j1 != idx_j2
    return {
        "idx_i": idx_i[mask].astype(np.int32),
        "idx_j1": idx_j1[mask].astype(np.int32),
        "idx_j2": idx_j2[mask].astype(np.int32),
        "idx_jj": inner[mask].astype(np.int32),
        "idx_ji": outer[mask].astype(np.int32),
    }
