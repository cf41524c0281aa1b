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
    # Pointer lists are passed as uint64 address arrays (ABI-identical to
    # `const T* const*` on LP64) — building real ctypes pointer arrays via
    # ``arr.ctypes.data`` measured ~37% of collate time.
    u64p = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
    try:
        lib.concat_offset_i32.restype = ctypes.c_int64
        lib.concat_offset_i32.argtypes = [
            u64p, i64p, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        ]
        lib.concat_rows_f32.restype = ctypes.c_int64
        lib.concat_rows_f32.argtypes = [
            u64p, i64p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int64,
        ]
    except AttributeError:
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


def has_collate() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "concat_offset_i32")


def _addrs_lens(arrs):
    """(uint64 address array, int64 length array) for a list of ndarrays.
    ``__array_interface__`` exposes the raw address as a plain int — far
    cheaper than ``arr.ctypes.data`` (which builds a ctypes view per call)."""
    n = len(arrs)
    addrs = np.empty(n, dtype=np.uint64)
    lens = np.empty(n, dtype=np.int64)
    for k, a in enumerate(arrs):
        ai = a.__array_interface__
        addrs[k] = ai["data"][0]
        lens[k] = ai["shape"][0] if ai["shape"] else 0
    return addrs, lens


def _as_c(arrs, dtype):
    return [a if (a.dtype == dtype and a.flags.c_contiguous)
            else np.ascontiguousarray(a, dtype=dtype) for a in arrs]


def concat_offset_i32_addr(addrs, lens, offs, out_len):
    """Padded concat from precomputed address/length arrays (CollatePlan
    path: no per-array Python work at collation time)."""
    lib = _load()
    out = np.empty(out_len, dtype=np.int32)
    m = lib.concat_offset_i32(addrs, lens, offs, len(addrs), out, out_len)
    if m < 0:
        total = int(lens.sum())
        raise ValueError(f"padding overflow: have {total} rows, bucket holds {out_len}")
    return out, int(m)


def concat_rows_f32_addr(addrs, lens, row_w, out_rows):
    lib = _load()
    out = np.empty((out_rows, row_w) if row_w != 1 else out_rows, dtype=np.float32)
    m = lib.concat_rows_f32(addrs, lens, row_w, len(addrs), out, out_rows)
    if m < 0:
        total = int(lens.sum())
        raise ValueError(f"padding overflow: have {total} rows, bucket holds {out_rows}")
    return out, int(m)


def concat_offset_i32(arrs, offs, out_len):
    """Padded concat of int32 arrays with per-array scalar offsets, in one
    native pass (the collation hot path; see csrc/graphbuild.cc)."""
    arrs = _as_c(arrs, np.int32)
    addrs, lens = _addrs_lens(arrs)
    offs = np.ascontiguousarray(offs, dtype=np.int32)
    return concat_offset_i32_addr(addrs, lens, offs, out_len)


def concat_rows_f32(arrs, out_rows):
    """Padded concat of float32 row blocks (shared trailing width)."""
    arrs = _as_c(arrs, np.float32)
    row_w = int(np.prod(arrs[0].shape[1:], dtype=np.int64)) if arrs[0].ndim > 1 else 1
    addrs, lens = _addrs_lens(arrs)
    out, m = concat_rows_f32_addr(addrs, lens, row_w, out_rows)
    if arrs[0].ndim > 1:
        out = out.reshape((out_rows,) + arrs[0].shape[1:])
    return out, int(m)


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
