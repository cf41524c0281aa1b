"""Fixed-shape padded graph batches (the TPU-native replacement for PyG's
dynamic ``Data``/``Batch`` objects).

A ``GraphBatch`` is a flat pytree of integer/float arrays whose shapes are
chosen from a small set of padding buckets so XLA compiles once per bucket.
Validity is carried by explicit 0/1 masks; padded index entries point at slot
0 and every consumer multiplies by the mask before any scatter/reduce, so
padding contributes exact zeros.

The batch layout concatenates all graphs (PyG-collate style: node indices are
offset per graph, ``node_graph`` is the graph-indicator vector), then pads:

* nodes      -> ``n_pad``
* global edges -> ``eg_pad``   (radius graph, reference: models.py:110)
* local edges  -> ``el_pad``   (bond graph / cutoff-masked, models.py:105-157)
* two-hop triplets -> ``t2_pad`` (reference: models.py:74-84)
* one-hop pairs    -> ``t1_pad`` (reference: models.py:85-97)
* graphs     -> ``g_pad``
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import numpy as np

from pamnet_tpu.data import graphbuild


class GraphBatch(NamedTuple):
    """Padded multi-graph batch. All arrays are numpy/jax; shapes static.

    Edge lists follow the reference convention ``(src, dst) == (j, i)`` with
    messages aggregated at ``i`` in local layers (local_message_passing.py:37,54)
    and at the flow-dependent end in the global layer.
    """

    # Nodes.
    z: np.ndarray  # (N,) int32 atom-type index
    feat: np.ndarray  # (N, F) float32 extra node features (PDBbind); F may be 0
    pos: np.ndarray  # (N, 3) float32
    node_mask: np.ndarray  # (N,) float32 0/1
    node_graph: np.ndarray  # (N,) int32 graph id
    # Global-plex edges.
    eg_src: np.ndarray  # (Eg,) int32
    eg_dst: np.ndarray  # (Eg,) int32
    eg_mask: np.ndarray  # (Eg,) float32
    # Local-plex edges.
    el_src: np.ndarray  # (El,) int32
    el_dst: np.ndarray  # (El,) int32
    el_mask: np.ndarray  # (El,) float32
    # Two-hop triplets (k -> j -> i).
    t2_i: np.ndarray  # (T2,) int32
    t2_j: np.ndarray
    t2_k: np.ndarray
    t2_kj: np.ndarray  # edge id of (k -> j)
    t2_ji: np.ndarray  # edge id of (j -> i)
    t2_mask: np.ndarray  # (T2,) float32
    # One-hop pairs (edge (i -> j1) with in-edge (j2 -> j1)).
    t1_i: np.ndarray  # (T1,) int32
    t1_j1: np.ndarray
    t1_j2: np.ndarray
    t1_jj: np.ndarray  # edge id of (j2 -> j1)
    t1_ji: np.ndarray  # edge id of (i -> j1)
    t1_mask: np.ndarray  # (T1,) float32
    # Graph-level.
    y: np.ndarray  # (G,) float32 labels
    graph_mask: np.ndarray  # (G,) float32
    # Scatter-free aggregation tables (ops/ell.py): ELL (group, K) index
    # tables + masks grouping edges by endpoint and triplets by edge, so
    # every aggregation (and every gather's backward) is a gather + dense
    # K-sum instead of an XLA scatter.  None when built without tables.
    tables: dict | None = None
    # Host-precomputed spherical basis (geometry-only, no trainable parts;
    # float64 on host -> f32): per-local-edge normalized radial table
    # (El, ns*nr) and per-triplet Y_l0 tables (T2, ns)/(T1, ns).  None ->
    # the model evaluates the basis on device (needed only if positions
    # change under jit).  Profiling: the on-device spherical-Bessel
    # evaluation dominated RNA inference (~half the forward).
    sbf_radial: np.ndarray | None = None
    cbf2: np.ndarray | None = None
    cbf1: np.ndarray | None = None
    # Host-precomputed edge distances (geometry-only): the on-device
    # pos-gathers for 1M+-edge graphs write (E, 3) arrays that tile-pad to
    # 128 lanes (42x traffic); distances are f64-exact from the host.
    dist_g: np.ndarray | None = None
    dist_l: np.ndarray | None = None
    # Compact-wire markers (collate_structures(compact_wire=True)): the
    # masks + node_graph above are None and these carry the information to
    # rebuild them inside the compiled step (hydrate_batch): ``counts`` =
    # int32 [num_nodes, n_eg, n_el, n_t2, n_t1, num_graphs]; ``n_per`` =
    # per-graph node counts (G,).  Index arrays may additionally arrive
    # int16 when their padded bound fits; hydrate_batch widens them.
    counts: np.ndarray | None = None
    n_per: np.ndarray | None = None

    @property
    def num_nodes(self) -> int:
        return self.z.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]


@dataclasses.dataclass(frozen=True)
class PadSizes:
    """Static padded sizes for one compilation bucket.

    The ``k*`` fields are ELL aggregation-table widths (max rows per group,
    rounded up); 0 means "derive from the batch" (bucketed to a multiple of
    8 — note per-batch derivation can produce varying compiled shapes; the
    GraphLoader pins dataset-wide maxima)."""

    n: int
    eg: int
    el: int
    t2: int
    t1: int
    g: int
    kg_dst: int = 0  # eg grouped by dst (in-degree)
    kg_src: int = 0  # eg grouped by src (out-degree)
    kl_dst: int = 0
    kl_src: int = 0
    k2_ji: int = 0  # two-hop triplets per center edge
    k2_kj: int = 0  # two-hop triplets per neighbor edge
    k1_ji: int = 0
    k1_jj: int = 0

    @staticmethod
    def round_up(x: int, align: int = 128) -> int:
        return max(align, int(math.ceil(x / align)) * align)

    @classmethod
    def for_counts(
        cls, n, eg, el, t2, t1, g, align: int = 128, slack: float = 1.0
    ) -> "PadSizes":
        r = cls.round_up
        return cls(
            n=r(int(n * slack), align),
            eg=r(int(eg * slack), align),
            el=r(int(el * slack), align),
            t2=r(int(t2 * slack), align),
            t1=r(int(t1 * slack), align),
            g=max(8, g),
        )

    @classmethod
    def bucketed(
        cls, n, eg, el, t2, t1, g, align: int = 128, growth: float = 1.5
    ) -> "PadSizes":
        """Geometric bucket ladder: pad each dimension up to align * growth^k,
        bounding the number of distinct compiled shapes to O(log sizes)."""

        def bucket(x):
            size = align
            while size < x:
                size = int(math.ceil(size * growth / align)) * align
            return size

        return cls(bucket(n), bucket(eg), bucket(el), bucket(t2), bucket(t1), max(8, g))


def _pad1(a: np.ndarray, size: int, fill=0):
    if a.shape[0] > size:
        raise ValueError(
            f"padding overflow: have {a.shape[0]} rows, bucket holds {size}"
        )
    out = np.full((size,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


def _mask(count: int, size: int) -> np.ndarray:
    m = np.zeros(size, dtype=np.float32)
    m[:count] = 1.0
    return m


def precompute_structure(
    mol: dict, dataset_kind: str, cutoff_l: float, cutoff_g: float,
    variant: str = "full",
) -> dict:
    """Build one molecule's full graph structure (host, cacheable).

    Positions are static in every supported dataset, so this runs once per
    molecule per config; batches are then assembled by pure index offsetting
    (:func:`collate_structures`) — the reference instead re-runs radius/knn +
    triplet CUDA kernels on every forward (models.py:110,143,162).

    Graph construction per dataset matches the reference forward exactly:
      * qm9:    local = provided bond graph; global = radius(cutoff_g),
                max_num_neighbors=1000 (500 for PAMNet_s)  (models.py:104-115,301)
      * pdbbind: global = radius(cutoff_g, max 1000); local = global edges
                with dist <= cutoff_l                      (models.py:117-136)
      * rna:    knn(50) superset; global = dist <= cutoff_g;
                local = dist <= cutoff_l                   (models.py:138-157)
    Two-hop triplets and one-hop pairs are enumerated on the *local* edges
    (models.py:162); PAMNet_s keeps only one-hop pairs (models.py:263-283).
    """
    pos = np.asarray(mol["pos"], np.float32)
    n = pos.shape[0]

    if dataset_kind == "qm9":
        el = np.asarray(mol["edge_index"], np.int64).astype(np.int32)
        el = graphbuild.remove_self_loops_np(el)
        max_nb = 500 if variant == "s" else 1000
        eg = graphbuild.radius_graph_np(pos, cutoff_g, None, max_nb)
        eg = graphbuild.remove_self_loops_np(eg)
    elif dataset_kind == "pdbbind":
        eg = graphbuild.radius_graph_np(pos, cutoff_g, None, 1000)
        eg = graphbuild.remove_self_loops_np(eg)
        dist_g = graphbuild.edge_distances_np(eg, pos)
        el = eg[:, dist_g <= cutoff_l]
    elif dataset_kind == "rna":
        eknn = graphbuild.knn_graph_np(pos, 50, None)
        eknn = graphbuild.remove_self_loops_np(eknn)
        dist_knn = graphbuild.edge_distances_np(eknn, pos)
        eg = eknn[:, dist_knn <= cutoff_g]
        el = eknn[:, dist_knn <= cutoff_l]
    else:
        raise ValueError(f"unknown dataset kind: {dataset_kind}")

    # Sort edges by their aggregation endpoint so forward segment-sums can
    # run as prefix-scans (ops/ell.py::segment_sum_sorted); summation order
    # is irrelevant to the math.  The global layer aggregates at dst under
    # source_to_target flow (QM9/PDBbind) and at src under target_to_source
    # (RNA, reference main_rna_puzzles.py:57); local layers always at dst.
    if dataset_kind == "rna":
        eg = eg[:, np.lexsort((eg[1], eg[0]))]  # src-major
    else:
        eg = eg[:, np.lexsort((eg[0], eg[1]))]  # dst-major
    el = el[:, np.lexsort((el[0], el[1]))]

    if variant == "full":
        t2 = graphbuild.triplets_np(el, n)
    else:
        t2 = {
            k: np.zeros(0, np.int32)
            for k in ("idx_i", "idx_j", "idx_k", "idx_kj", "idx_ji")
        }
    t1 = graphbuild.pairs_np(el, n)

    p64 = pos.astype(np.float64)
    s = {
        "pos": pos,
        "y": np.float32(mol["y"]),
        # C-contiguous so CollatePlan can address rows as views (a strided
        # (2,E) would force per-struct copies, disabling plan.verify()).
        "eg": np.ascontiguousarray(eg, np.int32),
        "el": np.ascontiguousarray(el, np.int32),
        "t2": t2,
        "t1": t1,
        "dist_g": np.sqrt(((p64[eg[1]] - p64[eg[0]]) ** 2).sum(-1)).astype(np.float32),
        "dist_l": np.sqrt(((p64[el[1]] - p64[el[0]]) ** 2).sum(-1)).astype(np.float32),
    }
    if dataset_kind == "pdbbind":
        s["feat"] = np.asarray(mol["feat"], np.float32)
        s["z"] = np.zeros(n, np.int32)
    else:
        s["z"] = np.asarray(mol["z"], np.int32)
        s["feat"] = np.zeros((n, 0), np.float32)
    return s


def attach_basis(s: dict, cutoff_l: float, num_spherical: int = 7,
                 num_radial: int = 6, envelope_exponent: int = 5) -> dict:
    """Precompute the spherical basis for one structure (host, float64).

    Adds ``sbf_radial`` (el, ns*nr), ``cbf2`` (t2, ns), ``cbf1`` (t1, ns) —
    all geometry-only (reference math: layers/basic.py:79-116), safe to
    cache because no trainable parameter enters them.
    """
    from pamnet_tpu.ops import bessel

    t = bessel.bessel_basis_tables(num_spherical, num_radial)
    pos = s["pos"].astype(np.float64)
    src, dst = s["el"]
    dist = np.sqrt(((pos[dst] - pos[src]) ** 2).sum(-1))
    x = dist / cutoff_l
    p = envelope_exponent
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2)
    c = -p * (p + 1) / 2.0
    env = np.where(x < 1.0, 1.0 / np.maximum(x, 1e-12) + a * x**p
                   + b * x ** (p + 1) + c * x ** (p + 2), 0.0)
    rad = np.zeros((len(dist), num_spherical, num_radial))
    for l in range(num_spherical):
        for n in range(num_radial):
            rad[:, l, n] = t["norm"][l, n] * bessel.sph_jn(
                l, np.maximum(t["zeros"][l, n] * x, 1e-12)
            )
    rad *= env[:, None, None]
    # Explicit width (not -1): molecules with zero local edges are legal
    # (e.g. an isolated far-apart PDBbind fragment) and reshape(0, -1) throws.
    s["sbf_radial"] = rad.reshape(
        len(dist), num_spherical * num_radial
    ).astype(np.float32)

    def cbf(tbl, a_idx, b_idx, c_idx):
        v1 = pos[tbl[b_idx]] - pos[tbl[a_idx]]
        v2 = pos[tbl[c_idx]] - pos[tbl[b_idx]]
        dot = (v1 * v2).sum(-1)
        cr = np.linalg.norm(np.cross(v1, v2), axis=-1)
        ang = np.arctan2(cr, dot)
        cth = np.cos(ang)
        polys = [np.ones_like(cth)]
        if num_spherical > 1:
            polys.append(cth)
        for l in range(2, num_spherical):
            polys.append(((2 * l - 1) * cth * polys[l - 1] - (l - 1) * polys[l - 2]) / l)
        return (np.stack(polys, -1) * t["sph_pref"]).astype(np.float32)

    s["cbf2"] = (
        cbf(s["t2"], "idx_i", "idx_j", "idx_k")
        if s["t2"]["idx_ji"].size
        else np.zeros((0, num_spherical), np.float32)
    )
    s["cbf1"] = cbf(s["t1"], "idx_i", "idx_j1", "idx_j2")
    return s


def structure_counts(s: dict) -> tuple[int, int, int, int, int]:
    return (
        s["pos"].shape[0],
        s["eg"].shape[1],
        s["el"].shape[1],
        s["t2"]["idx_ji"].shape[0],
        s["t1"]["idx_ji"].shape[0],
    )


def structure_group_maxima(s: dict) -> tuple[int, ...]:
    """Max aggregation-group sizes (ELL table widths) for one molecule, in
    PadSizes order: kg_dst, kg_src, kl_dst, kl_src, k2_ji, k2_kj, k1_ji, k1_jj."""

    def mx(ids):
        ids = np.asarray(ids)
        return int(np.bincount(ids).max()) if ids.size else 0

    return (
        mx(s["eg"][1]), mx(s["eg"][0]),
        mx(s["el"][1]), mx(s["el"][0]),
        mx(s["t2"]["idx_ji"]), mx(s["t2"]["idx_kj"]),
        mx(s["t1"]["idx_ji"]), mx(s["t1"]["idx_jj"]),
    )


def _cat_pad_i32(arrs: list[np.ndarray], offs: np.ndarray, size: int) -> np.ndarray:
    """Padded concat of int32 arrays with per-array scalar offsets (numpy
    path; the zero-Python-loop native path is :class:`CollatePlan`)."""
    cat = np.concatenate([a.astype(np.int32) + o for a, o in zip(arrs, offs)])
    return _pad1(cat, size)


def _cat_pad_f32(arrs: list[np.ndarray], size: int) -> np.ndarray:
    """Padded concat of float32 row blocks (shared trailing shape)."""
    return _pad1(np.concatenate(arrs).astype(np.float32), size)


# Collated fields: (key, path into the structure dict, offset kind, pad dim).
# Paths index nested dicts and 2-D rows: ("eg", 0) is row 0 of the (2, E)
# edge array.  Offsets: "node" adds the per-graph node offset, "edge" the
# per-graph local-edge offset (triplet edge ids index el), "zero" none.
_INT_FIELDS = (
    ("z", ("z",), "zero", "n"),
    ("eg_src", ("eg", 0), "node", "eg"),
    ("eg_dst", ("eg", 1), "node", "eg"),
    ("el_src", ("el", 0), "node", "el"),
    ("el_dst", ("el", 1), "node", "el"),
    ("t2_i", ("t2", "idx_i"), "node", "t2"),
    ("t2_j", ("t2", "idx_j"), "node", "t2"),
    ("t2_k", ("t2", "idx_k"), "node", "t2"),
    ("t2_kj", ("t2", "idx_kj"), "edge", "t2"),
    ("t2_ji", ("t2", "idx_ji"), "edge", "t2"),
    ("t1_i", ("t1", "idx_i"), "node", "t1"),
    ("t1_j1", ("t1", "idx_j1"), "node", "t1"),
    ("t1_j2", ("t1", "idx_j2"), "node", "t1"),
    ("t1_jj", ("t1", "idx_jj"), "edge", "t1"),
    ("t1_ji", ("t1", "idx_ji"), "edge", "t1"),
)
_F32_FIELDS = (("pos", "n"), ("feat", "n"), ("dist_g", "eg"), ("dist_l", "el"))
_F32_BASIS_FIELDS = (("sbf_radial", "el"), ("cbf2", "t2"), ("cbf1", "t1"))


def _get(s: dict, path: tuple):
    v = s
    for p in path:
        v = v[p]
    return v


class CollatePlan:
    """Precomputed per-structure field addresses for native batch collation.

    Built once per dataset: for every collated field, a flat uint64 address
    array + int64 length array over ALL structures.  Collating a batch is
    then a numpy gather of (addrs, lens) rows + ONE C call per field
    (csrc/graphbuild.cc::concat_offset_i32 / concat_rows_f32) that writes
    concat+offset+pad straight into the padded buffer — no per-array Python
    work at batch time (measured ~3x faster than the numpy path at the QM9
    recipe; see DEVNOTES.md).

    Holds references to every source array (addresses must stay alive).
    Structures are treated as FROZEN after plan construction: replacing any
    field array (e.g. re-running ``attach_basis``, or mutating
    ``loader.structs``) would leave baked addresses pointing at freed/stale
    memory.  ``verify(i)`` cheaply re-checks one structure's live addresses
    against the baked tables and is called once per collated batch — a
    wholesale re-attachment is caught on the next batch instead of
    producing silent garbage."""

    def __init__(self, structs: list[dict]):
        from pamnet_tpu.data import native

        if not native.has_collate():
            raise RuntimeError("native collate unavailable (make -C csrc)")
        self._keep = structs  # lifetime anchor for all addresses
        s0 = structs[0]
        self.has_basis = all("sbf_radial" in s for s in structs)
        self.has_dist = all("dist_g" in s for s in structs)
        self.y = np.array([s["y"] for s in structs], dtype=np.float32)

        def norm(s, path):
            a = _get(s, path)
            dt = np.int32 if isinstance(path[-1], (int,)) or path[0] in (
                "z", "t2", "t1") else np.float32
            if a.dtype != dt or not a.flags.c_contiguous:
                a = np.ascontiguousarray(a, dtype=dt)
                # Write the normalized array back so the address stays live
                # (2-D rows are contiguous views into the parent; skip).
                if len(path) == 1:
                    s[path[0]] = a
                elif isinstance(path[1], str):
                    s[path[0]][path[1]] = a
                else:
                    self._extra.append(a)
            return a

        self._extra: list = []
        # Struct indices whose plan arrays are private copies (2-D row views
        # normalized into self._extra) — live addresses can't be compared.
        self._unverifiable: set[int] = set()
        self.addr: dict[str, np.ndarray] = {}
        self.len: dict[str, np.ndarray] = {}
        self._paths: dict[str, tuple] = {}
        n = len(structs)
        for key, path, _, _ in _INT_FIELDS:
            self._paths[key] = tuple(path)
            addrs = np.empty(n, np.uint64)
            lens = np.empty(n, np.int64)
            for i, s in enumerate(structs):
                n_extra = len(self._extra)
                a = norm(s, path)
                if len(self._extra) != n_extra:
                    self._unverifiable.add(i)
                ai = a.__array_interface__
                addrs[i], lens[i] = ai["data"][0], a.shape[0]
            self.addr[key], self.len[key] = addrs, lens

        f32 = list(_F32_FIELDS) if self.has_dist else [("pos", "n"), ("feat", "n")]
        if self.has_basis:
            f32 += list(_F32_BASIS_FIELDS)
        self.f32_keys = [k for k, _ in f32]
        self.row_w: dict[str, int] = {}
        self.trailing: dict[str, tuple] = {}
        for key in self.f32_keys:
            self._paths[key] = (key,)
            a0 = s0[key]
            self.row_w[key] = int(np.prod(a0.shape[1:], dtype=np.int64)) if a0.ndim > 1 else 1
            self.trailing[key] = a0.shape[1:]
            addrs = np.empty(n, np.uint64)
            lens = np.empty(n, np.int64)
            for i, s in enumerate(structs):
                a = s[key]
                if a.dtype != np.float32 or not a.flags.c_contiguous:
                    a = np.ascontiguousarray(a, dtype=np.float32)
                    s[key] = a
                ai = a.__array_interface__
                addrs[i], lens[i] = ai["data"][0], a.shape[0]
            self.addr[key], self.len[key] = addrs, lens

    def verify(self, i: int) -> None:
        """Assert structure ``i``'s live array addresses still match the
        baked tables (O(#fields); ~tens of µs).  Catches the frozen-structs
        contract being broken (see class docstring)."""
        if i in self._unverifiable:
            return
        s = self._keep[i]
        for key, path in self._paths.items():
            a = _get(s, path)
            if a.__array_interface__["data"][0] != int(self.addr[key][i]):
                raise RuntimeError(
                    f"CollatePlan is stale: structure {i} field {key!r} was "
                    f"replaced after the plan was built (structs are frozen "
                    f"once a CollatePlan exists — rebuild the plan / loader)"
                )

    def cat_i32(self, key: str, idxs, offs: np.ndarray, size: int) -> np.ndarray:
        from pamnet_tpu.data import native

        return native.concat_offset_i32_addr(
            self.addr[key][idxs], self.len[key][idxs], offs, size)[0]

    def cat_f32(self, key: str, idxs, size: int) -> np.ndarray:
        from pamnet_tpu.data import native

        out, _ = native.concat_rows_f32_addr(
            self.addr[key][idxs], self.len[key][idxs], self.row_w[key], size)
        tr = self.trailing[key]
        return out.reshape((size,) + tr) if tr else out


def collate_structures(structs: list[dict], pads: PadSizes | None = None,
                       align: int = 128, build_tables: "bool | str" = True,
                       build_perms: bool = False,
                       plan: "CollatePlan | None" = None,
                       idxs: "list[int] | None" = None,
                       wire_geometry: str = "host",
                       compact_wire: bool = False) -> GraphBatch:
    """Assemble precomputed per-molecule structures into one padded batch by
    offsetting node ids (by node counts) and edge ids (by local-edge counts).

    With ``plan``/``idxs`` (the GraphLoader training path when csrc is
    built), every field is one native concat-offset-pad pass straight into
    its padded buffer; the numpy list path is the always-available fallback
    and correctness oracle — batch assembly is the per-step host cost that
    must stay under the device step time.

    ``wire_geometry="derive"`` drops every float geometry payload from the
    batch — ``dist_g``/``dist_l``/``sbf_radial``/``cbf2``/``cbf1`` — even
    when the structures carry them: the wire then ships positions + integer
    index tables only, and the model recomputes distances/angles/bases
    inside the compiled step (``models/pamnet.py`` device fallbacks — the
    reference recomputes geometry per forward too, models.py:104-188).
    Cuts the streamed bytes roughly in half on top of derive-mode ELL
    tables and removes the float concat passes from host collation; costs
    a few percent of device-step time (geometry re-evaluated per step) and
    f32 instead of host-f64 geometry (the reference's own precision).

    ``compact_wire=True`` additionally (a) narrows every index array (and
    table aux array) to int16 where its padded bound fits, and (b) ships a
    6-entry ``counts`` vector + per-graph ``n_per`` instead of the five
    masks and ``node_graph``.  Consumers must pass the batch through
    :func:`hydrate_batch` inside the compiled step (apply_pamnet and every
    train-step loss do)."""
    if wire_geometry not in ("host", "derive"):
        raise ValueError(f"wire_geometry must be 'host'|'derive', got {wire_geometry!r}")
    if plan is not None:
        idxs = np.asarray(idxs)
        nb = len(idxs)
        plan.verify(int(idxs[0]))
        n_per = plan.len["pos"][idxs]
        el_per = plan.len["el_src"][idxs]
        n_eg = int(plan.len["eg_src"][idxs].sum())
        n_t2 = int(plan.len["t2_ji"][idxs].sum())
        n_t1 = int(plan.len["t1_ji"][idxs].sum())
        y = plan.y[idxs]
        has_basis, has_dist = plan.has_basis, plan.has_dist
    else:
        nb = len(structs)
        n_per = np.array([s["pos"].shape[0] for s in structs], np.int64)
        el_per = np.array([s["el"].shape[1] for s in structs], np.int64)
        n_eg = int(sum(s["eg"].shape[1] for s in structs))
        n_t2 = int(sum(s["t2"]["idx_ji"].shape[0] for s in structs))
        n_t1 = int(sum(s["t1"]["idx_ji"].shape[0] for s in structs))
        y = np.array([s["y"] for s in structs], dtype=np.float32)
        has_basis = all("sbf_radial" in s for s in structs)
        has_dist = all("dist_g" in s for s in structs)
    if wire_geometry == "derive":
        has_basis = has_dist = False

    num_nodes = int(n_per.sum())
    n_el = int(el_per.sum())
    n_off = np.concatenate([[0], np.cumsum(n_per[:-1])]).astype(np.int32)
    el_off = np.concatenate([[0], np.cumsum(el_per[:-1])]).astype(np.int32)
    zero_off = np.zeros(nb, np.int32)
    offs_of = {"node": n_off, "edge": el_off, "zero": zero_off}

    if pads is None:
        pads = PadSizes.bucketed(
            num_nodes, n_eg, n_el, max(n_t2, 1), max(n_t1, 1), nb, align=align,
        )
    pad_of = {"n": pads.n, "eg": pads.eg, "el": pads.el, "t2": pads.t2,
              "t1": pads.t1}

    fields: dict[str, np.ndarray] = {}
    if plan is not None:
        geo_keys = {"dist_g", "dist_l", "sbf_radial", "cbf2", "cbf1"}
        for key, _, okind, pdim in _INT_FIELDS:
            fields[key] = plan.cat_i32(key, idxs, offs_of[okind], pad_of[pdim])
        for key in plan.f32_keys:
            if wire_geometry == "derive" and key in geo_keys:
                continue
            pdim = dict(_F32_FIELDS + _F32_BASIS_FIELDS)[key]
            fields[key] = plan.cat_f32(key, idxs, pad_of[pdim])
    else:
        for key, path, okind, pdim in _INT_FIELDS:
            fields[key] = _cat_pad_i32([_get(s, path) for s in structs],
                                       offs_of[okind], pad_of[pdim])
        f32 = [("pos", "n"), ("feat", "n")]
        if has_dist:
            f32 = list(_F32_FIELDS)
        if has_basis:
            f32 += list(_F32_BASIS_FIELDS)
        for key, pdim in f32:
            fields[key] = _cat_pad_f32([s[key] for s in structs], pad_of[pdim])

    eg_src_p, eg_dst_p = fields["eg_src"], fields["eg_dst"]
    el_src_p, el_dst_p = fields["el_src"], fields["el_dst"]
    t2 = {f"idx_{k}": fields[f"t2_{k}"] for k in ("i", "j", "k", "kj", "ji")}
    t1 = {f"idx_{k}": fields[f"t1_{k}"] for k in ("i", "j1", "j2", "jj", "ji")}

    # ---- sorted-group offsets (always built; ops/ell.py::segment_sum_sorted
    # turns every forward segment-sum into a prefix-scan) ----
    from pamnet_tpu.ops.ell import (
        build_ell_table_np,
        build_offsets_np,
        build_perm_np,
    )

    def _is_sorted(a, n):
        return n == 0 or bool(np.all(np.diff(a[:n]) >= 0))

    tables: dict = {}
    if _is_sorted(eg_dst_p, n_eg):
        tables["eg_dst_off"] = build_offsets_np(eg_dst_p, n_eg, pads.n)
    elif _is_sorted(eg_src_p, n_eg):
        tables["eg_src_off"] = build_offsets_np(eg_src_p, n_eg, pads.n)
    if _is_sorted(el_dst_p, n_el):
        tables["el_dst_off"] = build_offsets_np(el_dst_p, n_el, pads.n)
    if _is_sorted(t2["idx_ji"], n_t2):
        tables["t2_ji_off"] = build_offsets_np(t2["idx_ji"], n_t2, pads.el)
    if _is_sorted(t1["idx_ji"], n_t1):
        tables["t1_ji_off"] = build_offsets_np(t1["idx_ji"], n_t1, pads.el)

    # ---- scatter-free ELL aggregation tables (ops/ell.py) ----
    # Pay off for training (they remove the scatter-adds in gather
    # *backwards*); for inference on wide-degree graphs (RNA knn) the
    # gather blow-up costs more than the forward scatters it saves.
    # build_tables="derive": wire only the scan aux arrays plus a tiny
    # int32 shape marker per key (its length = the static table width K);
    # ops/ell.py::materialize_tables expands them into the bit-identical
    # (G, K) table + mask INSIDE the compiled step — the tables are ~45%
    # of a wired QM9 batch but a few-microsecond iota/gather on device.
    if build_tables:
        derive = build_tables == "derive"

        def k_auto(ids, n_valid, fixed):
            if fixed:
                return fixed
            counts = np.bincount(ids[:n_valid], minlength=1) if n_valid else np.array([0])
            return max(8, int(np.ceil(counts.max(initial=1) / 8)) * 8)

        for name, ids, n_valid, groups, fixed, rows in (
            ("eg_dst", eg_dst_p, n_eg, pads.n, pads.kg_dst, pads.eg),
            ("eg_src", eg_src_p, n_eg, pads.n, pads.kg_src, pads.eg),
            ("el_dst", el_dst_p, n_el, pads.n, pads.kl_dst, pads.el),
            ("el_src", el_src_p, n_el, pads.n, pads.kl_src, pads.el),
            ("t2_ji", t2["idx_ji"], n_t2, pads.el, pads.k2_ji, pads.t2),
            ("t2_kj", t2["idx_kj"], n_t2, pads.el, pads.k2_kj, pads.t2),
            ("t1_ji", t1["idx_ji"], n_t1, pads.el, pads.k1_ji, pads.t1),
            ("t1_jj", t1["idx_jj"], n_t1, pads.el, pads.k1_jj, pads.t1),
        ):
            k = k_auto(ids, n_valid, fixed)
            if derive:
                if name + "_off" in tables:
                    off = tables[name + "_off"]
                else:
                    perm, poff = build_perm_np(ids, n_valid, groups, rows)
                    tables[name + "_perm"] = perm
                    tables[name + "_poff"] = poff
                    off = poff
                kmax = int(np.diff(off).max(initial=0))
                if kmax > k:
                    raise ValueError(
                        f"ELL overflow: max group size {kmax} > table "
                        f"width {k} for {name}"
                    )
                tables[name + "_dk"] = np.zeros(k, np.int32)
            else:
                tbl, tmask = build_ell_table_np(ids, n_valid, groups, k)
                tables[name] = tbl
                tables[name + "_mask"] = tmask

    # ---- gather-backward scan permutations (ops/ell.py::gather_perm) ----
    # Built on request for the skew-padded gather keys so their backwards
    # can stream the R real cotangent rows through the blocked scan instead
    # of reading the ELL table's G*K padded random rows
    # (PAMNetConfig.gather_backward routes per key; el_dst is group-sorted
    # already so its existing offsets serve gather_sorted directly).
    if build_perms:
        for name, ids, n_valid, groups, rows in (
            ("el_src", el_src_p, n_el, pads.n, pads.el),
            ("t2_kj", t2["idx_kj"], n_t2, pads.el, pads.t2),
            ("t1_jj", t1["idx_jj"], n_t1, pads.el, pads.t1),
        ):
            if name + "_perm" in tables:  # built by the derive branch above
                continue
            perm, poff = build_perm_np(ids, n_valid, groups, rows)
            tables[name + "_perm"] = perm
            tables[name + "_poff"] = poff
        if "el_dst_off" not in tables and "el_dst_perm" not in tables:
            perm, poff = build_perm_np(el_dst_p, n_el, pads.n, pads.el)
            tables["el_dst_perm"] = perm
            tables["el_dst_poff"] = poff

    basis = {}
    if has_basis:
        basis = dict(
            sbf_radial=fields["sbf_radial"],
            cbf2=fields["cbf2"],
            cbf1=fields["cbf1"],
        )
    if has_dist:
        basis["dist_g"] = fields["dist_g"]
        basis["dist_l"] = fields["dist_l"]

    if compact_wire:
        # (a) narrow index/table-aux ints whose PADDED bound fits int16
        # (a static per-shape decision: node ids < pads.n, edge ids <
        # pads.el, table aux values <= their row dim); hydrate_batch
        # widens them on device.
        def narrow(a: np.ndarray, bound: int) -> np.ndarray:
            return a.astype(np.int16) if bound < 32768 else a

        bound_of = {"node": pads.n, "edge": pads.el, "zero": pads.n}
        for key, _, okind, _ in _INT_FIELDS:
            fields[key] = narrow(fields[key], bound_of[okind])
        rows_of = {"eg": pads.eg, "el": pads.el, "t2": pads.t2,
                   "t1": pads.t1, "n": pads.n}
        for k in list(tables):
            base = k.split("_")[0]  # eg/el/t2/t1
            rows = rows_of.get(base, 1 << 30)
            # offsets count rows; perms index rows; dk markers are zeros.
            tables[k] = narrow(tables[k], rows)
        t2 = {f"idx_{k}": fields[f"t2_{k}"] for k in ("i", "j", "k", "kj", "ji")}
        t1 = {f"idx_{k}": fields[f"t1_{k}"] for k in ("i", "j1", "j2", "jj", "ji")}
        eg_src_p, eg_dst_p = fields["eg_src"], fields["eg_dst"]
        el_src_p, el_dst_p = fields["el_src"], fields["el_dst"]
        # (b) counts + n_per instead of masks + node_graph.
        counts = np.array([num_nodes, n_eg, n_el, n_t2, n_t1, nb], np.int32)
        return GraphBatch(
            tables=tables,
            **basis,
            z=fields["z"],
            feat=fields["feat"],
            pos=fields["pos"],
            node_mask=None,
            node_graph=None,
            eg_src=eg_src_p, eg_dst=eg_dst_p, eg_mask=None,
            el_src=el_src_p, el_dst=el_dst_p, el_mask=None,
            t2_i=t2["idx_i"], t2_j=t2["idx_j"], t2_k=t2["idx_k"],
            t2_kj=t2["idx_kj"], t2_ji=t2["idx_ji"], t2_mask=None,
            t1_i=t1["idx_i"], t1_j1=t1["idx_j1"], t1_j2=t1["idx_j2"],
            t1_jj=t1["idx_jj"], t1_ji=t1["idx_ji"], t1_mask=None,
            y=_pad1(y, pads.g),
            graph_mask=None,
            counts=counts,
            n_per=_pad1(n_per.astype(np.int32), pads.g),
        )

    node_graph = np.repeat(np.arange(nb, dtype=np.int32), n_per)
    return GraphBatch(
        tables=tables,
        **basis,
        z=fields["z"],
        feat=fields["feat"],
        pos=fields["pos"],
        node_mask=_mask(num_nodes, pads.n),
        node_graph=_pad1(node_graph, pads.n),
        eg_src=eg_src_p,
        eg_dst=eg_dst_p,
        eg_mask=_mask(n_eg, pads.eg),
        el_src=el_src_p,
        el_dst=el_dst_p,
        el_mask=_mask(n_el, pads.el),
        t2_i=t2["idx_i"],
        t2_j=t2["idx_j"],
        t2_k=t2["idx_k"],
        t2_kj=t2["idx_kj"],
        t2_ji=t2["idx_ji"],
        t2_mask=_mask(n_t2, pads.t2),
        t1_i=t1["idx_i"],
        t1_j1=t1["idx_j1"],
        t1_j2=t1["idx_j2"],
        t1_jj=t1["idx_jj"],
        t1_ji=t1["idx_ji"],
        t1_mask=_mask(n_t1, pads.t1),
        y=_pad1(y, pads.g),
        graph_mask=_mask(nb, pads.g),
    )


def hydrate_batch(g: GraphBatch) -> GraphBatch:
    """Expand a compact-wire batch inside the compiled program (the mask/
    node_graph analog of ``ops/ell.py::materialize_tables``; idempotent).

    ``collate_structures(compact_wire=True)`` ships (a) index arrays
    narrowed to int16 wherever the padded bound fits and (b) a 6-entry
    ``counts`` vector + per-graph ``n_per`` instead of the five 0/1 masks
    and the node->graph indicator.  This widens the ints (one fused cast)
    and rebuilds masks as ``iota < count`` and ``node_graph`` as a
    searchsorted over ``cumsum(n_per)`` — a few microseconds of device
    work against ~30% of the streamed bytes.  Padded ``node_graph``
    entries clip to the LAST graph slot (the host builder pads with 0);
    both are masked to exact-zero contributions before every pool, so
    model outputs are identical (test-locked).
    """
    import jax.numpy as jnp

    upd: dict = {}
    for f in ("z", "eg_src", "eg_dst", "el_src", "el_dst", "t2_i", "t2_j",
              "t2_k", "t2_kj", "t2_ji", "t1_i", "t1_j1", "t1_j2", "t1_jj",
              "t1_ji", "node_graph"):
        v = getattr(g, f)
        if v is not None and v.dtype == jnp.int16:
            upd[f] = v.astype(jnp.int32)
    if g.tables:
        widened = {
            k: (v.astype(jnp.int32) if v.dtype == jnp.int16 else v)
            for k, v in g.tables.items()
        }
        if any(w is not v for w, v in zip(widened.values(),
                                          g.tables.values())):
            upd["tables"] = widened
    if g.counts is not None:
        c = g.counts.astype(jnp.int32)

        def mask(size: int, k: int):
            return (jnp.arange(size) < c[k]).astype(jnp.float32)

        n_pad = g.z.shape[0]
        g_pad = g.y.shape[0]
        cum = jnp.cumsum(g.n_per.astype(jnp.int32))
        node_graph = jnp.clip(
            jnp.searchsorted(cum, jnp.arange(n_pad), side="right"),
            0, g_pad - 1,
        ).astype(jnp.int32)
        upd.update(
            node_mask=mask(n_pad, 0),
            eg_mask=mask(g.eg_src.shape[0], 1),
            el_mask=mask(g.el_src.shape[0], 2),
            t2_mask=mask(g.t2_ji.shape[0], 3),
            t1_mask=mask(g.t1_ji.shape[0], 4),
            graph_mask=mask(g_pad, 5),
            node_graph=node_graph,
            counts=None,
            n_per=None,
        )
    return g._replace(**upd) if upd else g


def valid_graphs_np(gb: GraphBatch) -> float:
    """Host-side valid-graph count for loss accounting: works for full and
    compact-wire batches (whose graph_mask is None until hydration)."""
    if gb.graph_mask is not None:
        return float(np.asarray(gb.graph_mask).sum())
    return float(np.asarray(gb.counts)[5])


def build_graph_batch(
    mols: list[dict],
    dataset_kind: str,
    cutoff_l: float,
    cutoff_g: float,
    pads: PadSizes | None = None,
    variant: str = "full",
    align: int = 128,
) -> GraphBatch:
    """Convenience: precompute + collate in one call."""
    structs = [
        precompute_structure(m, dataset_kind, cutoff_l, cutoff_g, variant)
        for m in mols
    ]
    return collate_structures(structs, pads=pads, align=align)
