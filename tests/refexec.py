"""Execute the REFERENCE implementation (/root/reference/models.py) as a
parity oracle, unmodified.

The reference depends on four CUDA-wheel packages that are not installed
(torch_scatter, torch_sparse, torch_cluster-via-PyG, torch_geometric); this
module provides minimal pure-torch shims for exactly the API surface the
reference uses, registers them in ``sys.modules``, and imports
``/root/reference/models.py`` itself.  Everything downstream (layers/,
utils/sbf.py sympy bases, EMA, metrics) is the reference's own code running
on the installed torch 2.13 CPU.

Shimmed surface (all cited against the reference):

* ``torch_scatter.scatter(..., reduce='add')``
  (layers/local_message_passing.py:4,50,54,107,111)
* ``torch_sparse.SparseTensor`` CSR construction, 1-D row indexing,
  ``set_value(None).sum(dim=1)``, ``storage.row/col/value`` — only the
  triplet-enumeration usage at models.py:68-98,263-283.
* ``torch_geometric.nn``: ``MessagePassing`` (flow-aware propagate; message
  kwargs x_i/x_j/edge_attr/edge_index/num_nodes as used at
  layers/global_message_passing.py:33-56), ``global_add_pool``,
  ``global_mean_pool``, ``radius``, ``knn`` (models.py:6,110,128,143).
* ``torch_geometric.nn.inits.glorot`` (layers/global_message_passing.py:4).
* ``torch_geometric.utils.remove_self_loops`` (models.py:7,63).

Neighbor-search numerics: torch_cluster computes in the input dtype (f32 in
the reference, where positions are f32).  Because parity tests run the
reference model in f64 while the pamnet_tpu host builders decide edges in
f32, the shims pin the *decision* precision to the builder conventions
(radius membership in f32, knn ordering in f64-of-f32, distance ties broken
by index) so both programs see the identical edge set; all model math then
runs at the model's own dtype.
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"

# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------


def scatter(src, index, dim=0, dim_size=None, reduce="add"):
    """torch_scatter.scatter for the reduce='add', dim=0 usage
    (local_message_passing.py:50,54,107,111)."""
    assert dim == 0 and reduce == "add"
    size = int(dim_size) if dim_size is not None else int(index.max()) + 1
    out = torch.zeros((size,) + tuple(src.shape[1:]), dtype=src.dtype)
    return out.index_add_(0, index.long(), src)


# ---------------------------------------------------------------------------
# torch_sparse.SparseTensor (CSR triplet-enumeration subset)
# ---------------------------------------------------------------------------


class _Rowcount:
    def __init__(self, counts):
        self._counts = counts

    def sum(self, dim):
        assert dim == 1
        return self._counts

    def to(self, dtype):  # models.py:75 calls .to(torch.long) on the result
        return self._counts.to(dtype)


class _Storage:
    def __init__(self, row, col, value):
        self._row, self._col, self._value = row, col, value

    def row(self):
        return self._row

    def col(self):
        return self._col

    def value(self):
        return self._value


class SparseTensor:
    """Minimal torch_sparse.SparseTensor: COO input sorted to CSR order
    (row-major, col within row — torch_sparse SparseStorage semantics),
    supporting 1-D long-tensor row selection (models.py:74,85)."""

    def __init__(self, row=None, col=None, value=None, sparse_sizes=None,
                 _sorted=None):
        if _sorted is not None:
            self._row, self._col, self._value, self._nrows = _sorted
        else:
            nrows = int(sparse_sizes[0])
            ncols = int(sparse_sizes[1])
            key = row.long() * ncols + col.long()
            perm = torch.argsort(key)
            self._row = row.long()[perm]
            self._col = col.long()[perm]
            self._value = value[perm] if value is not None else None
            self._nrows = nrows
        counts = torch.bincount(self._row, minlength=self._nrows)
        self._rowptr = torch.zeros(self._nrows + 1, dtype=torch.long)
        torch.cumsum(counts, 0, out=self._rowptr[1:])
        self._rowcount = counts

    def __getitem__(self, idx):
        idx = idx.long()
        counts = self._rowcount[idx]
        starts = self._rowptr[idx]
        total = int(counts.sum())
        out_row = torch.repeat_interleave(torch.arange(idx.numel()), counts)
        cum = torch.cumsum(counts, 0) - counts
        intra = torch.arange(total) - torch.repeat_interleave(cum, counts)
        pos = torch.repeat_interleave(starts, counts) + intra
        return SparseTensor(
            _sorted=(out_row, self._col[pos],
                     self._value[pos] if self._value is not None else None,
                     idx.numel())
        )

    def set_value(self, value):
        assert value is None  # models.py:75,87 only use set_value(None)
        return _Rowcount(self._rowcount)

    @property
    def storage(self):
        return _Storage(self._row, self._col, self._value)


# ---------------------------------------------------------------------------
# torch_geometric.nn / .utils
# ---------------------------------------------------------------------------


class MessagePassing(torch.nn.Module):
    """PyG MessagePassing subset: flow-aware propagate with aggr='add'.

    source_to_target: x_j = x[edge_index[0]], x_i = x[edge_index[1]],
    aggregation at i = edge_index[1]; target_to_source swaps the roles
    (PyG semantics; reference threads flow at global_message_passing.py:11
    from main_rna_puzzles.py:57).
    """

    def __init__(self, aggr="add", flow="source_to_target"):
        super().__init__()
        assert flow in ("source_to_target", "target_to_source")
        self.flow = flow

    def propagate(self, edge_index, x=None, num_nodes=None, edge_attr=None):
        if self.flow == "source_to_target":
            j, i = edge_index[0], edge_index[1]
        else:
            i, j = edge_index[0], edge_index[1]
        m = self.message(
            x_i=x[i], x_j=x[j], edge_attr=edge_attr,
            edge_index=edge_index, num_nodes=num_nodes,
        )
        out = torch.zeros(x.size(0), m.size(-1), dtype=m.dtype)
        out.index_add_(0, i.long(), m)
        return self.update(out)

    def message(self, x_i, x_j, edge_attr, edge_index, num_nodes):  # override
        raise NotImplementedError

    def update(self, aggr_out):  # override
        return aggr_out


def global_add_pool(x, batch, size=None):
    size = int(size) if size is not None else int(batch.max()) + 1
    out = torch.zeros((size,) + tuple(x.shape[1:]), dtype=x.dtype)
    return out.index_add_(0, batch.long(), x)


def global_mean_pool(x, batch, size=None):
    size = int(size) if size is not None else int(batch.max()) + 1
    summed = global_add_pool(x, batch, size)
    counts = torch.bincount(batch.long(), minlength=size).clamp(min=1)
    return summed / counts.view((-1,) + (1,) * (x.dim() - 1)).to(x.dtype)


def radius(x, y, r, batch_x=None, batch_y=None, max_num_neighbors=32):
    """torch_cluster.radius: for each y[q], all x[s] with ||y[q]-x[s]|| <= r
    in the same batch segment, self included, capped at max_num_neighbors in
    index order; returns (query_idx, source_idx).  Membership decided in f32
    (see module docstring)."""
    assert x is y or torch.equal(x, y)  # reference only calls radius(pos, pos)
    p = np.asarray(x.detach().cpu().numpy(), dtype=np.float32)
    b = (np.zeros(len(p), np.int64) if batch_y is None
         else batch_y.cpu().numpy().astype(np.int64))
    rows, cols = [], []
    for g in np.unique(b):
        idx = np.nonzero(b == g)[0]
        d2 = ((p[idx, None, :] - p[None, idx, :]) ** 2).sum(-1)
        within = d2 <= np.float32(r) * np.float32(r)
        for qi in range(len(idx)):
            nbr = np.nonzero(within[qi])[0][:max_num_neighbors]
            rows.append(np.full(len(nbr), idx[qi], dtype=np.int64))
            cols.append(idx[nbr])
    rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)
    return torch.from_numpy(rows), torch.from_numpy(cols)


def knn(x, y, k, batch_x=None, batch_y=None):
    """torch_cluster.knn: for each y[q], its k nearest x[s] in the same batch
    segment (self included); ties broken by index.  Ordering decided in
    f64-of-f32 (see module docstring).  Returns (query_idx, source_idx)."""
    assert x is y or torch.equal(x, y)  # reference only calls knn(pos, pos)
    p32 = np.asarray(x.detach().cpu().numpy(), dtype=np.float32)
    b = (np.zeros(len(p32), np.int64) if batch_y is None
         else batch_y.cpu().numpy().astype(np.int64))
    rows, cols = [], []
    for g in np.unique(b):
        idx = np.nonzero(b == g)[0]
        p = p32[idx].astype(np.float64)
        m = len(idx)
        kk = min(k, m)
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        nbrs = np.argsort(d2, axis=1, kind="stable")[:, :kk]
        rows.append(np.repeat(idx, kk))
        cols.append(idx[nbrs.reshape(-1)])
    rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)
    return torch.from_numpy(rows), torch.from_numpy(cols)


def remove_self_loops(edge_index, edge_attr=None):
    mask = edge_index[0] != edge_index[1]
    return edge_index[:, mask], (edge_attr[mask] if edge_attr is not None else None)


def glorot(value):
    if value is not None:
        stdv = math.sqrt(6.0 / (value.size(-2) + value.size(-1)))
        value.data.uniform_(-stdv, stdv)


# ---------------------------------------------------------------------------
# module registration + reference import
# ---------------------------------------------------------------------------


def install_shims() -> None:
    # numpy 1.x compat: the reference's utils/sbf.py:65 uses the removed
    # ``np.math.factorial`` alias; restore it (pre-1.25 numpy shipped it).
    if not hasattr(np, "math"):
        np.math = math
    if "torch_scatter" in sys.modules:
        return
    ts = types.ModuleType("torch_scatter")
    ts.scatter = scatter
    sys.modules["torch_scatter"] = ts

    tsp = types.ModuleType("torch_sparse")
    tsp.SparseTensor = SparseTensor
    sys.modules["torch_sparse"] = tsp

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg_nn.global_add_pool = global_add_pool
    tg_nn.global_mean_pool = global_mean_pool
    tg_nn.radius = radius
    tg_nn.knn = knn
    tg_inits = types.ModuleType("torch_geometric.nn.inits")
    tg_inits.glorot = glorot
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils.remove_self_loops = remove_self_loops
    tg.nn = tg_nn
    tg_nn.inits = tg_inits
    tg.utils = tg_utils
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.nn.inits"] = tg_inits
    sys.modules["torch_geometric.utils"] = tg_utils


_MODELS = None
_HASHES_OK = None


def verify_reference_hashes() -> None:
    """Refuse to EXECUTE reference code whose bytes changed since the pinned
    snapshot (tests/reference_hashes.json): /root/reference is retrieved
    public content, and these parity tests import and run it with test
    privileges — a planted edit would execute here.  Set
    ``PAMNET_REFEXEC_TRUST=1`` only after re-reviewing the tree (then
    regenerate the manifest: sha256 every ``*.py`` under the root)."""
    global _HASHES_OK
    if _HASHES_OK:
        return
    import hashlib
    import json
    import os

    if os.environ.get("PAMNET_REFEXEC_TRUST") == "1":
        _HASHES_OK = True
        return
    manifest = os.path.join(os.path.dirname(__file__), "reference_hashes.json")
    with open(manifest) as f:
        pinned = json.load(f)
    bad = []
    for rel, want in pinned.items():
        p = os.path.join(REFERENCE_ROOT, rel)
        try:
            with open(p, "rb") as f:
                got = hashlib.sha256(f.read()).hexdigest()
        except OSError:
            bad.append(f"{rel}: missing")
            continue
        if got != want:
            bad.append(f"{rel}: sha256 {got[:12]}… != pinned {want[:12]}…")
    if bad:
        raise RuntimeError(
            "refexec: the reference tree changed since its hashes were "
            "pinned; refusing to execute it as a test oracle "
            "(PAMNET_REFEXEC_TRUST=1 overrides after review): "
            + "; ".join(bad)
        )
    _HASHES_OK = True


def load_reference_models():
    """Import /root/reference/models.py (unmodified) with the shims active.

    Leaves the reference's ``layers``/``utils`` packages in sys.modules (no
    first-party top-level modules share those names)."""
    global _MODELS
    if _MODELS is not None:
        return _MODELS
    verify_reference_hashes()
    install_shims()
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import models as ref_models  # noqa: F401  (the reference's models.py)
    finally:
        sys.path.remove(REFERENCE_ROOT)
    _MODELS = ref_models
    return ref_models


# ---------------------------------------------------------------------------
# Data construction (the PyG Data/Batch surface the reference forward reads)
# ---------------------------------------------------------------------------


class Data:
    """Attribute bag standing in for torch_geometric.data.Data: the reference
    forward reads .x, .pos, .edge_index, .batch only (models.py:100-105)."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def load_reference_module(name: str):
    """Import a reference module beyond models.py (e.g. ``utils.ema``) with
    the shims active — the reference's own code, unmodified."""
    import importlib

    verify_reference_hashes()
    install_shims()
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(REFERENCE_ROOT)


def mols_to_data(mols: list[dict], kind: str, dtype=torch.float64) -> Data:
    """A list of pamnet_tpu molecule dicts -> ONE reference-convention batched
    Data, replicating the PyG DataLoader collate the reference drivers use
    (node concat, edge_index offset by node counts, per-node ``batch`` vector,
    stacked ``y``; main_qm9.py:74-81)."""
    parts = [mol_to_data(m, kind, dtype) for m in mols]
    n_nodes = [p.x.size(0) for p in parts]
    offs = np.concatenate([[0], np.cumsum(n_nodes)[:-1]])
    x = torch.cat([p.x for p in parts])
    batch = torch.cat(
        [torch.full((n,), g, dtype=torch.long) for g, n in enumerate(n_nodes)]
    )
    y = torch.tensor([float(m["y"]) for m in mols], dtype=dtype)
    kw = dict(x=x, batch=batch, y=y)
    if kind == "qm9":
        kw["pos"] = torch.cat([p.pos for p in parts])
        kw["edge_index"] = torch.cat(
            [p.edge_index + int(o) for p, o in zip(parts, offs)], dim=1
        )
    return Data(**kw)


def mol_to_data(mol: dict, kind: str, dtype=torch.float64) -> Data:
    """One pamnet_tpu molecule dict -> reference-convention Data (batch of 1).

    Input layouts per branch (models.py:104-160): QM9 x=(N,) atom type +
    bond-graph edge_index + pos; PDBbind x=[pos | 18 features]; RNA
    x=[pos | CNO class]."""
    n = len(mol["pos"])
    pos = torch.from_numpy(np.asarray(mol["pos"], np.float32)).to(dtype)
    batch = torch.zeros(n, dtype=torch.long)
    if kind == "qm9":
        return Data(
            x=torch.from_numpy(np.asarray(mol["z"], np.int64)),
            pos=pos,
            edge_index=torch.from_numpy(np.asarray(mol["edge_index"], np.int64)),
            batch=batch,
        )
    if kind == "pdbbind":
        feat = torch.from_numpy(np.asarray(mol["feat"], np.float32)).to(dtype)
        return Data(x=torch.cat([pos, feat], dim=1), batch=batch)
    if kind == "rna":
        z = torch.from_numpy(np.asarray(mol["z"], np.float64)).to(dtype)
        return Data(x=torch.cat([pos, z[:, None]], dim=1), batch=batch)
    raise ValueError(kind)
