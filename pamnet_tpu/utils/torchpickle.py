"""First-party reader AND writer for ``torch.save`` artifacts — no torch
at runtime.

Handles both on-disk formats:

* the **legacy** (pre-1.6, non-zip) stream — the format of the reference's
  bundled ``save/pamnet_rna.pt`` (SURVEY.md section 2.1 bundled artifacts):
  four consecutive pickles (magic, protocol, sys_info, object) followed by a
  pickle of storage keys and the raw storage bytes (each prefixed with an
  int64 element count);
* the **zip** (1.6+) archive: ``<prefix>/data.pkl`` plus one raw file per
  storage under ``<prefix>/data/<key>`` — the format of PyG's preprocessed
  ``qm9_v2.pt``/``data_v2.pt`` fallback artifacts (reference:
  datasets/qm9_dataset.py:156-160,170-185).

Tensors are materialized as numpy arrays (shape/stride/offset honored).
Unknown classes unpickle into generic attribute-bag shims, so PyG ``Data``
objects inside the preprocessed artifact are readable without
torch_geometric.  Only ``collections.OrderedDict`` and builtins are imported
for real; nothing in the pickle can execute code.
"""

from __future__ import annotations

import collections
import io
import os
import pickle
import struct
import zipfile

import numpy as np

_MAGIC = 0x1950A86A20F9469CFC6C

_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


class _StorageType:
    """Marker for ``torch.FloatStorage``-style classes in persistent ids."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _DTYPES.get(name)


class _Storage:
    """One deserialized storage: raw bytes + element dtype."""

    def __init__(self, dtype: np.dtype, numel: int | None = None):
        self.dtype = dtype
        self.numel = numel
        self.data: bytes | None = None

    def array(self) -> np.ndarray:
        return np.frombuffer(self.data, dtype=self.dtype)


class Shim:
    """Attribute-bag stand-in for any class we don't ship (e.g. PyG Data)."""

    def __init__(self, *args, **kwargs):
        self._shim_args = args
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2:
            if state[0]:
                self.__dict__.update(state[0])
            if state[1]:
                self.__dict__.update(state[1])
        else:
            self._shim_state = state


def _materialize(storage: _Storage, storage_offset, size, stride):
    base = storage.array()
    itemsize = storage.dtype.itemsize
    if not size:
        return base[storage_offset].copy()
    arr = np.lib.stride_tricks.as_strided(
        base[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return arr.copy()


class _LazyTensor:
    """Placeholder emitted while storage bytes are not yet read (legacy
    format stores them *after* the pickle); resolved in a second pass."""

    def __init__(self, storage, offset, size, stride):
        self.spec = (storage, offset, tuple(size), tuple(stride))


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, load_storage, lazy: bool = False):
        super().__init__(f, encoding="utf-8")
        self._load_storage = load_storage
        self._lazy = lazy
        self._shims: dict[str, type] = {}

    # -- torch._utils rebuild functions (allowlisted by name) --
    def _rebuild_tensor(self, storage, storage_offset, size, stride):
        if self._lazy:
            return _LazyTensor(storage, storage_offset, size, stride)
        return _materialize(storage, storage_offset, size, stride)

    def _rebuild_tensor_v2(self, storage, storage_offset, size, stride,
                           requires_grad=False, backward_hooks=None, *extra):
        return self._rebuild_tensor(storage, storage_offset, size, stride)

    @staticmethod
    def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
        return data

    def find_class(self, module, name):
        if (module, name) == ("collections", "OrderedDict"):
            return collections.OrderedDict
        if module == "torch._utils" and name in (
            "_rebuild_tensor", "_rebuild_tensor_v2", "_rebuild_parameter"
        ):
            return getattr(self, name)
        if module == "torch" and name in _DTYPES:
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        # Anything else (torch_geometric Data, torch.dtype wrappers, ...)
        # becomes an inert attribute bag; never import arbitrary modules.
        key = f"{module}.{name}"
        if key not in self._shims:
            self._shims[key] = type(name, (Shim,), {"_shim_class": key})
        return self._shims[key]

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        return self._load_storage(pid)


def _resolve_lazy(obj, memo=None):
    """Replace _LazyTensor placeholders with materialized numpy arrays in an
    unpickled object graph (dicts / lists / tuples / sets / shim attrs)."""
    if memo is None:
        memo = {}
    oid = id(obj)
    if oid in memo:
        return memo[oid]
    if isinstance(obj, _LazyTensor):
        out = _materialize(*obj.spec)
    elif isinstance(obj, dict):
        memo[oid] = obj
        for k in list(obj):
            obj[k] = _resolve_lazy(obj[k], memo)
        return obj
    elif isinstance(obj, list):
        memo[oid] = obj
        for i in range(len(obj)):
            obj[i] = _resolve_lazy(obj[i], memo)
        return obj
    elif isinstance(obj, tuple):
        out = tuple(_resolve_lazy(v, memo) for v in obj)
    elif isinstance(obj, Shim):
        memo[oid] = obj
        obj.__dict__.update(
            {k: _resolve_lazy(v, memo) for k, v in obj.__dict__.items()}
        )
        return obj
    else:
        return obj
    memo[oid] = out
    return out


def _read_legacy(f) -> object:
    magic = pickle.load(f)
    if magic != _MAGIC:
        raise ValueError("not a legacy torch.save stream (bad magic)")
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info
    storages: dict[str, _Storage] = {}
    views: list[tuple] = []

    def load_storage(pid):
        # ('storage', storage_type, root_key, location, numel, view_metadata)
        _, stype, root_key, _loc, numel, view_meta = pid
        if root_key not in storages:
            if stype.dtype is None:
                raise ValueError(f"unsupported storage type {stype.name}")
            storages[root_key] = _Storage(stype.dtype, numel)
        root = storages[root_key]
        if view_meta is not None:
            view_key, offset, view_size = view_meta[:3]
            view = _Storage(root.dtype, view_size)
            views.append((view, root, offset, view_size))
            return view
        return root

    obj = _Unpickler(f, load_storage, lazy=True).load()
    keys = pickle.load(f)
    for key in keys:
        storage = storages[key]
        (numel,) = struct.unpack("<q", f.read(8))
        nbytes = numel * storage.dtype.itemsize
        storage.data = f.read(nbytes)
        if len(storage.data) != nbytes:
            raise EOFError("truncated storage data")
    for view, root, offset, view_size in views:
        itemsize = root.dtype.itemsize
        view.data = root.data[offset * itemsize:(offset + view_size) * itemsize]
    return _resolve_lazy(obj)


def _read_zip(path: str) -> object:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError("no data.pkl inside torch zip archive")
        prefix = pkl[0][: -len("data.pkl")]

        def load_storage(pid):
            # ('storage', storage_type, key, location, numel)
            _, stype, key, _loc, numel = pid
            dtype = stype.dtype if isinstance(stype, _StorageType) else None
            if dtype is None:
                raise ValueError(f"unsupported storage type {stype}")
            storage = _Storage(dtype, numel)
            storage.data = zf.read(f"{prefix}data/{key}")
            return storage

        with zf.open(pkl[0]) as f:
            return _Unpickler(io.BytesIO(f.read()), load_storage).load()


def load_torch_pickle(path: str) -> object:
    """Load a ``torch.save`` artifact (legacy or zip) with tensors as numpy
    arrays, importing no torch code."""
    if zipfile.is_zipfile(path):
        return _read_zip(path)
    with open(path, "rb") as f:
        return _read_legacy(f)


# ---------------------------------------------------------------------------
# Writer: state_dict of numpy arrays -> torch.save zip archive
# ---------------------------------------------------------------------------

_STORAGE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _pk_int(n: int) -> bytes:
    """Pickle an int (BININT1/BININT2/BININT/LONG1)."""
    if 0 <= n < 256:
        return b"K" + bytes([n])
    if 0 <= n < 65536:
        return b"M" + struct.pack("<H", n)
    if -2**31 <= n < 2**31:
        return b"J" + struct.pack("<i", n)
    enc = n.to_bytes((n.bit_length() + 8) // 8, "little", signed=True)
    return b"\x8a" + bytes([len(enc)]) + enc


def _pk_str(s: str) -> bytes:
    """Pickle a str (BINUNICODE)."""
    raw = s.encode("utf-8")
    return b"X" + struct.pack("<I", len(raw)) + raw


def _pk_tuple(items: list[bytes]) -> bytes:
    """Pickle a tuple from already-pickled element payloads."""
    if not items:
        return b")"  # EMPTY_TUPLE
    if len(items) == 1:
        return items[0] + b"\x85"  # TUPLE1
    if len(items) == 2:
        return b"".join(items) + b"\x86"  # TUPLE2
    if len(items) == 3:
        return b"".join(items) + b"\x87"  # TUPLE3
    return b"(" + b"".join(items) + b"t"  # MARK ... TUPLE


def _pk_global(module: str, name: str) -> bytes:
    return f"c{module}\n{name}\n".encode("ascii")


_EMPTY_ORDERED_DICT = _pk_global("collections", "OrderedDict") + b")R"


def save_torch_pickle(path: str, state_dict: dict) -> None:
    """Write ``state_dict`` (str -> numpy array) as a ``torch.save``-format
    zip archive readable by ``torch.load`` (including
    ``weights_only=True``) and by :func:`load_torch_pickle` — without
    importing torch.  The pickle stream references only
    ``torch._utils._rebuild_tensor_v2``, ``torch.<Dtype>Storage`` and
    ``collections.OrderedDict``, exactly like a real ``torch.save`` of a
    model ``state_dict`` (the reference's checkpoint format,
    inference_rna_puzzles.py:56)."""
    storages: list[bytes] = []
    body = bytearray()
    body += b"\x80\x02"  # PROTO 2
    body += _EMPTY_ORDERED_DICT
    body += b"("  # MARK for SETITEMS
    for key, value in state_dict.items():
        arr = np.ascontiguousarray(value)
        if arr.dtype.byteorder == ">":
            # The archive declares byteorder "little"; swap the payload to
            # match rather than writing big-endian bytes under a
            # little-endian label.
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        sname = _STORAGE_NAMES.get(arr.dtype.newbyteorder("<"))
        if sname is None:
            raise TypeError(f"{key}: no torch storage for dtype {arr.dtype}")
        skey = str(len(storages))
        storages.append(arr.tobytes())
        pid = _pk_tuple([
            _pk_str("storage"),
            _pk_global("torch", sname),
            _pk_str(skey),
            _pk_str("cpu"),
            _pk_int(arr.size),
        ])
        size = _pk_tuple([_pk_int(d) for d in arr.shape])
        # C-contiguous strides in elements.
        strides, acc = [], 1
        for d in reversed(arr.shape):
            strides.append(acc)
            acc *= d
        stride = _pk_tuple([_pk_int(s) for s in reversed(strides)])
        args = _pk_tuple([
            pid + b"Q",  # BINPERSID
            _pk_int(0),  # storage_offset
            size,
            stride,
            b"\x89",  # NEWFALSE (requires_grad)
            _EMPTY_ORDERED_DICT,  # backward_hooks
        ])
        body += _pk_str(key)
        body += _pk_global("torch._utils", "_rebuild_tensor_v2") + args + b"R"
    body += b"u."  # SETITEMS, STOP

    tmp = path + ".tmp"
    dirname = os.path.dirname(os.path.abspath(path))
    os.makedirs(dirname, exist_ok=True)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bytes(body))
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")
        for i, data in enumerate(storages):
            zf.writestr(f"archive/data/{i}", data)
    os.replace(tmp, path)
