"""On-disk cache of precomputed graph structures (+ spherical bases).

The reference materializes its preprocessing once into ``processed/data*.pt``
(reference: datasets/qm9_dataset.py:170-265 ``process()``); this module plays
the same role for the TPU loader's richer per-molecule artifact
(:func:`pamnet_tpu.data.batch.precompute_structure` + ``attach_basis``):
radius/knn graphs, triplet tables, f64-exact distances and basis tables.

Design:

* **Chunked column packs.** Molecules are grouped into chunks (default 512);
  each chunk is ONE ``.npz`` holding every field concatenated across the
  chunk plus per-molecule counts — loading is a handful of big reads +
  ``np.split``, not 10k tiny zip members.
* **Content-addressed.** The file name is a hash of (format version, build
  config, every molecule's content fingerprint), so a changed cutoff, basis
  order, variant, or input molecule can never serve a stale artifact.
* **Resumable.** Chunks are written atomically (tmp + rename) as they are
  built; a killed preprocessing run resumes at the first missing chunk.
* **Parallel.** ``num_workers > 1`` builds missing chunks in a process pool
  (useful on multi-core hosts; this pool's 1-core host defaults to in-process).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import tempfile

import numpy as np

_FORMAT_VERSION = 1
_T2_KEYS = ("idx_i", "idx_j", "idx_k", "idx_kj", "idx_ji")
_T1_KEYS = ("idx_i", "idx_j1", "idx_j2", "idx_jj", "idx_ji")


@dataclasses.dataclass(frozen=True)
class BuildSpec:
    """Everything that determines a structure's content besides the molecule."""

    dataset_kind: str
    cutoff_l: float
    cutoff_g: float
    variant: str = "full"
    precompute_basis: bool = True
    num_spherical: int = 7
    num_radial: int = 6
    envelope_exponent: int = 5

    def key(self) -> str:
        h = hashlib.sha1()
        h.update(repr((_FORMAT_VERSION, dataclasses.astuple(self))).encode())
        return h.hexdigest()[:16]


def mol_fingerprint(mol: dict) -> bytes:
    """Content hash of one input molecule (positions, types, labels, bonds)."""
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(mol["pos"], np.float32).tobytes())
    if "z" in mol:
        h.update(np.ascontiguousarray(mol["z"], np.int32).tobytes())
    if "feat" in mol:
        h.update(np.ascontiguousarray(mol["feat"], np.float32).tobytes())
    if "edge_index" in mol:
        h.update(np.ascontiguousarray(mol["edge_index"], np.int64).tobytes())
    h.update(np.float32(mol["y"]).tobytes())
    return h.digest()


def _chunk_path(cache_dir: str, spec_key: str, start: int, fps: list[bytes]) -> str:
    h = hashlib.sha1()
    h.update(spec_key.encode())
    for fp in fps:
        h.update(fp)
    return os.path.join(cache_dir, f"pamnet-{spec_key}-{start:08d}-{h.hexdigest()[:16]}.npz")


def _build_structs(mols: list[dict], spec: BuildSpec) -> list[dict]:
    from pamnet_tpu.data.batch import attach_basis, precompute_structure

    structs = [
        precompute_structure(m, spec.dataset_kind, spec.cutoff_l, spec.cutoff_g,
                             spec.variant)
        for m in mols
    ]
    if spec.precompute_basis:
        for s in structs:
            attach_basis(s, spec.cutoff_l, spec.num_spherical, spec.num_radial,
                         spec.envelope_exponent)
    return structs


def pack_chunk(structs: list[dict]) -> dict:
    """Column-pack a list of structures into flat arrays + counts."""
    out: dict = {
        "counts_n": np.array([s["pos"].shape[0] for s in structs], np.int64),
        "counts_eg": np.array([s["eg"].shape[1] for s in structs], np.int64),
        "counts_el": np.array([s["el"].shape[1] for s in structs], np.int64),
        "counts_t2": np.array([s["t2"]["idx_ji"].shape[0] for s in structs], np.int64),
        "counts_t1": np.array([s["t1"]["idx_ji"].shape[0] for s in structs], np.int64),
        "y": np.array([s["y"] for s in structs], np.float32),
    }
    for f in ("pos", "z", "feat"):
        out[f] = np.concatenate([s[f] for s in structs])
    for f in ("eg", "el"):
        out[f] = np.concatenate([s[f] for s in structs], axis=1)
    for f in ("dist_g", "dist_l"):
        out[f] = np.concatenate([s[f] for s in structs])
    for k in _T2_KEYS:
        out[f"t2_{k}"] = np.concatenate([s["t2"][k] for s in structs])
    for k in _T1_KEYS:
        out[f"t1_{k}"] = np.concatenate([s["t1"][k] for s in structs])
    if "sbf_radial" in structs[0]:
        for f in ("sbf_radial", "cbf2", "cbf1"):
            out[f] = np.concatenate([s[f] for s in structs])
    return out


def unpack_chunk(data: dict) -> list[dict]:
    """Inverse of :func:`pack_chunk`."""
    cn = data["counts_n"]
    n_mols = len(cn)
    splits = {
        k: np.cumsum(data[f"counts_{k}"])[:-1] for k in ("n", "eg", "el", "t2", "t1")
    }

    def sp(arr, key, axis=0):
        return np.split(arr, splits[key], axis=axis)

    pos = sp(data["pos"], "n")
    z = sp(data["z"], "n")
    feat = sp(data["feat"], "n")
    eg = sp(data["eg"], "eg", axis=1)
    el = sp(data["el"], "el", axis=1)
    dist_g = sp(data["dist_g"], "eg")
    dist_l = sp(data["dist_l"], "el")
    t2 = {k: sp(data[f"t2_{k}"], "t2") for k in _T2_KEYS}
    t1 = {k: sp(data[f"t1_{k}"], "t1") for k in _T1_KEYS}
    has_basis = "sbf_radial" in data
    if has_basis:
        sbf = sp(data["sbf_radial"], "el")
        cbf2 = sp(data["cbf2"], "t2")
        cbf1 = sp(data["cbf1"], "t1")
    structs = []
    for i in range(n_mols):
        s = {
            "pos": pos[i], "z": z[i], "feat": feat[i],
            "y": np.float32(data["y"][i]),
            "eg": eg[i], "el": el[i],
            "dist_g": dist_g[i], "dist_l": dist_l[i],
            "t2": {k: t2[k][i] for k in _T2_KEYS},
            "t1": {k: t1[k][i] for k in _T1_KEYS},
        }
        if has_basis:
            s["sbf_radial"], s["cbf2"], s["cbf1"] = sbf[i], cbf2[i], cbf1[i]
        structs.append(s)
    return structs


def _atomic_savez(path: str, payload: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _build_and_save(args) -> str:
    mols, spec, path = args
    _atomic_savez(path, pack_chunk(_build_structs(mols, spec)))
    return path


def load_or_build(
    mols: list[dict],
    spec: BuildSpec,
    cache_dir: str,
    chunk_size: int = 512,
    num_workers: int = 0,
    progress: bool = False,
) -> list[dict]:
    """Return precomputed structures for ``mols``, serving cache hits from
    ``cache_dir`` and building (atomically, resumably) what is missing."""
    os.makedirs(cache_dir, exist_ok=True)
    spec_key = spec.key()
    chunks = []  # (start, mols_slice, path)
    for start in range(0, len(mols), chunk_size):
        part = mols[start : start + chunk_size]
        fps = [mol_fingerprint(m) for m in part]
        chunks.append((start, part, _chunk_path(cache_dir, spec_key, start, fps)))

    missing = [(part, spec, path) for _, part, path in chunks
               if not os.path.exists(path)]
    if missing:
        if num_workers > 1:
            import multiprocessing as mp

            with mp.get_context("spawn").Pool(num_workers) as pool:
                for i, _ in enumerate(pool.imap_unordered(_build_and_save, missing)):
                    if progress:
                        print(f"structcache: built {i + 1}/{len(missing)} chunks",
                              flush=True)
        else:
            for i, job in enumerate(missing):
                _build_and_save(job)
                if progress:
                    print(f"structcache: built {i + 1}/{len(missing)} chunks",
                          flush=True)

    structs: list[dict] = []
    for _, part, path in chunks:
        with np.load(path) as data:
            structs.extend(unpack_chunk(dict(data)))
    return structs
