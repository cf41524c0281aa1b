"""On-disk structure cache (data/structcache.py): pack/unpack roundtrip,
cache-hit equality with the direct build path, content-addressed
invalidation, and resumability after a partial build."""

import glob
import os

import numpy as np
import pytest

from pamnet_tpu.data.batch import attach_basis, precompute_structure
from pamnet_tpu.data.structcache import (
    BuildSpec,
    load_or_build,
    mol_fingerprint,
    pack_chunk,
    unpack_chunk,
)
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset


def _assert_structs_equal(a, b):
    assert len(a) == len(b)
    for sa, sb in zip(a, b):
        assert set(sa) == set(sb)
        for k in sa:
            if k in ("t2", "t1"):
                for kk in sa[k]:
                    np.testing.assert_array_equal(sa[k][kk], sb[k][kk])
            else:
                np.testing.assert_array_equal(np.asarray(sa[k]), np.asarray(sb[k]))


def _direct(mols, spec):
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


SPEC = BuildSpec("qm9", 5.0, 5.0)


def test_cache_matches_direct_build(tmp_path):
    mols = synthetic_qm9_dataset(10, seed=1)
    got = load_or_build(mols, SPEC, str(tmp_path), chunk_size=4)
    _assert_structs_equal(got, _direct(mols, SPEC))
    assert len(glob.glob(str(tmp_path / "*.npz"))) == 3  # ceil(10/4)


def test_cache_hit_does_not_rebuild(tmp_path, monkeypatch):
    mols = synthetic_qm9_dataset(6, seed=2)
    first = load_or_build(mols, SPEC, str(tmp_path), chunk_size=4)
    import pamnet_tpu.data.structcache as sc

    def boom(*a, **k):
        raise AssertionError("cache miss: rebuild attempted")

    monkeypatch.setattr(sc, "_build_structs", boom)
    second = load_or_build(mols, SPEC, str(tmp_path), chunk_size=4)
    _assert_structs_equal(first, second)


def test_content_addressing_invalidates(tmp_path):
    mols = synthetic_qm9_dataset(4, seed=3)
    load_or_build(mols, SPEC, str(tmp_path), chunk_size=4)
    n0 = len(glob.glob(str(tmp_path / "*.npz")))

    # Different build config -> different key -> new chunk.
    load_or_build(mols, BuildSpec("qm9", 4.0, 5.0), str(tmp_path), chunk_size=4)
    n1 = len(glob.glob(str(tmp_path / "*.npz")))
    assert n1 == n0 + 1

    # Changed molecule content -> new fingerprint -> new chunk.
    mols2 = [dict(m) for m in mols]
    mols2[0]["pos"] = mols2[0]["pos"] + 0.1
    assert mol_fingerprint(mols2[0]) != mol_fingerprint(mols[0])
    got = load_or_build(mols2, SPEC, str(tmp_path), chunk_size=4)
    assert len(glob.glob(str(tmp_path / "*.npz"))) == n1 + 1
    _assert_structs_equal(got, _direct(mols2, SPEC))


def test_resume_after_partial_build(tmp_path):
    mols = synthetic_qm9_dataset(8, seed=4)
    # Build only the first chunk, as an interrupted run would have.
    load_or_build(mols[:4], SPEC, str(tmp_path), chunk_size=4)
    assert len(glob.glob(str(tmp_path / "*.npz"))) == 1
    got = load_or_build(mols, SPEC, str(tmp_path), chunk_size=4)
    assert len(glob.glob(str(tmp_path / "*.npz"))) == 2
    _assert_structs_equal(got, _direct(mols, SPEC))


def test_pack_roundtrip_variant_s_empty_t2():
    mols = synthetic_qm9_dataset(3, seed=5)
    spec = BuildSpec("qm9", 5.0, 5.0, variant="s", precompute_basis=False)
    structs = _direct(mols, spec)
    assert structs[0]["t2"]["idx_ji"].size == 0
    _assert_structs_equal(unpack_chunk(pack_chunk(structs)), structs)


def test_pack_roundtrip_pdbbind_features():
    rng = np.random.default_rng(6)
    mols = []
    for _ in range(3):
        n = int(rng.integers(8, 16))
        mols.append({
            "pos": rng.normal(size=(n, 3)).astype(np.float32) * 3,
            "feat": rng.normal(size=(n, 18)).astype(np.float32),
            "y": float(rng.normal()),
        })
    spec = BuildSpec("pdbbind", 2.0, 6.0, precompute_basis=True)
    structs = _direct(mols, spec)
    _assert_structs_equal(unpack_chunk(pack_chunk(structs)), structs)


def test_loader_uses_cache(tmp_path):
    from pamnet_tpu.data.loader import GraphLoader

    mols = synthetic_qm9_dataset(6, seed=7)
    a = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=2,
                    cache_dir=str(tmp_path))
    b = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=2)
    assert glob.glob(str(tmp_path / "*.npz"))
    for ba, bb in zip(a, b):
        for fa, fb in zip(ba, bb):
            if isinstance(fa, dict):
                for k in fa:
                    np.testing.assert_array_equal(fa[k], fb[k])
            elif fa is not None:
                np.testing.assert_array_equal(fa, fb)


def test_parallel_pool_build(tmp_path):
    """num_workers > 1 builds missing chunks in a spawn pool; results must
    equal the in-process build."""
    mols = synthetic_qm9_dataset(8, seed=8)
    got = load_or_build(mols, SPEC, str(tmp_path), chunk_size=2, num_workers=2)
    _assert_structs_equal(got, _direct(mols, SPEC))
    assert len(glob.glob(str(tmp_path / "*.npz"))) == 4
