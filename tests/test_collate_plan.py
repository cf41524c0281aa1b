"""CollatePlan (native zero-Python-loop collation) must produce batches
byte-identical to the numpy list path — fields, dtypes, tables, basis — for
both build_tables modes and shuffled index orders."""

import numpy as np
import pytest

from pamnet_tpu.data import native
from pamnet_tpu.data.batch import CollatePlan, collate_structures
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset

pytestmark = pytest.mark.skipif(
    not native.has_collate(), reason="native collate library not built"
)


def _assert_batch_equal(a, b):
    for name, fa, fb in zip(a._fields, a, b):
        if isinstance(fa, dict):
            assert set(fa) == set(fb), name
            for k in fa:
                np.testing.assert_array_equal(fa[k], fb[k], err_msg=f"{name}.{k}")
        elif fa is None:
            assert fb is None, name
        else:
            np.testing.assert_array_equal(fa, fb, err_msg=name)
            assert fa.dtype == fb.dtype, (name, fa.dtype, fb.dtype)


@pytest.mark.parametrize("build_tables", [True, False])
def test_plan_matches_list_path(build_tables):
    mols = synthetic_qm9_dataset(24, seed=11)
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=8, shuffle=False,
                         build_tables=build_tables)
    plan = CollatePlan(loader.structs)
    rng = np.random.default_rng(0)
    for idxs in loader.batches():
        idxs = rng.permutation(idxs).tolist()  # exercise non-monotone gathers
        a = collate_structures([loader.structs[i] for i in idxs], loader.pads,
                               build_tables=build_tables)
        b = collate_structures(None, loader.pads, build_tables=build_tables,
                               plan=plan, idxs=idxs)
        _assert_batch_equal(a, b)


def test_loader_iter_uses_plan_and_matches(monkeypatch):
    mols = synthetic_qm9_dataset(12, seed=12)
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, shuffle=False)
    via_plan = list(loader)
    assert loader._plan() is not None
    loader2 = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, shuffle=False)
    monkeypatch.setattr(native, "has_collate", lambda: False)
    via_list = list(loader2)
    for a, b in zip(via_plan, via_list):
        _assert_batch_equal(a, b)


def test_plan_detects_stale_structs():
    """Replacing a struct array after plan construction (the frozen-structs
    contract) must raise on the next collate, not read freed memory."""
    mols = synthetic_qm9_dataset(8, seed=3)
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, shuffle=False)
    plan = CollatePlan(loader.structs)
    idxs = loader.batches()[0]
    collate_structures(None, loader.pads, plan=plan, idxs=idxs)  # fresh: ok
    s = loader.structs[idxs[0]]
    s["pos"] = s["pos"].copy()  # simulate attach_basis re-run / user mutation
    with pytest.raises(RuntimeError, match="stale"):
        collate_structures(None, loader.pads, plan=plan, idxs=idxs)


def test_plan_overflow_raises():
    mols = synthetic_qm9_dataset(8, seed=13)
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=4, shuffle=False)
    plan = CollatePlan(loader.structs)
    import dataclasses

    tiny = dataclasses.replace(loader.pads, t1=8)
    with pytest.raises(ValueError, match="padding overflow"):
        collate_structures(None, tiny, plan=plan, idxs=list(range(8)))


def test_plan_matches_list_path_rna_and_pdbbind():
    """Plan collation must also match for the other dataset shapes: RNA-like
    (knn graphs, no feat) and PDBbind-like (18-dim feat, zero-z) — including
    inference mode (build_tables=False) used by the RNA scoring path."""
    rng = np.random.default_rng(21)
    rna_mols = []
    for _ in range(6):
        n = int(rng.integers(20, 30))
        rna_mols.append({
            "pos": rng.normal(size=(n, 3)).astype(np.float32) * 4,
            "z": rng.integers(0, 3, size=n).astype(np.int32),
            "y": float(abs(rng.normal())),
        })
    pdb_mols = []
    for i in range(6):
        n = int(rng.integers(10, 16))
        pos = rng.normal(size=(n, 3)).astype(np.float32) * 3
        if i % 2:
            pos[:, 0] += 100
        pdb_mols.append({
            "pos": pos,
            "feat": rng.normal(size=(n, 18)).astype(np.float32),
            "y": float(rng.normal()),
        })
    for mols, kind, cl, cg in ((rna_mols, "rna", 2.6, 20.0),
                               (pdb_mols, "pdbbind", 2.0, 6.0)):
        for build_tables in (True, False):
            loader = GraphLoader(mols, kind, cl, cg, batch_size=3,
                                 build_tables=build_tables)
            plan = CollatePlan(loader.structs)
            for idxs in loader.batches():
                a = collate_structures([loader.structs[i] for i in idxs],
                                       loader.pads, build_tables=build_tables)
                b = collate_structures(None, loader.pads,
                                       build_tables=build_tables,
                                       plan=plan, idxs=idxs)
                _assert_batch_equal(a, b)


def test_plan_from_structcache_roundtrip(tmp_path):
    """Structures loaded back from the disk cache must collate identically
    through the plan path (dtype/contiguity of cached arrays)."""
    from pamnet_tpu.data.synthetic import synthetic_qm9_dataset as synth

    mols = synth(6, seed=31)
    direct = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3)
    cached = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=3,
                         cache_dir=str(tmp_path))
    for a, b in zip(direct, cached):
        _assert_batch_equal(a, b)
