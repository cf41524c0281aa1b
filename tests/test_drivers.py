"""End-to-end driver smoke tests: each main_*.py runs one epoch on a tiny
generated dataset in a subprocess (CPU platform), exercising the full
CLI -> data -> train -> checkpoint path."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pamnet_tpu.data.tu_writer import write_tu_dataset

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=400,
    )


def _rna_graphs(rng, n_graphs, with_names=False):
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(25, 40))
        g = dict(
            attrs=(rng.random((n, 3)) * 12).astype(np.float32),
            labels=rng.integers(0, 3, n),
            y=float(rng.random() * 20),
        )
        if with_names:
            g["name"] = f"candidate_{i}.pdb"
        graphs.append(g)
    return graphs


def test_main_rna_puzzles_smoke(tmp_path, rng):
    root = str(tmp_path / "data" / "RNA-Puzzles")
    write_tu_dataset(root, "train", _rna_graphs(rng, 6))
    write_tu_dataset(root, "val", _rna_graphs(rng, 3))
    common = [os.path.join(REPO, "main_rna_puzzles.py"), "--platform", "cpu",
              "--epochs", "1", "--dim", "8", "--n_layer", "1",
              "--batch_size", "4", "--data_root", root]
    r = _run(common + ["--metrics_csv", "metrics.csv"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Epoch: 001" in r.stdout
    ckpt = tmp_path / "save" / "pamnet_rna_best.msgpack"
    assert ckpt.exists()
    with open(tmp_path / "metrics.csv") as f:
        header, row = f.read().strip().splitlines()
    assert header.split(",") == ["epoch", "train_loss", "val_loss", "seconds"]
    assert row.startswith("1,")
    # Resume from the saved full train state.
    r2 = _run(common + ["--resume", str(ckpt)], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Resumed full train state" in r2.stdout


def _pdbbind_graphs(rng, n_graphs):
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(15, 25))
        pos = (rng.random((n, 3)) * 5).astype(np.float32)
        pos[n // 2 :] += np.float32([100.0, 0, 0])  # "pocket" shifted subgraph
        feats = rng.random((n, 18)).astype(np.float32)
        graphs.append(dict(attrs=pos, labels=feats, y=float(rng.random() * 10)))
    return graphs


def test_main_pdbbind_smoke(tmp_path, rng):
    root = str(tmp_path / "data" / "PDBbind")
    write_tu_dataset(root, "train_val", _pdbbind_graphs(rng, 8))
    write_tu_dataset(root, "test", _pdbbind_graphs(rng, 3))
    common = [os.path.join(REPO, "main_pdbbind.py"), "--platform", "cpu",
              "--epochs", "1", "--dim", "8", "--n_layer", "1",
              "--batch_size", "4", "--data_root", root]
    r = _run(common + ["--save_dir", "save", "--metrics_csv", "metrics.csv"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Testing RMSE" in r.stdout
    # Opt-in checkpointing (the reference PDBbind driver saves nothing).
    ckpt = tmp_path / "save" / "PDBbind" / "best_model.msgpack"
    assert ckpt.exists()
    with open(tmp_path / "metrics.csv") as f:
        header, row = f.read().strip().splitlines()
    assert header.split(",")[:2] == ["epoch", "train_rmse"]
    assert row.startswith("1,")
    r2 = _run(common + ["--resume", str(ckpt)], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Resumed full train state" in r2.stdout


def test_main_qm9_smoke_and_resume(tmp_path):
    common = ["--platform", "cpu", "--synthetic", "--limit", "64",
              "--epochs", "1", "--dim", "8", "--n_layer", "1",
              "--batch_size", "8"]
    r = _run([os.path.join(REPO, "main_qm9.py")] + common, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Best Validation MAE" in r.stdout
    ckpt = tmp_path / "save" / "QM9" / "best_model.msgpack"
    assert ckpt.exists()
    # Resume from the saved full train state (params+opt+EMA+step).
    r2 = _run(
        [os.path.join(REPO, "main_qm9.py")] + common + ["--resume", str(ckpt)],
        cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Resumed full train state" in r2.stdout


def test_main_qm9_data_parallel(tmp_path):
    """--dp 2 on the virtual CPU mesh: the driver's shard_map path."""
    r = _run(
        [os.path.join(REPO, "main_qm9.py"), "--platform", "cpu", "--synthetic",
         "--limit", "64", "--epochs", "1", "--dim", "8", "--n_layer", "1",
         "--batch_size", "4", "--dp", "2"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Best Validation MAE" in r.stdout


def test_main_pdbbind_data_parallel(tmp_path, rng):
    """--dp 2 on the virtual CPU mesh: the PDBbind driver's shard_map path
    (signed ΔE pooling under DP; VERDICT r4 #2)."""
    root = str(tmp_path / "data" / "PDBbind")
    write_tu_dataset(root, "train_val", _pdbbind_graphs(rng, 12))
    write_tu_dataset(root, "test", _pdbbind_graphs(rng, 4))
    r = _run(
        [os.path.join(REPO, "main_pdbbind.py"), "--platform", "cpu",
         "--epochs", "1", "--dim", "8", "--n_layer", "1",
         "--batch_size", "2", "--data_root", root, "--dp", "2"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Testing RMSE" in r.stdout


def test_main_rna_puzzles_data_parallel(tmp_path, rng):
    """--dp 2 on the virtual CPU mesh: the RNA driver's shard_map path
    (mean pool + target_to_source flow under DP; VERDICT r4 #2)."""
    root = str(tmp_path / "data" / "RNA-Puzzles")
    write_tu_dataset(root, "train", _rna_graphs(rng, 8))
    write_tu_dataset(root, "val", _rna_graphs(rng, 3))
    r = _run(
        [os.path.join(REPO, "main_rna_puzzles.py"), "--platform", "cpu",
         "--epochs", "1", "--dim", "8", "--n_layer", "1",
         "--batch_size", "2", "--data_root", root, "--dp", "2"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Epoch: 001" in r.stdout


def test_inference_driver_csv_contract(tmp_path, rng):
    """inference_rna_puzzles.py end-to-end on a tiny generated dataset with
    the real reference checkpoint (dim=16, n_layer=1), checking the CSV
    contract PAMNet,tag,puzzle_number (reference inference_rna_puzzles.py:70-80)."""
    import csv

    if not os.path.isdir("/root/reference/save"):
        pytest.skip("reference checkpoint not mounted")
    root = str(tmp_path / "data" / "RNA-Puzzles")
    write_tu_dataset(root, "rna_toy", _rna_graphs(rng, 4, with_names=True))
    r = _run(
        [os.path.join(REPO, "inference_rna_puzzles.py"), "--platform", "cpu",
         "--dataset", "rna_toy", "--batch_size", "2",
         "--saved_model", "pamnet_rna.pt", "--data_root", root],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "rna_puzzles_predictions" / "rna_toy.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    assert set(rows[0].keys()) == {"PAMNet", "tag", "puzzle_number"}
    assert rows[0]["tag"] == "candidate_0"  # ".pdb" stripped
    assert all(np.isfinite(float(row["PAMNet"])) for row in rows)


def test_train_then_infer_native_checkpoint(tmp_path, rng):
    """Train RNA (saves a full-train-state msgpack), then run inference with
    that native checkpoint (the load_params full-state/bare-params path)."""
    root = str(tmp_path / "data" / "RNA-Puzzles")
    write_tu_dataset(root, "train", _rna_graphs(rng, 4))
    write_tu_dataset(root, "val", _rna_graphs(rng, 2))
    write_tu_dataset(root, "rna_toy", _rna_graphs(rng, 3, with_names=True))
    r = _run(
        [os.path.join(REPO, "main_rna_puzzles.py"), "--platform", "cpu",
         "--epochs", "1", "--dim", "8", "--n_layer", "1", "--batch_size", "4",
         "--data_root", root],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-1500:]
    r2 = _run(
        [os.path.join(REPO, "inference_rna_puzzles.py"), "--platform", "cpu",
         "--dataset", "rna_toy", "--batch_size", "2",
         "--saved_model", "pamnet_rna_best.msgpack",
         "--dim", "8", "--n_layer", "1", "--data_root", root],
        cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr[-1500:]
    assert (tmp_path / "rna_puzzles_predictions" / "rna_toy.csv").exists()


def test_tu_writer_roundtrip(tmp_path, rng):
    from pamnet_tpu.data.tu import TUDataset

    graphs = _rna_graphs(rng, 4, with_names=True)
    write_tu_dataset(str(tmp_path), "toy", graphs)
    ds = TUDataset(str(tmp_path), "toy")
    assert len(ds) == 4
    assert ds.names == [g["name"] for g in graphs]
    for i, g in enumerate(graphs):
        mol = ds[i]
        np.testing.assert_allclose(mol["pos"], g["attrs"], atol=1e-3)
        np.testing.assert_array_equal(mol["z"], g["labels"])
        assert mol["y"] == pytest.approx(g["y"], abs=1e-3)


# ---------------------------------------------------------------------------
# Real-data seam drill (VERDICT r3 #9): fabricated gdb9 raw files through the
# FULL QM9 driver (main_qm9.py real-data branch, not --synthetic), so the
# headline-MAE run has no untested seams when real files are staged.
# Mirrors reference main_qm9.py:61-76 (load + remap + shuffle + split).
# ---------------------------------------------------------------------------


def _sdf_block(name, z, pos, edge_index):
    """One V2000 SDF block in the fixed-column layout gdb9 uses."""
    syms = {0: "H", 1: "C", 2: "N", 3: "O", 4: "F", -1: "Si"}
    bonds = sorted({(min(a, b) + 1, max(a, b) + 1)
                    for a, b in zip(*edge_index)})
    lines = [name, "     synthetic          3D", ""]
    lines.append(f"{len(z):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000")
    for zi, (x, y, w) in zip(z, pos):
        lines.append(
            f"{x:10.4f}{y:10.4f}{w:10.4f} {syms[int(zi)]:<3}"
            "0  0  0  0  0  0  0  0  0  0  0  0"
        )
    for a, b in bonds:
        lines.append(f"{a:3d}{b:3d}  1  0")
    lines.append("M  END")
    return "\n".join(lines) + "\n"


def _stage_fake_gdb9(root, n_mols=40, bad_index=5, skip_index=11):
    """Write data/QM9/raw/{gdb9.sdf, gdb9.sdf.csv, uncharacterized.txt}:
    n_mols blocks, one unparseable (unknown element), one skip-listed."""
    from pamnet_tpu.data.synthetic import synthetic_qm9_dataset

    raw = os.path.join(root, "data", "QM9", "raw")
    os.makedirs(raw)
    mols = synthetic_qm9_dataset(n_mols, seed=77)
    blocks = []
    for i, m in enumerate(mols):
        z = m["z"].copy()
        if i == bad_index:
            z = np.full_like(z, -1)  # Si atoms: parser drops the block
        blocks.append(_sdf_block(f"gdb_{i+1}", z, m["pos"], m["edge_index"]))
    with open(os.path.join(raw, "gdb9.sdf"), "w") as f:
        f.write("$$$$\n".join(blocks) + "$$$$\n")
    rng = np.random.default_rng(3)
    with open(os.path.join(raw, "gdb9.sdf.csv"), "w") as f:
        f.write("mol_id," + ",".join(f"p{i}" for i in range(19)) + "\n")
        for i in range(n_mols):
            vals = rng.normal(0, 1, 19)
            f.write(f"gdb_{i+1}," + ",".join(f"{v:.6f}" for v in vals) + "\n")
    lines = ["hdr"] * 9 + [f"{skip_index + 1}  x", "ftr", ""]
    with open(os.path.join(raw, "uncharacterized.txt"), "w") as f:
        f.write("\n".join(lines))


def test_main_qm9_real_data_seam(tmp_path):
    """Full driver over the fabricated raw trio: loads blocks - unparseable -
    skip-listed molecules, applies the --target remap, trains, checkpoints."""
    _stage_fake_gdb9(str(tmp_path))
    r = _run(
        [os.path.join(REPO, "main_qm9.py"), "--platform", "cpu",
         "--dataset", "QM9", "--limit", "32", "--target", "7",
         "--epochs", "1", "--dim", "8", "--n_layer", "1", "--batch_size", "8"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # 40 blocks - 1 unparseable - 1 skip-listed = 38; --limit 32 then 80/10
    # split (reference split ratios at --limit; main_qm9.py).
    assert "train=25 val=3 test=4" in r.stdout, r.stdout[-2000:]
    assert "Best Validation MAE" in r.stdout
    assert (tmp_path / "save" / "QM9" / "best_model.msgpack").exists()
    # npz cache written; a second run must hit it (no re-parse) and load the
    # same counts.
    processed = tmp_path / "data" / "QM9" / "processed"
    assert any(processed.glob("*.npz"))
    (tmp_path / "data" / "QM9" / "raw" / "gdb9.sdf").unlink()  # cache or bust
    r2 = _run(
        [os.path.join(REPO, "main_qm9.py"), "--platform", "cpu",
         "--dataset", "QM9", "--limit", "32", "--target", "7",
         "--epochs", "1", "--dim", "8", "--n_layer", "1", "--batch_size", "8"],
        cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "train=25 val=3 test=4" in r2.stdout, r2.stdout[-2000:]
