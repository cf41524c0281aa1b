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
