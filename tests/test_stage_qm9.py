"""tools/stage_qm9.py: structural verification + staging of the real QM9
raw files (the turnkey path between "files exist" and "headline MAE run")."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import stage_qm9  # noqa: E402

from tests.test_qm9 import _write_raw  # noqa: E402  (fabricated raw trio)


def test_counting_helpers(tmp_path):
    _write_raw(tmp_path)
    raw = tmp_path / "raw"
    assert stage_qm9.count_sdf_blocks(str(raw / "gdb9.sdf")) == 3
    nrows, ncols = stage_qm9.count_csv_rows(str(raw / "gdb9.sdf.csv"))
    assert (nrows, ncols) == (3, 20)


def test_find_sources_recursive(tmp_path):
    _write_raw(tmp_path)
    found = stage_qm9.find_sources(str(tmp_path))
    assert found["gdb9.sdf"] and found["gdb9.sdf.csv"]
    assert found["uncharacterized.txt"]
    assert found["qm9.zip"] is None


def test_main_rejects_wrong_counts(tmp_path, monkeypatch, capsys):
    """The 3-block fixture must FAIL verification against the real-world
    constants — staging garbage is worse than staging nothing."""
    _write_raw(tmp_path)
    monkeypatch.setattr(sys, "argv",
                        ["stage_qm9", str(tmp_path),
                         "--root", str(tmp_path / "dest")])
    assert stage_qm9.main() == 1
    assert "VERIFY FAIL" in capsys.readouterr().err


def test_main_stages_and_parses(tmp_path, monkeypatch, capsys):
    """With the public constants scaled to the fixture, the full pipeline
    stages, verifies, parses, and prints the headline command."""
    _write_raw(tmp_path, skip_index=2)  # skip the water
    monkeypatch.setattr(stage_qm9, "N_SDF_BLOCKS", 3)
    monkeypatch.setattr(stage_qm9, "N_SKIP", 1)
    # 3 blocks - 1 skipped - 1 non-CHONF (Si) = 1 parsed molecule.
    monkeypatch.setattr(stage_qm9, "N_PROCESSED", 1)
    dest = tmp_path / "dest"
    monkeypatch.setattr(sys, "argv",
                        ["stage_qm9", str(tmp_path), "--root", str(dest),
                         "--parse"])
    assert stage_qm9.main() == 0
    for name in ("gdb9.sdf", "gdb9.sdf.csv", "uncharacterized.txt"):
        assert (dest / "raw" / name).exists()
    assert (dest / "processed" / "qm9_pamnet_tpu.npz").exists()
    out = capsys.readouterr().out
    assert "parsed 1 molecules" in out
    assert "main_qm9.py --model PAMNet --target 7" in out


def test_main_no_sources(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv",
                        ["stage_qm9", str(tmp_path / "empty_src"),
                         "--root", str(tmp_path / "dest")])
    os.makedirs(tmp_path / "empty_src")
    assert stage_qm9.main() == 1
    assert "no QM9 artifacts" in capsys.readouterr().err
