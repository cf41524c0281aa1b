"""QM9 pipeline tests on synthesized raw files: SDF parsing, target
reorder + unit conversion, skip list, target remap, cache roundtrip
(the silent-corruption risks called out in SURVEY.md hard part #5)."""

import os

import numpy as np
import pytest

from pamnet_tpu.data import qm9

# Minimal V2000 SDF: methane-like fragment + a molecule with an unknown
# element (to exercise the skip-unknowns path) + a water.
SDF = """\
gdb_1
     RDKit          3D

  5  4  0  0  0  0  0  0  0  0999 V2000
   -0.0127    1.0858    0.0080 C   0  0  0  0  0  0  0  0  0  0  0  0
    0.0022   -0.0060    0.0020 H   0  0  0  0  0  0  0  0  0  0  0  0
    1.0117    1.4638    0.0003 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.5408    1.4475   -0.8766 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.5238    1.4379    0.9064 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  1  3  1  0
  1  4  1  0
  1  5  1  0
M  END
$$$$
gdb_2
     RDKit          3D

  2  1  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 Si  0  0  0  0  0  0  0  0  0  0  0  0
    1.0000    0.0000    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
M  END
$$$$
gdb_3
     RDKit          3D

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.1173 O   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000    0.7572   -0.4692 H   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000   -0.7572   -0.4692 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  1  3  1  0
M  END
$$$$
"""


def _write_raw(tmp_path, skip_index=None):
    raw = tmp_path / "raw"
    os.makedirs(raw)
    (raw / "gdb9.sdf").write_text(SDF)
    header = "mol_id," + ",".join(f"p{i}" for i in range(19)) + "\n"
    rows = []
    for mol in range(3):
        rows.append(
            f"gdb_{mol+1}," + ",".join(str(float(mol + 1) * (c + 1)) for c in range(19))
        )
    (raw / "gdb9.sdf.csv").write_text(header + "\n".join(rows) + "\n")
    # uncharacterized.txt format: 9 header lines, entries, 2 footer lines.
    lines = ["hdr"] * 9
    if skip_index is not None:
        lines.append(f"{skip_index + 1}  something")
    lines += ["ftr", ""]
    (raw / "uncharacterized.txt").write_text("\n".join(lines))


def test_load_qm9_parsing_and_units(tmp_path):
    _write_raw(tmp_path)
    mols = qm9.load_qm9(str(tmp_path), cache=False)
    # Molecule 2 (Si) is skipped by the element whitelist.
    assert len(mols) == 2
    m = mols[0]
    assert m["z"].tolist() == [1, 0, 0, 0, 0]  # C, H, H, H, H
    assert m["pos"].shape == (5, 3)
    assert m["edge_index"].shape == (2, 8)  # 4 bonds, both directions
    # Target reorder: raw col 3 (HOMO, Hartree) becomes index 0 after the
    # cat([y[:,3:], y[:,:3]]) reorder... raw cols are [A,B,C,mu,...]; after
    # reorder index 0 = raw col 3 = value 4.0 (mol 1), times conversion[0]=1.
    np.testing.assert_allclose(m["y"][0], 4.0, rtol=1e-6)
    # Index 2 (raw col 5) carries HAR2EV conversion.
    np.testing.assert_allclose(m["y"][2], 6.0 * qm9.HAR2EV, rtol=1e-6)
    # Rotational constants (raw cols 0..2) land at the end, unconverted.
    np.testing.assert_allclose(m["y"][16:19], [1.0, 2.0, 3.0], rtol=1e-6)


def test_dropped_block_does_not_shift_labels(tmp_path):
    """Block 1 (Si) is dropped by the element whitelist; water at block 2
    must still read CSV row 2 (value 3.0 base), not row 1.  Regression for
    the enumeration-desync bug (parse_sdf_molecules now yields None per
    dropped block; reference enumerates the supplier, qm9_dataset.py:203-205).
    """
    _write_raw(tmp_path)
    mols = qm9.load_qm9(str(tmp_path), cache=False)
    water = mols[1]
    assert water["z"].tolist() == [3, 0, 0]  # O, H, H
    # Reordered index 0 = raw col 3 = 3.0 * 4 = 12.0 for CSV row index 2.
    np.testing.assert_allclose(water["y"][0], 12.0, rtol=1e-6)
    np.testing.assert_allclose(water["y"][16:19], [3.0, 6.0, 9.0], rtol=1e-6)


def test_parse_yields_none_per_dropped_block(tmp_path):
    raw = tmp_path / "raw"
    os.makedirs(raw)
    (raw / "gdb9.sdf").write_text(SDF)
    parsed = list(qm9.parse_sdf_molecules(str(raw / "gdb9.sdf")))
    assert len(parsed) == 3  # one entry per $$$$ block, no trailing ghost
    assert parsed[0] is not None
    assert parsed[1] is None  # Si block
    assert parsed[2] is not None


def test_skip_list(tmp_path):
    _write_raw(tmp_path, skip_index=0)  # drop the first molecule
    mols = qm9.load_qm9(str(tmp_path), cache=False)
    assert len(mols) == 1
    assert mols[0]["z"].tolist() == [3, 0, 0]  # O, H, H (water)


def test_cache_roundtrip(tmp_path):
    _write_raw(tmp_path)
    a = qm9.load_qm9(str(tmp_path), cache=True)
    assert os.path.exists(tmp_path / "processed" / "qm9_pamnet_tpu.npz")
    b = qm9.load_qm9(str(tmp_path), cache=True)  # from cache
    assert len(a) == len(b)
    for ma, mb in zip(a, b):
        np.testing.assert_array_equal(ma["z"], mb["z"])
        np.testing.assert_allclose(ma["pos"], mb["pos"])
        np.testing.assert_array_equal(ma["edge_index"], mb["edge_index"])
        np.testing.assert_allclose(ma["y"], mb["y"])


def test_target_remap():
    # 7/8/9/10 -> +5 (atomization variants, reference main_qm9.py:61-67).
    assert qm9.remap_target(7) == 12
    assert qm9.remap_target(10) == 15
    assert qm9.remap_target(0) == 0
    assert qm9.remap_target(11) == 11


def test_select_target(tmp_path):
    _write_raw(tmp_path)
    mols = qm9.load_qm9(str(tmp_path), cache=False)
    sel = qm9.select_target(mols, 7)  # remaps to 12
    assert sel[0]["y"] == pytest.approx(float(mols[0]["y"][12]))
