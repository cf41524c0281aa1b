"""Preprocessing-pipeline tests on synthesized chemistry files (mol2/PDB) —
covering the host tools that replace OpenBabel/RDKit."""

import os
import textwrap

import numpy as np
import pytest

from pamnet_tpu.data.featurizer import FEATURE_NAMES, featurize_mol2
from pamnet_tpu.data.mol2 import parse_mol2
from pamnet_tpu.data.pdb import parse_pdb_atoms, parse_rms_label

BENZENE_MOL2 = """\
@<TRIPOS>MOLECULE
benzene
12 12 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  1.396  0.000 C.ar 1 BNZ -0.062
  2 C2  1.209  0.698  0.000 C.ar 1 BNZ -0.062
  3 C3  1.209 -0.698  0.000 C.ar 1 BNZ -0.062
  4 C4  0.000 -1.396  0.000 C.ar 1 BNZ -0.062
  5 C5 -1.209 -0.698  0.000 C.ar 1 BNZ -0.062
  6 C6 -1.209  0.698  0.000 C.ar 1 BNZ -0.062
  7 H1  0.000  2.480  0.000 H    1 BNZ  0.062
  8 H2  2.148  1.240  0.000 H    1 BNZ  0.062
  9 H3  2.148 -1.240  0.000 H    1 BNZ  0.062
 10 H4  0.000 -2.480  0.000 H    1 BNZ  0.062
 11 H5 -2.148 -1.240  0.000 H    1 BNZ  0.062
 12 H6 -2.148  1.240  0.000 H    1 BNZ  0.062
@<TRIPOS>BOND
  1  1  2 ar
  2  2  3 ar
  3  3  4 ar
  4  4  5 ar
  5  5  6 ar
  6  6  1 ar
  7  1  7 1
  8  2  8 1
  9  3  9 1
 10  4 10 1
 11  5 11 1
 12  6 12 1
"""

ETHANOLAMINE_MOL2 = """\
@<TRIPOS>MOLECULE
etha
4 3 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 N1  0.000  0.000  0.000 N.3 1 ETA -0.32
  2 C1  1.450  0.000  0.000 C.3 1 ETA  0.03
  3 O1  2.100  1.300  0.000 O.3 1 ETA -0.40
  4 H1 -0.500 -0.800  0.000 H   1 ETA  0.12
@<TRIPOS>BOND
  1 1 2 1
  2 2 3 1
  3 1 4 1
"""


def test_parse_mol2_benzene(tmp_path):
    p = tmp_path / "benzene.mol2"
    p.write_text(BENZENE_MOL2)
    mol = parse_mol2(str(p))
    assert len(mol) == 12
    assert (mol.atomic_num[:6] == 6).all() and (mol.atomic_num[6:] == 1).all()
    assert mol.sybyl[0] == "C.ar"
    assert len(mol.bonds) == 12
    np.testing.assert_allclose(mol.charge[0], -0.062)


def test_featurizer_benzene(tmp_path):
    p = tmp_path / "benzene.mol2"
    p.write_text(BENZENE_MOL2)
    coords, feats = featurize_mol2(parse_mol2(str(p)))
    assert coords.shape == (6, 3)  # heavy atoms only
    assert feats.shape == (6, 18)
    f = dict(zip(FEATURE_NAMES, feats[0]))
    assert f["C"] == 1.0 and f["N"] == 0.0
    assert f["hyb"] == 2.0  # aromatic carbon
    assert f["heavydegree"] == 2.0
    assert f["heterodegree"] == 0.0
    assert f["aromatic"] == 1.0 and f["ring"] == 1.0
    assert f["hydrophobic"] == 1.0  # C with no N/O/F neighbor
    assert f["donor"] == 0.0 and f["acceptor"] == 0.0


def test_featurizer_ethanolamine(tmp_path):
    p = tmp_path / "etha.mol2"
    p.write_text(ETHANOLAMINE_MOL2)
    coords, feats = featurize_mol2(parse_mol2(str(p)))
    f_n, f_c, f_o = (dict(zip(FEATURE_NAMES, row)) for row in feats)
    assert f_n["N"] == 1.0 and f_o["O"] == 1.0
    assert f_n["donor"] == 1.0  # N-H
    assert f_n["acceptor"] == 1.0 and f_o["acceptor"] == 1.0
    # The fragment omits the hydroxyl H; the typical-valence model fills
    # monovalent O.3 with one implicit H (as OpenBabel would), so the !H0
    # donor alternative fires.
    assert f_o["donor"] == 1.0
    assert f_c["hydrophobic"] == 0.0  # C bonded to N and O
    assert f_c["heterodegree"] == 2.0
    assert f_n["ring"] == 0.0


PYRIDINE_MOL2 = """\
@<TRIPOS>MOLECULE
pyridine
11 11 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 N1  0.000  1.338  0.000 N.ar 1 PYR -0.35
  2 C2  1.144  0.720  0.000 C.ar 1 PYR  0.08
  3 C3  1.194 -0.670  0.000 C.ar 1 PYR -0.06
  4 C4  0.000 -1.378  0.000 C.ar 1 PYR -0.05
  5 C5 -1.194 -0.670  0.000 C.ar 1 PYR -0.06
  6 C6 -1.144  0.720  0.000 C.ar 1 PYR  0.08
  7 H2  2.060  1.300  0.000 H    1 PYR  0.06
  8 H3  2.150 -1.190  0.000 H    1 PYR  0.06
  9 H4  0.000 -2.460  0.000 H    1 PYR  0.06
 10 H5 -2.150 -1.190  0.000 H    1 PYR  0.06
 11 H6 -2.060  1.300  0.000 H    1 PYR  0.06
@<TRIPOS>BOND
  1  1  2 ar
  2  2  3 ar
  3  3  4 ar
  4  4  5 ar
  5  5  6 ar
  6  6  1 ar
  7  2  7 1
  8  3  8 1
  9  4  9 1
 10  5 10 1
 11  6 11 1
"""

WATER_MOL2 = """\
@<TRIPOS>MOLECULE
water
3 2 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 O1  0.000  0.000  0.000 O.3 1 HOH -0.66
  2 H1  0.960  0.000  0.000 H   1 HOH  0.33
  3 H2 -0.240  0.930  0.000 H   1 HOH  0.33
@<TRIPOS>BOND
  1 1 2 1
  2 1 3 1
"""


def test_featurizer_pyridine_and_water(tmp_path):
    p = tmp_path / "pyr.mol2"
    p.write_text(PYRIDINE_MOL2)
    _, feats = featurize_mol2(parse_mol2(str(p)))
    f_n = dict(zip(FEATURE_NAMES, feats[0]))
    # Aromatic ring nitrogen, no attached H: acceptor but not donor; the
    # 2-connected aromatic n is NOT excluded by the reference acceptor
    # pattern (only nX3 is; featurizer.py:127).
    assert f_n["N"] == 1.0 and f_n["aromatic"] == 1.0 and f_n["ring"] == 1.0
    assert f_n["acceptor"] == 1.0 and f_n["donor"] == 0.0
    assert f_n["hyb"] == 2.0

    w = tmp_path / "wat.mol2"
    w.write_text(WATER_MOL2)
    _, feats_w = featurize_mol2(parse_mol2(str(w)))
    f_o = dict(zip(FEATURE_NAMES, feats_w[0]))
    assert f_o["O"] == 1.0
    assert f_o["donor"] == 1.0 and f_o["acceptor"] == 1.0  # O-H donor
    assert f_o["ring"] == 0.0 and f_o["hydrophobic"] == 0.0


PDB_TEXT = """\
ATOM      1  P     G A   1      10.000  10.000  10.000  1.00  0.00           P
ATOM      2  C1'   G A   1      11.400  10.000  10.000  1.00  0.00           C
ATOM      3  N9    G A   1      12.100  11.200  10.000  1.00  0.00           N
ATOM      4  O2'   G A   1      10.700   8.800  10.000  1.00  0.00           O
ATOM      5  H1    G A   1      13.000  11.200  10.000  1.00  0.00           H
TER
rms   of this structure is 4.321
END
"""


def _feat(tmp_path, text, name="mol.mol2"):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    coords, feats = featurize_mol2(parse_mol2(str(p)))
    return coords, [dict(zip(FEATURE_NAMES, row)) for row in feats]


def test_featurizer_quaternary_ammonium(tmp_path):
    """Tetramethylammonium: 4-connected N is excluded from acceptors
    (reference SMARTS *+1 / #7v5, featurizer.py:127); its methyls stay
    non-hydrophobic (N neighbor)."""
    _, f = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        tma
        5 4 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 N1  0.000  0.000  0.000 N.4 1 TMA  0.30
          2 C1  1.500  0.000  0.000 C.3 1 TMA -0.10
          3 C2 -1.500  0.000  0.000 C.3 1 TMA -0.10
          4 C3  0.000  1.500  0.000 C.3 1 TMA -0.10
          5 C4  0.000 -1.500  0.000 C.3 1 TMA -0.10
        @<TRIPOS>BOND
          1 1 2 1
          2 1 3 1
          3 1 4 1
          4 1 5 1
        """)
    f_n = f[0]
    assert f_n["N"] == 1.0
    assert f_n["acceptor"] == 0.0 and f_n["donor"] == 0.0
    assert f_n["hyb"] == 3.0 and f_n["heavydegree"] == 4.0
    for fc in f[1:]:
        assert fc["hydrophobic"] == 0.0  # bonded to N


def test_featurizer_carboxylate(tmp_path):
    """Acetate: carboxylate oxygens are acceptors, never donors; the
    carboxyl carbon loses hydrophobicity (O neighbors), the methyl keeps
    it."""
    _, f = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        acetate
        4 3 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 C1  0.000  0.000  0.000 C.3   1 ACT -0.20
          2 C2  1.520  0.000  0.000 C.2   1 ACT  0.40
          3 O1  2.150  1.100  0.000 O.co2 1 ACT -0.60
          4 O2  2.150 -1.100  0.000 O.co2 1 ACT -0.60
        @<TRIPOS>BOND
          1 1 2 1
          2 2 3 2
          3 2 4 1
        """)
    f_me, f_c, f_o1, f_o2 = f
    assert f_me["hydrophobic"] == 1.0
    assert f_c["hydrophobic"] == 0.0
    for fo in (f_o1, f_o2):
        assert fo["O"] == 1.0
        assert fo["acceptor"] == 1.0 and fo["donor"] == 0.0
        assert fo["hyb"] == 2.0  # O.co2


def test_featurizer_sulfoxide_and_sulfone(tmp_path):
    """S(IV)/S(VI): DMSO and dimethylsulfone sulfur are excluded from
    acceptors (#16v4/#16v6); their S is sp3 (tetrahedral electron domains)
    so the S^3 hydrophobic alternative fires, like OpenBabel."""
    _, f = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        dmso_and_sulfone
        9 7 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 S1  0.000  0.000  0.000 S.O  1 DMS  0.30
          2 C1  1.800  0.000  0.000 C.3  1 DMS -0.10
          3 C2 -1.800  0.000  0.000 C.3  1 DMS -0.10
          4 O1  0.000  1.500  0.000 O.2  1 DMS -0.50
          5 S2 10.000  0.000  0.000 S.O2 1 SFN  0.50
          6 C3 11.800  0.000  0.000 C.3  1 SFN -0.10
          7 C4  8.200  0.000  0.000 C.3  1 SFN -0.10
          8 O2 10.000  1.500  0.000 O.2  1 SFN -0.50
          9 O3 10.000 -1.500  0.000 O.2  1 SFN -0.50
        @<TRIPOS>BOND
          1 1 2 1
          2 1 3 1
          3 1 4 2
          4 5 6 1
          5 5 7 1
          6 5 8 2
          7 5 9 2
        """)
    f_s1, _, _, f_o1, f_s2 = f[0], f[1], f[2], f[3], f[4]
    for fs in (f_s1, f_s2):
        assert fs["S"] == 1.0
        assert fs["acceptor"] == 0.0  # S(IV)/S(VI) excluded
        assert fs["hyb"] == 3.0  # tetrahedral
        assert fs["hydrophobic"] == 1.0  # S^3 alternative
    assert f_o1["acceptor"] == 1.0  # sulfinyl O stays an acceptor


def test_featurizer_nitro_nitrogen_excluded(tmp_path):
    """Nitromethane: nitro N has only 3 connections but valence 5 (two
    double bonds) — the bond-order valence accounting must exclude it from
    acceptors like OpenBabel's #7v5."""
    _, f = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        nitromethane
        4 3 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 C1  0.000  0.000  0.000 C.3  1 NME -0.10
          2 N1  1.500  0.000  0.000 N.2  1 NME  0.60
          3 O1  2.150  1.100  0.000 O.2  1 NME -0.40
          4 O2  2.150 -1.100  0.000 O.2  1 NME -0.40
        @<TRIPOS>BOND
          1 1 2 1
          2 2 3 2
          3 2 4 2
        """)
    f_c, f_n, f_o1, f_o2 = f
    assert f_n["acceptor"] == 0.0  # valence-5 N excluded
    assert f_n["donor"] == 0.0
    assert f_o1["acceptor"] == 1.0 and f_o2["acceptor"] == 1.0
    assert f_c["hydrophobic"] == 0.0  # bonded to N


def test_featurizer_halogen_on_aromatic_and_metal(tmp_path):
    """Chlorobenzene + a bare zinc: neutral Cl is hydrophobic, never an
    acceptor, not aromatic/ring itself; Zn maps to the metal one-hot class
    (acceptor under the documented neutral-formal-charge approximation)."""
    _, f = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        clbz_zn
        8 7 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 C1  0.000  1.396  0.000 C.ar 1 CLB -0.06
          2 C2  1.209  0.698  0.000 C.ar 1 CLB -0.06
          3 C3  1.209 -0.698  0.000 C.ar 1 CLB -0.06
          4 C4  0.000 -1.396  0.000 C.ar 1 CLB -0.06
          5 C5 -1.209 -0.698  0.000 C.ar 1 CLB -0.06
          6 C6 -1.209  0.698  0.000 C.ar 1 CLB  0.10
          7 Cl1 -2.500  1.500  0.000 Cl   1 CLB -0.15
          8 Zn1 10.000  0.000  0.000 Zn   1 ZN2  0.80
        @<TRIPOS>BOND
          1 1 2 ar
          2 2 3 ar
          3 3 4 ar
          4 4 5 ar
          5 5 6 ar
          6 6 1 ar
          7 6 7 1
        """)
    f_cl, f_zn = f[6], f[7]
    assert f_cl["halogen"] == 1.0
    assert f_cl["hydrophobic"] == 1.0
    assert f_cl["acceptor"] == 0.0
    assert f_cl["aromatic"] == 0.0 and f_cl["ring"] == 0.0
    assert f_zn["metal"] == 1.0
    assert f_zn["hydrophobic"] == 0.0 and f_zn["donor"] == 0.0
    assert f_zn["acceptor"] == 1.0  # documented neutral-charge approximation
    # Ring carbons keep aromatic+ring; the Cl-bearing carbon stays
    # hydrophobic (Cl is not N/O/F).
    assert f[5]["aromatic"] == 1.0 and f[5]["ring"] == 1.0
    assert f[5]["hydrophobic"] == 1.0


def test_featurizer_implicit_hydrogen_model(tmp_path):
    """The typical-valence implicit-H complement (OpenBabel's model):
    under-protonated files perceive like protonated ones, while ions and
    fully-bonded atoms gain nothing."""
    # Thiol written without its S-H: the implicit H defeats the H0 term of
    # the donor pattern's first alternative !$([#6,H0,-,-2,-3]), exactly
    # as OpenBabel's perception would (S^3 keeps it hydrophobic either
    # way).
    _, f = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        bare_thiol
        2 1 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 C1  0.000  0.000  0.000 C.3 1 THL  0.00
          2 S1  1.800  0.000  0.000 S.3 1 THL -0.20
        @<TRIPOS>BOND
          1 1 2 1
        """, name="thiol.mol2")
    assert f[1]["donor"] == 1.0  # 1 implicit H -> not H0
    assert f[1]["hydrophobic"] == 1.0  # S^3 alternative, H-independent
    # Saturated control: divalent S.3 gets no implicit H and stays H0.
    _, f2 = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        thioether
        3 2 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 C1  0.000  0.000  0.000 C.3 1 THE  0.00
          2 S1  1.800  0.000  0.000 S.3 1 THE -0.20
          3 C2  3.600  0.000  0.000 C.3 1 THE  0.00
        @<TRIPOS>BOND
          1 1 2 1
          2 2 3 1
        """, name="thioether.mol2")
    assert f2[1]["donor"] == 0.0  # H0: no implicit H on divalent S.3
    assert f2[1]["hydrophobic"] == 1.0
    # Isolated atoms are ions, not hydrides: bare F gains no implicit H so
    # the !H0 donor alternative cannot fire (registry: uncertain vs OB).
    _, f3 = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        fluoride
        1 0 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 F1  0.000  0.000  0.000 F 1 FLU -0.90
        """, name="fluoride.mol2")
    assert f3[0]["donor"] == 0.0


def test_featurizer_n4_type_formal_charge(tmp_path):
    """SYBYL N.4 is +1 by definition: even an under-protonated ammonium
    (3 heavy bonds, no H in the file) hits the *+1 acceptor exclusion, and
    the implicit H the charge-adjusted valence ladder adds makes it a
    donor — both matching OpenBabel."""
    _, f = _feat(tmp_path, """\
        @<TRIPOS>MOLECULE
        n4_unprot
        4 3 1
        SMALL
        GASTEIGER
        @<TRIPOS>ATOM
          1 N1  0.000  0.000  0.000 N.4 1 AMM  0.30
          2 C1  1.500  0.000  0.000 C.3 1 AMM -0.10
          3 C2 -1.500  0.000  0.000 C.3 1 AMM -0.10
          4 C3  0.000  1.500  0.000 C.3 1 AMM -0.10
        @<TRIPOS>BOND
          1 1 2 1
          2 1 3 1
          3 1 4 1
        """)
    assert f[0]["acceptor"] == 0.0  # *+1 exclusion via the N.4 type
    assert f[0]["donor"] == 1.0  # one implicit H fills the +1 ladder (4)


def test_parse_pdb_and_rms(tmp_path):
    p = tmp_path / "cand.pdb"
    p.write_text(PDB_TEXT)
    elems, coords = parse_pdb_atoms(str(p))
    assert elems == ["P", "C", "N", "O", "H"]
    assert coords.shape == (5, 3)
    assert parse_rms_label(str(p)) == pytest.approx(4.321)


def test_preprocess_rna_pipeline(tmp_path, rng):
    import subprocess
    import sys

    src = tmp_path / "data" / "RNA-Puzzles" / "classics_train_val"
    for split in ("example_train", "example_val"):
        os.makedirs(src / split)
        for i in range(2):
            (src / split / f"cand{i}.pdb").write_text(PDB_TEXT)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "preprocess_rna_puzzles.py"),
         "--data_dir", str(src),
         "--save_dir", str(tmp_path / "data" / "RNA-Puzzles")],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PYTHONPATH": repo},
    )
    assert r.returncode == 0, r.stderr[-1500:]
    from pamnet_tpu.data.tu import TUDataset

    ds = TUDataset(str(tmp_path / "data" / "RNA-Puzzles"), "train")
    assert len(ds) == 2
    mol = ds[0]
    # C/N/O only (P and H dropped), labels mapped to {0,1,2}.
    assert mol["z"].tolist() == [0, 1, 2]
    assert mol["y"] == pytest.approx(4.321, abs=1e-3)


def test_pdbbind_full_chain(tmp_path, rng):
    """Raw PDBbind layout -> preprocess_pdbbind.py -> TU files ->
    main_pdbbind.py one epoch (the complete C15 + C18 pipeline)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = tmp_path / "data" / "PDBbind"
    for split, names in (("refined-set", ["1abc", "2xyz", "3pqr"]),
                         ("core-set", ["3pqr"])):
        for name in names:
            d = data_dir / split / name
            os.makedirs(d, exist_ok=True)
            (d / f"{name}_ligand.mol2").write_text(ETHANOLAMINE_MOL2)
            (d / f"{name}_pocket.mol2").write_text(BENZENE_MOL2)
    os.makedirs(data_dir / "refined-set" / "index", exist_ok=True)
    (data_dir / "refined-set" / "index" / "INDEX_refined_data.2016").write_text(
        "# header\n"
        "1abc  2.00  2016  6.42  Kd=380nM  // ref\n"
        "2xyz  1.80  2016  5.11  Ki=7.7uM  // ref\n"
        "3pqr  2.20  2016  4.50  Kd=32uM   // ref\n"
    )
    env = {**os.environ, "PYTHONPATH": repo}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "preprocess_pdbbind.py"),
         "--data_dir", str(data_dir)],
        capture_output=True, text=True, timeout=200, env=env,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    # core-set -> test; refined minus core -> train_val (reference :185-188).
    from pamnet_tpu.data.tu import TUDataset

    train_val = TUDataset(str(data_dir), "train_val")
    test = TUDataset(str(data_dir), "test")
    assert len(train_val) == 2 and len(test) == 1
    mol = test[0]
    assert mol["feat"].shape[1] == 18
    assert mol["y"] == pytest.approx(4.50, abs=1e-2)

    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "main_pdbbind.py"),
         "--platform", "cpu", "--epochs", "1", "--dim", "8", "--n_layer", "1",
         "--batch_size", "2", "--data_root", str(data_dir)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r2.returncode == 0, r2.stderr[-1500:]
    assert "Testing RMSE" in r2.stdout


def test_pdbbind_build_complex(tmp_path):
    from preprocess_pdbbind import build_complex  # repo root import

    lig = tmp_path / "x_ligand.mol2"
    lig.write_text(ETHANOLAMINE_MOL2)
    pock = tmp_path / "x_pocket.mol2"
    pock.write_text(BENZENE_MOL2)
    pos, feat = build_complex(str(lig), str(pock), cutoff=6.0)
    # complex(6+3) + pocket(6) + ligand(3) nodes
    assert pos.shape == (18, 3) and feat.shape == (18, 18)
    # Shifted subgraphs sit past x=40 (DeltaE sign mask, models.py:122-125).
    assert (pos[9:15, 0] > 40).all() and (pos[15:, 0] > 40).all()
    assert (pos[:9, 0] < 40).all()


def test_featurizer_uppercase_sybyl_case_insensitive(tmp_path):
    """SYBYL writers emit case variants ("C.AR", bond order "AR"); perception
    must match the lowercase forms exactly (OpenBabel's typer is
    case-insensitive)."""
    p = tmp_path / "bnz_upper.mol2"
    p.write_text(BENZENE_MOL2.replace("C.ar", "C.AR").replace(" ar\n", " AR\n"))
    q = tmp_path / "bnz_lower.mol2"
    q.write_text(BENZENE_MOL2)
    coords_u, feats_u = featurize_mol2(parse_mol2(str(p)))
    coords_l, feats_l = featurize_mol2(parse_mol2(str(q)))
    np.testing.assert_array_equal(feats_u, feats_l)
    f = dict(zip(FEATURE_NAMES, feats_u[0]))
    assert f["aromatic"] == 1.0 and f["hyb"] == 2.0
