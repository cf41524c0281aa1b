"""Minimal PDB structure parser for the RNA-Puzzles pipeline (replaces the
RDKit dependency of the reference's preprocess_rna_puzzles.py:7-31).

Only needs element symbols + coordinates of ATOM/HETATM records, in file
order, plus the ``rms`` score line that RNA-Puzzles candidate files carry
after the first TER record (reference: preprocess_rna_puzzles.py:33-42).
"""

from __future__ import annotations

import numpy as np

_TWO_LETTER = {"CL", "BR", "NA", "MG", "ZN", "FE", "MN", "SE"}


def _element(line: str) -> str:
    elem = line[76:78].strip().upper() if len(line) >= 78 else ""
    if elem:
        return elem.capitalize()
    name = line[12:16].strip()
    stem = "".join(c for c in name if c.isalpha()).upper()
    if stem[:2] in _TWO_LETTER:
        return stem[:2].capitalize()
    return stem[:1].capitalize()


def parse_pdb_atoms(path: str):
    """(elements, coords) for all ATOM/HETATM records in file order."""
    elems, coords = [], []
    with open(path) as f:
        for line in f:
            if line.startswith(("ATOM", "HETATM")):
                elems.append(_element(line))
                coords.append(
                    (float(line[30:38]), float(line[38:46]), float(line[46:54]))
                )
    return elems, np.asarray(coords, dtype=np.float64)


def parse_rms_label(path: str) -> float:
    """RMSD label from the ``rms`` line after the first TER record
    (reference: preprocess_rna_puzzles.py:33-42)."""
    with open(path) as f:
        for line in f:
            if "TER" in line:
                break
        cont = None
        for line in f:
            cont = line.split()
            if cont and cont[0] == "rms":
                break
    if not cont or cont[0] != "rms":
        raise ValueError(f"no rms record found in {path}")
    return float(cont[-1])
