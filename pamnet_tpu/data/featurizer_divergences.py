"""Machine-checkable registry of the expected divergences between the
first-party mol2 featurizer (pamnet_tpu/data/featurizer.py) and the
reference's OpenBabel-based one (reference: utils/featurizer.py:57-131).

The featurizer docstring documents its approximations in prose; this module
turns each one into a *specified fixture*: a minimal mol2, the heavy-atom
index + feature column it affects, the value OUR featurizer provably emits
(locked by tests/test_featurizer_divergences.py), and the value OpenBabel is
expected to emit, with a confidence tag.

Consumers:
  * tests/test_featurizer_divergences.py asserts the ``ours`` column on
    every entry, so the registry can never drift from the implementation.
  * tools/compare_openbabel.py --check-divergences runs BOTH featurizers on
    these fixtures wherever pybel is available and verifies the
    ``openbabel`` column, resolving the "likely"/"uncertain" entries into
    golden rows.

Confidence semantics:
  certain   — follows directly from OpenBabel's documented semantics.
  likely    — depends on OpenBabel perception details (formal charges from
              SYBYL types) that match common behavior but are unverified in
              this environment (no OpenBabel, DEVNOTES.md).
  uncertain — the divergence may not exist; recorded so the harness checks
              it explicitly instead of it hiding in an aggregate diff.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Divergence:
    name: str
    mol2: str  # complete minimal TRIPOS mol2 text
    atom: int  # index into the HEAVY-atom feature rows
    feature: str  # column name from featurizer.FEATURE_NAMES
    ours: float  # what pamnet_tpu emits (test-locked)
    openbabel: float  # what the reference featurizer is expected to emit
    confidence: str  # certain | likely | uncertain
    reason: str


EXPECTED_DIVERGENCES: list[Divergence] = [
    Divergence(
        name="n4-unprotonated-acceptor",
        mol2="""\
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
""",
        atom=0,
        feature="acceptor",
        ours=1.0,
        openbabel=0.0,
        confidence="likely",
        reason=(
            "N.4 written with only 3 heavy bonds and no explicit H "
            "(under-protonated file): we approximate formal charge as "
            "neutral (degree 3, valence 3 -> not excluded); OpenBabel's "
            "mol2 typer marks N.4 as +1, hitting the *+1 acceptor "
            "exclusion (reference featurizer.py:127)."
        ),
    ),
    Divergence(
        name="implicit-h-donor",
        mol2="""\
@<TRIPOS>MOLECULE
dma_noh
3 2 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 N1  0.000  0.000  0.000 N.3 1 DMA -0.30
  2 C1  1.450  0.000  0.000 C.3 1 DMA  0.00
  3 C2 -1.450  0.000  0.000 C.3 1 DMA  0.00
@<TRIPOS>BOND
  1 1 2 1
  2 1 3 1
""",
        atom=0,
        feature="donor",
        ours=0.0,
        openbabel=1.0,
        confidence="certain",
        reason=(
            "Dimethylamine written WITHOUT its N-H hydrogen: our donor "
            "test counts explicit H only (valid for protonated PDBbind "
            "files, featurizer.py docstring); OpenBabel adds 1 implicit H "
            "to divalent N.3 and the !H0 donor pattern fires "
            "(reference featurizer.py:128)."
        ),
    ),
    Divergence(
        name="ccat-hybridization",
        mol2="""\
@<TRIPOS>MOLECULE
guanidinium_core
4 3 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  0.000  0.000 C.cat 1 GUA  0.60
  2 N1  1.330  0.000  0.000 N.pl3 1 GUA -0.40
  3 N2 -0.665  1.150  0.000 N.pl3 1 GUA -0.40
  4 N3 -0.665 -1.150  0.000 N.pl3 1 GUA -0.40
@<TRIPOS>BOND
  1 1 2 ar
  2 1 3 ar
  3 1 4 ar
""",
        atom=0,
        feature="hyb",
        ours=3.0,
        openbabel=2.0,
        confidence="certain",
        reason=(
            "Guanidinium carbon typed C.cat: our SYBYL-suffix table has no "
            "'cat' entry and defaults exotic suffixes to sp3 "
            "(featurizer.py::_hybridization); OpenBabel perceives the "
            "planar cation as sp2."
        ),
    ),
    Divergence(
        name="se-bare-hybridization",
        mol2="""\
@<TRIPOS>MOLECULE
selenide
3 2 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 Se1  0.000  0.000  0.000 Se  1 SEL -0.20
  2 C1   1.950  0.000  0.000 C.3 1 SEL  0.10
  3 C2  -1.950  0.000  0.000 C.3 1 SEL  0.10
@<TRIPOS>BOND
  1 1 2 1
  2 1 3 1
""",
        atom=0,
        feature="hyb",
        ours=0.0,
        openbabel=3.0,
        confidence="likely",
        reason=(
            "Dimethylselenide Se typed bare 'Se' (no SYBYL suffix): our "
            "suffix table emits 0 for suffix-less types; OpenBabel "
            "perceives divalent Se as sp3."
        ),
    ),
    Divergence(
        name="bare-metal-acceptor",
        mol2="""\
@<TRIPOS>MOLECULE
zinc_ion
1 0 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 Zn1  0.000  0.000  0.000 Zn 1 ZN2  0.80
""",
        atom=0,
        feature="acceptor",
        ours=1.0,
        openbabel=0.0,
        confidence="uncertain",
        reason=(
            "Bare Zn ion: we treat formal charge as neutral so nothing "
            "excludes it from the acceptor complement pattern; whether "
            "OpenBabel excludes it depends on its formal-charge "
            "perception for unbonded metals (*+2 exclusion). If OpenBabel "
            "also reads it as neutral, there is NO divergence and this "
            "entry's openbabel value flips to 1.0 — the harness resolves "
            "it."
        ),
    ),
]
