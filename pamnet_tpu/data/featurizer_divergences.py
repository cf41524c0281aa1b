"""Machine-checkable registry of expected agreements/divergences between
the first-party mol2 featurizer (pamnet_tpu/data/featurizer.py) and the
reference's OpenBabel-based one (reference: utils/featurizer.py:57-131).

The featurizer docstring documents its perception model in prose; this
module turns each historically-divergent case into a *specified fixture*: a
minimal mol2, the heavy-atom index + feature column it affects, the value
OUR featurizer provably emits (locked by
tests/test_featurizer_divergences.py), and the value OpenBabel is expected
to emit, with a confidence tag.

Two lists:

* ``EXPECTED_DIVERGENCES`` — cases where our perception still differs from
  expected OpenBabel behavior (``ours != openbabel``).
* ``VERIFIED_MATCHES`` — cases that *used to* diverge until the perception
  layer closed them (round 3: SYBYL ``N.4`` formal charge, the
  typical-valence implicit-hydrogen model, ``C.cat`` sp2, bond-order
  hybridization for suffix-less organics).  Kept as fixtures so (a) the
  matched behavior can never silently regress and (b) the OpenBabel side
  of the claim stays checkable (``ours == openbabel``).

Consumers:
  * tests/test_featurizer_divergences.py asserts the ``ours`` column on
    every entry in BOTH lists, so the registry can never drift from the
    implementation.
  * tools/compare_openbabel.py --check-divergences runs BOTH featurizers on
    these fixtures wherever pybel is available and verifies the
    ``openbabel`` column, resolving the "likely"/"uncertain" entries into
    golden rows.

Confidence semantics:
  certain   — follows directly from OpenBabel's documented semantics.
  likely    — depends on OpenBabel perception details (formal charges from
              SYBYL types, HYB-table coverage) that match common behavior
              but are unverified in this environment (no OpenBabel,
              DEVNOTES.md).
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
        name="isolated-anion-implicit-h",
        mol2="""\
@<TRIPOS>MOLECULE
fluoride_ion
1 0 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 F1  0.000  0.000  0.000 F 1 FLU -0.90
""",
        atom=0,
        feature="donor",
        ours=0.0,
        openbabel=1.0,
        confidence="likely",
        reason=(
            "Isolated halogen atom: our implicit-H model treats "
            "zero-connectivity atoms as ions (a bare F is fluoride, not "
            "HF), so the !H0 donor alternative never fires.  OpenBabel 3's "
            "mol2 reader fills implicit hydrogens from the typical-valence "
            "table after bonds are read (mol2format.cpp ends by assigning "
            "each atom SetImplicitHCount(typical valence - bond-order "
            "sum); the charge column is a PARTIAL charge and never enters "
            "the valence model), with no special case for zero-degree "
            "atoms — so a lone neutral F gets 1 implicit H and matches "
            "donor via [!H0;#9].  Deliberate divergence: a bare halogen "
            "row in a pocket mol2 is chemically a halide ion, and calling "
            "it an H-bond DONOR inverts its pharmacophore role; we keep "
            "the ion reading.  'likely' (upgraded round 5 from uncertain): "
            "follows from the typical-valence fill path; pybel is not "
            "runnable here for the end-to-end bit — tools/"
            "compare_openbabel.py --check-divergences resolves it."
        ),
    ),
]


# Historically-divergent fixtures closed by the perception layer (round 3:
# N.4 formal charge, implicit-H model, C.cat, bond-order hybridization;
# round 4: Hueckel aromaticity for Kekule-written files): ours == openbabel
# on every entry (asserted by the tests), so a perception regression reopens
# them loudly.
VERIFIED_MATCHES: list[Divergence] = [
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
        openbabel=1.0,
        confidence="likely",
        reason=(
            "Bare Zn ion matches the acceptor COMPLEMENT pattern "
            "(utils/featurizer.py:127: every atom not in the listed "
            "exclusion set) in both featurizers.  Resolved round 5 by "
            "OpenBabel's formal-charge source: its mol2 reader assigns "
            "formal charges only from SYBYL atom types (mol2format.cpp "
            "special-cases N.4 -> +1 and the O.co2 pair; the per-atom "
            "charge column is a PARTIAL charge, stored via "
            "SetPartialCharge and never converted to a formal charge), so "
            "a bare 'Zn' row keeps formal charge 0 and the pattern's "
            "*+1/*+2/*+3 exclusions never fire — OpenBabel also emits "
            "acceptor=1.  Was registered as an uncertain divergence "
            "(openbabel=0.0) in rounds 3-4.  'likely': pybel is not "
            "runnable here for the end-to-end bit."
        ),
    ),
    Divergence(
        name="carbon-free-saturated-ring-not-aromatic",
        # Pentazolidine: cyclo-N5, all single bonds, N.3 types.  Under a
        # bare lone-pair-counting model every N contributes 2 pi ->
        # 5*2 = 10 = 4n+2 and the ring would falsely perceive aromatic
        # (ADVICE r4); the perception now requires at least one in-system
        # double/ar bond before any ring/envelope can qualify.
        mol2="""\
@<TRIPOS>MOLECULE
pentazolidine
5 5 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 N1  0.000  0.000  0.000 N.3 1 PNZ 0.00
  2 N2  0.951  0.309  0.000 N.3 1 PNZ 0.00
  3 N3  1.538 -0.500  0.000 N.3 1 PNZ 0.00
  4 N4  0.951 -1.309  0.000 N.3 1 PNZ 0.00
  5 N5  0.000 -1.000  0.000 N.3 1 PNZ 0.00
@<TRIPOS>BOND
  1 1 2 1
  2 2 3 1
  3 3 4 1
  4 4 5 1
  5 5 1 1
""",
        atom=0,
        feature="aromatic",
        ours=0.0,
        openbabel=0.0,
        confidence="uncertain",
        reason=(
            "A fully saturated carbon-free heterocycle must not perceive "
            "aromatic: lone pairs alone are no conjugation (our rule since "
            "round 5: a qualifying ring/envelope needs >= 1 in-system "
            "double/ar bond).  OpenBabel's model assigns lone-pair pi "
            "contributions to divalent/trivalent heteroatoms "
            "pyrrole-style, so whether its cycle traversal also demands "
            "sp2 evidence decides its answer; if OpenBabel marks cyclo-N5 "
            "aromatic that is an electron-counting false positive we "
            "deliberately do not reproduce.  The harness resolves it "
            "wherever pybel exists."
        ),
    ),
    Divergence(
        name="azulene-plus-4n-ring-sub-envelope",
        # Kekule azulene (atoms 1-10, the usual matching) with a CAPABLE
        # but 4-pi five-ring fused onto the 7=8 double bond: atoms 11/12
        # (C.2, 11=12 double) and 13 (carbonyl C, exocyclic =O14).  Ring B
        # {7,8,11,12,13} counts 1+1+1+1+0 = 4 -> fails per-ring but every
        # atom is capable, so it joins the envelope union, dragging the
        # maximal system to 10+2 = 12 pi -> 4n -> the envelope pass fails
        # and the 10-pi azulene SUB-envelope is never retested.
        mol2="""\
@<TRIPOS>MOLECULE
azulene_plus_4n_ring
14 16 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  0.000  0.000 C.2 1 AZU 0.00
  2 C2  1.000  0.500  0.000 C.2 1 AZU 0.00
  3 C3  2.000  0.000  0.000 C.2 1 AZU 0.00
  4 C4  2.000 -1.000  0.000 C.2 1 AZU 0.00
  5 C5  1.000 -1.500  0.000 C.2 1 AZU 0.00
  6 C6  1.000 -2.500  0.000 C.2 1 AZU 0.00
  7 C7  0.200 -3.300  0.000 C.2 1 AZU 0.00
  8 C8 -0.800 -3.300  0.000 C.2 1 AZU 0.00
  9 C9 -1.600 -2.500  0.000 C.2 1 AZU 0.00
 10 C10 -1.000 -1.000  0.000 C.2 1 AZU 0.00
 11 C11  0.600 -4.500  0.000 C.2 1 AZU 0.00
 12 C12 -0.400 -5.200  0.000 C.2 1 AZU 0.00
 13 C13 -1.400 -4.500  0.000 C.2 1 AZU 0.00
 14 O1  -2.600 -4.800  0.000 O.2 1 AZU 0.00
@<TRIPOS>BOND
  1 1 2 2
  2 2 3 1
  3 3 4 2
  4 4 5 1
  5 5 1 1
  6 5 6 2
  7 6 7 1
  8 7 8 2
  9 8 9 1
 10 9 10 2
 11 10 1 1
 12 7 11 1
 13 11 12 2
 14 12 13 1
 15 13 8 1
 16 13 14 2
""",
        atom=2,  # a3: pure-5-ring azulene carbon, aromatic only via the
        # 10-pi sub-envelope
        feature="aromatic",
        ours=1.0,
        openbabel=1.0,
        confidence="likely",
        reason=(
            "CLOSED round 5: a failing maximal union now recurses into its "
            "sub-systems (remove one ring, re-split into edge-connected "
            "components), so the 12-pi (4n) three-ring union fails but the "
            "10-pi azulene subsystem is retested and marked.  This mirrors "
            "OpenBabel 3's actual algorithm (src/typer.cpp, "
            "OBAromaticTyper): after per-atom pi-contribution assignment "
            "it traverses CYCLES from root atoms and tests 4n+2 per "
            "traversed cycle — the 10-atom azulene perimeter is a cycle of "
            "its own and is tested regardless of the fused 4n ring, so "
            "OpenBabel marks it aromatic.  'likely' only because pybel is "
            "not runnable on this host to confirm the end-to-end bit."
        ),
    ),
    Divergence(
        name="azulene-fused-saturated-ring",
        # Kekule azulene (atoms 1-10, same matching as the azulene fixture
        # below) with a saturated cyclopentane fused onto the 6-7 single
        # bond of the 7-ring (atoms 11-13, C.3).  The sp3 ring is excluded
        # from the envelope union (it fails the per-atom checks), so the
        # 10-pi azulene system still marks all 10 carbons — a disqualified
        # fused ring must not kill its capable neighbors' envelope.
        mol2="""\
@<TRIPOS>MOLECULE
dihydrocyclopenta_azulene
13 15 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  0.000  0.000 C.2 1 AZU 0.00
  2 C2  1.000  0.500  0.000 C.2 1 AZU 0.00
  3 C3  2.000  0.000  0.000 C.2 1 AZU 0.00
  4 C4  2.000 -1.000  0.000 C.2 1 AZU 0.00
  5 C5  1.000 -1.500  0.000 C.2 1 AZU 0.00
  6 C6  1.000 -2.500  0.000 C.2 1 AZU 0.00
  7 C7  0.200 -3.300  0.000 C.2 1 AZU 0.00
  8 C8 -0.800 -3.300  0.000 C.2 1 AZU 0.00
  9 C9 -1.600 -2.500  0.000 C.2 1 AZU 0.00
 10 C10 -1.000 -1.000  0.000 C.2 1 AZU 0.00
 11 C11  2.000 -3.000  0.000 C.3 1 AZU 0.00
 12 C12  1.800 -4.300  0.000 C.3 1 AZU 0.00
 13 C13  0.600 -4.500  0.000 C.3 1 AZU 0.00
@<TRIPOS>BOND
  1 1 2 2
  2 2 3 1
  3 3 4 2
  4 4 5 1
  5 5 1 1
  6 5 6 2
  7 6 7 1
  8 7 8 2
  9 8 9 1
 10 9 10 2
 11 10 1 1
 12 6 11 1
 13 11 12 1
 14 12 13 1
 15 13 7 1
""",
        atom=2,  # a3: lies only on the 5-ring — needs the envelope pass
        feature="aromatic",
        ours=1.0,
        openbabel=1.0,
        confidence="likely",
        reason=(
            "Azulene with a saturated cyclopentane fused onto its 7-ring: "
            "the sp3 ring fails the per-atom capability checks and is "
            "excluded from the envelope union, so the fused 10-pi azulene "
            "system still passes 4n+2 and all 10 azulene carbons mark "
            "aromatic (regression guard: an earlier envelope pass tested "
            "only the MAXIMAL union, which the sp3 atoms disqualified, "
            "silently un-marking the pure-5-ring carbons)."
        ),
    ),
    Divergence(
        name="pentalene-envelope-not-aromatic",
        # Kekule pentalene: two fused 5-rings (fusion atoms 4/8, 1-based),
        # perfect matching 1=2, 3=4, 5=6, 7=8.  The fused envelope counts
        # 8 pi -> 4n, NOT 4n+2: the envelope pass must not fire (guards the
        # azulene fix against over-marking antiaromatic fused systems).
        mol2="""\
@<TRIPOS>MOLECULE
pentalene_kekule
8 9 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  0.000  0.000 C.2 1 PEN 0.00
  2 C2  1.000  0.700  0.000 C.2 1 PEN 0.00
  3 C3  2.000  0.000  0.000 C.2 1 PEN 0.00
  4 C4  1.600 -1.000  0.000 C.2 1 PEN 0.00
  5 C5  2.300 -2.000  0.000 C.2 1 PEN 0.00
  6 C6  1.600 -3.000  0.000 C.2 1 PEN 0.00
  7 C7  0.400 -2.700  0.000 C.2 1 PEN 0.00
  8 C8  0.300 -1.300  0.000 C.2 1 PEN 0.00
@<TRIPOS>BOND
  1 1 2 2
  2 2 3 1
  3 3 4 2
  4 4 8 1
  5 8 1 1
  6 4 5 1
  7 5 6 2
  8 6 7 1
  9 7 8 2
""",
        atom=0,
        feature="aromatic",
        ours=0.0,
        openbabel=0.0,
        confidence="certain",
        reason=(
            "Pentalene (8 pi over the fused envelope, and 4 pi per ring) "
            "is the canonical 4n antiaromatic bicyclic: neither the "
            "per-ring pass nor the fused-envelope pass may mark it."
        ),
    ),
    Divergence(
        name="azulene-envelope-aromaticity",
        # Kekule azulene (no aromatic marks): fused 5/7 bicyclic with the
        # perfect matching a1=a2, a3=a4, a5=b1, b2=b3, b4=b5 (fusion atoms
        # a1/a5 = atoms 1 and 5, 1-based).  Coordinates are placeholders
        # (perception is graph-only).
        mol2="""\
@<TRIPOS>MOLECULE
azulene_kekule
10 11 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  0.000  0.000 C.2 1 AZU 0.00
  2 C2  1.000  0.500  0.000 C.2 1 AZU 0.00
  3 C3  2.000  0.000  0.000 C.2 1 AZU 0.00
  4 C4  2.000 -1.000  0.000 C.2 1 AZU 0.00
  5 C5  1.000 -1.500  0.000 C.2 1 AZU 0.00
  6 C6  1.000 -2.500  0.000 C.2 1 AZU 0.00
  7 C7  0.200 -3.300  0.000 C.2 1 AZU 0.00
  8 C8 -0.800 -3.300  0.000 C.2 1 AZU 0.00
  9 C9 -1.600 -2.500  0.000 C.2 1 AZU 0.00
 10 C10 -1.000 -1.000  0.000 C.2 1 AZU 0.00
@<TRIPOS>BOND
  1 1 2 2
  2 2 3 1
  3 3 4 2
  4 4 5 1
  5 5 1 1
  6 5 6 2
  7 6 7 1
  8 7 8 2
  9 8 9 1
 10 9 10 2
 11 10 1 1
""",
        atom=2,  # a3: lies only on the 5-ring, which fails per-ring Hueckel
        feature="aromatic",
        ours=1.0,
        openbabel=1.0,
        confidence="likely",
        reason=(
            "Azulene written Kekule: aromaticity is an ENVELOPE property "
            "of the fused 10-pi system — each individual ring fails 4n+2 "
            "(the 5-ring counts 4 with the a5=b1 double exocyclic to it). "
            "Round 4's fused-envelope pass (union of edge-sharing base "
            "cycles, same per-atom pi model) counts 10 pi over the system "
            "and marks all 10 carbons, matching OpenBabel's fused-system "
            "model.  Atom index 2 (pure-5-ring) is the one that needed "
            "the envelope pass."
        ),
    ),
    Divergence(
        name="kekule-benzene-aromatic",
        mol2="""\
@<TRIPOS>MOLECULE
benzene_kekule
6 6 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  1.396  0.000 C.2 1 BNZ -0.06
  2 C2  1.209  0.698  0.000 C.2 1 BNZ -0.06
  3 C3  1.209 -0.698  0.000 C.2 1 BNZ -0.06
  4 C4  0.000 -1.396  0.000 C.2 1 BNZ -0.06
  5 C5 -1.209 -0.698  0.000 C.2 1 BNZ -0.06
  6 C6 -1.209  0.698  0.000 C.2 1 BNZ -0.06
@<TRIPOS>BOND
  1 1 2 2
  2 2 3 1
  3 3 4 2
  4 4 5 1
  5 5 6 2
  6 6 1 1
""",
        atom=0,
        feature="aromatic",
        ours=1.0,
        openbabel=1.0,
        confidence="certain",
        reason=(
            "Benzene written Kekule (C.2 types, alternating 1/2 bonds, no "
            ".ar marks anywhere): OpenBabel re-perceives aromaticity on "
            "read, so the [a] flag fires; the Hueckel perception layer "
            "(6 pi over a 6-ring) now matches.  Closed round 4 (was "
            "ours=0.0: the featurizer trusted file markings only)."
        ),
    ),
    Divergence(
        name="kekule-pyridine-n-aromatic",
        mol2="""\
@<TRIPOS>MOLECULE
pyridine_kekule
6 6 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 N1  0.000  1.338  0.000 N.2 1 PYR -0.30
  2 C1  1.193  0.720  0.000 C.2 1 PYR  0.05
  3 C2  1.193 -0.672  0.000 C.2 1 PYR -0.06
  4 C3  0.000 -1.381  0.000 C.2 1 PYR -0.06
  5 C4 -1.193 -0.672  0.000 C.2 1 PYR -0.06
  6 C5 -1.193  0.720  0.000 C.2 1 PYR  0.05
@<TRIPOS>BOND
  1 1 2 2
  2 2 3 1
  3 3 4 2
  4 4 5 1
  5 5 6 2
  6 6 1 1
""",
        atom=0,
        feature="aromatic",
        ours=1.0,
        openbabel=1.0,
        confidence="certain",
        reason=(
            "Pyridine written Kekule: ring N contributes 1 pi electron via "
            "its in-ring double bond; 6 pi total -> aromatic, like "
            "OpenBabel's re-perception.  Closed round 4."
        ),
    ),
    Divergence(
        name="thiophene-unmarked-aromatic",
        mol2="""\
@<TRIPOS>MOLECULE
thiophene_kekule
5 5 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 S1  0.000  1.189  0.000 S.3 1 THI -0.10
  2 C1  1.235  0.123  0.000 C.2 1 THI -0.10
  3 C2  0.709 -1.150  0.000 C.2 1 THI -0.08
  4 C3 -0.709 -1.150  0.000 C.2 1 THI -0.08
  5 C4 -1.235  0.123  0.000 C.2 1 THI -0.10
@<TRIPOS>BOND
  1 1 2 1
  2 2 3 2
  3 3 4 1
  4 4 5 2
  5 5 1 1
""",
        atom=0,
        feature="aromatic",
        ours=1.0,
        openbabel=1.0,
        confidence="likely",
        reason=(
            "Thiophene written Kekule with divalent S typed S.3: the S "
            "lone pair contributes 2 pi electrons (2 + 2x2 = 6 -> "
            "aromatic), matching OpenBabel's heteroatom lone-pair model. "
            "Closed round 4."
        ),
    ),
    Divergence(
        name="cyclohexane-not-aromatic",
        mol2="""\
@<TRIPOS>MOLECULE
cyclohexane
6 6 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  1.250  0.722  0.000 C.3 1 CHX -0.06
  2 C2  1.250 -0.722  0.000 C.3 1 CHX -0.06
  3 C3  0.000 -1.444  0.000 C.3 1 CHX -0.06
  4 C4 -1.250 -0.722  0.000 C.3 1 CHX -0.06
  5 C5 -1.250  0.722  0.000 C.3 1 CHX -0.06
  6 C6  0.000  1.444  0.000 C.3 1 CHX -0.06
@<TRIPOS>BOND
  1 1 2 1
  2 2 3 1
  3 3 4 1
  4 4 5 1
  5 5 6 1
  6 6 1 1
""",
        atom=0,
        feature="aromatic",
        ours=0.0,
        openbabel=0.0,
        confidence="certain",
        reason=(
            "Saturated ring: every carbon has only single bonds, so the "
            "Hueckel perception must NOT fire (guards against "
            "over-marking; the ring flag [r] is still 1 via _ring_atoms)."
        ),
    ),
    Divergence(
        name="quinone-not-aromatic",
        mol2="""\
@<TRIPOS>MOLECULE
benzoquinone_core
8 8 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  0.000  1.400  0.000 C.2 1 QUI  0.20
  2 C2  1.210  0.700  0.000 C.2 1 QUI -0.08
  3 C3  1.210 -0.700  0.000 C.2 1 QUI -0.08
  4 C4  0.000 -1.400  0.000 C.2 1 QUI  0.20
  5 C5 -1.210 -0.700  0.000 C.2 1 QUI -0.08
  6 C6 -1.210  0.700  0.000 C.2 1 QUI -0.08
  7 O1  0.000  2.620  0.000 O.2 1 QUI -0.30
  8 O2  0.000 -2.620  0.000 O.2 1 QUI -0.30
@<TRIPOS>BOND
  1 1 2 1
  2 2 3 2
  3 3 4 1
  4 4 5 1
  5 5 6 2
  6 6 1 1
  7 1 7 2
  8 4 8 2
""",
        atom=0,
        feature="aromatic",
        ours=0.0,
        openbabel=0.0,
        confidence="certain",
        reason=(
            "1,4-benzoquinone: the two carbonyl carbons are sp2 but their "
            "exocyclic C=O contributes 0 ring electrons -> 4 pi -> NOT "
            "aromatic, exactly the 4n+2 failure OpenBabel also perceives."
        ),
    ),
    Divergence(
        name="sulfone-ring-not-aromatic",
        mol2="""\
@<TRIPOS>MOLECULE
thiophene_dioxide
7 7 1
SMALL
GASTEIGER
@<TRIPOS>ATOM
  1 C1  1.250  0.800  0.000 C.2  1 TDO -0.10
  2 C2  1.250 -0.800  0.000 C.2  1 TDO -0.10
  3 S1  0.000  0.000  0.500 S.O2 1 TDO  0.40
  4 C3 -0.450  1.320  0.000 C.2  1 TDO -0.10
  5 C4 -0.450 -1.320  0.000 C.2  1 TDO -0.10
  6 O1  0.000  1.100  1.700 O.2  1 TDO -0.30
  7 O2  0.000 -1.100  1.700 O.2  1 TDO -0.30
@<TRIPOS>BOND
  1 1 2 2
  2 2 3 1
  3 3 5 1
  4 5 4 1
  5 4 1 1
  6 3 6 2
  7 3 7 2
""",
        atom=0,
        feature="aromatic",
        ours=0.0,
        openbabel=0.0,
        confidence="certain",
        reason=(
            "Kekule thiophene-1,1-dioxide: the sulfone S carries two "
            "exocyclic doubles (cumulated), which disqualifies the ring. "
            "Regression guard for a round-4 defect where the cumulated "
            "check broke out of the ring loop WITHOUT clearing ok, so the "
            "partial pi count (2 from the C=C walked before reaching S) "
            "passed 4n+2 and falsely marked the ring aromatic."
        ),
    ),
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
        ours=0.0,
        openbabel=0.0,
        confidence="likely",
        reason=(
            "N.4 written with only 3 heavy bonds and no explicit H "
            "(under-protonated file): the SYBYL type is +1 by definition, "
            "and the perception layer now marks it so (like OpenBabel's "
            "mol2 typer), hitting the *+1 acceptor exclusion (reference "
            "featurizer.py:127). Closed round 3 (was ours=1.0)."
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
        ours=1.0,
        openbabel=1.0,
        confidence="certain",
        reason=(
            "Dimethylamine written WITHOUT its N-H hydrogen: the "
            "typical-valence implicit-H model now assigns divalent N.3 "
            "one implicit H (like OpenBabel), so the !H0 donor pattern "
            "fires (reference featurizer.py:128). Closed round 3 (was "
            "ours=0.0)."
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
        ours=2.0,
        openbabel=2.0,
        confidence="certain",
        reason=(
            "Guanidinium carbon typed C.cat: the suffix table now maps "
            "'cat' to sp2 (OpenBabel perceives the planar cation as sp2). "
            "Closed round 3 (was ours=3.0 via the exotic-suffix default)."
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
        ours=3.0,
        openbabel=3.0,
        confidence="likely",
        reason=(
            "Dimethylselenide Se typed bare 'Se' (no SYBYL suffix): "
            "suffix-less organics now get bond-order hybridization "
            "perception (all-single divalent Se -> sp3, like OpenBabel). "
            "Closed round 3 (was ours=0.0)."
        ),
    ),
]
