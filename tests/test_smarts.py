"""The SMARTS-subset evaluator (pamnet_tpu/data/smarts.py) must implement
the SMARTS grammar faithfully for the constructs the reference's five
featurizer patterns use (reference: utils/featurizer.py:124-131): primitive
semantics, ! & , ; precedence, recursive environments over linear chains,
and bond-kind matching — plus loud failures for unsupported constructs."""

import numpy as np
import pytest

from pamnet_tpu.data.smarts import PerceivedMol, compile_smarts


def _mol(atoms, bonds=()):
    """atoms: list of dicts with keys z, arom, fc, h, x, v, hyb, ring
    (defaults 0/False); bonds: (i, j, order) strings."""
    n = len(atoms)
    nbrs = [[] for _ in range(n)]
    for i, j, order in bonds:
        nbrs[i].append((j, order))
        nbrs[j].append((i, order))

    def arr(key, default, dtype):
        return np.array([a.get(key, default) for a in atoms], dtype=dtype)

    return PerceivedMol(
        z=arr("z", 6, np.int64),
        aromatic=arr("arom", False, bool),
        formal_charge=arr("fc", 0, np.int64),
        num_h=arr("h", 0, np.int64),
        connectivity=arr("x", 0, np.int64),
        valence=arr("v", 0, np.int64),
        hyb=arr("hyb", 0, np.int64),
        in_ring=arr("ring", False, bool),
        neighbors=nbrs,
    )


def test_primitives():
    m = _mol([
        dict(z=7, arom=True, fc=1, h=2, x=3, v=4, hyb=2, ring=True),
        dict(z=17),
    ])
    for pat, expected in [
        ("[#7]", [True, False]),
        ("[*]", [True, True]),
        ("[n]", [True, False]),      # aromatic N
        ("[N]", [False, False]),     # aliphatic N: atom 0 is aromatic
        ("[Cl]", [False, True]),
        ("[a]", [True, False]),
        ("[A]", [False, True]),
        ("[H2]", [True, False]),
        ("[X3]", [True, False]),
        ("[v4]", [True, False]),
        ("[+]", [True, False]),
        ("[+1]", [True, False]),
        ("[+2]", [False, False]),
        ("[-]", [False, False]),
        ("[^2]", [True, False]),
        ("[r]", [True, False]),
        ("[R]", [True, False]),
    ]:
        got = compile_smarts(pat).match_all(m).tolist()
        assert got == expected, pat


def test_logic_precedence():
    # '!' > '&'/adjacency > ',' > ';'
    m = _mol([
        dict(z=7, arom=True, x=3),   # aromatic n, X3
        dict(z=7, arom=True, x=2),   # aromatic n, X2
        dict(z=8, arom=False, h=1),  # aliphatic O with H
    ])
    assert compile_smarts("[nX3]").match_all(m).tolist() == [True, False, False]
    assert compile_smarts("[n,O]").match_all(m).tolist() == [True, True, True]
    # ';' binds lower than ',': (!H0) AND (n OR O)
    assert compile_smarts("[!H0;n,O]").match_all(m).tolist() == \
        [False, False, True]
    assert compile_smarts("[!n]").match_all(m).tolist() == [False, False, True]
    # explicit '&' equals adjacency
    assert compile_smarts("[n&X3]").match_all(m).tolist() == \
        compile_smarts("[nX3]").match_all(m).tolist()


def test_recursive_chain_and_bonds():
    # propane-like chain C0 - N1 = O2 with distinct bond orders
    m = _mol(
        [dict(z=6), dict(z=7), dict(z=8)],
        bonds=[(0, 1, "1"), (1, 2, "2")],
    )
    has_nof_nbr = compile_smarts("[$(*~[#7,#8,F])]")
    assert has_nof_nbr.match_all(m).tolist() == [True, True, True]
    # C has no O neighbor one bond away via '~O': only N does
    assert compile_smarts("[$(*~[#8])]").match_all(m).tolist() == \
        [False, True, False]
    # bond kinds: '=' requires the double bond
    assert compile_smarts("[$(*=[#8])]").match_all(m).tolist() == \
        [False, True, False]
    assert compile_smarts("[$(*-[#8])]").match_all(m).tolist() == \
        [False, False, False]
    # two-bond linear chain: C-N=O from the carbon end
    assert compile_smarts("[$(C~[#7]~[#8])]").match_all(m).tolist() == \
        [True, False, False]
    # aromatic bond ':' matches only 'ar' orders
    m2 = _mol([dict(z=6, arom=True), dict(z=6, arom=True)],
              bonds=[(0, 1, "ar")])
    assert compile_smarts("[$(*:[#6])]").match_all(m2).tolist() == [True, True]
    assert compile_smarts("[$(*-[#6])]").match_all(m2).tolist() == \
        [False, False]


def test_reference_patterns_semantics():
    """Spot-check the five reference patterns on hand-built perceptions."""
    from pamnet_tpu.data.featurizer import REFERENCE_SMARTS

    hydro = compile_smarts(REFERENCE_SMARTS["hydrophobic"])
    acc = compile_smarts(REFERENCE_SMARTS["acceptor"])
    don = compile_smarts(REFERENCE_SMARTS["donor"])

    # methane C vs C bonded to O: only the former is hydrophobic
    m = _mol([dict(z=6, h=4, x=4, v=4), dict(z=6, x=2, v=2), dict(z=8)],
             bonds=[(1, 2, "1")])
    assert hydro.match_all(m).tolist() == [True, False, False]

    # thioether S (v2, H0) hydrophobic; S with an H is not (unless sp3 tag)
    m = _mol([dict(z=16, x=2, v=2), dict(z=16, x=2, v=2, h=1)])
    assert hydro.match_all(m).tolist() == [True, False]
    # ...but ^3 sulfur is hydrophobic regardless of H (S^3 alternative)
    m = _mol([dict(z=16, x=2, v=2, h=1, hyb=3)])
    assert hydro.match_all(m).tolist() == [True]

    # acceptor: ether O yes; aromatic o no; N+ no; pentavalent N no
    m = _mol([
        dict(z=8, x=2, v=2),
        dict(z=8, arom=True, x=2, v=3),
        dict(z=7, fc=1, x=4, v=4),
        dict(z=7, x=3, v=5),
    ])
    assert acc.match_all(m).tolist() == [True, False, False, False]

    # donor: N-H and O-H yes; C-H no; N without H no; S-H yes (term 1)
    m = _mol([
        dict(z=7, h=1, x=3, v=3),
        dict(z=8, h=1, x=2, v=2),
        dict(z=6, h=3, x=4, v=4),
        dict(z=7, x=3, v=3),
        dict(z=16, h=1, x=2, v=2),
    ])
    assert don.match_all(m).tolist() == [True, True, False, False, True]


def test_vectorized_matches_scalar_on_random_graphs():
    """match_all (vectorized with masked short-circuiting) must agree with
    per-atom match_atom for all five reference patterns on random
    perceptions — including multi-atom recursive walks."""
    from pamnet_tpu.data.featurizer import REFERENCE_SMARTS

    rng = np.random.default_rng(7)
    n = 300
    atoms = [
        dict(
            z=int(rng.choice([1, 6, 7, 8, 9, 15, 16, 17, 30])),
            arom=bool(rng.random() < 0.3),
            fc=int(rng.choice([-1, 0, 0, 0, 1])),
            h=int(rng.integers(0, 4)),
            x=int(rng.integers(0, 5)),
            v=int(rng.integers(0, 7)),
            hyb=int(rng.integers(0, 4)),
            ring=bool(rng.random() < 0.4),
        )
        for _ in range(n)
    ]
    bonds = [
        (int(rng.integers(0, n)), int(rng.integers(0, n)),
         str(rng.choice(["1", "2", "ar", "am"])))
        for _ in range(2 * n)
    ]
    m = _mol(atoms, bonds)
    for name, smarts in REFERENCE_SMARTS.items():
        pat = compile_smarts(smarts)
        vec = pat.match_all(m)
        sca = np.array([pat.match_atom(m, i) for i in range(n)])
        assert (vec == sca).all(), name


def test_unsupported_constructs_raise():
    for bad in ("[r5]", "[$([C](N)O)]", "C", "[@]"):
        with pytest.raises(ValueError):
            compile_smarts(bad)


def test_parse_charge_forms():
    m = _mol([dict(fc=2), dict(fc=-2), dict(fc=0)])
    assert compile_smarts("[++]").match_all(m).tolist() == [True, False, False]
    assert compile_smarts("[+2]").match_all(m).tolist() == [True, False, False]
    assert compile_smarts("[--]").match_all(m).tolist() == [False, True, False]
    assert compile_smarts("[-2]").match_all(m).tolist() == [False, True, False]
    assert compile_smarts("[+0]").match_all(m).tolist() == [False, False, True]
