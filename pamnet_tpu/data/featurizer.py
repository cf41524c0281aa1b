"""PDBbind atom featurizer: 18 features per heavy atom, matching the
reference's OpenBabel-based featurizer layout (reference: utils/featurizer.py,
consumed by models.py:35 ``init_linear(18, dim)``):

  [0:9]   one-hot atom class: B, C, N, O, P, S, Se, halogen, metal
          (reference: featurizer.py:57-82; unknown types encode all-zeros)
  [9]     hybridization (1/2/3)
  [10]    heavy-atom degree
  [11]    heteroatom degree (bonded N/O/S/P/...; non-C, non-H neighbors)
  [12]    partial charge (taken from the mol2 file's charge column)
  [13:18] SMARTS-defined flags: hydrophobic, aromatic, acceptor, donor, ring
          (reference SMARTS at featurizer.py:124-131)

The five SMARTS flags are re-implemented *semantically* on the parsed mol2
graph instead of via a SMARTS engine; the definitions below document the
intended chemistry of each reference pattern.  Documented approximations:

* partial charges come from the mol2 file (PDBbind ships Gasteiger-style
  charges) rather than being recomputed;
* formal charges are approximated as neutral (mol2 carries none) — affects
  only the *+1/*+2/*+3 exclusions of the acceptor pattern and the anion
  exclusions of the donor pattern for rare charged species;
* the donor test counts *explicit* hydrogens (PDBbind mol2 files are
  protonated, so this matches OpenBabel's implicit+explicit H count there);
* hybridization comes from the SYBYL type suffix rather than OpenBabel's
  perception (exotic types default to sp3).
"""

from __future__ import annotations

import numpy as np

from pamnet_tpu.data.mol2 import Mol2

_METALS = set(
    [3, 4, 11, 12, 13]
    + list(range(19, 32))
    + list(range(37, 51))
    + list(range(55, 84))
    + list(range(87, 104))
)

_HALOGENS = {9, 17, 35, 53}

_ATOM_CLASS = {}
for _code, _nums in enumerate(
    [{5}, {6}, {7}, {8}, {15}, {16}, {34}, _HALOGENS, _METALS]
):
    for _z in _nums:
        _ATOM_CLASS[_z] = _code

FEATURE_NAMES = [
    "B", "C", "N", "O", "P", "S", "Se", "halogen", "metal",
    "hyb", "heavydegree", "heterodegree", "partialcharge",
    "hydrophobic", "aromatic", "acceptor", "donor", "ring",
]


def _hybridization(sybyl: str) -> int:
    """OpenBabel-style hyb value from the SYBYL type suffix.

    Sulfoxide/sulfone sulfur (S.O / S.O2) is tetrahedral -> sp3, matching
    OpenBabel's electron-domain assignment; suffixes compare
    case-insensitively (writers emit both S.O2 and S.o2)."""
    if "." not in sybyl:
        return 0
    suffix = sybyl.split(".", 1)[1].lower()
    if suffix == "1":
        return 1
    if suffix in ("2", "ar", "am", "co2", "pl3"):
        return 2
    if suffix in ("3", "4", "o", "o2", "th", "t3"):
        return 3
    return 3


# SYBYL bond-order values for valence accounting (TRIPOS bond types).
_ORDER_VALENCE = {
    "1": 1.0, "2": 2.0, "3": 3.0, "am": 1.0, "ar": 1.5,
    "du": 1.0, "un": 1.0, "nc": 0.0,
}


def _ring_atoms(n: int, bonds) -> np.ndarray:
    """Atoms lying on at least one cycle.

    In a simple graph, every non-bridge edge is on a cycle, so ring atoms are
    exactly the endpoints of non-bridge edges (bridges via iterative Tarjan
    lowlink DFS)."""
    adj = [[] for _ in range(n)]
    for ei, (a, b, _) in enumerate(bonds):
        adj[a].append((b, ei))
        adj[b].append((a, ei))
    disc = [-1] * n
    low = [0] * n
    is_bridge = [False] * len(bonds)
    timer = 0
    for root in range(n):
        if disc[root] != -1:
            continue
        disc[root] = low[root] = timer
        timer += 1
        stack = [(root, -1, iter(adj[root]))]
        while stack:
            v, pe, it = stack[-1]
            advanced = False
            for w, ei in it:
                if ei == pe:
                    continue
                if disc[w] == -1:
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, ei, iter(adj[w])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u]:
                        is_bridge[pe] = True
    in_ring = np.zeros(n, dtype=bool)
    for ei, (a, b, _) in enumerate(bonds):
        if a != b and not is_bridge[ei]:
            in_ring[a] = in_ring[b] = True
    return in_ring


def featurize_mol2(mol: Mol2, molcode: float | None = None):
    """(coords, features) over heavy atoms (reference API:
    Featurizer.get_features, utils/featurizer.py:204-261).  With
    ``molcode=None`` (save_molecule_codes=False) features have width 18,
    matching preprocess_pdbbind.py:82."""
    n = len(mol)
    z = mol.atomic_num
    heavy = z > 1

    # Graph helpers over ALL atoms (H's count for H-attachment tests).
    nbrs = [[] for _ in range(n)]
    arom_bond = np.zeros(n, dtype=bool)
    for a, b, order in mol.bonds:
        nbrs[a].append(b)
        nbrs[b].append(a)
        if order == "ar":
            arom_bond[a] = arom_bond[b] = True

    in_ring = _ring_atoms(n, mol.bonds)
    hyb = np.array([_hybridization(s) for s in mol.sybyl], dtype=np.float32)
    heavydeg = np.array(
        [sum(z[w] > 1 for w in nbrs[v]) for v in range(n)], dtype=np.float32
    )
    heterodeg = np.array(
        [sum(z[w] not in (1, 6) and z[w] > 1 for w in nbrs[v]) for v in range(n)],
        dtype=np.float32,
    )
    has_h = np.array([any(z[w] == 1 for w in nbrs[v]) for v in range(n)])
    aromatic = arom_bond | np.array(
        [s.endswith(".ar") for s in mol.sybyl], dtype=bool
    )

    # --- SMARTS-flag semantics (reference patterns featurizer.py:124-131) ---
    # hydrophobic: neutral carbon with no N/O/F neighbor; divalent
    # no-H sulfur / aromatic or sp3 sulfur; neutral Cl/Br/I.
    no_nof = np.array(
        [all(z[w] not in (7, 8, 9) for w in nbrs[v]) for v in range(n)]
    )
    sulfur_hydrophobic = (z == 16) & (
        aromatic | (hyb == 3) | ((~has_h) & (heavydeg <= 2))
    )
    hydrophobic = ((z == 6) & no_nof) | sulfur_hydrophobic | np.isin(z, (17, 35, 53))

    # acceptor: anything NOT in {H, C, F, Cl, Br, I, aromatic o/s,
    # 3-connected aromatic n, pentavalent N/P, S(IV)/S(VI), cations}
    # (reference SMARTS featurizer.py:127).  Valence is accounted from the
    # mol2 bond orders (ar = 1.5) so e.g. nitro N (3 connections, valence 5)
    # is excluded like OpenBabel's #7v5 would.
    total_deg = np.array([len(nbrs[v]) for v in range(n)], dtype=np.int64)
    valence = np.zeros(n, dtype=np.float64)
    for a, b, order in mol.bonds:
        v = _ORDER_VALENCE.get(order, 1.0)
        valence[a] += v
        valence[b] += v
    valence = np.round(valence).astype(np.int64)
    n_arom_x3 = (z == 7) & aromatic & (total_deg == 3)
    nv5 = (z == 7) & ((total_deg >= 4) | (valence >= 5))
    pv5 = (z == 15) & ((total_deg >= 4) | (valence >= 5))
    sv46 = (z == 16) & ((total_deg >= 3) | (valence >= 4))
    excluded = (
        (z == 1) | (z == 6) | np.isin(z, (9, 17, 35, 53))
        | ((z == 8) & aromatic) | ((z == 16) & aromatic)
        | n_arom_x3 | nv5 | pv5 | sv46
    )
    acceptor = ~excluded

    # donor: non-carbon heavy atom with >= 1 attached hydrogen.
    donor = (z != 6) & (z > 1) & has_h

    feats = np.concatenate(
        [
            np.stack(
                [
                    np.array([_ATOM_CLASS.get(int(a), -1) == c for a in z])
                    for c in range(9)
                ],
                axis=1,
            ).astype(np.float32),
            hyb[:, None],
            heavydeg[:, None],
            heterodeg[:, None],
            mol.charge[:, None].astype(np.float32),
        ],
        axis=1,
    )
    if molcode is not None:
        feats = np.concatenate(
            [feats, np.full((n, 1), float(molcode), np.float32)], axis=1
        )
    flags = np.stack([hydrophobic, aromatic, acceptor, donor, in_ring], axis=1)
    feats = np.concatenate([feats, flags.astype(np.float32)], axis=1)

    if np.isnan(feats).any():
        raise RuntimeError("Got NaN when calculating features")
    return mol.pos[heavy].astype(np.float32), feats[heavy]
