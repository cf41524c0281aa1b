"""The OpenBabel-parity registry must stay truthful on OUR side: every
entry's ``ours`` value — in both the remaining-divergence list and the
closed (verified-match) list — is asserted against the live featurizer, so
the registry (pamnet_tpu/data/featurizer_divergences.py) can never drift
from the implementation.  The ``openbabel`` column is verified by
tools/compare_openbabel.py --check-divergences wherever pybel exists
(not in this environment, DEVNOTES.md)."""

import numpy as np

from pamnet_tpu.data.featurizer import FEATURE_NAMES, featurize_mol2
from pamnet_tpu.data.featurizer_divergences import (
    EXPECTED_DIVERGENCES,
    VERIFIED_MATCHES,
)
from pamnet_tpu.data.mol2 import parse_mol2

ALL_ENTRIES = EXPECTED_DIVERGENCES + VERIFIED_MATCHES


def test_registry_matches_our_featurizer(tmp_path):
    assert EXPECTED_DIVERGENCES, "divergence list must not be empty"
    assert VERIFIED_MATCHES, "verified-match list must not be empty"
    for d in ALL_ENTRIES:
        p = tmp_path / f"{d.name}.mol2"
        p.write_text(d.mol2)
        _, feats = featurize_mol2(parse_mol2(str(p)))
        col = FEATURE_NAMES.index(d.feature)
        got = float(feats[d.atom, col])
        assert got == d.ours, (
            f"{d.name}: ours[{d.feature}] = {got}, registry says {d.ours}"
        )


def test_registry_entries_are_well_formed():
    names = [d.name for d in ALL_ENTRIES]
    assert len(names) == len(set(names)), "duplicate entry names"
    for d in ALL_ENTRIES:
        assert d.feature in FEATURE_NAMES
        assert d.confidence in ("certain", "likely", "uncertain")
        assert d.mol2.startswith("@<TRIPOS>MOLECULE")
        assert d.reason
    # Divergences must actually diverge; verified matches must match.
    for d in EXPECTED_DIVERGENCES:
        assert d.ours != d.openbabel, f"{d.name} belongs in VERIFIED_MATCHES"
    for d in VERIFIED_MATCHES:
        assert d.ours == d.openbabel, f"{d.name} belongs in EXPECTED_DIVERGENCES"


def test_registry_fixtures_parse_standalone(tmp_path):
    """Each fixture must be a complete, parseable mol2 with the indexed
    heavy atom present."""
    for d in ALL_ENTRIES:
        p = tmp_path / f"{d.name}.mol2"
        p.write_text(d.mol2)
        mol = parse_mol2(str(p))
        heavy = np.asarray(mol.atomic_num) > 1
        assert d.atom < int(heavy.sum())
