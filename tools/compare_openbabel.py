#!/usr/bin/env python
"""Compare pamnet_tpu's first-party mol2 featurizer against the reference
OpenBabel-based featurizer, feature by feature, on real mol2 files.

This environment ships no OpenBabel, so the harness cannot run here; run it
wherever `pybel` + the reference repo are available (e.g. the reference's
docker image, README.md:47-55):

    python tools/compare_openbabel.py --reference /path/to/PAMNet \
        /path/to/pdbbind/*/*_ligand.mol2

It prints a per-feature mismatch table and exits nonzero if any flag column
disagrees above --tol.  Reference semantics: utils/featurizer.py:57-131
(9-class one-hot, hyb/heavydegree/heterodegree/partialcharge, 5 SMARTS
flags); ours: pamnet_tpu/data/featurizer.py (documented approximations in
its module docstring).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pamnet_tpu.data.featurizer import FEATURE_NAMES, featurize_mol2  # noqa: E402
from pamnet_tpu.data.mol2 import parse_mol2  # noqa: E402


def reference_features(path: str, reference_root: str):
    sys.path.insert(0, reference_root)
    import pybel  # OpenBabel; present only where the reference runs
    from utils import Featurizer

    featurizer = Featurizer(save_molecule_codes=False)
    mol = next(pybel.readfile("mol2", path))
    return featurizer.get_features(mol)


def check_divergences(reference_root: str) -> int:
    """Verify the expected-divergence registry
    (pamnet_tpu/data/featurizer_divergences.py) against real OpenBabel:
    for every entry, run BOTH featurizers on the bundled fixture and check
    the ``ours`` and ``openbabel`` columns.  Resolves the likely/uncertain
    entries into golden rows."""
    import tempfile

    from pamnet_tpu.data.featurizer_divergences import (
        EXPECTED_DIVERGENCES,
        VERIFIED_MATCHES,
    )

    entries = EXPECTED_DIVERGENCES + VERIFIED_MATCHES
    failures = 0
    for d in entries:
        with tempfile.NamedTemporaryFile("w", suffix=".mol2", delete=False) as f:
            f.write(d.mol2)
            path = f.name
        try:
            col = FEATURE_NAMES.index(d.feature)
            _, got_feats = featurize_mol2(parse_mol2(path))
            got = float(got_feats[d.atom, col])
            try:
                _, ref_feats = reference_features(path, reference_root)
                ref = float(ref_feats[d.atom, col])
            except Exception as e:  # noqa: BLE001 - report per entry
                print(f"{d.name}: OpenBabel side FAILED ({e})")
                failures += 1
                continue
        finally:
            os.unlink(path)
        ok_ours = got == d.ours
        ok_ref = ref == d.openbabel
        status = "OK" if (ok_ours and ok_ref) else "MISMATCH"
        print(f"{d.name} [{d.feature}] ({d.confidence}): ours={got} "
              f"(expected {d.ours}), openbabel={ref} (expected {d.openbabel})"
              f" -> {status}")
        if not (ok_ours and ok_ref):
            failures += 1
    print(f"\n{len(entries) - failures}/{len(entries)}"
          f" registry entries confirmed")
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mol2", nargs="*", help="mol2 files to compare on")
    ap.add_argument("--reference", required=True,
                    help="path to the reference PAMNet checkout (for utils.Featurizer)")
    ap.add_argument("--tol", type=float, default=0.0,
                    help="max tolerated per-column mismatch rate (flags)")
    ap.add_argument("--charge-tol", type=float, default=1e-3,
                    help="abs tolerance for partialcharge (continuous)")
    ap.add_argument("--check-divergences", action="store_true",
                    help="verify the expected-divergence registry instead "
                    "of diffing files")
    args = ap.parse_args()

    if args.check_divergences:
        return check_divergences(args.reference)
    if not args.mol2:
        ap.error("provide mol2 files or --check-divergences")

    total = np.zeros(len(FEATURE_NAMES), dtype=np.int64)
    mismatch = np.zeros(len(FEATURE_NAMES), dtype=np.int64)
    n_files = 0
    for path in args.mol2:
        try:
            ref_coords, ref_feats = reference_features(path, args.reference)
            got_coords, got_feats = featurize_mol2(parse_mol2(path))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"SKIP {path}: {e}")
            continue
        if ref_feats.shape != got_feats.shape:
            print(f"SHAPE MISMATCH {path}: ref {ref_feats.shape} vs "
                  f"ours {got_feats.shape}")
            mismatch += 1
            total += 1
            continue
        n_files += 1
        for col, name in enumerate(FEATURE_NAMES):
            tol = args.charge_tol if name == "partialcharge" else 0.5
            bad = np.abs(ref_feats[:, col] - got_feats[:, col]) > tol
            total[col] += len(bad)
            mismatch[col] += int(bad.sum())
            if bad.any():
                rows = np.nonzero(bad)[0][:5]
                print(f"  {os.path.basename(path)} [{name}]: "
                      f"{int(bad.sum())}/{len(bad)} differ, e.g. rows {rows.tolist()} "
                      f"ref={ref_feats[rows, col].tolist()} "
                      f"ours={got_feats[rows, col].tolist()}")

    print(f"\nCompared {n_files} files:")
    worst = 0.0
    for col, name in enumerate(FEATURE_NAMES):
        rate = mismatch[col] / max(total[col], 1)
        worst = max(worst, rate if name != "partialcharge" else 0.0)
        print(f"  {name:>14s}: {mismatch[col]:6d}/{total[col]:6d} "
              f"({100 * rate:.3f}% mismatch)")
    return 1 if worst > args.tol else 0


if __name__ == "__main__":
    sys.exit(main())
