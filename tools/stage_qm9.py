"""Turnkey staging for the real QM9 raw files (VERDICT r4 #6).

This environment has zero network egress, so the headline-MAE run is blocked
on someone staging the raw files.  This tool removes every step between
"files exist somewhere" and "MAE run started":

    python tools/stage_qm9.py /path/with/downloaded/files [--root data/QM9]
                              [--parse] [--link]

It (1) finds the QM9 artifacts in the source directory (raw trio, the
qm9.zip bundle, or a preprocessed data_v2.pt/qm9_v2.pt), (2) verifies them
STRUCTURALLY against the publicly-known constants — 133,885 SDF molecule
blocks, a 133,885-row 20+-column CSV, a 3,054-entry uncharacterized list
(reference: datasets/qm9_dataset.py:116-168,195-196 and the GDB-9 paper) —
plus sha256 for the record, (3) copies (or symlinks) them into the layout
``data/qm9.py::load_qm9`` expects, (4) optionally builds the parsed ``.npz``
cache immediately (``--parse``), and (5) prints the exact headline commands.

Sources (reference qm9_dataset.py:116-120):
  https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/molnet_publish/qm9.zip
  https://ndownloader.figshare.com/files/3195404        (uncharacterized.txt)
  https://pytorch-geometric.com/datasets/qm9_v2.zip     (preprocessed fallback)
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SDF_BLOCKS = 133_885  # GDB-9 molecule count (public constant)
N_SKIP = 3_054          # uncharacterized molecules (qm9_dataset.py:195-196)
N_PROCESSED = 130_831   # 133,885 - 3,054 (molecules after the skip list)


def sha256(path: str, limit_mb: int = 0) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()


def count_sdf_blocks(path: str) -> int:
    n = 0
    with open(path, "rb") as f:
        for line in f:
            if line.rstrip() == b"$$$$":
                n += 1
    return n


def count_csv_rows(path: str) -> tuple[int, int]:
    with open(path) as f:
        header = f.readline()
        ncols = len(header.split(","))
        nrows = sum(1 for line in f if line.strip())
    return nrows, ncols


def verify_raw_trio(sdf: str, csv: str, unc: str) -> list[str]:
    """Structural verification; returns a list of problems (empty = ok)."""
    from pamnet_tpu.data.qm9 import load_skip_list

    problems = []
    nb = count_sdf_blocks(sdf)
    if nb != N_SDF_BLOCKS:
        problems.append(f"gdb9.sdf has {nb} molecule blocks, expected {N_SDF_BLOCKS}")
    nrows, ncols = count_csv_rows(csv)
    if nrows != N_SDF_BLOCKS:
        problems.append(f"gdb9.sdf.csv has {nrows} data rows, expected {N_SDF_BLOCKS}")
    if ncols < 20:
        problems.append(f"gdb9.sdf.csv has {ncols} columns, expected >= 20 "
                        f"(id + 19 targets)")
    try:
        skip = load_skip_list(unc)
        if len(skip) != N_SKIP:
            problems.append(
                f"uncharacterized.txt yields {len(skip)} skip entries, "
                f"expected {N_SKIP}")
    except (ValueError, IndexError) as e:
        problems.append(f"uncharacterized.txt unparseable: {e}")
    return problems


def find_sources(src: str) -> dict:
    """Locate stageable artifacts anywhere under ``src`` (flat or nested)."""
    wanted = {"gdb9.sdf": None, "gdb9.sdf.csv": None,
              "uncharacterized.txt": None, "qm9.zip": None,
              "data_v2.pt": None, "qm9_v2.pt": None, "qm9_v2.zip": None}
    for dirpath, _, files in os.walk(src):
        for f in files:
            if f in wanted and wanted[f] is None:
                wanted[f] = os.path.join(dirpath, f)
    return wanted


def stage(path: str, dest: str, link: bool) -> None:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if os.path.abspath(path) == os.path.abspath(dest):
        return
    if os.path.lexists(dest):
        os.unlink(dest)
    if link:
        os.symlink(os.path.abspath(path), dest)
    else:
        shutil.copy2(path, dest)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("source", help="Directory holding the downloaded files "
                                   "(searched recursively)")
    ap.add_argument("--root", default=os.path.join("data", "QM9"),
                    help="Dataset root to stage into (default data/QM9)")
    ap.add_argument("--link", action="store_true",
                    help="Symlink instead of copying (saves ~400 MB)")
    ap.add_argument("--parse", action="store_true",
                    help="Parse + build the npz cache now (a few minutes on "
                         "one core; otherwise the first driver run does it)")
    args = ap.parse_args()

    raw = os.path.join(args.root, "raw")
    found = find_sources(args.source)

    # Unzip bundles first so their members join the candidate set.
    for zname, members in (("qm9.zip", ("gdb9.sdf", "gdb9.sdf.csv")),
                           ("qm9_v2.zip", ("qm9_v2.pt",))):
        if found[zname] and not all(found[m] for m in members):
            print(f"extracting {found[zname]} ...")
            os.makedirs(raw, exist_ok=True)
            with zipfile.ZipFile(found[zname]) as zf:
                for m in zf.namelist():
                    base = os.path.basename(m)
                    if base in members:
                        with zf.open(m) as fin, \
                                open(os.path.join(raw, base), "wb") as fout:
                            shutil.copyfileobj(fin, fout)
            for m in members:
                p = os.path.join(raw, m)
                if os.path.exists(p):
                    found[m] = p

    trio = [found["gdb9.sdf"], found["gdb9.sdf.csv"], found["uncharacterized.txt"]]
    preproc = found["data_v2.pt"] or found["qm9_v2.pt"]

    if all(trio):
        print("found raw trio:")
        for p in trio:
            print(f"  {p}  ({os.path.getsize(p):,} bytes, "
                  f"sha256 {sha256(p)[:16]}…)")
        problems = verify_raw_trio(*trio)
        if problems:
            for p in problems:
                print(f"VERIFY FAIL: {p}", file=sys.stderr)
            return 1
        print(f"verified: {N_SDF_BLOCKS} SDF blocks, {N_SDF_BLOCKS} CSV rows, "
              f"{N_SKIP} skip entries")
        for p, name in zip(trio, ("gdb9.sdf", "gdb9.sdf.csv",
                                  "uncharacterized.txt")):
            stage(p, os.path.join(raw, name), args.link)
        print(f"staged under {raw}/")
    elif preproc:
        print(f"found preprocessed artifact: {preproc} "
              f"({os.path.getsize(preproc):,} bytes, "
              f"sha256 {sha256(preproc)[:16]}…)")
        dest = os.path.join(args.root, "processed", "data_v2.pt")
        stage(preproc, dest, args.link)
        print(f"staged as {dest} (raw trio preferred when available; the "
              f"preprocessed path bakes in the reference's skip list + "
              f"target reorder)")
    else:
        print("no QM9 artifacts found. Need either the raw trio "
              "(gdb9.sdf, gdb9.sdf.csv, uncharacterized.txt), qm9.zip + "
              "uncharacterized.txt, or a preprocessed data_v2.pt/qm9_v2.pt.",
              file=sys.stderr)
        return 1

    if args.parse:
        from pamnet_tpu.data.qm9 import load_qm9

        print("parsing (builds the npz cache) ...")
        mols = load_qm9(args.root, allow_download=False)
        print(f"parsed {len(mols)} molecules "
              f"(expected {N_PROCESSED} from the raw trio)")
        if all(trio) and len(mols) != N_PROCESSED:
            print(f"VERIFY FAIL: molecule count {len(mols)} != {N_PROCESSED}",
                  file=sys.stderr)
            return 1

    print("\nheadline MAE run (reference recipe, README.md:95):")
    print("  python main_qm9.py --model PAMNet --target 7 --epochs 900 "
          "--batch_size 32 --dim 128 --n_layer 6 --lr 1e-4")
    print("TPU-recommended equivalent (same math; device-resident epochs):")
    print("  python main_qm9.py --model PAMNet --target 7 --epochs 900 "
          "--batch_size 32 --dim 128 --n_layer 6 --lr 1e-4 \\\n"
          "      --device_data --device_basis --no_ell_tables "
          "--balanced_batches --structure_cache data/QM9/structs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
