"""QM9 dataset pipeline (reference: datasets/qm9_dataset.py).

First-party SDF parser replacing the RDKit dependency: the model only needs
atom elements, 3D coordinates, and the bond list, all of which are in the
gdb9 SDF text (the reference itself reads coordinates straight from the SDF
text, qm9_dataset.py:209-211).

Behavioral parity points (SURVEY.md hard part #5):
  * target matrix reordered ``cat([y[:, 3:], y[:, :3]])`` moving rotational
    constants A,B,C to the end (qm9_dataset.py:192),
  * unit conversion table Hartree->eV / kcal/mol->eV (qm9_dataset.py:21-27),
  * uncharacterized-molecule skip list (qm9_dataset.py:195-196),
  * per-atom reference energies ``atomrefs`` for targets 7..11
    (qm9_dataset.py:29-48),
  * driver-side target remap 7/8/9/10 -> +5 (atomization variants,
    main_qm9.py:61-67).

Files expected under ``<root>/raw``: ``gdb9.sdf``, ``gdb9.sdf.csv``,
``uncharacterized.txt`` (download them once with any network-enabled host;
this environment has no egress).  Parsed molecules are cached to an ``.npz``.
"""

from __future__ import annotations

import os

import numpy as np

HAR2EV = 27.2113825435
KCALMOL2EV = 0.04336414

# Applied after reordering (reference: qm9_dataset.py:24-27,192-193).
CONVERSION = np.array(
    [1.0, 1.0, HAR2EV, HAR2EV, HAR2EV, 1.0, HAR2EV, HAR2EV, HAR2EV, HAR2EV,
     HAR2EV, 1.0, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV, KCALMOL2EV, 1.0, 1.0, 1.0],
    dtype=np.float64,
)

ATOM_TYPES = {"H": 0, "C": 1, "N": 2, "O": 3, "F": 4}

# Per-atom reference energies (reference: qm9_dataset.py:29-48), indexed by
# reordered target id (7=U0 ... 11=Cv table index differs; keys as reference).
# Kept for parity with the reference's QM9.atomref() accessor
# (qm9_dataset.py:134-141); like the reference, the training drivers never
# consume it (targets 12-15 in the CSV are already atomization-corrected).
ATOMREFS = {
    6: [0.0, 0.0, 0.0, 0.0, 0.0],
    7: [-13.61312172, -1029.86312267, -1485.30251237, -2042.61123593, -2713.48485589],
    8: [-13.5745904, -1029.82456413, -1485.26398105, -2042.5727046, -2713.44632457],
    9: [-13.54887564, -1029.79887659, -1485.2382935, -2042.54701705, -2713.42063702],
    10: [-13.90303183, -1030.25891228, -1485.71166277, -2043.01812778, -2713.88796536],
    11: [0.0, 0.0, 0.0, 0.0, 0.0],
}


def remap_target(target: int) -> int:
    """Driver remap: 7/8/9/10 -> 12/13/14/15 (U0_ATOM etc.; reference:
    main_qm9.py:61-67)."""
    return target + 5 if target in (7, 8, 9, 10) else target


def parse_sdf_molecules(sdf_path: str):
    """Yield (elements, pos, bonds) per molecule block from a V2000 SDF file.

    Yields exactly ONE item per ``$$$$``-delimited block — ``None`` when the
    block is unparseable or contains atoms outside ``ATOM_TYPES`` — so that
    ``enumerate()`` over this generator tracks the raw block index and can
    never desynchronize from the CSV target rows / skip list (the reference
    enumerates the RDKit supplier the same way, qm9_dataset.py:203-205).
    Whitespace-only trailing chunks (after the final ``$$$$``) are not blocks
    and yield nothing.
    """
    with open(sdf_path, "r") as f:
        text = f.read()
    for block in text.split("$$$$\n"):
        lines = block.splitlines()
        if not any(ln.strip() for ln in lines):
            continue  # trailing whitespace after the final $$$$, not a block
        if len(lines) < 4:
            yield None
            continue
        counts = lines[3]
        try:
            na, nb = int(counts[0:3]), int(counts[3:6])
        except ValueError:
            yield None
            continue
        elems, pos = [], []
        ok = True
        for line in lines[4 : 4 + na]:
            try:
                x, y, z = float(line[0:10]), float(line[10:20]), float(line[20:30])
            except (ValueError, IndexError):
                ok = False
                break
            sym = line[31:34].strip()
            if sym not in ATOM_TYPES:
                ok = False
                break
            elems.append(ATOM_TYPES[sym])
            pos.append((x, y, z))
        if not ok:
            yield None
            continue
        bonds = []
        for line in lines[4 + na : 4 + na + nb]:
            a, b = int(line[0:3]) - 1, int(line[3:6]) - 1
            bonds.append((a, b))
            bonds.append((b, a))
        yield (
            np.asarray(elems, np.int32),
            np.asarray(pos, np.float32),
            np.asarray(bonds, np.int64).reshape(-1, 2).T
            if bonds
            else np.zeros((2, 0), np.int64),
        )


def load_targets(csv_path: str) -> np.ndarray:
    """Raw 19-target matrix, reordered + unit-converted like the reference."""
    rows = []
    with open(csv_path) as f:
        next(f)  # header
        for line in f:
            line = line.strip()
            if not line:
                continue
            rows.append([float(v) for v in line.split(",")[1:20]])
    y = np.asarray(rows, dtype=np.float64)
    y = np.concatenate([y[:, 3:], y[:, :3]], axis=1)  # A,B,C to the end
    return y * CONVERSION


def load_skip_list(path: str) -> set[int]:
    """3054 uncharacterized molecules (reference: qm9_dataset.py:195-196)."""
    with open(path) as f:
        lines = f.read().split("\n")[9:-2]
    return {int(x.split()[0]) - 1 for x in lines}


# Reference download endpoints (qm9_dataset.py:116-120).
RAW_URL = (
    "https://deepchemdata.s3-us-west-1.amazonaws.com/datasets/"
    "molnet_publish/qm9.zip"
)
RAW_URL2 = "https://ndownloader.figshare.com/files/3195404"
PROCESSED_URL = "https://pytorch-geometric.com/datasets/qm9_v2.zip"


def download(root: str, timeout: float = 60.0) -> None:
    """Fetch the QM9 raw files (reference: qm9_dataset.py:157-168): the gdb9
    zip (gdb9.sdf + gdb9.sdf.csv) and the uncharacterized list.  Raises
    ConnectionError with staging instructions when the host has no egress."""
    import urllib.error
    import urllib.request
    import zipfile

    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    try:
        zip_path = os.path.join(raw, "qm9.zip")
        urllib.request.urlretrieve(RAW_URL, zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(raw)
        os.unlink(zip_path)
        urllib.request.urlretrieve(
            RAW_URL2, os.path.join(raw, "uncharacterized.txt")
        )
    except (urllib.error.URLError, OSError) as e:
        raise ConnectionError(
            f"QM9 download failed ({e}). If this host has no network egress, "
            f"stage gdb9.sdf / gdb9.sdf.csv / uncharacterized.txt (or the "
            f"preprocessed data_v2.pt / qm9_v2.pt) under {raw} manually "
            f"(sources: {RAW_URL} and {RAW_URL2})."
        ) from e


def load_qm9_preprocessed(path: str) -> list[dict]:
    """Torch-free reader for the preprocessed PyG artifact (``data_v2.pt`` /
    ``qm9_v2.pt``; reference fallback qm9_dataset.py:156-160,172-185): a
    ``torch.save`` of ``(Data, slices)`` where the collated ``Data`` holds
    x = atom-type indices, pos, bond edge_index, and the already
    reordered+unit-converted y (M, 19).  Skip list and target reorder are
    baked in by the reference's process()."""
    from pamnet_tpu.utils.torchpickle import load_torch_pickle

    data, slices = load_torch_pickle(path)
    x = np.asarray(data.x).reshape(-1)
    pos = np.asarray(data.pos)
    edge_index = np.asarray(data.edge_index)
    y = np.asarray(data.y)
    sx = np.asarray(slices["x"], np.int64)
    se = np.asarray(slices["edge_index"], np.int64)
    sy = np.asarray(slices["y"], np.int64)
    mols = []
    for i in range(len(sx) - 1):
        n0, n1 = sx[i], sx[i + 1]
        e0, e1 = se[i], se[i + 1]
        mols.append(
            dict(
                z=x[n0:n1].astype(np.int32),
                pos=pos[n0:n1].astype(np.float32),
                # PyG collate offsets node ids by the cumulative node count;
                # undo it so each molecule is self-contained.
                edge_index=(edge_index[:, e0:e1] - n0).astype(np.int64),
                y=y[sy[i]].astype(np.float64).reshape(-1),
            )
        )
    return mols


def load_qm9(root: str, cache: bool = True, allow_download: bool = False) -> list[dict]:
    """Full QM9: list of molecule dicts {z, pos, edge_index, y(19,)}.

    Resolution order (mirrors the reference's raw/preprocessed dual path,
    qm9_dataset.py:147-160): npz cache -> raw SDF files -> preprocessed
    ``data_v2.pt``/``qm9_v2.pt`` artifact -> (optional) download."""
    raw = os.path.join(root, "raw")
    cache_path = os.path.join(root, "processed", "qm9_pamnet_tpu.npz")
    if cache and os.path.exists(cache_path):
        return _load_cache(cache_path)

    sdf = os.path.join(raw, "gdb9.sdf")
    csv = os.path.join(raw, "gdb9.sdf.csv")
    unc = os.path.join(raw, "uncharacterized.txt")
    if not all(os.path.exists(p) for p in (sdf, csv, unc)):
        for pre in (
            os.path.join(root, "processed", "data_v2.pt"),
            os.path.join(raw, "qm9_v2.pt"),
        ):
            if os.path.exists(pre):
                mols = load_qm9_preprocessed(pre)
                if cache:
                    _save_cache(cache_path, mols)
                return mols
        if allow_download:
            download(root)
        else:
            raise FileNotFoundError(
                f"QM9 data missing under {root}: need raw gdb9.sdf/"
                "gdb9.sdf.csv/uncharacterized.txt, or a preprocessed "
                "data_v2.pt/qm9_v2.pt, or pass allow_download=True "
                f"(reference download URLs: qm9_dataset.py:116-120)."
            )
    targets = load_targets(csv)
    skip = load_skip_list(unc)
    mols = []
    dropped = 0
    for i, parsed in enumerate(parse_sdf_molecules(sdf)):
        if parsed is None:
            dropped += 1
            continue
        if i in skip:
            continue
        z, pos, bonds = parsed
        mols.append(dict(z=z, pos=pos, edge_index=bonds, y=targets[i]))
    if dropped:
        import warnings

        warnings.warn(
            f"load_qm9: {dropped} SDF blocks were unparseable or contained "
            "non-CHONF atoms and were dropped (labels stay aligned by block "
            "index)."
        )
    if cache:
        _save_cache(cache_path, mols)
    return mols


def _save_cache(path: str, mols: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = {}
    n = len(mols)
    flat["z"] = np.concatenate([m["z"] for m in mols])
    flat["pos"] = np.concatenate([m["pos"] for m in mols])
    flat["e"] = np.concatenate([m["edge_index"] for m in mols], axis=1)
    flat["y"] = np.stack([m["y"] for m in mols])
    flat["nz"] = np.array([len(m["z"]) for m in mols])
    flat["ne"] = np.array([m["edge_index"].shape[1] for m in mols])
    np.savez_compressed(path, **flat)


def _load_cache(path: str) -> list[dict]:
    f = np.load(path)
    zs = np.split(f["z"], np.cumsum(f["nz"])[:-1])
    ps = np.split(f["pos"], np.cumsum(f["nz"])[:-1])
    es = np.split(f["e"], np.cumsum(f["ne"])[:-1], axis=1)
    return [
        dict(z=z, pos=p, edge_index=e, y=y)
        for z, p, e, y in zip(zs, ps, es, f["y"])
    ]


def select_target(mols: list[dict], target: int) -> list[dict]:
    """Apply the driver's MyTransform: y = y[:, remap(target)]
    (reference: main_qm9.py:61-67)."""
    t = remap_target(target)
    return [dict(m, y=float(m["y"][t])) for m in mols]
