"""RNA scoring service (serve_rna.py): the HTTP wrapper must score through
the exact production inference path — JSON-route scores match the f64-oracle
goldens, the PDB route matches the JSON route on identical coordinates, and
compiled programs are reused across requests (one compile per bucket)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available
from test_rna_parity import GOLDEN

pytestmark = [
    pytest.mark.skipif(
        not reference_available(), reason="reference artifacts not mounted"
    ),
]


@pytest.fixture(scope="module")
def service():
    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint
    from serve_rna import RNAScoringService

    cfg = PAMNetConfig(dataset="rna_serve", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    params = load_torch_checkpoint(f"{REFERENCE_ROOT}/save/pamnet_rna.pt")
    return RNAScoringService(params, cfg, batch_size=16)


@pytest.fixture(scope="module")
def natives():
    from pamnet_tpu.data.tu import TUDataset

    ds = TUDataset(f"{REFERENCE_ROOT}/data/RNA-Puzzles", "rna_native")
    names = [n[:-4] if n.endswith(".pdb") else n for n in ds.names]
    return ds.molecules(), names


def test_service_scores_match_goldens(service, natives):
    mols, names = natives
    scores = service.score_molecules(mols[:2])
    for got, name in zip(scores, names[:2]):
        assert abs(got - GOLDEN[name]) < 5e-5, (name, got, GOLDEN[name])


def _post(url, data: bytes, ctype: str) -> dict:
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def _pdb_text(z, pos) -> str:
    """Minimal ATOM records (element in cols 77-78, coords %8.3f)."""
    elem = "CNO"
    lines = []
    for i, (zi, p) in enumerate(zip(z, pos)):
        lines.append(
            f"ATOM  {i % 99999:5d}  {elem[zi]:<3s}  G A{i % 9999:4d}    "
            f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00          "
            f" {elem[zi]:>1s}"
        )
    return "\n".join(lines) + "\nTER\n"


def test_http_roundtrip(service, natives):
    from serve_rna import make_server

    mols, names = natives
    server = make_server(service, "127.0.0.1", 0, "pamnet_rna.pt")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        # JSON route: two bundled natives against the oracle goldens.
        body = json.dumps({"molecules": [
            {"name": names[i], "z": np.asarray(mols[i]["z"]).tolist(),
             "pos": np.asarray(mols[i]["pos"]).tolist()}
            for i in range(2)
        ]}).encode()
        res = _post(f"{base}/score", body, "application/json")
        assert res["names"] == names[:2]
        for got, name in zip(res["scores"], names[:2]):
            assert abs(got - GOLDEN[name]) < 5e-5, (name, got)

        # PDB route: 3-decimal coordinates round-trip exactly, so the PDB
        # score must equal the JSON score for the same rounded molecule.
        z = np.asarray(mols[0]["z"])[:600]
        pos = np.round(np.asarray(mols[0]["pos"], np.float64)[:600], 3)
        ref = _post(f"{base}/score", json.dumps({"molecules": [
            {"name": "ref", "z": z.tolist(), "pos": pos.tolist()}
        ]}).encode(), "application/json")["scores"][0]
        got = _post(f"{base}/score?name=frag", _pdb_text(z, pos).encode(),
                    "chemical/x-pdb")
        assert got["names"] == ["frag"]
        assert abs(got["scores"][0] - ref) < 1e-5

        # Compiled-bucket reuse: re-scoring the same molecules must not
        # add compiles (the jit cache is shared across requests).
        before = service.compiled_buckets()
        _post(f"{base}/score", body, "application/json")
        assert service.compiled_buckets() == before

        # Malformed input -> 400 with an error payload, server stays up.
        try:
            _post(f"{base}/score", b"{\"molecules\": [{}]}",
                  "application/json")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=60) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        server.shutdown()
        server.server_close()


def test_rejects_out_of_range_atom_codes(service, natives):
    """Out-of-range z (e.g. atomic numbers instead of TU codes) must raise,
    not be clamped by jax's gather into silently-wrong scores."""
    mols, _ = natives
    bad = dict(mols[0])
    bad["z"] = np.asarray(bad["z"]) + 6  # 6/7/8 = C/N/O atomic numbers
    with pytest.raises(ValueError, match="atom codes"):
        service.score_molecules([bad])
    with pytest.raises(ValueError, match="pos"):
        service.score_molecules([dict(z=[0, 1], pos=[[0.0, 0.0, 0.0]])])


def test_pad_cap_is_monotone_across_requests(service, natives):
    """The service's ladder-bucket cap must only ever widen: a small request
    after a large one keeps the high-water pads, so bucket shapes stay on
    the geometric ladder and compiled programs are reused across requests."""
    mols, _ = natives
    service.score_molecules([mols[0]])
    big = service._pads
    small = dict(z=np.asarray(mols[0]["z"])[:40],
                 pos=np.asarray(mols[0]["pos"])[:40])
    service.score_molecules([small])
    assert service._pads == big  # not shrunk back to the small request
