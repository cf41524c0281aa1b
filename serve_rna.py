"""Long-running RNA scoring service over the TPU-resident model.

The reference has no server — its "serve" path is batch CSV scoring
(reference: inference_rna_puzzles.py:21-86; SURVEY.md section 3.4).  This
wraps the exact same inference stack (checkpoint readers, GraphLoader
ladder buckets, `apply_pamnet`) behind a minimal HTTP API for
production-style deployment: parameters load once at startup, compiled
programs are cached per padding bucket and reused across requests, and the
geometric ladder means structures of similar size share a bucket.

API (JSON unless noted):
  GET  /healthz
      -> {"ok": true, "model": <path>, "compiled_buckets": N}
  POST /score      Content-Type: application/json
      {"molecules": [{"name": "...", "z": [0,1,2,...], "pos": [[x,y,z],..]}]}
      (z follows the TU convention: 0=C 1=N 2=O — preprocess_rna_puzzles.py)
      -> {"names": [...], "scores": [...]}
  POST /score      any other Content-Type: raw PDB text, one structure
      (heavy C/N/O atoms extracted like preprocess_rna_puzzles.py; pass
      ?name=<tag> for the response name)
      -> {"names": [<tag>], "scores": [<s>]}

Scoring math and CSV-golden parity are locked by tests/test_serve.py
against the same f64-oracle goldens as the batch driver.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import threading
import os

import numpy as np

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.utils.runtime import enable_compilation_cache, resolve_path

REFERENCE_ROOT = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")

_RNA_TYPES = {"C": 0, "N": 1, "O": 2}  # preprocess_rna_puzzles.py TYPES


def pdb_text_to_molecule(text: str) -> dict:
    """Heavy C/N/O atoms of one PDB structure -> TU-convention molecule
    (same extraction as preprocess_rna_puzzles.construct_graphs)."""
    import tempfile

    from pamnet_tpu.data.pdb import parse_pdb_atoms

    with tempfile.NamedTemporaryFile("w", suffix=".pdb", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        elems, coords = parse_pdb_atoms(path)
    finally:
        os.unlink(path)
    keep = [i for i, e in enumerate(elems) if e in _RNA_TYPES]
    if not keep:
        raise ValueError("no C/N/O atoms in PDB input")
    z = np.asarray([_RNA_TYPES[elems[i]] for i in keep], np.int32)
    pos = coords[keep].astype(np.float32)
    return dict(z=z, pos=pos, y=0.0)


class RNAScoringService:
    """Params + config held resident; one jit wrapper whose compiled-program
    cache is shared across requests (one compile per padding bucket)."""

    def __init__(self, params, cfg: PAMNetConfig, batch_size: int = 16,
                 ladder_pads: bool = True):
        import jax

        from pamnet_tpu.models import apply_pamnet

        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.ladder_pads = ladder_pads
        self._fwd = jax.jit(lambda p, g: apply_pamnet(p, g, cfg))
        # jax dispatch is thread-safe, but serialize scoring so concurrent
        # requests don't interleave compiles on the single host core.
        self._lock = threading.Lock()
        # Monotone high-water pad cap shared across requests: ladder buckets
        # are clamped against loader.pads, so a per-request cap would make
        # the largest batch of every distinct-size request its own compiled
        # shape.  Feeding each loader the running maximum keeps the clamp
        # stable once the biggest structures have been seen, so bucket
        # shapes stay on the geometric ladder and compiled programs are
        # genuinely reused across requests.
        self._pads = None

    def compiled_buckets(self) -> int:
        try:
            return int(self._fwd._cache_size())
        except Exception:  # noqa: BLE001 - jax-version-dependent introspection
            return -1

    def score_molecules(self, mols: list[dict]) -> np.ndarray:
        """(len(mols),) scores via the production inference path."""
        import jax
        import jax.numpy as jnp

        from pamnet_tpu.data.loader import GraphLoader

        for i, m in enumerate(mols):
            if "z" not in m or "pos" not in m:
                raise ValueError(f"molecule {i}: need 'z' and 'pos'")
        mols = [dict(z=np.asarray(m["z"], np.int32),
                     pos=np.asarray(m["pos"], np.float32),
                     y=float(m.get("y", 0.0))) for m in mols]
        ntypes = self.cfg.num_atom_types
        for i, m in enumerate(mols):
            z, pos = m["z"], m["pos"]
            if z.ndim != 1 or pos.shape != (z.shape[0], 3):
                raise ValueError(
                    f"molecule {i}: 'pos' must be (len(z), 3), got z "
                    f"{z.shape} pos {pos.shape}"
                )
            if z.size and (z.min() < 0 or z.max() >= ntypes):
                # Reject rather than let jax clamp out-of-range gathers into
                # silently-wrong scores (e.g. atomic numbers 6/7/8 instead
                # of the TU codes 0=C 1=N 2=O).
                raise ValueError(
                    f"molecule {i}: atom codes must be in [0, {ntypes}) "
                    f"(TU convention: 0=C 1=N 2=O), got "
                    f"[{int(z.min())}, {int(z.max())}]"
                )
        with self._lock:
            loader = GraphLoader(
                mols, self.cfg.dataset_kind, self.cfg.cutoff_l,
                self.cfg.cutoff_g, batch_size=self.batch_size, shuffle=False,
                build_tables=False, ladder_pads=self.ladder_pads,
                pads=self._pads,
            )
            self._pads = loader.pads  # high-water cap (pads only ever widen)
            out = []
            for gb in loader:
                res = self._fwd(self.params, jax.tree.map(jnp.asarray, gb))
                nb = int(gb.graph_mask.sum())
                out.append(np.asarray(res)[:nb])
        return np.concatenate(out)


def make_server(service: RNAScoringService, host: str, port: int,
                model_path: str):
    """ThreadingHTTPServer wired to the service (returned unstarted so tests
    can drive it on an ephemeral port)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._reply(200, {"ok": True, "model": model_path,
                                  "compiled_buckets":
                                      service.compiled_buckets()})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/score":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    req = json.loads(body)
                    mols = req["molecules"]
                    names = [m.get("name", f"molecule_{i}")
                             for i, m in enumerate(mols)]
                else:  # raw PDB text
                    q = parse_qs(parsed.query)
                    names = [q.get("name", ["structure"])[0]]
                    mols = [pdb_text_to_molecule(body.decode())]
                scores = service.score_molecules(mols)
                self._reply(200, {"names": names,
                                  "scores": [float(s) for s in scores]})
            except Exception as e:  # noqa: BLE001 - report to the client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--host', type=str, default='127.0.0.1')
    parser.add_argument('--port', type=int, default=8040)
    parser.add_argument('--n_layer', type=int, default=1)
    parser.add_argument('--dim', type=int, default=16)
    parser.add_argument('--batch_size', type=int, default=16)
    parser.add_argument('--cutoff_l', type=float, default=2.6)
    parser.add_argument('--cutoff_g', type=float, default=20.0)
    parser.add_argument('--flow', type=str, default='target_to_source')
    parser.add_argument('--saved_model', type=str, default='pamnet_rna.pt')
    parser.add_argument('--precision', type=str, default='float32',
                        choices=['default', 'float32'])
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--platform', type=str, default='auto')
    parser.add_argument('--fixed_pads', action='store_true')
    args = parser.parse_args()

    from pamnet_tpu.utils.runtime import set_matmul_precision, set_platform
    set_platform(args.platform)
    enable_compilation_cache()
    set_matmul_precision(args.precision)

    import jax

    from pamnet_tpu.models import init_pamnet
    from pamnet_tpu.train.checkpoint import load_params, load_torch_checkpoint

    cfg = PAMNetConfig(dataset="rna_serve", dim=args.dim,
                       n_layer=args.n_layer, cutoff_l=args.cutoff_l,
                       cutoff_g=args.cutoff_g, flow=args.flow,
                       compute_dtype=args.compute_dtype)
    ckpt_path = resolve_path(
        osp.join('.', 'save', args.saved_model),
        osp.join(REFERENCE_ROOT, 'save', args.saved_model),
    )
    if args.saved_model.endswith('.pt'):
        params = load_torch_checkpoint(ckpt_path)
    else:
        params = load_params(ckpt_path, init_pamnet(jax.random.PRNGKey(0), cfg))
    service = RNAScoringService(params, cfg, batch_size=args.batch_size,
                                ladder_pads=not args.fixed_pads)
    server = make_server(service, args.host, args.port, ckpt_path)
    print(f"Model loaded from {ckpt_path}. "
          f"Serving on http://{args.host}:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
