"""RNA scoring profile: where does the batch-16 forward spend device time?
Decides VERDICT round-1 item 6 (lane-packing the local/sbf chain) with data:
if the local chain is a small fraction of the forward, packing it cannot
reach the 1.5x overall target no matter how well it works.

Usage: python tools/rna_profile.py [trace_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.data.tu import TUDataset
from pamnet_tpu.models import apply_pamnet
from pamnet_tpu.train.checkpoint import load_torch_checkpoint
from pamnet_tpu.utils.runtime import enable_compilation_cache, resolve_path


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pamnet_rna_trace"
    enable_compilation_cache()
    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    data_root = resolve_path(os.path.join(".", "data", "RNA-Puzzles"),
                             os.path.join(ref, "data", "RNA-Puzzles"))
    ckpt = resolve_path(os.path.join(".", "save", "pamnet_rna.pt"),
                        os.path.join(ref, "save", "pamnet_rna.pt"))
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    params = load_torch_checkpoint(ckpt)
    mols = TUDataset(data_root, "rna_native").molecules()
    # Production inference configuration (bench.py / inference driver):
    # sorted offsets only + per-batch EXACT pads (round 5).
    loader = GraphLoader(mols, "rna", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=16, build_tables=False,
                         ladder_pads="exact")
    print(f"pads: {loader.pads}", file=sys.stderr)
    batches = [jax.tree.map(jnp.asarray, gb) for gb in loader]

    fwd_acc = jax.jit(lambda p, g, acc: acc + apply_pamnet(p, g, cfg).sum())
    acc = jnp.float32(0.0)
    for gb in batches:
        acc = fwd_acc(params, gb, acc)
    _ = float(acc)

    reps = 10
    acc = jnp.float32(0.0)
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            for gb in batches:
                acc = fwd_acc(params, gb, acc)
        _ = float(acc)
    wall = time.time() - t0
    n = reps * len(mols)
    print(f"{n} scorings in {wall:.3f}s -> {n/wall:.1f} graphs/s", file=sys.stderr)

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", str(e["pid"]))
    agg: dict = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = names.get(e["pid"], "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        # Whole-module spans (jit_<fn>(fingerprint)) cover their own leaf
        # ops on another lane — keep the aggregation leaf-only.
        if e["name"].startswith("jit_"):
            continue
        d = float(e.get("dur", 0.0))
        agg[e["name"]] = agg.get(e["name"], 0.0) + d
        total += d
    print(f"total device op time: {total/1e3:.1f} ms over {wall*1e3:.0f} ms wall")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur/1e3:9.1f} ms ({dur/total*100:4.1f}%)  {name[:100]}")


if __name__ == "__main__":
    main()
