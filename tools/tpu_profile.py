"""Capture a device trace of the QM9 multistep train scan and summarize
device busy time vs wall time (VERDICT round-1 item 2: the ~2x busy-vs-wall
gap — schedule holes in our program, or tunnel time-sharing?).

Usage: python tools/tpu_profile.py [trace_dir]
Parses the trace.json.gz event dump: sums per-lane op durations on TPU
device lanes over the scan's span and prints busy fraction per lane.
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
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
from pamnet_tpu.models import init_pamnet
from pamnet_tpu.train.loop import (
    init_train_state, make_multistep_train_step, make_optimizer,
    stack_microbatches,
)
from pamnet_tpu.train.schedules import warmup_exponential
from pamnet_tpu.utils.runtime import enable_compilation_cache


def run_and_trace(trace_dir: str, compute_dtype: str = "float32",
                  steps: int = 256) -> float:
    enable_compilation_cache()
    bs = 32
    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype=compute_dtype)
    mols = synthetic_qm9_dataset(8 * bs, seed=480)
    # PAMNET_PROFILE_PADS=worstcase traces the any-shuffle bucket; default
    # matches the bench config (balanced plan-pinned pads).
    balanced = os.environ.get("PAMNET_PROFILE_PADS", "balanced") != "worstcase"
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=bs, shuffle=False,
                         drop_last=True, balanced_batches=balanced)
    batches = [jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), gb)
               for gb in loader]
    stacked = stack_microbatches(batches)
    reps = max(steps // len(batches), 1)
    tiled = jax.tree.map(lambda x: jnp.concatenate([x] * reps), stacked)
    n_steps = reps * len(batches)

    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)
    run = make_multistep_train_step(cfg, optimizer, "l1", ema_decay=0.999)

    state, losses = run(state, tiled)
    _ = float(losses[-1])  # compile + settle

    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        state, losses = run(state, tiled)
        _ = float(losses[-1])
    wall = time.time() - t0
    print(f"{n_steps} steps traced in {wall:.3f}s "
          f"({wall/n_steps*1e3:.3f} ms/step wall)", file=sys.stderr)
    return wall / n_steps


def summarize(trace_dir: str, ms_step_wall: float) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Map pid/tid -> lane name.
    names: dict = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", str(e["pid"]))
    by_lane: dict = {}
    spans: dict = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = names.get(e["pid"], str(e["pid"]))
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        lane = (pname, e.get("tid"))
        dur = float(e.get("dur", 0.0))
        by_lane[lane] = by_lane.get(lane, 0.0) + dur
        ts = float(e["ts"])
        lo, hi = spans.get(lane, (ts, ts))
        spans[lane] = (min(lo, ts), max(hi, ts + dur))
    total_busy = 0.0
    for lane, busy in sorted(by_lane.items(), key=lambda kv: -kv[1]):
        lo, hi = spans[lane]
        span = hi - lo
        if span <= 0:
            continue
        print(f"lane {lane[0]}/tid{lane[1]}: busy {busy/1e3:.1f} ms over "
              f"{span/1e3:.1f} ms span -> {busy/span*100:.1f}% busy")
        total_busy = max(total_busy, busy)
    # Top ops on the busiest lane family.
    agg: dict = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = names.get(e["pid"], str(e["pid"]))
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        agg[e["name"]] = agg.get(e["name"], 0.0) + float(e.get("dur", 0.0))
    print("top device ops:")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {dur/1e3:9.1f} ms  {name[:110]}")
    print(f"wall {ms_step_wall:.3f} ms/step")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pamnet_trace"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    ms = run_and_trace(trace_dir, dtype)
    summarize(trace_dir, ms)
