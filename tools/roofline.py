"""Roofline / MFU statement for the shipped QM9 train step (VERDICT r3 #2).

Computes, for the exact program bench.py ships (QM9 recipe d=128 L=6 batch
32, bf16 activations, balanced pads, ELL tables, 512-step scan block):

* XLA's own cost model for the compiled executable (``compiled.
  cost_analysis()``): total FLOPs and bytes accessed per optimizer step —
  the numerator of both roofline ratios, measured from the post-fusion HLO
  rather than hand-counted;
* honest wall time per step (chained-accumulator host-fetch timing —
  block_until_ready lies over this pool's tunnel, DEVNOTES.md);
* achieved FLOP/s vs the v5e bf16 MXU peak (197 TFLOP/s nominal; this
  pool's tunnel sustains ~64 TFLOP/s on pure bf16 4096^3 matmuls, the
  DEVNOTES calibration — both denominators are reported) and achieved
  HBM bytes/s vs the v5e 819 GB/s peak;
* an analytic table of the dominant per-step byte streams (ELL gather rows
  at the padded lane-row cost) so the "which stream dominates" claim is
  recomputable, not just asserted from old traces.

Usage:  python tools/roofline.py            (TPU; ~2 min incl. compile)
        PAMNET_BENCH_DTYPE=float32 python tools/roofline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM BW.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 98.5e12
V5E_PEAK_HBM_BPS = 819e9
# DEVNOTES.md calibration: sustained bf16 matmul throughput actually
# reachable through this pool's time-shared tunnel (20x 4096^3 chain).
TUNNEL_SUSTAINED_FLOPS = 64e12


def main():
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
    from pamnet_tpu.train.loop import make_multistep_train_step, stack_microbatches
    from pamnet_tpu.utils.recipe import QM9_RECIPE, qm9_bench_config, qm9_train_state
    from pamnet_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    # Single-sourced with bench.py's contract line (pamnet_tpu/utils/recipe.py)
    # so this roofline always prices the program the bench ships.
    batch_size, steps = QM9_RECIPE["batch_size"], 512
    cfg = qm9_bench_config()
    dim, n_layer, dtype = cfg.dim, cfg.n_layer, cfg.compute_dtype
    mols = synthetic_qm9_dataset(16 * batch_size, seed=480)
    loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=batch_size, shuffle=False, drop_last=True,
                         balanced_batches=True)
    pads = loader.pads
    print(f"pads: {pads}", file=sys.stderr)
    batches = [jax.tree.map(jnp.asarray, gb) for gb in loader][:8]

    _, optimizer, state = qm9_train_state(cfg, len(loader))
    S = len(batches)
    reps = steps // S
    stacked = stack_microbatches(batches)
    tiled = jax.tree.map(lambda x: jnp.concatenate([x] * reps), stacked)
    run = make_multistep_train_step(cfg, optimizer, "l1",
                                    ema_decay=QM9_RECIPE["ema_decay"])

    # ---- XLA cost model of the compiled block ----
    # NOTE on loop semantics: the 512-step scan lowers to ONE while loop and
    # XLA's cost analysis counts the loop BODY once (verified: the reported
    # total, ~3.5e10 FLOPs, matches an analytic matmul count for a single
    # fwd+bwd step at these pad shapes to ~15%), so the module totals ARE
    # per-step numbers (prologue/epilogue negligible at S=512).
    # "bytes accessed" prices every op's operands+outputs at HBM cost even
    # when fusion keeps them in registers/VMEM — treat it as an upper bound,
    # not achieved traffic; the analytic gather table below estimates the
    # real dominant HBM streams.
    lowered = jax.jit(run).lower(state, tiled)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    n_steps = reps * S
    flops_step = float(ca.get("flops", float("nan")))
    bytes_step_upper = float(ca.get("bytes accessed", float("nan")))

    # ---- honest wall time ----
    t0 = time.time()
    state2, losses = run(state, tiled)
    _ = float(losses[-1])
    print(f"compile+first block: {time.time() - t0:.1f}s", file=sys.stderr)
    best = None
    for _ in range(3):
        t0 = time.time()
        state2, losses = run(state2, tiled)
        _ = float(losses[-1])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    step_s = best / n_steps

    achieved_flops = flops_step / step_s
    peak_flops = (V5E_PEAK_BF16_FLOPS if dtype == "bfloat16"
                  else V5E_PEAK_F32_FLOPS)

    # ---- analytic dominant-stream table (per step, padded shapes) ----
    # Random row gathers move one padded lane row (128 lanes) per row read;
    # at d=128 that is d*itemsize bytes/row.  Scans stream their rows
    # (~3 passes: cumsum read+write + sliced output).  Row READS only —
    # output writes are mostly fused.  Mirrors the SHIPPED routing
    # defaults (models/layers.py): forward agg mix = t2_ji/t1_ji/el_dst
    # scan + eg_dst ELL K-sum; gather backwards = scan routing for
    # el_dst/el_src/t2_kj/t1_jj (el_src and the triplet keys pay one extra
    # R-row random permute gather), ELL for the eg keys.
    item = 2 if dtype == "bfloat16" else 4
    row = dim * item
    SCAN = 3
    streams = {
        # global plex: x_i/x_j node-projection gathers + their ELL backwards
        "eg_gathers_fwd": 2 * pads.eg * row,
        "eg_gathers_bwd_ell": pads.n * (pads.kg_dst + pads.kg_src) * row,
        # local plex: x_i/x_j gathers for BOTH edge messages + scan backwards
        "el_gathers_fwd": 4 * pads.el * row,
        "el_gathers_bwd_scan": (2 * SCAN + 2 * (1 + SCAN)) * pads.el * row,
        # triplet m_neighbor gathers + their perm-scan backwards
        "triplet_gathers_fwd": (pads.t2 + pads.t1) * row,
        "triplet_gathers_bwd_scan": (1 + SCAN) * (pads.t2 + pads.t1) * row,
        # forward segment sums (mix) + their g[seg_ids] backward gathers
        "agg_fwd_scan": SCAN * (pads.t2 + pads.t1 + pads.el) * row,
        "agg_fwd_eg_ell": pads.n * pads.kg_dst * row,
        "agg_bwd_gathers": (pads.t2 + pads.t1 + pads.el + pads.eg) * row,
    }
    streams = {k: v * n_layer for k, v in streams.items()}

    gather_bytes = sum(streams.values())
    gather_bps = gather_bytes / step_s
    report = {
        "metric": "qm9_train_roofline",
        "dtype": dtype,
        "ms_per_step": round(step_s * 1e3, 3),
        "flops_per_step": flops_step,
        "bytes_accessed_upper_bound_per_step": bytes_step_upper,
        "achieved_tflops": round(achieved_flops / 1e12, 2),
        "mfu_vs_v5e_peak": round(achieved_flops / peak_flops, 4),
        "mfu_vs_tunnel_sustained": round(
            achieved_flops / TUNNEL_SUSTAINED_FLOPS, 4),
        "analytic_gather_bytes_per_step": {
            k: int(v) for k, v in streams.items()
        },
        "analytic_gather_gbps": round(gather_bps / 1e9, 1),
        "gather_hbm_roofline_fraction": round(
            gather_bps / V5E_PEAK_HBM_BPS, 4),
        "n_steps_timed": n_steps,
    }
    print(json.dumps(report))
    print(
        f"\nStatement: at {report['ms_per_step']} ms/step the compiled step "
        f"executes {flops_step / 1e9:.1f} GFLOP (XLA cost model) = "
        f"{report['achieved_tflops']} TFLOP/s — "
        f"{100 * report['mfu_vs_v5e_peak']:.1f}% MFU vs the v5e bf16 peak "
        f"and {100 * report['mfu_vs_tunnel_sustained']:.1f}% of this pool's "
        f"sustained-tunnel matmul rate.  The analytic gather streams alone "
        f"move {gather_bytes / 1e6:.0f} MB/step = "
        f"{report['analytic_gather_gbps']} GB/s — "
        f"{100 * report['gather_hbm_roofline_fraction']:.1f}% of the 819 "
        f"GB/s sequential HBM roofline.  The binding ceiling for these "
        f"streams is the RANDOM-row DMA rate, not sequential bandwidth "
        f"(tools/gather_micro.py measured ~20 GB/s effective for random "
        f"padded-row gathers regardless of index pattern), so the step is "
        f"gather-DMA-limited, not MXU-limited — matching the round-2/3 "
        f"trace attribution (gathers ~half of leaf device time).",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
