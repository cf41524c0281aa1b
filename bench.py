"""Throughput benchmark: QM9-recipe PAMNet training (dim=128, n_layer=6,
batch=32 — the reference headline configuration, README.md:95) measured as
molecules/sec/chip, plus the RNA-Puzzles scoring secondary metric
(BASELINE.md) in the same run.

Prints one JSON line PER TASK — the FIRST line is the primary QM9 training
contract (pre-staged device steps); the second is RNA scoring; the third is
the QM9 epoch-WALL line (production streaming path incl. host pipeline +
eval); the fourth is PDBbind training throughput:
  {"metric": "qm9_...", "value": N, "unit": "molecules/sec/chip",
   "vs_baseline": N, "baseline": 450.0, "baseline_estimated": true}
  {"metric": "rna_scoring_throughput", ...}
  {"metric": "qm9_epoch_wall_throughput", ...}
  {"metric": "pdbbind_train_throughput", ...}
`PAMNET_BENCH_TASK=qm9|rna|epoch|pdbbind` restricts to one task/line.

Baselines are ESTIMATES (marked `baseline_estimated` in the JSON): the
reference is a single-GPU PyTorch/PyG implementation that publishes no
numbers (BASELINE.md).  QM9: 450 molecules/sec (batch 32, ~70 ms/step on a
V100-class GPU with per-step radius-graph + triplet construction — the
dominant costs measured in SURVEY.md section 3.2).  RNA: 60 graphs/sec.
The driver-set target is >5x (BASELINE.md), i.e. vs_baseline > 5.

Precision: QM9 training runs bf16 activations — the banked default, +12.5%
same-process with 250-epoch convergence indistinguishable from f32
(DEVNOTES.md training-dynamics section); segment reductions and the fusion
softmax accumulate in f32.  RNA scoring stays f32 (near-tie ranking is
sensitive to the ~2.6% bf16 weight-rounding bias).  Matmuls run at jax
DEFAULT precision (bf16 inputs / f32 accumulation — standard TPU training
numerics).  `PAMNET_BENCH_DTYPE` overrides the QM9 activation dtype.
Absolute numbers vary ~3x across sessions on this pool's time-shared TPU
tunnel (DEVNOTES.md); comparisons are only valid same-process.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE_GPU_MOL_PER_SEC = 450.0
# RNA scoring (secondary metric, BASELINE.md): estimated reference throughput
# ~60 graphs/sec (batch-16 forwards incl. per-forward knn(50) + triplet CUDA
# kernels over ~1900-atom structures on a V100-class GPU).
REFERENCE_GPU_RNA_GRAPHS_PER_SEC = 60.0
# PDBbind training (reference recipe main_pdbbind.py:42-54: dim=128 L=3
# batch=32): estimated ~100 graphs/sec on a V100-class GPU — each step runs
# per-forward radius(6.0) construction + triplet enumeration over ~15k
# atoms/batch (3-subgraph complexes, ~400-700 atoms each) plus fwd+bwd;
# scaled from the QM9 estimate by the ~25x atom count and the denser
# radius-6 A global graph (~40-80 neighbors/atom vs QM9's ~15).  Marked
# estimated like the others (no CUDA GPU here to measure).
REFERENCE_GPU_PDBBIND_GRAPHS_PER_SEC = 100.0

# Set by bench_qm9 so bench_epoch can report the estimate-free internal
# epoch-wall : device-step ratio when both tasks run in one process.
_QM9_DEVICE_STEP_MOL_S: float | None = None


def bench_rna():
    """RNA-Puzzles scoring throughput with the bundled checkpoint + data."""
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.models import apply_pamnet
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint
    from pamnet_tpu.utils.runtime import resolve_path

    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    data_root = resolve_path(
        os.path.join(".", "data", "RNA-Puzzles"),
        os.path.join(ref, "data", "RNA-Puzzles"),
    )
    ckpt = resolve_path(
        os.path.join(".", "save", "pamnet_rna.pt"),
        os.path.join(ref, "save", "pamnet_rna.pt"),
    )
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    params = load_torch_checkpoint(ckpt)
    mols = TUDataset(data_root, "rna_native").molecules()
    batch_size = 16
    t0 = time.time()
    # No ELL tables for inference on wide-degree knn graphs (DEVNOTES.md):
    # scatter-free pays in training backwards, not here.  Exact per-batch
    # pads: one compile per distinct batch shape, zero geometric-bucket
    # overshoot (+42% over one fixed bucket, +14% over the geometric
    # ladder; identical scores — tools/tpu_ab.py ladder).
    loader = GraphLoader(mols, "rna", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=batch_size, build_tables=False,
                         ladder_pads="exact")
    print(f"host structure build: {time.time()-t0:.1f}s, pads={loader.pads}",
          file=sys.stderr)
    batches = [jax.tree.map(jnp.asarray, gb) for gb in loader]

    # Chain an accumulator through every forward so fetching one scalar at
    # the end forces ALL executions (block_until_ready lies on this tunnel).
    fwd_acc = jax.jit(
        lambda p, g, acc: acc + apply_pamnet(p, g, cfg).sum()
    )
    acc = jnp.float32(0.0)
    t0 = time.time()
    for gb in batches:
        acc = fwd_acc(params, gb, acc)
    _ = float(acc)
    print(f"compile+first pass: {time.time()-t0:.1f}s", file=sys.stderr)

    reps = 10
    acc = jnp.float32(0.0)
    t0 = time.time()
    for _ in range(reps):
        for gb in batches:
            acc = fwd_acc(params, gb, acc)
    _ = float(acc)
    elapsed = time.time() - t0
    gps = reps * len(mols) / elapsed
    print(f"{reps * len(mols)} scorings in {elapsed:.3f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "rna_scoring_throughput",
        "value": round(gps, 1),
        "unit": "graphs/sec/chip",
        "vs_baseline": round(gps / REFERENCE_GPU_RNA_GRAPHS_PER_SEC, 2),
        "baseline": REFERENCE_GPU_RNA_GRAPHS_PER_SEC,
        "baseline_estimated": True,
    }))


def bench_epoch():
    """QM9 epoch-WALL throughput through the production streaming path:
    GraphLoader shuffle + prefetch + EpochRunner scan blocks + EMA-weight
    StackedEval of a val split — everything a real epoch pays except disk IO
    (synthetic molecules), mirroring main_qm9.py's epoch loop.  The first
    (compile + eval-staging) epoch is excluded; the measured epoch includes
    host collation, host->device transfer, the device steps, and the val
    eval — the honest end-to-end number next to bench_qm9's device-step-only
    contract metric (the gap between the two IS the host pipeline cost;
    reference epochs time data loading too, main_qm9.py:99-132)."""
    import numpy as np

    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
    from pamnet_tpu.train.loop import (
        EpochRunner,
        StackedEval,
        make_multistep_eval,
    )
    from pamnet_tpu.utils.recipe import QM9_RECIPE, qm9_bench_config, qm9_train_state
    from pamnet_tpu.utils.wirepack import stage as to_device

    batch_size = QM9_RECIPE["batch_size"]
    n_train = int(os.environ.get("PAMNET_BENCH_EPOCH_MOLS", 4096))
    n_val = max(n_train // 8, batch_size)
    cfg = qm9_bench_config()
    mols = synthetic_qm9_dataset(n_train + n_val, seed=481)
    t0 = time.time()
    # build_tables="derive": the shipped streaming default — ship tiny shape
    # markers instead of the (G, K) ELL tables (~45% of the wired bytes) and
    # re-derive them bit-identically inside the compiled step
    # (ops/ell.py::materialize_tables).  Costs 3.3% on pre-staged device
    # steps but won the streaming epoch wall 1.69x same-process
    # (tools/tpu_ab.py derive).  PAMNET_BENCH_TABLES=host restores wired
    # tables.
    tables = (True if os.environ.get("PAMNET_BENCH_TABLES") == "host"
              else "derive")
    # wire_geometry="derive": ship positions + integer tables only;
    # distances/angles/bases recomputed inside the compiled step.  Costs
    # 3.1% on pre-staged device steps but won the streaming epoch wall
    # 2.02x same-process (wire 0.771 -> 0.387 MB/batch; tools/tpu_ab.py
    # geo).  PAMNET_BENCH_GEOMETRY=host restores wired float geometry.
    geometry = (os.environ.get("PAMNET_BENCH_GEOMETRY", "derive")
                if tables == "derive" else "host")
    # compact_wire: int16 indices + counts instead of masks, hydrated
    # bit-identically on device (+19% epoch wall, wire 0.387 -> 0.160
    # MB/batch; tools/tpu_ab.py wiremin).  PAMNET_BENCH_WIRE=full opts out.
    compact = (geometry == "derive"
               and os.environ.get("PAMNET_BENCH_WIRE") != "full")
    # cache_collate: with the frozen balanced plan the collated wire per
    # batch is a pure function of its molecule set, so epochs 2+ skip host
    # collation entirely (+27.6% epoch wall same-process, bit-identical
    # arrays; tools/tpu_ab.py colcache).  The compile epoch below populates
    # the cache, mirroring a real multi-epoch --balanced_batches run.
    # PAMNET_BENCH_COLCACHE=off opts out.
    colcache = os.environ.get("PAMNET_BENCH_COLCACHE") != "off"
    train_loader = GraphLoader(mols[:n_train], "qm9", cfg.cutoff_l,
                               cfg.cutoff_g, batch_size=batch_size,
                               shuffle=True, seed=480, drop_last=True,
                               balanced_batches=True, build_tables=tables,
                               build_perms=True, wire_geometry=geometry,
                               compact_wire=compact, cache_collate=colcache)
    # Mirrors the drivers: eval loaders skip the gather-backward aux arrays
    # (no backward to route).
    val_loader = GraphLoader(mols[n_train:], "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=batch_size, balanced_batches=True,
                             build_perms=False)
    print(f"epoch-wall: structure build {time.time()-t0:.1f}s "
          f"(train={n_train} val={n_val})", file=sys.stderr)

    _, optimizer, state = qm9_train_state(cfg, len(train_loader))
    runner = EpochRunner(cfg, optimizer, "l1",
                         ema_decay=QM9_RECIPE["ema_decay"], scan_steps=16)
    val_eval = StackedEval(make_multistep_eval(cfg), val_loader, to_device)

    t0 = time.time()
    state, _, ng, _ = runner.run(state, train_loader.prefetch(), to_device)
    val_pred = val_eval.predict(state.ema)
    _ = float(np.abs(val_pred - val_eval.y).mean())
    print(f"epoch-wall: compile epoch {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    state, _, ng, _ = runner.run(state, train_loader.prefetch(), to_device)
    val_mae = float(np.abs(val_eval.predict(state.ema) - val_eval.y).mean())
    elapsed = time.time() - t0
    mol_per_sec = ng / elapsed
    print(f"epoch-wall: {ng:.0f} molecules + {n_val}-mol eval in "
          f"{elapsed:.2f}s (val MAE {val_mae:.3f})", file=sys.stderr)
    record = {
        "metric": "qm9_epoch_wall_throughput",
        "value": round(mol_per_sec, 1),
        "unit": "molecules/sec/chip",
        "vs_baseline": round(mol_per_sec / REFERENCE_GPU_MOL_PER_SEC, 2),
        "baseline": REFERENCE_GPU_MOL_PER_SEC,
        "baseline_estimated": True,
        "epoch_seconds": round(elapsed, 2),
    }
    if _QM9_DEVICE_STEP_MOL_S:
        # Estimate-free internal ratio: production streaming epoch wall vs
        # the pre-staged device-step contract line, same process (the gap
        # IS the host pipeline + eval cost; VERDICT r4 #8).
        record["ratio_to_device_step"] = round(
            mol_per_sec / _QM9_DEVICE_STEP_MOL_S, 3)
    print(json.dumps(record))


def bench_pdbbind():
    """PDBbind training throughput (reference recipe main_pdbbind.py:42-54:
    dim=128, n_layer=3, batch=32, MSE + MultiStepLR, no EMA) over
    realistic-scale synthetic 3-subgraph complexes (~400-700 atoms each,
    radius-6A global graphs — the edge/triplet skew real preprocessed
    PDBbind graphs have; data/synthetic.py::synthetic_pdbbind_complex).
    Measures pre-staged device steps like the QM9 contract line."""
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.config import PAMNetConfig
    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.synthetic import synthetic_pdbbind_complex_dataset
    from pamnet_tpu.models import count_parameters
    from pamnet_tpu.train.loop import (
        init_train_state,
        make_multistep_train_step,
        make_optimizer,
        stack_microbatches,
    )
    from pamnet_tpu.train.schedules import multistep
    from pamnet_tpu.utils.recipe import qm9_bench_dtype

    batch_size = 32
    cfg = PAMNetConfig(dataset="PDBbind", dim=128, n_layer=3,
                       cutoff_l=2.0, cutoff_g=6.0,
                       compute_dtype=qm9_bench_dtype())
    t0 = time.time()
    # 4 distinct staged blocks x 64 scan steps: a 128-step tile of these
    # ~10 MB batches plus the (E~350k, dim) edge streams exhausted HBM on
    # the v5e-1 tunnel slice.
    mols = [dict(pos=g["attrs"], feat=g["labels"], y=g["y"])
            for g in synthetic_pdbbind_complex_dataset(4 * batch_size)]
    # No ELL tables: the radius-6 A global graph carries ~40-80
    # neighbors/atom, and the (G, K) ELL gather-aggregation measured 2.8x
    # SLOWER than sorted-scan forwards + perm-routed scan backwards at
    # these shapes (tools/tpu_ab.py pdbbind) — the RNA wide-degree lesson
    # extends to training.  PAMNET_BENCH_TABLES=host restores ELL tables.
    tables = os.environ.get("PAMNET_BENCH_TABLES") == "host"
    loader = GraphLoader(mols, "pdbbind", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=batch_size, shuffle=False, drop_last=True,
                         balanced_batches=True, build_tables=tables,
                         build_perms=True, wire_geometry="derive",
                         compact_wire=True)
    print(f"pdbbind: structure build {time.time()-t0:.1f}s, "
          f"pads={loader.pads}", file=sys.stderr)
    batches = [jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), gb)
               for gb in loader]

    from pamnet_tpu.models import init_pamnet
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    print(f"pdbbind params: {count_parameters(params):,}", file=sys.stderr)
    # lr 1e-5 (not the recipe's 1e-3): random-feature synthetic complexes
    # diverge under constant high lr within the measured block, and a nan
    # loss in the contract artifact reads as a correctness bug (convergence
    # evidence lives in docs/evidence/pdbbind_*; throughput is lr-blind).
    optimizer = make_optimizer(multistep(1e-5, steps_per_epoch=len(loader)))
    state = init_train_state(params, optimizer, use_ema=False)

    steps = int(os.environ.get("PAMNET_BENCH_PDBBIND_STEPS", 64))
    S = len(batches)
    reps = max(steps // S, 1)
    stacked = stack_microbatches(batches)
    tiled = jax.tree.map(lambda x: jnp.concatenate([x] * reps), stacked)
    run = make_multistep_train_step(cfg, optimizer, "mse", ema_decay=None)

    t0 = time.time()
    state, losses = run(state, tiled)
    _ = float(losses[-1])
    print(f"pdbbind compile+first block: {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    state, losses = run(state, tiled)
    last_loss = float(losses[-1])
    elapsed = time.time() - t0
    n_steps = reps * S
    gps = n_steps * batch_size / elapsed
    print(f"pdbbind: {n_steps} steps in {elapsed:.3f}s -> {gps:.1f} graphs/s "
          f"({elapsed/n_steps*1000:.3f} ms/step), loss={last_loss:.4f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "pdbbind_train_throughput",
        "value": round(gps, 1),
        "unit": "graphs/sec/chip",
        "vs_baseline": round(gps / REFERENCE_GPU_PDBBIND_GRAPHS_PER_SEC, 2),
        "baseline": REFERENCE_GPU_PDBBIND_GRAPHS_PER_SEC,
        "baseline_estimated": True,
    }))


def main():
    from pamnet_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    task = os.environ.get("PAMNET_BENCH_TASK", "both")
    if task == "rna":
        bench_rna()
        return
    if task == "epoch":
        bench_epoch()
        return
    if task == "pdbbind":
        bench_pdbbind()
        return
    bench_qm9()
    if task == "both":
        bench_rna()
        bench_epoch()
        bench_pdbbind()


def bench_qm9():
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.data.loader import GraphLoader
    from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
    from pamnet_tpu.models import count_parameters
    from pamnet_tpu.utils.recipe import QM9_RECIPE, qm9_bench_config, qm9_train_state

    batch_size = int(os.environ.get("PAMNET_BENCH_BATCH",
                                    QM9_RECIPE["batch_size"]))
    # PAMNET_BENCH_MODEL=PAMNet_s benches the one-hop efficiency variant
    # (reference models.py:227-353) at the same recipe.
    variant = "s" if os.environ.get("PAMNET_BENCH_MODEL") == "PAMNet_s" else "full"
    n_mols = 16 * batch_size
    steps = int(os.environ.get("PAMNET_BENCH_STEPS", 512))

    env_int = lambda k: int(os.environ[k]) if k in os.environ else None
    cfg = qm9_bench_config(dim=env_int("PAMNET_BENCH_DIM"),
                           n_layer=env_int("PAMNET_BENCH_LAYERS"),
                           variant=variant)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    mols = synthetic_qm9_dataset(n_mols, seed=480)
    # balanced_batches: frozen LPT-packed composition + pads pinned to the
    # plan's true maxima instead of the any-shuffle worst-case bucket
    # (+52% same-process at this recipe — the step is HBM-bound on padded
    # edge gathers and the worst-case bucket pads 1.4-1.8x more rows than
    # real batches fill; tools/tpu_ab.py planpads).  Same batch size, same
    # math, every molecule once per epoch (the bench set divides evenly;
    # non-divisible splits freeze the dropped remainder — loader docstring);
    # epochs reshuffle batch order only (as --device_data).  The
    # reference pays no padding at all (dense per-batch tensors), so
    # plan-true pads move the measured workload CLOSER to the reference's.
    # PAMNET_BENCH_PADS=worstcase restores the any-shuffle bucket.
    balanced = os.environ.get("PAMNET_BENCH_PADS", "balanced") != "worstcase"
    loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=batch_size, shuffle=False, drop_last=True,
                         variant=variant, balanced_batches=balanced)
    print(f"pads: {loader.pads}", file=sys.stderr)

    # Prebuild + stage a handful of distinct batches on device: measures the
    # device training step; host collation overlaps via prefetch in real runs.
    batches = []
    for i, gb in enumerate(loader):
        batches.append(jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), gb))
        if i >= 7:
            break

    params, optimizer, state = qm9_train_state(cfg, len(loader))
    print(f"params: {count_parameters(params):,}", file=sys.stderr)

    # On-device multi-step training (lax.scan over a block of batches): one
    # dispatch per S steps, measuring true device throughput rather than
    # per-step host dispatch latency.
    from pamnet_tpu.train.loop import make_multistep_train_step, stack_microbatches

    # One device dispatch for the whole measured run: tile the distinct
    # batches up to `steps` along the scan axis (dispatch overhead over this
    # pool's TPU tunnel is ~80 ms/call and would otherwise dominate).
    S = len(batches)
    reps = max(steps // S, 1)
    stacked = stack_microbatches(batches)  # (S, ...)
    tiled = jax.tree.map(lambda x: jnp.concatenate([x] * reps), stacked)
    run = make_multistep_train_step(cfg, optimizer, "l1",
                                    ema_decay=QM9_RECIPE["ema_decay"])

    # Warmup / compile with a STAGED attribution (VERDICT r4 #8: each
    # round's cold-start number must explain itself — trace/lower vs XLA
    # compile vs first-execution remote program load vs tunnel queueing;
    # methodology from tools/compile_attribution.py).  NOTE: timing must end
    # with a host fetch of a scalar that depends on the whole computation —
    # on this pool's tunneled TPU, block_until_ready returns before
    # execution completes (verified against known-FLOP matmul chains), so
    # device-side timestamps lie (the tile+stage line is therefore an
    # enqueue time; deferred work lands in "first block").
    t0 = time.time()
    jax.block_until_ready(tiled)
    t1 = time.time()
    lowered = run.lower(state, tiled)
    t2 = time.time()
    compiled = lowered.compile()
    t3 = time.time()
    state, losses = compiled(state, tiled)
    _ = float(losses[-1])
    t4 = time.time()
    print(f"compile+first block: {t4-t0:.1f}s (tile+stage-enqueue "
          f"{t1-t0:.1f}s, trace+lower {t2-t1:.1f}s, compile() {t3-t2:.1f}s, "
          f"first block incl. remote program load {t4-t3:.1f}s)",
          file=sys.stderr)

    t0 = time.time()
    state, losses = compiled(state, tiled)
    last_loss = float(losses[-1])  # forces the chained pipeline to finish
    elapsed = time.time() - t0

    n_steps = reps * S
    mol_per_sec = n_steps * batch_size / elapsed
    print(
        f"{n_steps} steps in {elapsed:.3f}s -> {mol_per_sec:.1f} mol/s "
        f"({elapsed/n_steps*1000:.3f} ms/step), loss={last_loss:.4f}",
        file=sys.stderr,
    )
    metric = ("qm9_pamnet_s_d128_L6_train_throughput" if variant == "s"
              else "qm9_pamnet_d128_L6_train_throughput")
    # Estimate-free internal numbers ride inside the contract JSON: XLA's
    # own per-step FLOP count (loop body counted once; verified against an
    # analytic matmul count, tools/roofline.py) and the implied MFU vs the
    # 197 TFLOP/s v5e bf16 peak.
    try:
        # The scan body is counted ONCE by XLA's cost model (verified in
        # tools/roofline.py), so this is already per-step.
        flops_step = float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:  # cost model unavailable on some backends
        flops_step = 0.0
    record = {
        "metric": metric,
        "value": round(mol_per_sec, 1),
        "unit": "molecules/sec/chip",
        "vs_baseline": round(mol_per_sec / REFERENCE_GPU_MOL_PER_SEC, 2),
        "baseline": REFERENCE_GPU_MOL_PER_SEC,
        "baseline_estimated": True,
        "ms_per_step": round(elapsed / n_steps * 1e3, 3),
    }
    if flops_step:
        record["flops_per_step"] = flops_step
        record["mfu_vs_v5e_bf16_peak_pct"] = round(
            flops_step / (elapsed / n_steps) / 197e12 * 100, 2)
    print(json.dumps(record))
    global _QM9_DEVICE_STEP_MOL_S
    _QM9_DEVICE_STEP_MOL_S = mol_per_sec


if __name__ == "__main__":
    main()
