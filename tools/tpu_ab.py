"""Same-process TPU A/B harness (DEVNOTES.md: cross-session variance ~3x, so
every comparison must run back-to-back in ONE process, timed with host
fetches that data-depend on the whole computation).

Experiments (select with argv[1:], default: dtype):
  dtype   f32 vs bf16 compute at the QM9 headline recipe (d=128 L=6 b=32),
          512-step single-dispatch scans, ELL tables on.
  pallas  native-TPU evidence for ops/pallas_triplet.py: ELL tables vs XLA
          scatter vs the Pallas MXU kernel at a config that passes the VMEM
          gate (batch 8, align=256).
  rna     RNA scoring f32 vs bf16 compute (bundled data + checkpoint).
  fold    RNA scoring: folded sbf projection vs the unfolded table path.
  fuse    RNA scoring: fused sbf+message single-row triplet gather vs the
          split folded gathers (+ the bf16 compound).
  ladder  RNA scoring: per-batch ladder padding buckets vs one fixed
          worst-case bucket.
  flatopt QM9 recipe: per-leaf vs flattened optimizer/EMA tails (measured
          refutation — tree is already at its floor).
  variant QM9 recipe: PAMNet vs PAMNet_s (bf16).
  batch   QM9 recipe (bf16) at batch 32/64/128 — per-chip batching headroom.
  devgraph QM9 recipe: host-precomputed structure vs on-device per-forward
          rebuild (--device_graph), the reference's construction semantics.
  scan    RNA scoring (fold+fuse+ladder): compensated prefix-scan segment
          sums vs plain XLA scatter-adds (both exact; pure speed question).
  scanimpl RNA scoring: blocked two-level scan vs global TwoSum scan
          (PAMNetConfig.sorted_scan_impl; both compensated, pure speed).
  aggfwd  QM9 recipe (bf16): forward segment sums via ELL K-sum vs blocked
          sorted scan, with ELL gather backwards kept in both variants.
  aggmix  like aggfwd but at the shipped balanced-pads config, adding the
          per-key mix (triplet reductions sorted, global tables ELL).
  gathbwd gather-BACKWARD routing per key: ELL-table cotangent aggregation
          (G*K padded random rows) vs the blocked scan over the real rows
          (gather_sorted/gather_perm; PAMNetConfig.gather_backward).
  evalpads stacked eval with plan-pinned vs LPT-balanced eval composition
          (order-free, so balancing eval is exactly metric-preserving).
  derive  device-derived ELL tables (materialize_tables) vs host-built
          wired tables: scan-step cost + production epoch-wall gain.
  geo     derive-mode GEOMETRY (positions+indices only on the wire;
          distances/bases recomputed in the compiled step) vs host float
          geometry: scan-step cost + production epoch-wall gain.
  pdbbind PDBbind training step at the reference recipe over realistic
          3-subgraph complexes: ELL tables vs sorted-scan/perm routing vs
          host-wired tables (wide-degree radius-6 graphs).
  rnatables RNA training at the reference recipe: derive-mode ELL tables
          vs sorted-scan/perm routing (knn-50 wide degrees).
  colcache  cross-epoch collation cache (GraphLoader cache_collate) vs
          per-epoch re-collation at the shipped streaming config.
  blocksteps scan_steps 16/32/64 at the cached streaming config (dispatch
          overhead amortization vs per-call staged payload).

Each experiment prints one `AB <name> variant=... mol_s=...` line per variant.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
from pamnet_tpu.models import count_parameters, init_pamnet
from pamnet_tpu.train.loop import (
    init_train_state,
    make_multistep_train_step,
    make_optimizer,
    stack_microbatches,
)
from pamnet_tpu.train.schedules import warmup_exponential
from pamnet_tpu.utils.runtime import enable_compilation_cache


def _stage(loader, n_blocks=8):
    batches = []
    for i, gb in enumerate(loader):
        batches.append(jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), gb))
        if i + 1 >= n_blocks:
            break
    return batches


def _tile(batches, steps):
    S = len(batches)
    reps = max(steps // S, 1)
    stacked = stack_microbatches(batches)
    return jax.tree.map(lambda x: jnp.concatenate([x] * reps), stacked), reps * S


def _run_scan(name, variant, cfg, state, tiled, n_steps, batch_size):
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    run = make_multistep_train_step(cfg, optimizer, "l1", ema_decay=0.999)
    t0 = time.time()
    s1, losses = run(state, tiled)
    _ = float(losses[-1])
    print(f"  [{variant}] compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    best = None
    for _ in range(3):
        t0 = time.time()
        s1, losses = run(state, tiled)
        last = float(losses[-1])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    mol_s = n_steps * batch_size / best
    print(f"AB {name} variant={variant} ms_step={best/n_steps*1e3:.3f} "
          f"mol_s={mol_s:.1f} loss={last:.4f}")
    return mol_s


def exp_dtype():
    cfg32 = PAMNetConfig(dataset="QM9", dim=128, n_layer=6,
                         cutoff_l=5.0, cutoff_g=5.0)
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    loader = GraphLoader(mols, "qm9", cfg32.cutoff_l, cfg32.cutoff_g,
                         batch_size=bs, shuffle=False, drop_last=True)
    print(f"pads: {loader.pads}", file=sys.stderr)
    batches = _stage(loader)
    tiled, n_steps = _tile(batches, 512)
    params = init_pamnet(jax.random.PRNGKey(480), cfg32)
    print(f"params: {count_parameters(params):,}", file=sys.stderr)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    a = _run_scan("dtype", "f32", cfg32, state, tiled, n_steps, bs)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    b = _run_scan("dtype", "bf16", cfg16, state, tiled, n_steps, bs)
    a2 = _run_scan("dtype", "f32_again", cfg32, state, tiled, n_steps, bs)
    print(f"AB dtype speedup={b/max(a,a2):.3f}x (vs best f32)")


def exp_flatopt():
    """Per-leaf kernel overhead in the optimizer/EMA tail of the train step:
    the round-2 trace attributed 0.26 ms/step to the EMA update alone —
    ~16x its HBM-traffic floor, i.e. ~200 tiny per-leaf kernels.  Variants:
      tree      production step (tree Adam + tree EMA)
      no_ema    EMA removed entirely (upper bound on the EMA win)
      flat_ema  EMA on ravel_pytree(params): 2 kernels instead of ~200
      flat_all  optax.flatten(Adam chain) + flat EMA
    """
    from jax.flatten_util import ravel_pytree

    import optax

    from pamnet_tpu.models import apply_pamnet
    from pamnet_tpu.train.loop import TrainState, _loss_terms

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6,
                       cutoff_l=5.0, cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=bs, shuffle=False, drop_last=True)
    batches = _stage(loader)
    tiled, n_steps = _tile(batches, 512)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)

    def make_run(flat_opt, ema_mode):
        base = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                              clip_norm=1000.0)
        optimizer = optax.flatten(base) if flat_opt else base

        def loss_fn(p, batch):
            pred = apply_pamnet(p, batch, cfg)
            total, count = _loss_terms(pred, batch.y, batch.graph_mask, "l1")
            return total / jnp.maximum(count, 1.0)

        def body(state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            p = optax.apply_updates(state.params, updates)
            if ema_mode == "tree":
                ema = jax.tree.map(lambda s, q: 0.001 * q + 0.999 * s,
                                   state.ema, p)
            elif ema_mode == "flat":
                ema = 0.001 * ravel_pytree(p)[0] + 0.999 * state.ema
            else:
                ema = None
            return TrainState(p, opt_state, ema, state.step + 1), loss

        ema0 = (ravel_pytree(params)[0] if ema_mode == "flat"
                else jax.tree.map(lambda x: x, params) if ema_mode == "tree"
                else None)
        state = TrainState(params, optimizer.init(params), ema0,
                           jnp.zeros((), jnp.int32))

        @jax.jit
        def run(st, blk):
            return jax.lax.scan(body, st, blk)

        return run, state

    def timed(variant, flat_opt, ema_mode):
        run, state = make_run(flat_opt, ema_mode)
        t0 = time.time()
        _, losses = run(state, tiled)
        _ = float(losses[-1])
        print(f"  [{variant}] compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            _, losses = run(state, tiled)
            last = float(losses[-1])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        mol_s = n_steps * bs / best
        print(f"AB flatopt variant={variant} ms_step={best/n_steps*1e3:.3f} "
              f"mol_s={mol_s:.1f} loss={last:.4f}")
        return mol_s

    a = timed("tree", False, "tree")
    timed("no_ema", False, "none")
    c = timed("flat_ema", False, "flat")
    d = timed("flat_all", True, "flat")
    a2 = timed("tree_again", False, "tree")
    print(f"AB flatopt flat_ema={c/max(a,a2):.3f}x flat_all={d/max(a,a2):.3f}x"
          f" (vs best tree)")


def exp_pallas():
    from pamnet_tpu.ops.pallas_triplet import fits_pallas

    bs = 8
    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6,
                       cutoff_l=5.0, cutoff_g=5.0)
    mols = synthetic_qm9_dataset(16 * bs, seed=481)

    # ELL-table variant (training default)
    lo_t = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g, batch_size=bs,
                       shuffle=False, drop_last=True, align=256)
    # No tables: XLA scatter vs Pallas share these batches
    lo_n = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g, batch_size=bs,
                       shuffle=False, drop_last=True, align=256,
                       build_tables=False)
    pads = lo_n.pads
    ok = fits_pallas(pads.el, pads.t2, cfg.dim) and fits_pallas(pads.el, pads.t1, cfg.dim)
    print(f"pads: {pads}  fits_pallas={ok}", file=sys.stderr)
    if not ok:
        print("AB pallas SKIPPED: VMEM gate fails at this config")
        return

    params = init_pamnet(jax.random.PRNGKey(481), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    tiled_t, n_steps = _tile(_stage(lo_t), 512)
    tiled_n, _ = _tile(_stage(lo_n), 512)
    # Strip ALL tables (collate always builds the sorted-offset entries, and
    # any truthy `tables` routes local_mp away from fused_triplet_aggregate —
    # the op under test).  tables={} -> XLA gather+scatter vs Pallas MXU.
    tiled_0 = tiled_n._replace(tables={})

    _run_scan("pallas", "ell_tables", cfg, state, tiled_t, n_steps, bs)
    _run_scan("pallas", "sorted_offsets", cfg, state, tiled_n, n_steps, bs)
    _run_scan("pallas", "xla_scatter", cfg, state, tiled_0, n_steps, bs)
    cfgp = dataclasses.replace(cfg, use_pallas_triplet=True)
    _run_scan("pallas", "pallas_mxu", cfgp, state, tiled_0, n_steps, bs)


def exp_rna():
    """RNA scoring (bundled data + checkpoint): f32 vs bf16 compute.
    Profile (tools/rna_profile.py) shows the forward is bandwidth-bound on
    random dim-16 gathers; bf16 halves every padded lane-row read."""
    import os

    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.models import apply_pamnet
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint
    from pamnet_tpu.utils.runtime import resolve_path

    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    data_root = resolve_path("./data/RNA-Puzzles",
                             f"{ref}/data/RNA-Puzzles")
    ckpt = resolve_path("./save/pamnet_rna.pt", f"{ref}/save/pamnet_rna.pt")
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    params = load_torch_checkpoint(ckpt)
    mols = TUDataset(data_root, "rna_native").molecules()
    loader = GraphLoader(mols, "rna", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=16, build_tables=False)
    batches = [jax.tree.map(jnp.asarray, gb) for gb in loader]

    def run(variant, c):
        fwd = jax.jit(lambda p, g, acc: acc + apply_pamnet(p, g, c).sum())
        acc = jnp.float32(0.0)
        t0 = time.time()
        for gb in batches:
            acc = fwd(params, gb, acc)
        ref_sum = float(acc)
        print(f"  [{variant}] compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            reps = 10
            acc = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(reps):
                for gb in batches:
                    acc = fwd(params, gb, acc)
            _ = float(acc)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        gps = 10 * len(mols) / best
        print(f"AB rna variant={variant} graphs_s={gps:.1f} "
              f"score_sum={ref_sum:.4f}")
        return gps

    a = run("f32", cfg)
    b = run("bf16", dataclasses.replace(cfg, compute_dtype="bfloat16"))
    a2 = run("f32_again", cfg)
    print(f"AB rna speedup={b/max(a,a2):.3f}x (vs best f32)")


def exp_fold():
    """Folded sbf projection (models/pamnet.py fold_sbf) vs the unfolded
    table path on RNA scoring — round-3 measured 227.8 -> 238.3 g/s with
    scores agreeing to 1.2e-5 relative."""
    run = exp_rna_runner()
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    a = run("unfolded", dataclasses.replace(cfg, fold_sbf=False))
    b = run("folded", dataclasses.replace(cfg, fold_sbf=True))
    a2 = run("unfolded_again", dataclasses.replace(cfg, fold_sbf=False))
    print(f"AB fold speedup={b/max(a,a2):.3f}x (vs best unfolded)")


def exp_fuse():
    """Fused sbf+m_neighbor triplet gather (config.fuse_sbf_gather: one
    concatenated lane row per triplet) vs the split folded gathers vs
    unfolded, on RNA scoring.  Also A/Bs the bf16 compound."""
    run = exp_rna_runner()
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    a = run("fold_nofuse", dataclasses.replace(
        cfg, fold_sbf=True, fuse_sbf_gather=False))
    b = run("fold_fuse", dataclasses.replace(
        cfg, fold_sbf=True, fuse_sbf_gather=True))
    a2 = run("fold_nofuse_again", dataclasses.replace(
        cfg, fold_sbf=True, fuse_sbf_gather=False))
    print(f"AB fuse speedup={b/max(a,a2):.3f}x (vs best fold_nofuse)")
    c = run("fuse_bf16", dataclasses.replace(
        cfg, fold_sbf=True, fuse_sbf_gather=True, compute_dtype="bfloat16"))
    print(f"AB fuse+bf16 speedup={c/max(a,a2):.3f}x (vs best f32 fold_nofuse)")


def exp_ladder():
    """Per-batch ladder pads (GraphLoader ladder_pads=True) vs the fixed
    worst-case bucket on RNA scoring: the 21-structure set batches as 16+5,
    and the 5-graph tail otherwise pays full 16-graph triplet cost."""
    import os

    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.models import apply_pamnet
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint
    from pamnet_tpu.utils.runtime import resolve_path

    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    data_root = resolve_path("./data/RNA-Puzzles", f"{ref}/data/RNA-Puzzles")
    ckpt = resolve_path("./save/pamnet_rna.pt", f"{ref}/save/pamnet_rna.pt")
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    params = load_torch_checkpoint(ckpt)
    mols = TUDataset(data_root, "rna_native").molecules()

    def run(variant, ladder):
        loader = GraphLoader(mols, "rna", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=16, build_tables=False,
                             ladder_pads=ladder)
        batches = [jax.tree.map(jnp.asarray, gb) for gb in loader]
        fwd = jax.jit(lambda p, g, acc: acc + apply_pamnet(p, g, cfg).sum())
        acc = jnp.float32(0.0)
        for gb in batches:
            acc = fwd(params, gb, acc)
        ref_sum = float(acc)
        best = None
        for _ in range(3):
            acc = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(10):
                for gb in batches:
                    acc = fwd(params, gb, acc)
            _ = float(acc)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        gps = 10 * len(mols) / best
        print(f"AB ladder variant={variant} graphs_s={gps:.1f} "
              f"score_sum={ref_sum:.4f}")
        return gps

    a = run("fixed", False)
    b = run("ladder", True)
    a2 = run("fixed_again", False)
    print(f"AB ladder speedup={b/max(a,a2):.3f}x (vs best fixed)")
    # ladder_pads="exact": per-batch counts rounded to align only (no
    # geometric growth) — the geometric buckets overshoot real counts ~20%
    # on average, pure pad waste on a FIXED scoring set; one compile per
    # distinct batch shape instead of per bucket.
    c = run("exact", "exact")
    b2 = run("ladder_again", True)
    print(f"AB ladder exact_vs_ladder={c/max(b,b2):.3f}x")


def exp_rna_runner():
    """Build the RNA scoring runner without executing the dtype A/B."""
    import os

    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.models import apply_pamnet
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint
    from pamnet_tpu.utils.runtime import resolve_path

    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    data_root = resolve_path("./data/RNA-Puzzles", f"{ref}/data/RNA-Puzzles")
    ckpt = resolve_path("./save/pamnet_rna.pt", f"{ref}/save/pamnet_rna.pt")
    params = load_torch_checkpoint(ckpt)
    mols = TUDataset(data_root, "rna_native").molecules()
    loader = GraphLoader(mols, "rna", 2.6, 20.0, batch_size=16,
                         build_tables=False)
    batches = [jax.tree.map(jnp.asarray, gb) for gb in loader]

    def run(variant, c):
        fwd = jax.jit(lambda p, g, acc: acc + apply_pamnet(p, g, c).sum())
        acc = jnp.float32(0.0)
        for gb in batches:
            acc = fwd(params, gb, acc)
        ref_sum = float(acc)
        best = None
        for _ in range(3):
            acc = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(10):
                for gb in batches:
                    acc = fwd(params, gb, acc)
            _ = float(acc)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        gps = 10 * len(mols) / best
        print(f"AB variant={variant} graphs_s={gps:.1f} score_sum={ref_sum:.4f}")
        return gps

    return run


def exp_variant():
    """PAMNet vs PAMNet_s at the QM9 recipe (bf16) — round-3 measured
    5,742.9 vs 6,414.0 mol/s same-process (+11.7%)."""
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)

    def one(variant):
        cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                           cutoff_g=5.0, compute_dtype="bfloat16",
                           variant=variant)
        loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=bs,
                             shuffle=False, drop_last=True, variant=variant)
        batches = _stage(loader)
        tiled, n_steps = _tile(batches, 512)
        params = init_pamnet(jax.random.PRNGKey(480), cfg)
        opt = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                             clip_norm=1000.0)
        state = init_train_state(params, opt, use_ema=True)
        return _run_scan("variant", variant, cfg, state, tiled, n_steps, bs)

    a = one("full")
    b = one("s")
    a2 = one("full")
    print(f"AB variant PAMNet_s speedup={b/max(a,a2):.3f}x (vs best full)")


def exp_batch():
    """QM9 recipe (bf16) throughput vs batch size 32/64/128, same process.

    The reference recipe fixes batch_size=32 (README.md:95); this measures
    the per-chip headroom a production user gets by batching more molecules
    per step (DEVNOTES round-1: 'batching more molecules per step' is a
    lever that works).  Total molecules per dispatch is held constant
    (steps scale down as batch scales up) so dispatch overhead is matched."""
    results = {}
    order = [32, 64, 128, 32]  # re-run 32 last to bound session drift
    for i, bs in enumerate(order):
        cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                           cutoff_g=5.0, compute_dtype="bfloat16")
        mols = synthetic_qm9_dataset(16 * bs, seed=480)
        loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=bs,
                             shuffle=False, drop_last=True)
        batches = _stage(loader)
        tiled, n_steps = _tile(batches, 512 * 32 // bs)
        params = init_pamnet(jax.random.PRNGKey(480), cfg)
        opt = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                             clip_norm=1000.0)
        state = init_train_state(params, opt, use_ema=True)
        tag = f"bs{bs}" + ("_again" if i == 3 else "")
        results[tag] = _run_scan("batch", tag, cfg, state, tiled, n_steps, bs)
    base = max(results["bs32"], results["bs32_again"])
    for bs in (64, 128):
        print(f"AB batch bs{bs} scaling={results[f'bs{bs}'] / base:.3f}x "
              f"(vs best bs32)")


def exp_devgraph():
    """QM9 recipe (bf16): host-precomputed structure (+ELL tables, the
    production default) vs `device_graph` per-forward rebuild (the
    reference's semantics, models.py:104-162; positions-change-under-jit
    path).  Quantifies what the host-precompute design buys."""
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)

    def one(tag, device_graph):
        cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                           cutoff_g=5.0, compute_dtype="bfloat16",
                           device_graph=device_graph)
        loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=bs,
                             shuffle=False, drop_last=True,
                             build_tables=not device_graph)
        batches = _stage(loader)
        tiled, n_steps = _tile(batches, 512)
        params = init_pamnet(jax.random.PRNGKey(480), cfg)
        opt = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                             clip_norm=1000.0)
        state = init_train_state(params, opt, use_ema=True)
        return _run_scan("devgraph", tag, cfg, state, tiled, n_steps, bs)

    a = one("host_structs", False)
    b = one("device_graph", True)
    a2 = one("host_structs_again", False)
    print(f"AB devgraph device_graph cost={max(a, a2)/b:.3f}x slower than "
          f"host-precomputed (production default)")


def _rna_production_setup():
    """(cfg, params, mols, batches) for the RNA production scoring path
    (bundled checkpoint + data, fold+fuse+ladder, f32)."""
    import os

    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint
    from pamnet_tpu.utils.runtime import resolve_path

    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    data_root = resolve_path("./data/RNA-Puzzles", f"{ref}/data/RNA-Puzzles")
    ckpt = resolve_path("./save/pamnet_rna.pt", f"{ref}/save/pamnet_rna.pt")
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    params = load_torch_checkpoint(ckpt)
    mols = TUDataset(data_root, "rna_native").molecules()
    loader = GraphLoader(mols, "rna", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=16, build_tables=False, ladder_pads=True)
    return cfg, params, mols, [jax.tree.map(jnp.asarray, gb) for gb in loader]


def _score_rna(exp, variant, cfg, params, mols, batches):
    """Best-of-3 x 10-rep chained-accumulator scoring run (the DEVNOTES
    honest-fetch timing contract), building a FRESH jit wrapper so
    per-config routing (cfg.agg_forward / cfg.sorted_scan_impl) is re-traced."""
    from pamnet_tpu.models import apply_pamnet

    fwd = jax.jit(lambda p, g, acc: acc + apply_pamnet(p, g, cfg).sum())
    acc = jnp.float32(0.0)
    t0 = time.time()
    for gb in batches:
        acc = fwd(params, gb, acc)
    ref_sum = float(acc)
    print(f"  [{variant}] compile+first: {time.time()-t0:.1f}s",
          file=sys.stderr)
    best = None
    for _ in range(3):
        acc = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(10):
            for gb in batches:
                acc = fwd(params, gb, acc)
        _ = float(acc)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    gps = 10 * len(mols) / best
    print(f"AB {exp} variant={variant} graphs_s={gps:.1f} "
          f"score_sum={ref_sum:.4f}")
    return gps


def exp_scan():
    """Compensated prefix-scan (sorted offsets, the current inference
    default) vs plain XLA scatter-add segment sums on the CURRENT RNA
    production path (fold+fuse+ladder, f32).  Both are exact to ~1e-5 of the
    f64 oracle (scatter-adds measured 7.5e-6; the compensated scan 7.6e-6),
    so this is purely a speed question: the TwoSum compensation cost the
    scan path -28%, and the early-round "sorted beats scatter" matrix
    (77 vs 118 g/s) predates fold/fuse/ladder, which shrank everything
    around the segment sums."""
    cfg, params, mols, base = _rna_production_setup()
    stripped = [gb._replace(tables={}) for gb in base]
    a = _score_rna("scan", "comp_scan", cfg, params, mols, base)
    b = _score_rna("scan", "scatter", cfg, params, mols, stripped)
    a2 = _score_rna("scan", "comp_scan_again", cfg, params, mols, base)
    print(f"AB scan scatter_vs_scan={b/max(a,a2):.3f}x")


def exp_aggfwd():
    """Forward segment-sum routing at the QM9 bf16 recipe when batches carry
    BOTH ELL tables and sorted offsets (PAMNetConfig.agg_forward):
    ELL gather + dense K-sum (G*K random rows, K rounded to 8) vs the
    blocked prefix scan (streams the R sorted rows once).  Gathers keep
    their scatter-free ELL backward in BOTH variants — round 1's
    "sorted 6,957 < ell 9,937" comparison dropped the tables entirely,
    losing the gather backwards to scatter-adds; this isolates the forward
    reduction."""
    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=bs, shuffle=False, drop_last=True)
    batches = _stage(loader)
    tiled, n_steps = _tile(batches, 512)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    ell_cfg = dataclasses.replace(cfg, agg_forward="ell")
    sorted_cfg = dataclasses.replace(cfg, agg_forward="sorted")
    a = _run_scan("aggfwd", "ell", ell_cfg, state, tiled, n_steps, bs)
    b = _run_scan("aggfwd", "sorted", sorted_cfg, state, tiled, n_steps, bs)
    a2 = _run_scan("aggfwd", "ell_again", ell_cfg, state, tiled, n_steps, bs)
    print(f"AB aggfwd sorted_vs_ell={b/max(a,a2):.3f}x")


def exp_scanimpl():
    """Sub-f64 sorted-scan implementations on the RNA production path
    (fold+fuse+ladder, f32): blocked two-level (block-local prefixes + a
    compensated block prefix; ONE short-scan pass over the rows) vs the
    global TwoSum scan (two full-length cumsums + a full-length elementwise
    TwoSum chain).  Accuracy of both is locked by tests/test_ell.py and the
    production parity suite; this measures pure speed."""
    cfg, params, mols, batches = _rna_production_setup()

    def run(variant, impl):
        c = dataclasses.replace(cfg, sorted_scan_impl=impl)
        return _score_rna("scanimpl", variant, c, params, mols, batches)

    a = run("twosum", "twosum")
    b = run("blocked", "blocked")
    a2 = run("twosum_again", "twosum")
    print(f"AB scanimpl blocked_vs_twosum={b/max(a,a2):.3f}x")


def exp_aggmix():
    """Per-key forward segment-sum routing at the SHIPPED bench config
    (balanced pads, bf16): the triplet ELL tables carry the worst
    mean-vs-max padding skew (El*K rows vs ~3.3k real triplet rows at the
    QM9 recipe), while the global-plex table sits near 1.2x — so route ONLY
    the triplet reductions (t2_ji/t1_ji) through the blocked sorted scan and
    keep the big well-packed tables on the ELL K-sum.  The round-3 aggfwd
    A/B was all-or-nothing and pre-dated balanced pads."""
    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=bs, shuffle=False, drop_last=True,
                         balanced_batches=True)
    print(f"pads: {loader.pads}", file=sys.stderr)
    batches = _stage(loader)
    tiled, n_steps = _tile(batches, 512)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    def v(agg):
        return dataclasses.replace(cfg, agg_forward=agg)

    a = _run_scan("aggmix", "ell", v("ell"), state, tiled, n_steps, bs)
    b = _run_scan("aggmix", "mix_triplets", v(frozenset({"t2_ji", "t1_ji"})),
                  state, tiled, n_steps, bs)
    d = _run_scan("aggmix", "mix_triplets_el",
                  v(frozenset({"t2_ji", "t1_ji", "el_dst"})),
                  state, tiled, n_steps, bs)
    c = _run_scan("aggmix", "sorted", v("sorted"), state, tiled, n_steps, bs)
    a2 = _run_scan("aggmix", "ell_again", v("ell"), state, tiled, n_steps, bs)
    base = max(a, a2)
    print(f"AB aggmix mix_vs_ell={b/base:.3f}x mix_el_vs_ell={d/base:.3f}x "
          f"sorted_vs_ell={c/base:.3f}x")


def exp_gathbwd():
    """Gather-BACKWARD routing at the shipped bench config (balanced pads,
    bf16, default agg_forward mix): cotangent aggregation via the ELL table
    (G*K padded random rows) vs the blocked prefix scan over the R real rows
    (gather_sorted for the group-sorted el_dst key, gather_perm + host
    permutation for el_src/t2_kj/t1_jj).  The roofline attribution
    (tools/roofline.py) puts ELL gather backwards as the largest analytic
    stream, and the el_dst/el_src node tables pad ~4.4x / the triplet tables
    ~2.7x over the real row counts — this measures whether streaming the
    real rows beats gathering the padded ones."""
    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                         batch_size=bs, shuffle=False, drop_last=True,
                         balanced_batches=True, build_perms=True)
    print(f"pads: {loader.pads}", file=sys.stderr)
    batches = _stage(loader)
    tiled, n_steps = _tile(batches, 512)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    def v(keys):
        return dataclasses.replace(cfg, gather_backward=keys)

    a = _run_scan("gathbwd", "ell", v(frozenset()), state, tiled, n_steps, bs)
    b = _run_scan("gathbwd", "el", v(frozenset({"el_dst", "el_src"})),
                  state, tiled, n_steps, bs)
    c = _run_scan("gathbwd", "triplets", v(frozenset({"t2_kj", "t1_jj"})),
                  state, tiled, n_steps, bs)
    d = _run_scan(
        "gathbwd", "all",
        v(frozenset({"el_dst", "el_src", "t2_kj", "t1_jj"})),
        state, tiled, n_steps, bs,
    )
    a2 = _run_scan("gathbwd", "ell_again", v(frozenset()), state, tiled,
                   n_steps, bs)
    base = max(a, a2)
    print(f"AB gathbwd el_vs_ell={b/base:.3f}x triplets_vs_ell={c/base:.3f}x "
          f"all_vs_ell={d/base:.3f}x")


def exp_derive():
    """Device-derived ELL tables (collate build_tables="derive" +
    ops/ell.py::materialize_tables) vs host-built wired tables, at the
    shipped bench config (balanced pads, bf16, default routing).

    Two questions, both answered same-process:
    1. STEP: does re-deriving the (G, K) tables inside every scan step cost
       device time?  (Expected ~free: an iota + tiny int gather vs the
       step's ~292 MB of gather streams.)  Losses must match EXACTLY —
       the derived tables are bit-identical to the host builder's.
    2. WALL: what does removing the tables+masks from the wire (~45% of a
       QM9 batch's staged bytes) buy the production streaming path
       (GraphLoader + prefetch + EpochRunner + StackedEval)?
    """
    import numpy as np

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    results = {}
    for name, mode in [("host", True), ("derive", "derive"),
                       ("host_again", True)]:
        loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, shuffle=False, drop_last=True,
                             balanced_batches=True, build_tables=mode,
                             build_perms=True)
        batches = _stage(loader)
        staged_mb = sum(
            l.nbytes for l in jax.tree.leaves(batches[0])) / 1e6
        print(f"  [{name}] wire={staged_mb:.3f} MB/batch", file=sys.stderr)
        tiled, n_steps = _tile(batches, 512)
        results[name] = _run_scan("derive", name, cfg, state, tiled,
                                  n_steps, bs)
    base = max(results["host"], results["host_again"])
    print(f"AB derive step_vs_host={results['derive']/base:.3f}x")

    # ---- epoch wall through the production streaming path ----
    from pamnet_tpu.train.loop import (
        EpochRunner,
        StackedEval,
        init_train_state as _init,
        make_multistep_eval,
    )
    from pamnet_tpu.utils.wirepack import stage as to_device

    wmols = synthetic_qm9_dataset(4096 + 512, seed=481)
    wall = {}
    for name, mode in [("host", True), ("derive", "derive"),
                       ("host_again", True)]:
        train_loader = GraphLoader(wmols[:4096], "qm9", cfg.cutoff_l,
                                   cfg.cutoff_g, batch_size=bs, shuffle=True,
                                   seed=480, drop_last=True,
                                   balanced_batches=True, build_tables=mode,
                                   build_perms=bool(mode))
        val_loader = GraphLoader(wmols[4096:], "qm9", cfg.cutoff_l,
                                 cfg.cutoff_g, batch_size=bs,
                                 balanced_batches=True, build_tables=mode,
                                 build_perms=False)
        st = _init(params, optimizer, use_ema=True)
        runner = EpochRunner(cfg, optimizer, "l1", ema_decay=0.999,
                             scan_steps=16)
        ev = StackedEval(make_multistep_eval(cfg), val_loader, to_device)
        t0 = time.time()
        st, _, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
        mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
        print(f"  [{name}] compile epoch: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            st, _, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
            mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        wall[name] = ng / best
        print(f"AB derivewall variant={name} mol_s={wall[name]:.1f} "
              f"mae={mae:.4f}")
    base = max(wall["host"], wall["host_again"])
    print(f"AB derivewall wall_vs_host={wall['derive']/base:.3f}x")


def exp_geo():
    """Derive-mode GEOMETRY (collate wire_geometry="derive": positions +
    integer tables only on the wire; distances/angles/bases recomputed
    inside the compiled step) vs host-precomputed float geometry, on top of
    the shipped derive-mode ELL tables.

    Two questions, both same-process:
    1. STEP: what does re-evaluating geometry per step cost on pre-staged
       batches?  (--device_basis measured ~2% at this recipe; derive also
       recomputes distances.)
    2. WALL: what does dropping ~50% of the remaining wired bytes + the
       float collation passes buy the production streaming epoch
       (host-pipeline-bound at 1 CPU core; VERDICT r4 #1)?
    """
    import numpy as np

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    results = {}
    for name, geo in [("host", "host"), ("derive", "derive"),
                      ("host_again", "host")]:
        loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, shuffle=False, drop_last=True,
                             balanced_batches=True, build_tables="derive",
                             build_perms=True, wire_geometry=geo)
        batches = _stage(loader)
        staged_mb = sum(
            l.nbytes for l in jax.tree.leaves(batches[0])) / 1e6
        print(f"  [{name}] wire={staged_mb:.3f} MB/batch", file=sys.stderr)
        tiled, n_steps = _tile(batches, 512)
        results[name] = _run_scan("geo", name, cfg, state, tiled,
                                  n_steps, bs)
    base = max(results["host"], results["host_again"])
    print(f"AB geo step_vs_host={results['derive']/base:.3f}x")

    # ---- epoch wall through the production streaming path ----
    from pamnet_tpu.train.loop import (
        EpochRunner,
        StackedEval,
        init_train_state as _init,
        make_multistep_eval,
    )
    from pamnet_tpu.utils.wirepack import stage as to_device

    wmols = synthetic_qm9_dataset(4096 + 512, seed=481)
    wall = {}
    for name, geo in [("host", "host"), ("derive", "derive"),
                      ("host_again", "host")]:
        train_loader = GraphLoader(wmols[:4096], "qm9", cfg.cutoff_l,
                                   cfg.cutoff_g, batch_size=bs, shuffle=True,
                                   seed=480, drop_last=True,
                                   balanced_batches=True,
                                   build_tables="derive", build_perms=True,
                                   wire_geometry=geo)
        # Eval stays host-geometry both ways (staged once; not under test).
        val_loader = GraphLoader(wmols[4096:], "qm9", cfg.cutoff_l,
                                 cfg.cutoff_g, batch_size=bs,
                                 balanced_batches=True, build_perms=False)
        st = _init(params, optimizer, use_ema=True)
        runner = EpochRunner(cfg, optimizer, "l1", ema_decay=0.999,
                             scan_steps=16)
        ev = StackedEval(make_multistep_eval(cfg), val_loader, to_device)
        t0 = time.time()
        st, _, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
        mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
        print(f"  [{name}] compile epoch: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            st, _, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
            mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        wall[name] = ng / best
        print(f"AB geowall variant={name} mol_s={wall[name]:.1f} "
              f"mae={mae:.4f}")
    base = max(wall["host"], wall["host_again"])
    print(f"AB geowall wall_vs_host={wall['derive']/base:.3f}x")


def exp_pdbbind():
    """PDBbind training-step aggregation routing at the reference recipe
    (dim=128 L=3 b=32) over realistic 3-subgraph complexes: the radius-6 A
    global graph has ~40-80 neighbors/atom with ~2.4x max-vs-mean skew —
    RNA-like wide degrees where ELL tables lost for inference — so the QM9
    table defaults need re-measuring here (VERDICT r4 #3).

    Variants (all derive-geometry, the shipped streaming default):
      ell      derive-mode ELL tables + perms (QM9-style default)
      noell    offsets + perms only (sorted scans forward, scan backwards)
      hosttab  host-built wired ELL tables (wire paid, no re-derivation)
    """
    from pamnet_tpu.data.synthetic import synthetic_pdbbind_complex_dataset
    from pamnet_tpu.train.schedules import constant

    cfg = PAMNetConfig(dataset="PDBbind", dim=128, n_layer=3,
                       cutoff_l=2.0, cutoff_g=6.0, compute_dtype="bfloat16")
    bs = 32
    mols = [dict(pos=g["attrs"], feat=g["labels"], y=g["y"])
            for g in synthetic_pdbbind_complex_dataset(4 * bs)]
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(constant(1e-3))
    state = init_train_state(params, optimizer, use_ema=False)

    results = {}
    for name, tables in [("ell", "derive"), ("noell", False),
                         ("hosttab", True), ("ell_again", "derive")]:
        loader = GraphLoader(mols, "pdbbind", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, shuffle=False, drop_last=True,
                             balanced_batches=True, build_tables=tables,
                             build_perms=True,
                             wire_geometry="derive" if tables != True else "host")  # noqa: E712
        batches = _stage(loader, n_blocks=4)
        print(f"  [{name}] pads={loader.pads}", file=sys.stderr)
        tiled, n_steps = _tile(batches, 64)

        run = make_multistep_train_step(cfg, optimizer, "mse", ema_decay=None)
        t0 = time.time()
        s1, losses = run(state, tiled)
        _ = float(losses[-1])
        print(f"  [{name}] compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            s1, losses = run(state, tiled)
            last = float(losses[-1])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = n_steps * bs / best
        print(f"AB pdbbind variant={name} ms_step={best/n_steps*1e3:.3f} "
              f"g_s={results[name]:.1f} loss={last:.4f}")
    base = max(results["ell"], results["ell_again"])
    print(f"AB pdbbind noell_vs_ell={results['noell']/base:.3f}x "
          f"hosttab_vs_ell={results['hosttab']/base:.3f}x")


def exp_wiremin():
    """Compact wire (int16 indices + counts instead of masks/node_graph,
    hydrated in the compiled step) vs the full derive-geometry wire, on top
    of derive tables + derive geometry: scan-step cost + production
    streaming epoch-wall gain.  Expected ~2.4x fewer wired bytes; math is
    BIT-identical (tests/test_compact_wire.py)."""
    import numpy as np

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    results = {}
    for name, compact in [("full", False), ("compact", True),
                          ("full_again", False)]:
        loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, shuffle=False, drop_last=True,
                             balanced_batches=True, build_tables="derive",
                             build_perms=True, wire_geometry="derive",
                             compact_wire=compact)
        batches = _stage(loader)
        staged_mb = sum(
            l.nbytes for l in jax.tree.leaves(batches[0])) / 1e6
        print(f"  [{name}] wire={staged_mb:.3f} MB/batch", file=sys.stderr)
        tiled, n_steps = _tile(batches, 512)
        results[name] = _run_scan("wiremin", name, cfg, state, tiled,
                                  n_steps, bs)
    base = max(results["full"], results["full_again"])
    print(f"AB wiremin step_vs_full={results['compact']/base:.3f}x")

    from pamnet_tpu.train.loop import (
        EpochRunner,
        StackedEval,
        init_train_state as _init,
        make_multistep_eval,
    )
    from pamnet_tpu.utils.wirepack import stage as to_device

    wmols = synthetic_qm9_dataset(4096 + 512, seed=481)
    wall = {}
    for name, compact in [("full", False), ("compact", True),
                          ("full_again", False)]:
        train_loader = GraphLoader(wmols[:4096], "qm9", cfg.cutoff_l,
                                   cfg.cutoff_g, batch_size=bs, shuffle=True,
                                   seed=480, drop_last=True,
                                   balanced_batches=True,
                                   build_tables="derive", build_perms=True,
                                   wire_geometry="derive",
                                   compact_wire=compact)
        val_loader = GraphLoader(wmols[4096:], "qm9", cfg.cutoff_l,
                                 cfg.cutoff_g, batch_size=bs,
                                 balanced_batches=True, build_perms=False)
        st = _init(params, optimizer, use_ema=True)
        runner = EpochRunner(cfg, optimizer, "l1", ema_decay=0.999,
                             scan_steps=16)
        ev = StackedEval(make_multistep_eval(cfg), val_loader, to_device)
        t0 = time.time()
        st, _, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
        mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
        print(f"  [{name}] compile epoch: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            st, _, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
            mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        wall[name] = ng / best
        print(f"AB wiremwall variant={name} mol_s={wall[name]:.1f} "
              f"mae={mae:.4f}")
    base = max(wall["full"], wall["full_again"])
    print(f"AB wiremwall wall_vs_full={wall['compact']/base:.3f}x")


def exp_lossfetch():
    """Deferred epoch-end loss fetch (one device_get per epoch) vs the
    synchronous per-dispatch float(loss) fetch, at the shipped production
    streaming config (derive tables + derive geometry + compact wire,
    scan_steps=16).  Every per-dispatch fetch pays this pool's ~90 ms
    host<->device RTT, which rivals a 16-step block's own compute; the
    accounting replay is bit-identical either way
    (tests/test_train.py::test_epoch_runner_deferred_fetch_bit_identical)."""
    import numpy as np

    from pamnet_tpu.train.loop import (
        EpochRunner,
        StackedEval,
        init_train_state as _init,
        make_multistep_eval,
    )
    from pamnet_tpu.utils.wirepack import stage as to_device

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    wmols = synthetic_qm9_dataset(4096 + 512, seed=481)
    train_loader = GraphLoader(wmols[:4096], "qm9", cfg.cutoff_l,
                               cfg.cutoff_g, batch_size=bs, shuffle=True,
                               seed=480, drop_last=True,
                               balanced_batches=True, build_tables="derive",
                               build_perms=True, wire_geometry="derive",
                               compact_wire=True)
    val_loader = GraphLoader(wmols[4096:], "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, balanced_batches=True,
                             build_perms=False)
    wall, sums = {}, {}
    for name, defer in [("sync", False), ("defer", True),
                        ("sync_again", False)]:
        st = _init(params, optimizer, use_ema=True)
        runner = EpochRunner(cfg, optimizer, "l1", ema_decay=0.999,
                             scan_steps=16)
        ev = StackedEval(make_multistep_eval(cfg), val_loader, to_device)
        t0 = time.time()
        st, ls, ng, _ = runner.run(st, train_loader.prefetch(), to_device,
                                   defer_fetch=defer)
        mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
        print(f"  [{name}] compile epoch: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            st, ls, ng, _ = runner.run(st, train_loader.prefetch(), to_device,
                                       defer_fetch=defer)
            mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        wall[name] = ng / best
        sums[name] = ls
        print(f"AB lossfetch variant={name} mol_s={wall[name]:.1f} "
              f"loss_sum={ls:.6f} mae={mae:.4f}")
    # Bit-equality of the accounting is locked by the CPU test (the loader's
    # shuffle stream advances across epochs, so cross-variant loss sums here
    # are different-batch-order, not a parity check).
    base = max(wall["sync"], wall["sync_again"])
    print(f"AB lossfetch defer_vs_sync={wall['defer']/base:.3f}x")


def exp_colcache():
    """Cross-epoch collation cache (GraphLoader cache_collate) vs per-epoch
    re-collation, at the shipped production streaming config (derive tables
    + derive geometry + compact wire, balanced plan, deferred fetch,
    scan_steps=16).  With a frozen plan the collated wire is a pure function
    of each batch's molecule set, so epochs 2+ can skip host collation
    entirely — on this host's ONE core that work competes with the staging
    thread even under prefetch."""
    import numpy as np

    from pamnet_tpu.train.loop import (
        EpochRunner,
        StackedEval,
        init_train_state as _init,
        make_multistep_eval,
    )
    from pamnet_tpu.utils.wirepack import stage as to_device

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    wmols = synthetic_qm9_dataset(4096 + 512, seed=481)
    kw = dict(batch_size=bs, shuffle=True, seed=480, drop_last=True,
              balanced_batches=True, build_tables="derive",
              build_perms=True, wire_geometry="derive", compact_wire=True)
    val_loader = GraphLoader(wmols[4096:], "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, balanced_batches=True,
                             build_perms=False)
    wall = {}
    for name, cache in [("plain", False), ("cache", True),
                        ("plain_again", False)]:
        train_loader = GraphLoader(wmols[:4096], "qm9", cfg.cutoff_l,
                                   cfg.cutoff_g, cache_collate=cache, **kw)
        st = _init(params, optimizer, use_ema=True)
        runner = EpochRunner(cfg, optimizer, "l1", ema_decay=0.999,
                             scan_steps=16)
        ev = StackedEval(make_multistep_eval(cfg), val_loader, to_device)
        t0 = time.time()
        st, ls, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
        mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
        print(f"  [{name}] compile epoch: {time.time()-t0:.1f}s "
              f"(cache {train_loader._collate_cache_bytes/1e6:.1f} MB)",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            st, ls, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
            mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        wall[name] = ng / best
        print(f"AB colcache variant={name} mol_s={wall[name]:.1f} "
              f"loss_sum={ls:.6f} mae={mae:.4f}")
    base = max(wall["plain"], wall["plain_again"])
    print(f"AB colcache cache_vs_plain={wall['cache']/base:.3f}x")


def exp_blocksteps():
    """scan_steps at the shipped cached streaming config (derive tables +
    geometry + compact wire, colcache, deferred fetch): with collation
    cached and staging overlapped, the residual epoch-wall gap to the
    device-step ceiling is per-dispatch tunnel overhead (~25-80 ms/call,
    DEVNOTES round-1) — 8 blocks/epoch at scan_steps=16.  Larger blocks
    amortize dispatches at the cost of a bigger staged payload per call."""
    import numpy as np

    from pamnet_tpu.train.loop import (
        EpochRunner,
        StackedEval,
        init_train_state as _init,
        make_multistep_eval,
    )
    from pamnet_tpu.utils.wirepack import stage as to_device

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    wmols = synthetic_qm9_dataset(4096 + 512, seed=481)
    train_loader = GraphLoader(wmols[:4096], "qm9", cfg.cutoff_l, cfg.cutoff_g,
                               batch_size=bs, shuffle=True, seed=480,
                               drop_last=True, balanced_batches=True,
                               build_tables="derive", build_perms=True,
                               wire_geometry="derive", compact_wire=True,
                               cache_collate=True)
    val_loader = GraphLoader(wmols[4096:], "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, balanced_batches=True,
                             build_perms=False)
    wall = {}
    for name, steps in [("s16", 16), ("s32", 32), ("s64", 64),
                        ("s16_again", 16)]:
        st = _init(params, optimizer, use_ema=True)
        runner = EpochRunner(cfg, optimizer, "l1", ema_decay=0.999,
                             scan_steps=steps)
        ev = StackedEval(make_multistep_eval(cfg), val_loader, to_device)
        t0 = time.time()
        st, ls, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
        mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
        print(f"  [{name}] compile epoch: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            st, ls, ng, _ = runner.run(st, train_loader.prefetch(), to_device)
            mae = float(np.abs(ev.predict(st.ema) - ev.y).mean())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        wall[name] = ng / best
        print(f"AB blocksteps variant={name} mol_s={wall[name]:.1f} "
              f"loss_sum={ls:.6f} mae={mae:.4f}")
    base = max(wall["s16"], wall["s16_again"])
    for n in ("s32", "s64"):
        print(f"AB blocksteps {n}_vs_s16={wall[n]/base:.3f}x")


def exp_rnatables():
    """RNA TRAINING at the reference recipe (dim=16 L=1 b=8, SmoothL1,
    main_rna_puzzles.py:45-58) over synthetic candidate structures:
    derive-mode ELL tables vs sorted-scan/perm routing.  The knn(50)
    superset makes RNA degrees as wide as PDBbind's radius-6 graphs, where
    ELL measured 2.8x slower (exp_pdbbind) — RNA training defaults need
    the same measurement (inference already defaults tables off)."""
    from pamnet_tpu.data.synthetic import synthetic_rna_dataset
    from pamnet_tpu.train.schedules import constant

    cfg = PAMNetConfig(dataset="rna_ab", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source",
                       compute_dtype="bfloat16")
    bs = 8
    mols = [dict(pos=g["attrs"], z=g["labels"].astype(int), y=g["y"])
            for g in synthetic_rna_dataset(16 * bs)]
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(constant(1e-4))
    state = init_train_state(params, optimizer, use_ema=False)

    results = {}
    for name, tables in [("ell", "derive"), ("noell", False),
                         ("ell_again", "derive")]:
        loader = GraphLoader(mols, "rna", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, shuffle=False, drop_last=True,
                             balanced_batches=True, build_tables=tables,
                             build_perms=True, wire_geometry="derive")
        batches = _stage(loader)
        tiled, n_steps = _tile(batches, 256)
        run = make_multistep_train_step(cfg, optimizer, "smooth_l1",
                                        ema_decay=None)
        t0 = time.time()
        s1, losses = run(state, tiled)
        _ = float(losses[-1])
        print(f"  [{name}] compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = None
        for _ in range(3):
            t0 = time.time()
            s1, losses = run(state, tiled)
            last = float(losses[-1])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = n_steps * bs / best
        print(f"AB rnatables variant={name} ms_step={best/n_steps*1e3:.3f} "
              f"g_s={results[name]:.1f} loss={last:.4f}")
    base = max(results["ell"], results["ell_again"])
    print(f"AB rnatables noell_vs_ell={results['noell']/base:.3f}x")


def exp_evalpads():
    """Stacked one-dispatch evaluation (train/loop.py StackedEval) with the
    eval loaders' current plan-pinned pads vs LPT-balanced composition.
    Eval is order-free (labels ride in the batches, the metric is a global
    mean), so balancing eval batches is exactly metric-preserving — the only
    question is how much the tighter pads save on the HBM-bound forward.
    Run at the QM9 recipe over a 4096-molecule synthetic split (the shape of
    the 110k run's 13.75k eval splits)."""
    from pamnet_tpu.train.loop import StackedEval, make_multistep_eval

    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                       cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(4096, seed=481)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    eval_run = make_multistep_eval(cfg)

    def to_device(tree):
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), tree)

    import numpy as np

    results = {}
    for name, kw in [("plan", dict(plan_pads=True)),
                     ("balanced", dict(balanced_batches=True)),
                     ("plan_again", dict(plan_pads=True))]:
        loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, shuffle=False, **kw)
        print(f"  [{name}] pads: {loader.pads}", file=sys.stderr)
        ev = StackedEval(eval_run, loader, to_device)
        t0 = time.time()
        pred = ev.predict(params)
        print(f"  [{name}] compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)
        mae = float(np.mean(np.abs(pred - ev.y)))
        best = None
        for _ in range(3):
            t0 = time.time()
            pred = ev.predict(params)  # np.asarray fetch = honest timing
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = len(mols) / best
        print(f"AB evalpads variant={name} mol_s={results[name]:.1f} "
              f"mae={mae:.6f}")
    base = max(results["plan"], results["plan_again"])
    print(f"AB evalpads balanced_vs_plan={results['balanced']/base:.3f}x")


def exp_planpads():
    """Pad-waste reduction from plan-pinned pads (GraphLoader plan_pads /
    balanced_batches): the adversarial worst-case bucket must cover any
    shuffle (sum of the batch_size largest molecules), but real batch sums
    concentrate near batch_size * mean — at the QM9 recipe the worst-case
    bucket carries 1.4-1.8x the padded rows of the frozen plan's true
    maxima, and the step is HBM-bound on padded edge gathers.  Variants:
      worstcase  production default (any-shuffle-safe bucket)
      plan       pads pinned to the sequential plan's batch maxima
      balanced   LPT-packed composition, pads pinned to its maxima
    """
    cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6,
                       cutoff_l=5.0, cutoff_g=5.0, compute_dtype="bfloat16")
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    params = init_pamnet(jax.random.PRNGKey(480), cfg)
    optimizer = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=64),
                               clip_norm=1000.0)
    state = init_train_state(params, optimizer, use_ema=True)

    results = {}
    variants = [("worstcase", {}), ("plan", dict(plan_pads=True)),
                ("balanced", dict(balanced_batches=True)),
                ("worstcase_again", {})]
    for name, kw in variants:
        loader = GraphLoader(mols, "qm9", cfg.cutoff_l, cfg.cutoff_g,
                             batch_size=bs, shuffle=False, drop_last=True,
                             **kw)
        print(f"  [{name}] pads: {loader.pads}", file=sys.stderr)
        tiled, n_steps = _tile(_stage(loader), 512)
        results[name] = _run_scan("planpads", name, cfg, state, tiled,
                                  n_steps, bs)
    base = max(results["worstcase"], results["worstcase_again"])
    print(f"AB planpads plan={results['plan']/base:.3f}x "
          f"balanced={results['balanced']/base:.3f}x (vs best worstcase)")


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    which = sys.argv[1:] or ["dtype"]
    for w in which:
        {"dtype": exp_dtype, "flatopt": exp_flatopt,
         "pallas": exp_pallas, "rna": exp_rna,
         "fold": exp_fold, "fuse": exp_fuse, "ladder": exp_ladder,
         "variant": exp_variant, "batch": exp_batch,
         "devgraph": exp_devgraph, "scan": exp_scan,
         "scanimpl": exp_scanimpl, "aggfwd": exp_aggfwd,
         "aggmix": exp_aggmix, "gathbwd": exp_gathbwd,
         "evalpads": exp_evalpads, "derive": exp_derive,
         "planpads": exp_planpads, "geo": exp_geo,
         "pdbbind": exp_pdbbind, "rnatables": exp_rnatables,
         "wiremin": exp_wiremin, "lossfetch": exp_lossfetch,
         "colcache": exp_colcache, "blocksteps": exp_blocksteps}[w]()


if __name__ == "__main__":
    main()
