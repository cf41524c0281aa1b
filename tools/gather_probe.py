"""Micro-probe for the roofline's "reduce gathered BYTES" levers at the QM9
bench shapes (VERDICT r4 #4) — measured on the real TPU, same process, one
dispatch per timed region, accumulator-chained host fetches (DEVNOTES.md:
block_until_ready lies over this tunnel).

Levers probed, each at the shipped bench-recipe shapes (balanced-pad loader
pads, dim=128):

1. ``dtype``  — does shrinking the gathered ROW payload below bf16 speed the
   random row gather?  (int8 table + dequant-after-gather was the verdict's
   candidate (a) for the geometry-constant sbf tables.)
2. ``locality`` — does index ORDER matter to gather DMA (sorted / 64-row
   window-local / uniform random)?  Candidate (b): host locality-reordering
   only pays if sorted/local gathers are measurably faster.
3. ``ksplit`` — ELL K-sum at the REAL skewed t2_ji distribution vs the same
   table truncated to K_mean rows (the unreachable best case of any K-split
   scheme: every group fits the short table, zero spill handling) vs the
   shipped blocked prefix scan.  Candidate (c) is refuted if even the
   truncated-K ceiling does not beat the scan the default already uses.

Usage: python tools/gather_probe.py [iters]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
from pamnet_tpu.ops.ell import (
    build_ell_table_np,
    build_offsets_np,
    segment_sum_ell,
    segment_sum_sorted,
)

DIM = 128


def timed(fn, *args, reps: int = 3) -> float:
    """Best-of-reps wall time of one dispatch, ended by a scalar host fetch."""
    out = fn(*args)
    _ = float(out)  # compile + first execution
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _ = float(fn(*args))
        best = min(best, time.time() - t0)
    return best


def gather_time(src, idx_sets, iters: int) -> float:
    """Seconds per gather of idx_sets.shape[1] rows from src (one scan
    dispatch over `iters` distinct index sets; gathered rows are reduced with
    f32 ACCUMULATION but no f32 materialization — `.astype(f32).sum()` was
    measured dtype-independent here, i.e. XLA materialized the converted
    array and the probe timed that write/read instead of the gather)."""

    @jax.jit
    def run(src, idx_sets):
        def body(acc, idx):
            return acc + jnp.sum(src[idx], dtype=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx_sets)
        return acc

    t = timed(run, src, idx_sets)
    return t / iters


def reduce_time(src_rows, iters: int) -> float:
    """Control: the same f32-accumulated reduce over a PRE-materialized
    (rows, DIM) array — no gather.  Subtracting this from gather_time
    isolates the gather itself."""

    @jax.jit
    def run(x):
        def body(acc, i):
            return acc + jnp.sum(x, dtype=jnp.float32) + i.astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc

    t = timed(run, src_rows)
    return t / iters


def main():
    # Default 32: idx payloads are (iters, 16*Eg) int32 — keep them tens of
    # MB so staging over the ~40 MB/s tunnel stays small.
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(480)

    # Real bench shapes: balanced-pad loader at the contract recipe.
    bs = 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=bs, shuffle=False,
                         drop_last=True, balanced_batches=True)
    pads = loader.pads
    gb = next(iter(loader))
    N, Eg, El, T2 = pads.n, pads.eg, pads.el, pads.t2
    print(f"pads: N={N} Eg={Eg} El={El} T2={T2}", file=sys.stderr)

    # ---- 1. dtype: random (R,) gathers from an (N, 128) node table ----
    # R = 16x the bench Eg so the gather dominates the ~200 us/scan-iter
    # fixed cost (measured: at R = Eg the no-gather reduce control costs as
    # much as gather+reduce and the probe resolves nothing).  Relative dtype
    # / locality scaling is what the probe is for; absolute us are per-R-row
    # gather.
    R = Eg * 16
    src_f32 = jnp.asarray(rng.standard_normal((N, DIM)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(iters, R)), jnp.int32)
    res, ctl = {}, {}
    for name, src in [("f32", src_f32), ("bf16", src_f32.astype(jnp.bfloat16)),
                      ("int8", (src_f32 * 10).astype(jnp.int8))]:
        res[name] = gather_time(src, idx, iters)
        ctl[name] = reduce_time(
            jnp.asarray(rng.standard_normal((R, DIM)), src.dtype), iters)
    print("dtype (node->edge gather, us/gather, ctl = no-gather reduce): "
          + "  ".join(f"{k}={v*1e6:.1f}(ctl {ctl[k]*1e6:.1f})"
                      for k, v in res.items()))
    net = {k: max(res[k] - ctl[k], 1e-9) for k in res}
    print("dtype gather-only (us, reduce-control subtracted): "
          + "  ".join(f"{k}={v*1e6:.1f}" for k, v in net.items()))
    print(f"AB gathdtype int8_vs_bf16={net['bf16']/net['int8']:.3f}x "
          f"bf16_vs_f32={net['f32']/net['bf16']:.3f}x")

    # ---- 2. locality: index order at fixed payload (bf16) ----
    src = src_f32.astype(jnp.bfloat16)
    sorted_idx = np.sort(rng.integers(0, N, size=(iters, R)), axis=1)
    win = 64
    base = rng.integers(0, max(N - win, 1), size=(iters, R))
    local_idx = np.sort(base, axis=1) + rng.integers(0, win, size=(iters, R))
    rand_idx = rng.integers(0, N, size=(iters, R))
    loc = {}
    for name, ids in [("sorted", sorted_idx), ("local64", local_idx),
                      ("random", rand_idx)]:
        loc[name] = gather_time(src, jnp.asarray(ids, jnp.int32), iters)
    print("locality (us/gather): "
          + "  ".join(f"{k}={v*1e6:.1f}" for k, v in loc.items()))
    print(f"AB gathlocality sorted_vs_random={loc['random']/loc['sorted']:.3f}x "
          f"local64_vs_random={loc['random']/loc['local64']:.3f}x")

    # ---- 2b. pairfuse: two (N,128) bf16 gathers, same idx, vs one (N,256) --
    # If per-row DMA cost has a fixed component, fusing shared-index gathers
    # into one wider row halves the row count (the round-3 RNA fuse_sbf win);
    # round 4 closed this for QM9 bf16 on byte-proportionality grounds —
    # re-measured here directly at scale.
    # Two DISTINCT sources (CSE would collapse two gathers of the same
    # array) vs their concatenation — the real pattern is two different
    # tables sharing one index (e.g. x[el_src] and rbf-projected[el]).
    src_b = jnp.asarray(rng.standard_normal((N, DIM)), jnp.bfloat16)
    src2 = jnp.concatenate([src, src_b], axis=1)  # (N, 256) bf16
    one_idx = jnp.asarray(rand_idx, jnp.int32)

    @jax.jit
    def run_two(a, b, idx_sets):
        def body(acc, idx):
            return acc + jnp.sum(a[idx], dtype=jnp.float32) \
                       + jnp.sum(b[idx], dtype=jnp.float32) * 0.5, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx_sets)
        return acc

    @jax.jit
    def run_one(a2, idx_sets):
        def body(acc, idx):
            g = a2[idx]
            return acc + jnp.sum(g[:, :DIM], dtype=jnp.float32) \
                       + jnp.sum(g[:, DIM:], dtype=jnp.float32) * 0.5, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx_sets)
        return acc

    t_two = timed(run_two, src, src_b, one_idx) / iters
    t_one = timed(run_one, src2, one_idx) / iters
    print(f"pairfuse (us/iter, bf16, same idx): two_128={t_two*1e6:.1f} "
          f"one_256={t_one*1e6:.1f}")
    print(f"AB pairfuse one_vs_two={t_two/t_one:.3f}x")

    # ---- 3. ksplit: ELL K-sum over the REAL t2_ji distribution ----
    ids_np = np.asarray(gb.t2_ji, np.int64)
    mask_np = np.asarray(gb.t2_mask, np.float32)
    n_valid = int(mask_np.sum())
    counts = np.bincount(ids_np[: n_valid], minlength=El)
    k_max = int(counts.max())
    k_mean = max(int(np.ceil(counts[counts > 0].mean())), 1)
    table, tmask = build_ell_table_np(ids_np, n_valid, El, k_max)
    # Truncated table: the unreachable ceiling of any K-split (all groups fit
    # K_mean slots, no spill pass).  WRONG results; timing ceiling only.
    tbl_trunc, tm_trunc = table[:, :k_mean], tmask[:, :k_mean]
    offsets = build_offsets_np(ids_np, n_valid, El)
    vals = jnp.asarray(rng.standard_normal((T2, DIM)), jnp.bfloat16)
    seg = jnp.asarray(ids_np, jnp.int32)
    rmask = jnp.asarray(mask_np)

    def seg_run(fn):
        @jax.jit
        def run(vals):
            def body(acc, _):
                return acc + fn(vals).astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return acc

        return timed(run, vals) / iters

    t_full = seg_run(lambda v: segment_sum_ell(
        v, seg, rmask, jnp.asarray(table), jnp.asarray(tmask)))
    t_trunc = seg_run(lambda v: segment_sum_ell(
        v, seg, rmask, jnp.asarray(tbl_trunc), jnp.asarray(tm_trunc)))
    t_scan = seg_run(lambda v: segment_sum_sorted(
        v, seg, rmask, jnp.asarray(offsets)))
    print(f"ksplit t2_ji (K_max={k_max}, K_mean={k_mean}, rows={n_valid}/{T2}, "
          f"us/reduce): ell_full={t_full*1e6:.1f} ell_kmean_ceiling="
          f"{t_trunc*1e6:.1f} blocked_scan={t_scan*1e6:.1f}")
    print(f"AB ksplit kmean_ceiling_vs_scan={t_scan/t_trunc:.3f}x "
          f"(>1 means even the ceiling beats the shipped scan)")


if __name__ == "__main__":
    main()
