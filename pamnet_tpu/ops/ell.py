"""Scatter-free segment aggregation via ELL (padded-neighbor-list) tables.

Profiling the train step on v5e showed XLA's scatter-add dominating: every
forward ``segment_sum`` and the *backward* of every edge gather lowers to a
serialized scatter (~0.2-0.4 ms each; ~24 per step at QM9 scale).  Because
graph structure is static, the host can precompute, for every aggregation,
an ELL table ``table[group, k] -> row id`` (padded, masked).  Aggregation
then becomes gather + masked dense sum over the K axis — no scatters — and
with the custom VJPs below the backward passes are plain gathers as well:

  segment_sum_ell:  out[v] = sum_k values[table[v, k]] * tmask[v, k]
                    d_values[e] = g[seg_ids[e]] * row_mask[e]
  gather_ell:       out[e] = x[idx[e]]
                    d_x[v] = sum_k g[table[v, k]] * tmask[v, k]

Contract: rows with ``row_mask == 0`` (padding) must not contribute to the
loss through the gathered values (all model paths mask them), and the table
must list exactly the valid rows of each group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ell_reduce(values: jax.Array, table: jax.Array, tmask: jax.Array) -> jax.Array:
    gathered = values[table]  # (G, K, D)
    # Accumulate in f32 even for bf16 streams (sums over K up to ~100 rows
    # lose mantissa bits fast at 8-bit precision); output keeps the stream
    # dtype.
    return jnp.sum(gathered * tmask[..., None].astype(values.dtype), axis=1,
                   dtype=jnp.float32).astype(values.dtype)


@jax.custom_vjp
def segment_sum_ell(values, seg_ids, row_mask, table, tmask):
    """Segment sum of ``values`` (R, D) into groups via the ELL ``table``
    (G, K); equals ``segment_sum(values * row_mask, seg_ids, G)``."""
    return _ell_reduce(values, table, tmask)


def _seg_fwd(values, seg_ids, row_mask, table, tmask):
    return segment_sum_ell(values, seg_ids, row_mask, table, tmask), (
        seg_ids,
        row_mask,
    )


def _seg_bwd(res, g):
    seg_ids, row_mask = res
    d_values = g[seg_ids] * row_mask[:, None].astype(g.dtype)
    return d_values, None, None, None, None


segment_sum_ell.defvjp(_seg_fwd, _seg_bwd)


@jax.custom_vjp
def gather_ell(x, idx, table, tmask):
    """Row gather ``x[idx]`` whose backward aggregates with the ELL table of
    ``idx`` (i.e. table groups rows by their idx value) instead of a
    scatter-add."""
    return x[idx]


def _gather_fwd(x, idx, table, tmask):
    return x[idx], (idx, table, tmask)


def _gather_bwd(res, g):
    idx, table, tmask = res
    return _ell_reduce(g, table, tmask), None, None, None


gather_ell.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gather_sorted(impl, x, idx, offsets):
    """Row gather ``x[idx]`` for an ``idx`` that is group-sorted (rows stored
    in nondecreasing idx order, padding at the tail): the backward aggregates
    the cotangent with the blocked/compensated prefix scan over ``offsets``
    (one streaming pass over the real rows) instead of reading the G*K
    padded random rows of an ELL table.  Pays off when the key's ELL table
    carries mean-vs-max padding skew (the el_dst node table reads N*kl rows
    ~4.4x the real edge count at the QM9 recipe)."""
    return x[idx]


def _gather_sorted_fwd(impl, x, idx, offsets):
    return x[idx], offsets


def _gather_sorted_bwd(impl, offsets, g):
    return _scan_group_sums(impl, g, offsets), None, None


gather_sorted.defvjp(_gather_sorted_fwd, _gather_sorted_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gather_perm(impl, x, idx, perm, offsets):
    """Row gather ``x[idx]`` for an arbitrary ``idx``: the backward permutes
    the cotangent into idx-sorted order (``perm`` = host-built stable sort of
    the valid rows, padding rows parked past ``offsets[-1]``) and runs the
    prefix-scan aggregation of :func:`gather_sorted`.  Reads R random rows
    plus one streaming pass instead of the ELL table's G*K random rows —
    the win for the triplet keys whose tables pad El*K ~2.7x the real
    triplet count (DEVNOTES round-3 exact-widths note)."""
    return x[idx]


def _gather_perm_fwd(impl, x, idx, perm, offsets):
    return x[idx], (perm, offsets)


def _gather_perm_bwd(impl, res, g):
    perm, offsets = res
    return _scan_group_sums(impl, g[perm], offsets), None, None, None


gather_perm.defvjp(_gather_perm_fwd, _gather_perm_bwd)


def _compensated_cumsum(v):
    """f32 prefix sums with a TwoSum compensation stream: returns ``(s, e)``,
    each (R+1, D) with a leading zero row, such that ``s + e`` equals the
    true prefix to ~double working precision.  The defect of each stored
    prefix step, ``d[i] = s[i-1] + v[i] - s[i]``, is eps-scale and EXACTLY
    computable in f32 via a TwoSum (the final subtraction is Sterbenz-exact
    because both operands approximate the same prefix), and the true
    compensation satisfies ``e[i] - e[i-1] = d[i]``, so ``e = cumsum(d)`` —
    a second native cumsum whose own rounding only perturbs an eps-scale
    quantity."""
    z = jnp.zeros_like(v[:1])
    s = jnp.concatenate([z, jnp.cumsum(v, axis=0)], axis=0)
    s_prev = s[:-1]
    t = s_prev + v
    bp = t - s_prev
    g = (s_prev - (t - bp)) + (v - bp)
    d = (t - s[1:]) + g
    e = jnp.concatenate([z, jnp.cumsum(d, axis=0)], axis=0)
    return s, e


# Block length: 128/256/512 measured equal on v5e (458/455/457 g/s RNA
# scoring; 1024+ degrade) — 128 wins on the error bound (∝ B) and divides
# every pad (align=128), so the zero-pad concat never materializes.
_SCAN_BLOCK = 128


def _blocked_group_sums(v, offsets):
    """Group sums over ``[offsets[k], offsets[k+1])`` via two-level prefix
    sums: local cumsum inside fixed B-row blocks plus a compensated prefix
    over the per-block sums.  Intra-block prefix differences cancel at
    block-local magnitudes (no global-prefix rounding at all), and the
    block-level prefix carries a TwoSum compensation, so accuracy matches
    the global compensated scan at a fraction of its cost."""
    R, D = v.shape
    B = _SCAN_BLOCK
    nb = -(-R // B)
    if nb * B != R:
        v = jnp.concatenate([v, jnp.zeros((nb * B - R, D), v.dtype)], axis=0)
    p = jnp.cumsum(v.reshape(nb, B, D), axis=1)  # block-local prefixes
    s_blk, e_blk = _compensated_cumsum(p[:, -1])  # (nb+1, D) block prefix
    p_flat = p.reshape(nb * B, D)
    b = offsets // B
    local = jnp.where(
        (offsets % B > 0)[:, None],
        p_flat[jnp.maximum(offsets - 1, 0)],
        jnp.zeros((), v.dtype),
    )
    hi = s_blk[b[1:]] - s_blk[b[:-1]]
    lo = (e_blk[b[1:]] - e_blk[b[:-1]]) + (local[1:] - local[:-1])
    return hi + lo


def _scan_group_sums(impl, values, offsets):
    """Group sums of rows pre-sorted by group via prefix scans; rows beyond
    ``offsets[-1]`` are never sliced into any group.  f64 keeps a plain
    cumsum; sub-f64 runs the compensated scheme selected by ``impl``."""
    if jnp.dtype(values.dtype).itemsize >= 8:
        s = jnp.cumsum(values, axis=0)
        s = jnp.concatenate([jnp.zeros_like(s[:1]), s], axis=0)
        return s[offsets[1:]] - s[offsets[:-1]]

    v = values.astype(jnp.float32)
    if impl == "blocked":
        return _blocked_group_sums(v, offsets).astype(values.dtype)
    s, e = _compensated_cumsum(v)
    out = (s[offsets[1:]] - s[offsets[:-1]]) + (e[offsets[1:]] - e[offsets[:-1]])
    return out.astype(values.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _segment_sum_sorted(impl, values, seg_ids, row_mask, offsets):
    return _scan_group_sums(impl, values, offsets)


def _sorted_fwd(impl, values, seg_ids, row_mask, offsets):
    return _segment_sum_sorted(impl, values, seg_ids, row_mask, offsets), (
        seg_ids,
        row_mask,
    )


def _sorted_bwd(impl, res, g):
    seg_ids, row_mask = res
    return g[seg_ids] * row_mask[:, None].astype(g.dtype), None, None, None


_segment_sum_sorted.defvjp(_sorted_fwd, _sorted_bwd)


def segment_sum_sorted(values, seg_ids, row_mask, offsets, impl: str = "blocked"):
    """Segment sum for rows pre-sorted by group: prefix-scan + offset
    differences (no scatter, no gather blow-up).

    ``offsets`` (G+1,) marks each group's [start, end) in the first
    ``offsets[-1]`` (valid) rows; padded tail rows are never touched by the
    slicing, so no masking is needed in the forward.  Backward is the plain
    gather ``g[seg_ids]`` (masked), as for segment_sum_ell.

    Precision note: group sums are differences of prefix sums, and a plain
    f32 global prefix loses ~log2(R/K) mantissa bits to cancellation
    (measured 8.9e-4 absolute on batch-16 RNA scores vs 7.5e-6 for
    scatter-adds).  Sub-f64 streams therefore run a compensated scheme,
    selected by ``impl`` (a static argument — part of the trace; the model
    threads ``PAMNetConfig.sorted_scan_impl`` through, so the choice lives
    on the hashable jit key rather than in a module global).  Both hold
    scatter-parity accuracy (7.5-7.6e-6 on the batch-16 RNA scores):

    * ``"blocked"`` (default): block-local prefix sums + a TwoSum-
      compensated prefix over the per-block sums (:func:`_blocked_group_sums`)
      — one short-scan pass over the rows instead of two full-length
      cumsums plus a full-length TwoSum chain.
    * ``"twosum"``: the global compensated scan — an (s, e) prefix/
      compensation pair over all rows (:func:`_compensated_cumsum`); kept
      as the reference implementation and A/B target (tools/tpu_ab.py
      scanimpl).

    Neither uses ``lax.associative_scan`` (its TPU lowering measured 190x
    slower even at a few hundred rows).  Low-precision streams (bf16/f16)
    are additionally upcast to f32 first (a bf16 prefix over 1e5+ rows
    collapsed RNA scores to ~half).  f64 (jax x64 oracle paths) keeps a
    plain f64 cumsum.
    """
    if impl not in ("blocked", "twosum"):
        raise ValueError(f"invalid sorted-scan impl: {impl}")
    return _segment_sum_sorted(impl, values, seg_ids, row_mask, offsets)


def build_offsets_np(ids, num_valid: int, num_groups: int):
    """(G+1,) int32 group offsets for rows sorted by ``ids`` (validates
    sortedness of the valid region)."""
    import numpy as np

    ids = np.asarray(ids[:num_valid])
    if num_valid and np.any(np.diff(ids) < 0):
        raise ValueError("rows are not sorted by group id")
    return np.searchsorted(ids, np.arange(num_groups + 1)).astype(np.int32)


def build_perm_np(ids, num_valid: int, num_groups: int, total_rows: int):
    """Host-side permutation + offsets for :func:`gather_perm`'s backward.

    Returns ``(perm (total_rows,) int32, offsets (num_groups+1,) int32)``:
    ``perm`` stable-sorts the first ``num_valid`` rows by their ``ids`` value
    and parks the padding rows past the end; ``offsets`` marks each group's
    [start, end) within the permuted order (``offsets[-1] == num_valid``, so
    the scan never slices a padding row into a group)."""
    import numpy as np

    idv = np.asarray(ids[:num_valid], dtype=np.int64)
    if num_valid and (idv.min() < 0 or idv.max() >= num_groups):
        raise ValueError("group id out of range")
    order = np.argsort(idv, kind="stable").astype(np.int32)
    counts = np.bincount(idv, minlength=num_groups)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    perm = np.concatenate(
        [order, np.arange(num_valid, total_rows, dtype=np.int32)]
    )
    return perm, offsets


def build_ell_table_np(ids, num_valid: int, num_groups: int, k: int):
    """Host-side ELL construction: group row indices by ``ids`` value.

    Dispatches to the C++ counting-sort builder (csrc/graphbuild.cc) when
    available — the python path's argsort was ~60% of batch collation time
    on this host.

    Args:
      ids: (R,) int group id per row (rows >= num_valid are padding).
      num_valid: count of real rows.
      num_groups: G.
      k: fixed table width (must be >= max group size; raises otherwise).
    Returns: (table (G, k) int32, tmask (G, k) float32).
    """
    import numpy as np

    from pamnet_tpu.data import native

    if native.available() and num_valid > 1024:
        try:
            return native.ell_table(ids, num_valid, num_groups, k)
        except RuntimeError:
            pass  # stale .so without the symbol; fall through

    ids = np.asarray(ids[:num_valid], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    counts = np.bincount(sorted_ids, minlength=num_groups)
    if counts.size > num_groups:
        raise ValueError("group id out of range")
    if counts.max(initial=0) > k:
        raise ValueError(
            f"ELL overflow: max group size {counts.max()} > table width {k}"
        )
    table = np.zeros((num_groups, k), dtype=np.int32)
    tmask = np.zeros((num_groups, k), dtype=np.float32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(num_valid) - offsets[sorted_ids]
    table[sorted_ids, within] = order.astype(np.int32)
    tmask[sorted_ids, within] = 1.0
    return table, tmask


def derive_ell_table(offsets, k: int, perm=None):
    """On-DEVICE ELL table materialization, bit-identical to
    :func:`build_ell_table_np`.

    The host table is ``table[g, s] = order[offsets[g] + s]`` for
    ``s < count[g]`` (zeros + zero mask elsewhere), where ``order`` is the
    stable by-group sort of the valid rows.  Both ingredients are already
    wired for the scan-routing machinery — ``order == perm[:num_valid]``
    from :func:`build_perm_np` (or the identity when the stream is stored
    group-sorted, i.e. ``offsets`` from :func:`build_offsets_np`) — so the
    (G, K) int table + (G, K) f32 mask never need to cross the wire: they
    are ~45%% of a QM9 batch's staged bytes but a few-microsecond iota/
    gather on device.

    Args:
      offsets: (G+1,) int32 group offsets (``offsets[-1] == num_valid``).
      k: static table width.
      perm: (R,) int32 stable sort permutation (padding parked past
        ``num_valid``), or None when the stream is already group-sorted.
    Returns: (table (G, k) int32, tmask (G, k) float32), exact matches of
      the host builder's output.
    """
    counts = offsets[1:] - offsets[:-1]  # (G,)
    lane = jnp.arange(k, dtype=offsets.dtype)
    slot = offsets[:-1, None] + lane[None, :]  # (G, k)
    valid = lane[None, :] < counts[:, None]
    if perm is not None:
        # Invalid slots may reach past the perm; clamp before the gather
        # (they are overwritten with 0 below either way).
        vals = perm[jnp.minimum(slot, perm.shape[0] - 1)]
    else:
        vals = slot
    table = jnp.where(valid, vals, 0).astype(jnp.int32)
    return table, valid.astype(jnp.float32)


def materialize_tables(tables: dict | None) -> dict | None:
    """Materialize derive-mode ELL tables inside the compiled program.

    ``collate_structures(build_tables="derive")`` wires, per table key, a
    tiny int32 shape marker ``KEY_dk`` (its length IS the static table
    width) next to the scan aux arrays (``KEY_off`` for group-sorted
    streams, ``KEY_perm``+``KEY_poff`` otherwise) instead of the (G, K)
    table + mask.  This expands every marker into the exact host-built
    ``KEY``/``KEY_mask`` pair via :func:`derive_ell_table` and drops the
    markers; host-built batches (no markers) pass through untouched, so
    downstream routing (models/layers.py _agg/_gath, the fold/fuse gates)
    sees an identical dict either way.
    """
    if not tables:
        return tables
    marks = [k for k in tables if k.endswith("_dk")]
    if not marks:
        return tables
    out = {k: v for k, v in tables.items() if not k.endswith("_dk")}
    for mark in marks:
        name = mark[: -len("_dk")]
        k = tables[mark].shape[-1]
        if name + "_poff" in tables:
            tbl, tmask = derive_ell_table(
                tables[name + "_poff"], k, tables[name + "_perm"]
            )
        else:
            tbl, tmask = derive_ell_table(tables[name + "_off"], k)
        out[name] = tbl
        out[name + "_mask"] = tmask
    return out
