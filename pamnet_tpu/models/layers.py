"""Message-passing layers over padded edge/triplet tensors.

TPU-native re-design of the reference layers:

* :func:`global_mp` replaces the PyG ``MessagePassing`` subclass (reference:
  layers/global_message_passing.py:9-60) with explicit gather + masked
  segment-sum; the ``flow`` option selects the aggregation endpoint.
* :func:`local_mp` / :func:`local_mp_s` replace the raw ``torch_scatter``
  implementation (reference: layers/local_message_passing.py:9-123).  The
  triplet gather-multiply-segment-sum is the hot op; masks make padded
  triplets contribute exact zeros.

All layers return ``(x, out, att)`` where ``out``/``att`` are the per-node
scalar head and attention logit consumed by the fusion module
(reference: models.py:206-213).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pamnet_tpu import nn
from pamnet_tpu.ops.ell import (
    gather_ell,
    gather_perm,
    gather_sorted,
    segment_sum_ell,
    segment_sum_sorted,
)
from pamnet_tpu.ops.segment import segment_sum


class FoldedSBF(NamedTuple):
    """Folded spherical-basis inputs for the fused triplet gather
    (models/pamnet.py fold_sbf + fuse_sbf_gather): ``proj`` = the per-edge
    radial table pre-projected through the model-level 1-layer sbf MLP,
    (El, ns*dim); ``cbf`` = per-triplet Y_l0 values, (T, ns); ``bias`` =
    that MLP's bias, (dim,)."""

    proj: jax.Array
    cbf: jax.Array
    bias: jax.Array


def _fused_sbf_gather(p, m_neighbor, folded: FoldedSBF, idx, t_mask):
    """ONE row gather serving both the projected-sbf table and the neighbor
    edge messages: both streams are indexed by the same neighbor-edge id, so
    ``concat(proj, m_neighbor)[idx]`` reads one padded lane row per triplet
    where the split gathers read two ((ns+1)*dim <= 128 gate; at the RNA
    dim-16 shapes the concatenated row is exactly 128 lanes).  Returns the
    modulated triplet messages ``m_neighbor[idx] * mlp_sbf(sbf)`` (reference:
    local_message_passing.py:49-51), with padded triplets exact zeros."""
    d = m_neighbor.shape[1]
    ns = folded.proj.shape[1] // d
    rows = jnp.concatenate(
        [folded.proj, m_neighbor.astype(folded.proj.dtype)], axis=1
    )[idx]
    acc = folded.bias
    for l in range(ns):
        acc = acc + folded.cbf[:, l : l + 1] * rows[:, l * d : (l + 1) * d]
    b = nn.mlp(p["mlp_sbf"], nn.silu(acc)) * t_mask[:, None]
    return rows[:, ns * d :] * b


def init_global_mp(key, dim: int):
    ks = jax.random.split(key, 10)
    return {
        "mlp_x1": nn.mlp_init(ks[0], [dim, dim]),
        "mlp_x2": nn.mlp_init(ks[1], [dim, dim]),
        "res1": nn.res_init(ks[2], dim),
        "res2": nn.res_init(ks[3], dim),
        "res3": nn.res_init(ks[4], dim),
        "mlp_m": nn.mlp_init(ks[5], [dim * 3, dim]),
        "W_edge_attr": nn.linear_init(ks[6], dim, dim, bias=False),
        "mlp_out": nn.mlp_init(ks[7], [dim, dim, dim, dim]),
        "W_out": nn.linear_init(ks[8], dim, 1),
        "W": nn.glorot(ks[9], (dim, 1)),
    }


def _t(tables, name):
    return tables[name], tables[name + "_mask"]


# Forward segment-sum preference when a batch carries BOTH an ELL table and
# sorted-group offsets for the same key: "ell" = gather + dense K-sum (reads
# G*K rows, K = the dataset-max group size); "sorted" = blocked prefix scan
# over the R group-sorted rows (streams them once).  A set/frozenset of key
# names routes ONLY those keys to the scan (per-key mix).  Backwards are
# identical either way (masked gather), and gathers keep their scatter-free
# ELL backward regardless — this flag ONLY reorders the forward reduction.
# Same-process A/Bs at the QM9 bf16 recipe (tools/tpu_ab.py aggfwd/aggmix;
# DEVNOTES round-3): all-ELL beats all-sorted (sorted 0.914x worst-case pads,
# 0.960x balanced pads), but the PER-KEY MIX — reductions whose ELL tables
# carry the worst mean-vs-max padding skew routed through the blocked scan
# (t2/t1: El*K rows vs ~3.3k real triplets; el_dst: N*kl rows ~4.4x the el
# stream), everything else on the ELL K-sum — measured 1.035x over all-ELL
# at the shipped balanced-pads config (ell 8,924/8,919 <-> mix_triplets
# 9,212 <-> +el_dst 9,236 mol/s), so that mix is the default.  The big
# well-packed global-plex table (eg_dst, ~1.2x skew) stays on ELL ("sorted"
# = routing it too = 0.960x).
# The routing lives on PAMNetConfig.agg_forward (hashable, part of the jit
# key) and is threaded through the layer calls; this constant is only the
# shared default.  Keys missing their sorted offsets fall back to their ELL
# table, so any mix is safe for any table layout.
DEFAULT_AGG_FORWARD: frozenset = frozenset({"t2_ji", "t1_ji", "el_dst"})

# Gather-BACKWARD routing: keys whose gather cotangent aggregates via the
# blocked prefix scan (gather_sorted / gather_perm in ops/ell.py — one
# streaming pass over the R real rows, plus one R-row random permute gather
# for unsorted keys) instead of the ELL table's G*K padded random rows.
# Routed keys need their scan aux arrays in the batch ("KEY_off" for
# group-sorted keys; "KEY_perm"+"KEY_poff" otherwise — built by
# collate_structures(build_perms=True)); keys missing them keep the ELL
# backward, so any mix is safe for any table layout.  Default = the
# measured winner (same-process A/B, tools/tpu_ab.py gathbwd, QM9 bf16
# balanced recipe, 512-step scans): ell 9230.9/9243.4 <-> el-only 9287.3
# <-> triplets-only 9385.8 <-> all-four 9482.6 mol/s = 1.026x — the
# skew-padded tables (el_dst N*kl rows ~4.4x the real edge count, el_src,
# and the ~2.7x triplet tables t2_kj/t1_jj) all pay to route; the
# well-packed global-plex eg tables (~1.2x, and the forward aggmix A/B
# showed scan-routing eg loses) stay on the ELL backward.
DEFAULT_GATHER_BACKWARD: frozenset = frozenset(
    {"el_dst", "el_src", "t2_kj", "t1_jj"}
)


def _route_sorted(agg_forward, key: str) -> bool:
    if isinstance(agg_forward, str):
        return agg_forward == "sorted"
    return key in agg_forward


def _agg(values, ids, row_mask, num_groups, tables, key,
         agg_forward=DEFAULT_AGG_FORWARD, scan_impl: str = "blocked"):
    """Masked segment sum, preferring (1) scatter-free ELL tables (built for
    training; fastest at QM9 scale), then (2) prefix-scan over group-sorted
    rows (offsets are always built; best for inference on huge edge sets
    where ELL gathers blow up), then (3) XLA scatter-add."""
    if tables:
        have_off = key + "_off" in tables
        if key in tables and not (_route_sorted(agg_forward, key) and have_off):
            return segment_sum_ell(values, ids, row_mask, *_t(tables, key))
        if have_off:
            return segment_sum_sorted(
                values, ids, row_mask, tables[key + "_off"], impl=scan_impl
            )
    return segment_sum(values * row_mask[:, None], ids, num_groups)


def _gath(x, idx, tables, key, gather_backward=DEFAULT_GATHER_BACKWARD,
          scan_impl: str = "blocked"):
    """Row gather with a scatter-free backward: routed keys aggregate their
    cotangent via the blocked prefix scan (gather_perm/gather_sorted) when
    the batch carries the aux arrays, everything else via the ELL table;
    plain gather (XLA scatter backward) when neither is present."""
    if tables:
        if key in gather_backward:
            if key + "_perm" in tables:
                return gather_perm(
                    scan_impl, x, idx, tables[key + "_perm"],
                    tables[key + "_poff"],
                )
            if key + "_off" in tables:
                return gather_sorted(scan_impl, x, idx, tables[key + "_off"])
        if key in tables:
            return gather_ell(x, idx, *_t(tables, key))
    return x[idx]


def global_mp(p, x, edge_attr, src, dst, e_mask, flow: str, num_nodes: int,
              tables: dict | None = None, lane_pack: bool = False,
              agg_forward=DEFAULT_AGG_FORWARD, scan_impl: str = "blocked",
              gather_backward=DEFAULT_GATHER_BACKWARD):
    """One global-plex layer (reference: global_message_passing.py:33-56).

    ``flow`` chooses which endpoint receives messages: ``source_to_target``
    aggregates at ``dst`` (x_i = x[dst]); ``target_to_source`` at ``src``.

    Two TPU-native rewrites of the reference math (both exact):
    * project-then-gather: the message MLP's first matmul over
      concat(x_i, x_j, e) is split row-wise so the x-projections run over
      N nodes instead of E >> N edges;
    * scatter-free aggregation: with ELL ``tables`` present, the forward
      segment-sum AND the gathers' backwards are gather + dense K-sum
      (ops/ell.py) instead of XLA scatters.
    """
    res_x = x
    x = nn.mlp(p["mlp_x1"], x)

    if flow == "source_to_target":
        i_idx, j_idx = dst, src
        ti, tj = ("eg_dst", "eg_src")
    else:
        i_idx, j_idx = src, dst
        ti, tj = ("eg_src", "eg_dst")
    agg_idx, t_agg = i_idx, ti

    dim = x.shape[1]
    w = p["mlp_m"][0]["w"].astype(x.dtype)  # (3*dim, dim) = [x_i | x_j | e]
    b = p["mlp_m"][0]["b"].astype(x.dtype)
    xi_proj = x @ w[:dim]
    xj_proj = x @ w[dim : 2 * dim]
    x_i = _gath(xi_proj, i_idx, tables, ti, gather_backward, scan_impl)
    x_j = _gath(xj_proj, j_idx, tables, tj, gather_backward, scan_impl)
    from pamnet_tpu.ops import packing

    pf = packing.pack_factor(dim) if lane_pack else 1
    if pf > 1 and edge_attr.shape[0] % pf == 0:
        # Lane-packed edge pipeline for narrow dims (docs/DESIGN.md section 4):
        # the elementwise chain runs at full 128-lane utilization; unpack
        # before aggregation (whose indices address individual edges).
        e_p = packing.pack(edge_attr, pf)
        pre = packing.pack(x_i + x_j, pf) + packing.packed_linear(
            e_p, w[2 * dim :], b, pf
        )
        w_e = p["W_edge_attr"]["w"].astype(edge_attr.dtype)
        m_p = nn.silu(pre) * (e_p @ packing.packed_weight(w_e, pf))
        m_p = m_p * packing.pack_mask(e_mask, dim, pf).astype(m_p.dtype)
        m = packing.unpack(m_p, pf)
    else:
        m = nn.silu(x_i + x_j + edge_attr @ w[2 * dim :] + b)
        m = m * nn.linear(p["W_edge_attr"], edge_attr)
        m = m * e_mask[:, None]
    x = x + _agg(m, agg_idx, e_mask, num_nodes, tables, t_agg,
                 agg_forward, scan_impl)
    x = nn.mlp(p["mlp_x2"], x)

    x = nn.res(p["res1"], x) + res_x
    x = nn.res(p["res2"], x)
    x = nn.res(p["res3"], x)

    out = nn.mlp(p["mlp_out"], x)
    att = out @ p["W"].astype(out.dtype)  # (N, 1)
    return x, nn.linear(p["W_out"], out), att


def _edge_message(mlp_p, x, rbf, i, j, tables,
                  gather_backward=DEFAULT_GATHER_BACKWARD,
                  scan_impl: str = "blocked"):
    """silu(W @ concat(x_i, x_j, rbf) + b) with the x-projections hoisted to
    node level (project-then-gather; identical math, E->N matmul rows)."""
    dim = x.shape[1]
    w = mlp_p[0]["w"].astype(x.dtype)  # (3*dim, dim)
    b = mlp_p[0]["b"].astype(x.dtype)
    xi, xj = x @ w[:dim], x @ w[dim : 2 * dim]
    x_i = _gath(xi, i, tables, "el_dst", gather_backward, scan_impl)
    x_j = _gath(xj, j, tables, "el_src", gather_backward, scan_impl)
    return nn.silu(x_i + x_j + rbf @ w[2 * dim :] + b)


def init_local_mp(key, dim: int, variant: str = "full"):
    ks = jax.random.split(key, 13)
    p = {
        "mlp_x1": nn.mlp_init(ks[0], [dim, dim]),
        "mlp_m_ji": nn.mlp_init(ks[1], [3 * dim, dim]),
        "mlp_sbf": nn.mlp_init(ks[3], [dim, dim, dim]),
        "lin_rbf": nn.linear_init(ks[4], dim, dim, bias=False),
        "res1": nn.res_init(ks[5], dim),
        "res2": nn.res_init(ks[6], dim),
        "res3": nn.res_init(ks[7], dim),
        "lin_rbf_out": nn.linear_init(ks[8], dim, dim, bias=False),
        "mlp_x2": nn.mlp_init(ks[9], [dim, dim]),
        "mlp_out": nn.mlp_init(ks[10], [dim, dim, dim, dim]),
        "W_out": nn.linear_init(ks[11], dim, 1),
        "W": nn.glorot(ks[12], (dim, 1)),
    }
    # Same shape, different name: mlp_m_kj (full, two-hop neighbors) vs
    # mlp_m_jj (_s, one-hop pair neighbors); kept separate for checkpoint
    # name fidelity (reference: local_message_passing.py:16,76).
    p["mlp_m_kj" if variant == "full" else "mlp_m_jj"] = nn.mlp_init(
        ks[2], [3 * dim, dim]
    )
    return p


def local_mp(
    p,
    x,
    rbf,
    sbf2,
    sbf1,
    t2_kj,
    t2_ji,
    t2_mask,
    t1_jj,
    t1_ji,
    t1_mask,
    el_src,
    el_dst,
    el_mask,
    num_nodes: int,
    use_pallas: bool = False,
    tables: dict | None = None,
    agg_forward=DEFAULT_AGG_FORWARD,
    scan_impl: str = "blocked",
    gather_backward=DEFAULT_GATHER_BACKWARD,
):
    """One full local-plex layer with both triplet streams (reference:
    local_message_passing.py:36-66).  ``sbf2``/``sbf1`` arrive already
    projected to ``dim`` by the model-level mlp_sbf2/mlp_sbf1."""
    from pamnet_tpu.ops.pallas_triplet import fits_pallas, fused_triplet_aggregate

    j, i = el_src, el_dst
    num_edges = rbf.shape[0]

    res_x = x
    x = nn.mlp(p["mlp_x1"], x)

    m_ji = _edge_message(p["mlp_m_ji"], x, rbf, i, j, tables,
                         gather_backward, scan_impl)
    m_neighbor = _edge_message(p["mlp_m_kj"], x, rbf, i, j, tables,
                               gather_backward, scan_impl) * nn.linear(
        p["lin_rbf"], rbf
    )

    # Triplet aggregation: gather neighbor-edge messages, modulate by the
    # angular basis, scatter-add back onto the center edge.  This is the hot
    # op (SURVEY.md section 3.2); padded triplets are masked to exact zero.
    if isinstance(sbf2, FoldedSBF):
        m2 = _fused_sbf_gather(p, m_neighbor, sbf2, t2_kj, t2_mask)
        m1 = _fused_sbf_gather(p, m_neighbor, sbf1, t1_jj, t1_mask)
        m_other = _agg(
            m2, t2_ji, t2_mask, num_edges, tables, "t2_ji", agg_forward,
            scan_impl,
        ) + _agg(
            m1, t1_ji, t1_mask, num_edges, tables, "t1_ji", agg_forward,
            scan_impl,
        )
        return _local_tail(
            p, x, res_x, m_ji + m_other, rbf, i, el_mask, num_nodes, tables,
            agg_forward, scan_impl,
        )
    b2 = nn.mlp(p["mlp_sbf"], sbf2) * t2_mask[:, None]
    b1 = nn.mlp(p["mlp_sbf"], sbf1) * t1_mask[:, None]
    if tables:
        m2 = _gath(m_neighbor, t2_kj, tables, "t2_kj", gather_backward,
                   scan_impl) * b2
        m1 = _gath(m_neighbor, t1_jj, tables, "t1_jj", gather_backward,
                   scan_impl) * b1
        m_other = _agg(
            m2, t2_ji, t2_mask, num_edges, tables, "t2_ji", agg_forward,
            scan_impl,
        ) + _agg(
            m1, t1_ji, t1_mask, num_edges, tables, "t1_ji", agg_forward,
            scan_impl,
        )
    else:
        dim = rbf.shape[1]
        p2 = use_pallas and fits_pallas(num_edges, b2.shape[0], dim)
        p1 = use_pallas and fits_pallas(num_edges, b1.shape[0], dim)
        m_other = fused_triplet_aggregate(
            m_neighbor, b2, t2_kj, t2_ji, num_edges, p2
        ) + fused_triplet_aggregate(m_neighbor, b1, t1_jj, t1_ji, num_edges, p1)
    return _local_tail(
        p, x, res_x, m_ji + m_other, rbf, i, el_mask, num_nodes, tables,
        agg_forward, scan_impl,
    )


def _local_tail(p, x, res_x, m, rbf, i, el_mask, num_nodes, tables,
                agg_forward=DEFAULT_AGG_FORWARD, scan_impl: str = "blocked"):
    """Shared epilogue of both local-layer variants: rbf gating, edge->node
    aggregation, residual update, scalar/attention heads (reference:
    local_message_passing.py:53-66)."""
    m = nn.linear(p["lin_rbf_out"], rbf) * m
    m = m * el_mask[:, None]
    x = x + _agg(m, i, el_mask, num_nodes, tables, "el_dst", agg_forward,
                 scan_impl)
    x = nn.mlp(p["mlp_x2"], x)

    x = nn.res(p["res1"], x) + res_x
    x = nn.res(p["res2"], x)
    x = nn.res(p["res3"], x)

    out = nn.mlp(p["mlp_out"], x)
    att = out @ p["W"].astype(out.dtype)
    return x, nn.linear(p["W_out"], out), att


def local_mp_s(
    p, x, rbf, sbf, t1_jj, t1_ji, t1_mask, el_src, el_dst, el_mask,
    num_nodes: int, tables: dict | None = None,
    agg_forward=DEFAULT_AGG_FORWARD, scan_impl: str = "blocked",
    gather_backward=DEFAULT_GATHER_BACKWARD,
):
    """Efficient one-hop-only local layer (reference:
    local_message_passing.py:96-123, used by PAMNet_s)."""
    j, i = el_src, el_dst
    num_edges = rbf.shape[0]

    res_x = x
    x = nn.mlp(p["mlp_x1"], x)

    m_ji = _edge_message(p["mlp_m_ji"], x, rbf, i, j, tables,
                         gather_backward, scan_impl)
    m_neighbor = _edge_message(p["mlp_m_jj"], x, rbf, i, j, tables,
                               gather_backward, scan_impl) * nn.linear(
        p["lin_rbf"], rbf
    )
    if isinstance(sbf, FoldedSBF):
        m1 = _fused_sbf_gather(p, m_neighbor, sbf, t1_jj, t1_mask)
    else:
        b1 = nn.mlp(p["mlp_sbf"], sbf) * t1_mask[:, None]
        m1 = _gath(m_neighbor, t1_jj, tables, "t1_jj", gather_backward,
                   scan_impl) * b1
    m = m_ji + _agg(m1, t1_ji, t1_mask, num_edges, tables, "t1_ji",
                    agg_forward, scan_impl)
    return _local_tail(p, x, res_x, m, rbf, i, el_mask, num_nodes, tables,
                       agg_forward, scan_impl)
