"""On-device graph-structure rebuild: the jit-compatible analog of the
reference's per-forward graph construction (reference: models.py:104-162
rebuilds radius/knn edges + triplet tables from positions on every call).

The production path precomputes structure on host (positions are static in
every supported dataset; data/batch.py::precompute_structure), but
``PAMNetConfig.device_graph=True`` routes ``apply_pamnet`` through this
module instead: edges and triplet tables are rebuilt from ``pos`` inside
the compiled step using ``ops/neighbors.py``, and the precomputed
distance/basis/aggregation-table fields are dropped so the model's existing
device fallbacks evaluate geometry in-graph.  This is the path for
positions that change under jit (relaxation / MD-style loops), at the cost
of the O(N^2)/O(E^2) masked candidate sets — intended for QM9-scale
batches (see ops/neighbors.py).

Per dataset (matching precompute_structure / reference models.py):
  * qm9:     global = radius(cutoff_g, max 1000; 500 for PAMNet_s);
             local edges + triplets are BOND data (models.py:105) and are
             kept from the input batch.
  * pdbbind: global = radius(cutoff_g, max 1000); local = global edges
             with dist <= cutoff_l; triplets rebuilt from local.
  * rna:     knn(50) superset; global/local = dist <= cutoff_g/l;
             triplets rebuilt from local.
"""

from __future__ import annotations

import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import GraphBatch
from pamnet_tpu.ops import neighbors


def _compact(sel_mask, src, dst, e_pad):
    """Compact the selected edges of a candidate list into ``e_pad`` slots
    (padded entries point at 0, mask marks validity)."""
    idx = jnp.nonzero(sel_mask, size=e_pad, fill_value=0)[0]
    count = jnp.sum(sel_mask)
    mask = (jnp.arange(e_pad) < count).astype(jnp.float32)
    return src[idx], dst[idx], mask, count


def rebuild_structure(g: GraphBatch, cfg: PAMNetConfig) -> GraphBatch:
    """Return ``g`` with edges/triplets rebuilt on device from ``g.pos``.

    Pad sizes are taken from the incoming batch, so the rebuilt structure
    compiles to the same shapes.  A structure that outgrows its pad is
    silently truncated (static shapes cannot raise under jit); use
    :func:`structure_counts_device` to audit counts against the pads when
    positions move.
    """
    kind = cfg.dataset_kind
    pos, graph, mask = g.pos, g.node_graph, g.node_mask
    eg_pad = g.eg_src.shape[0]

    if kind == "qm9":
        max_nb = 500 if cfg.variant == "s" else 1000
        q, s, eg_mask = neighbors.radius_edges(
            pos, graph, mask, cfg.cutoff_g, eg_pad, max_num_neighbors=max_nb
        )
        # Local edges are the chemical bond graph (reference models.py:105)
        # — input data, not geometry; keep them and their triplet tables.
        return g._replace(
            eg_src=q, eg_dst=s, eg_mask=eg_mask,
            tables=None, sbf_radial=None, cbf2=None, cbf1=None,
            dist_g=None, dist_l=None,
        )

    el_pad = g.el_src.shape[0]
    if kind == "pdbbind":
        q, s, eg_mask = neighbors.radius_edges(
            pos, graph, mask, cfg.cutoff_g, eg_pad, max_num_neighbors=1000
        )
    elif kind == "rna":
        kq, ks, kmask = neighbors.knn_edges(pos, graph, mask, 50)
        kd = jnp.sqrt(jnp.sum((pos[ks] - pos[kq]) ** 2, axis=-1))
        keep = (kmask > 0) & (kq != ks)  # host removes self-loops
        q, s, eg_mask, _ = _compact(
            keep & (kd <= cfg.cutoff_g), kq, ks, eg_pad
        )
    else:
        raise ValueError(f"unknown dataset kind: {kind}")

    # Local = global/knn candidates within cutoff_l (reference models.py:
    # 127-136 pdbbind, 143-157 rna).
    if kind == "pdbbind":
        d = jnp.sqrt(jnp.sum((pos[s] - pos[q]) ** 2, axis=-1))
        el_src, el_dst, el_mask, _ = _compact(
            (eg_mask > 0) & (d <= cfg.cutoff_l), q, s, el_pad
        )
    else:
        el_src, el_dst, el_mask, _ = _compact(
            keep & (kd <= cfg.cutoff_l), kq, ks, el_pad
        )

    t1 = neighbors.device_pairs(el_src, el_dst, el_mask, g.t1_jj.shape[0])
    rep = dict(
        eg_src=q, eg_dst=s, eg_mask=eg_mask,
        el_src=el_src, el_dst=el_dst, el_mask=el_mask,
        t1_i=t1["idx_i"], t1_j1=t1["idx_j1"], t1_j2=t1["idx_j2"],
        t1_jj=t1["idx_jj"], t1_ji=t1["idx_ji"], t1_mask=t1["mask"],
        tables=None, sbf_radial=None, cbf2=None, cbf1=None,
        dist_g=None, dist_l=None,
    )
    if cfg.variant == "full":
        t2 = neighbors.device_triplets(el_src, el_dst, el_mask, g.t2_kj.shape[0])
        rep.update(
            t2_i=t2["idx_i"], t2_j=t2["idx_j"], t2_k=t2["idx_k"],
            t2_kj=t2["idx_kj"], t2_ji=t2["idx_ji"], t2_mask=t2["mask"],
        )
    return g._replace(**rep)


def structure_counts_device(g: GraphBatch, cfg: PAMNetConfig):
    """Exact structure counts for the current positions (jit-compatible):
    dict of eg/el/t2/t1 counts to audit against the batch pads when
    positions change under jit (a count above its pad means
    :func:`rebuild_structure` truncated)."""
    kind = cfg.dataset_kind
    pos, graph, mask = g.pos, g.node_graph, g.node_mask
    n = pos.shape[0]
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    valid = (mask[:, None] > 0) & (mask[None, :] > 0)
    same = graph[:, None] == graph[None, :]
    off_diag = ~jnp.eye(n, dtype=bool)
    cand = valid & same & off_diag
    if kind == "rna":
        # knn(50) superset bound; cutoffs apply within it.
        big = jnp.asarray(jnp.inf, d2.dtype)
        keyed = jnp.where(cand, d2, big)
        kth = jnp.sort(keyed, axis=1)[:, :50]
        in_knn = keyed <= kth[:, -1:]
        eg_cand = cand & in_knn & (d2 <= cfg.cutoff_g**2)
        el_cand = cand & in_knn & (d2 <= cfg.cutoff_l**2)
    else:
        eg_cand = cand & (d2 <= cfg.cutoff_g**2)
        el_cand = cand & (d2 <= cfg.cutoff_l**2)
    counts = {"eg": jnp.sum(eg_cand)}
    if kind == "qm9":
        counts["el"] = jnp.sum(g.el_mask > 0)
        return counts
    counts["el"] = jnp.sum(el_cand)
    return counts
