"""PAMNet: physics-aware two-plex GNN as a pure function over a GraphBatch.

Capability parity with the reference ``PAMNet`` / ``PAMNet_s``
(reference: models.py:21-353), re-designed for fixed shapes:

* graph structure (edges + triplet tables) arrives precomputed and padded in
  the ``GraphBatch`` (built on host or on device; the reference recomputes
  radius/knn/triplets from positions each forward, but positions are static
  in every supported dataset so structure is cacheable),
* distances/angles/bases are evaluated on device from positions, so the
  model remains a function of geometry (and stays differentiable w.r.t. it),
* padded entries flow through all MLPs but are masked to exact zeros before
  every scatter/pool.

Forward math matches reference models.py:100-224 (full) / 285-353 (`_s`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pamnet_tpu import nn
from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import GraphBatch
from pamnet_tpu.models import layers as L
from pamnet_tpu.ops.basis import bessel_rbf, spherical_basis
from pamnet_tpu.ops.ell import materialize_tables
from pamnet_tpu.ops.segment import segment_mean, segment_sum

import math
import numpy as np


def init_pamnet(key: jax.Array, cfg: PAMNetConfig) -> dict:
    """Create the parameter pytree (names/shapes track the reference modules
    so the torch checkpoint maps 1:1; see train/checkpoint.py)."""
    ks = jax.random.split(key, 16)
    dim = cfg.dim
    sbf_dim = cfg.num_spherical * cfg.num_radial

    params: dict = {
        # U(-sqrt(3), sqrt(3)) (reference: models.py:58-60)
        "embeddings": jax.random.uniform(
            ks[0], (cfg.num_atom_types, dim), minval=-math.sqrt(3), maxval=math.sqrt(3)
        ),
        # Trainable Bessel frequencies init n*pi (reference: layers/basic.py:69-72)
        "rbf_g": {"freq": jnp.arange(1, cfg.num_rbf + 1, dtype=jnp.float32) * jnp.pi},
        "rbf_l": {"freq": jnp.arange(1, cfg.num_rbf + 1, dtype=jnp.float32) * jnp.pi},
        "mlp_rbf_g": nn.mlp_init(ks[1], [cfg.num_rbf, dim]),
        "mlp_rbf_l": nn.mlp_init(ks[2], [cfg.num_rbf, dim]),
    }
    if cfg.dataset_kind != "rna" and cfg.variant == "full":
        params["init_linear"] = nn.linear_init(
            ks[3], cfg.num_node_features, dim, bias=False
        )

    if cfg.variant == "full":
        params["mlp_sbf1"] = nn.mlp_init(ks[4], [sbf_dim, dim])
        params["mlp_sbf2"] = nn.mlp_init(ks[5], [sbf_dim, dim])
    else:
        params["mlp_sbf"] = nn.mlp_init(ks[4], [sbf_dim, dim])

    gkeys = jax.random.split(ks[6], cfg.n_layer)
    lkeys = jax.random.split(ks[7], cfg.n_layer)
    params["global_layers"] = [L.init_global_mp(k, dim) for k in gkeys]
    params["local_layers"] = [
        L.init_local_mp(k, dim, cfg.variant) for k in lkeys
    ]
    return params


def count_parameters(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def _safe_edge_dist(pos, src, dst, mask, cutoff):
    """Edge length; padded edges forced to 2*cutoff so every basis channel is
    exactly zero there (mask-before-basis; SURVEY.md hard part #4)."""
    d = jnp.sqrt(jnp.sum((pos[dst] - pos[src]) ** 2, axis=-1))
    return jnp.where(mask > 0, d, 2.0 * cutoff)


def _angle(pos, a, b, c, mask):
    """Angle between v1 = pos[b]-pos[a] and v2 = pos[c]-pos[b] via
    atan2(|v1 x v2|, v1.v2) (reference: models.py:164-177), with zero-safe
    norm and padding-safe atan2 arguments."""
    v1 = pos[b] - pos[a]
    v2 = pos[c] - pos[b]
    dot = jnp.sum(v1 * v2, axis=-1)
    cross = jnp.cross(v1, v2)
    sq = jnp.sum(cross * cross, axis=-1)
    nrm = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    dot = jnp.where(mask > 0, dot, 1.0)  # atan2(0,0) has NaN grads
    return jnp.arctan2(nrm, dot)


def _fold_gate(cfg: PAMNetConfig, tables) -> bool:
    """Should the sbf MLP fold through the triplet gather (fold_sbf)?

    Auto (cfg.fold_sbf=None): only when the projected row fits one 128-lane
    row AND the batch carries no ELL triplet tables.  The projected table
    carries mlp_sbf WEIGHT gradients, so its plain triplet gather would add
    a T-axis scatter-add per layer to the backward — the exact op the ELL
    machinery removes; training batches (which build ELL tables) therefore
    stay on the unfolded path, whose gather is gradient-free (grads reach
    mlp_sbf via the dense per-triplet matmul instead).  cfg.fold_sbf=True
    still forces folding."""
    if cfg.fold_sbf is not None:
        return cfg.fold_sbf
    return cfg.num_spherical * cfg.dim <= 128 and not (
        tables and "t1_jj" in tables
    )


def apply_pamnet(params: dict, g: GraphBatch, cfg: PAMNetConfig) -> jax.Array:
    """Forward pass -> (G,) per-graph predictions (padded graphs give 0)."""
    from pamnet_tpu.data.batch import hydrate_batch

    # Compact-wire batches (int16 indices, counts instead of masks) expand
    # here, inside the compiled program; full batches pass through.
    g = hydrate_batch(g)
    kind = cfg.dataset_kind
    num_nodes = g.z.shape[0]
    if cfg.device_graph:
        # Rebuild edges/triplets from positions inside the compiled step
        # (reference per-forward semantics, models.py:104-162); drops the
        # precomputed distance/basis/table fields so the device fallbacks
        # below evaluate geometry in-graph.
        from pamnet_tpu.models.device_graph import rebuild_structure

        g = rebuild_structure(g, cfg)
    pos = g.pos

    # ---- node embedding (reference: models.py:107,119,140) ----
    if kind == "pdbbind":
        x = nn.linear(params["init_linear"], g.feat)
    else:
        x = params["embeddings"][g.z]

    # ---- distances: host-precomputed when the batch carries them (the
    # (E, 3) pos-gathers tile-pad to 128 lanes, 42x traffic on 1M+-edge
    # graphs); device fallback keeps geometry differentiable ----
    if g.dist_g is not None:
        dist_g = jnp.where(g.eg_mask > 0, g.dist_g, 2.0 * cfg.cutoff_g)
        dist_l = jnp.where(g.el_mask > 0, g.dist_l, 2.0 * cfg.cutoff_l)
    else:
        dist_g = _safe_edge_dist(pos, g.eg_src, g.eg_dst, g.eg_mask, cfg.cutoff_g)
        dist_l = _safe_edge_dist(pos, g.el_src, g.el_dst, g.el_mask, cfg.cutoff_l)

    use_two_hop = cfg.variant == "full"

    # ---- bases (reference: models.py:179-188) ----
    # The 1D Bessel basis has *trainable* frequencies, so it always runs on
    # device; the spherical basis is geometry-only and uses the host
    # precomputed float64 tables when the batch carries them (the on-device
    # evaluation dominated RNA inference time).
    rbf_l = bessel_rbf(dist_l, params["rbf_l"]["freq"], cfg.cutoff_l, cfg.envelope_exponent)
    rbf_g = bessel_rbf(dist_g, params["rbf_g"]["freq"], cfg.cutoff_g, cfg.envelope_exponent)
    edge_attr_rbf_l = nn.mlp(params["mlp_rbf_l"], rbf_l)
    edge_attr_rbf_g = nn.mlp(params["mlp_rbf_g"], rbf_g)

    # Mixed-precision boundary starts at the (geometry-constant) spherical
    # basis TABLES: casting them before the triplet gathers halves the
    # dominant random-gather HBM traffic at bf16 (each gathered row costs a
    # full 512-byte padded lane row in f32; profile: tools/rna_profile.py).
    # The trainable Bessel part and on-device basis math stay f32.
    cdt = jnp.dtype(cfg.compute_dtype)

    ns, nr = cfg.num_spherical, cfg.num_radial
    # Fold the 1-layer sbf MLP THROUGH the triplet gather when the projected
    # row still fits one 128-lane row (ns*dim <= 128, i.e. the RNA dim-16
    # scoring shapes): pre-project the per-edge radial table once at edge
    # level (7 tiny block matmuls, El rows), gather the (El, ns*dim)
    # projected table (same single padded-lane-row read per triplet as the
    # raw (El, 42) gather), and finish with ns fused lane-slice
    # multiply-adds.  Exact reassociation of silu((sbf ⊙ rep(cbf)) @ W + b);
    # removes the (T, 42) materialization + (T,42)@(42,dim) matmul streams —
    # ~2 full padded T-row passes on the 1.8M-triplet RNA batch.
    # Derive-mode batches (collate_structures(build_tables="derive")) carry
    # tiny shape markers instead of the (G, K) ELL tables; expand them here
    # (inside the compiled program, bit-identical to the host builder) so
    # all downstream routing sees the same dict either way.
    tables = g.tables if (cfg.scatter_free and g.tables is not None) else None
    tables = materialize_tables(tables)
    fold_sbf = (
        g.sbf_radial is not None
        and _fold_gate(cfg, tables)
        and len(params.get("mlp_sbf1", params.get("mlp_sbf", []))) == 1
    )
    if fold_sbf:
        sbf_table_f = g.sbf_radial.astype(cdt)

        def projected(mlp_p):
            w = mlp_p[0]["w"].astype(cdt)  # (ns*nr, dim)
            b = mlp_p[0]["b"].astype(cdt)
            proj = jnp.concatenate(
                [sbf_table_f[:, l * nr:(l + 1) * nr] @ w[l * nr:(l + 1) * nr]
                 for l in range(ns)],
                axis=1,
            )  # (El, ns*dim)
            return proj, b

        # Fuse the projected-table gather with the per-layer m_neighbor
        # gather (same neighbor-edge index; one lane row serves both when
        # (ns+1)*dim <= 128).  Auto-off when ELL triplet tables are present:
        # the fused plain gather would forfeit their scatter-free backward.
        fuse = (cfg.fuse_sbf_gather if cfg.fuse_sbf_gather is not None
                else ((ns + 1) * cfg.dim <= 128
                      and not (tables and "t1_jj" in tables)))
        if fuse:
            def folded_attr(mlp_p, cbf):
                proj, b = projected(mlp_p)
                return L.FoldedSBF(proj, cbf.astype(cdt), b)

            if use_two_hop:
                edge_attr_sbf2 = folded_attr(params["mlp_sbf2"], g.cbf2)
                edge_attr_sbf1 = folded_attr(params["mlp_sbf1"], g.cbf1)
            else:
                edge_attr_sbf = folded_attr(params["mlp_sbf"], g.cbf1)
        else:
            def projected_attr(mlp_p, idx, cbf):
                proj, b = projected(mlp_p)
                d = cfg.dim
                rows = proj[idx]  # one padded lane-row per triplet
                cbf_c = cbf.astype(cdt)
                out = b
                for l in range(ns):
                    out = out + cbf_c[:, l:l + 1] * rows[:, l * d:(l + 1) * d]
                return nn.silu(out)

            if use_two_hop:
                edge_attr_sbf2 = projected_attr(
                    params["mlp_sbf2"], g.t2_kj, g.cbf2
                )
                edge_attr_sbf1 = projected_attr(
                    params["mlp_sbf1"], g.t1_jj, g.cbf1
                )
            else:
                edge_attr_sbf = projected_attr(params["mlp_sbf"], g.t1_jj, g.cbf1)
    elif g.sbf_radial is not None:
        # Gather the FLAT (El, ns*nr) table and expand cbf to ns*nr lanes:
        # gathering a reshaped (El, ns, nr) view materializes (T, ns, nr)
        # arrays whose minor dims tile-pad to (8, 128) — a 24x memory blowup
        # that dominated RNA inference.
        sbf_table = g.sbf_radial.astype(cdt)

        def sbf_from_tables(idx, cbf):
            cbf_rep = jnp.repeat(cbf.astype(cdt), nr, axis=1)  # (T, ns*nr)
            return sbf_table[idx] * cbf_rep

        if use_two_hop:
            sbf2 = sbf_from_tables(g.t2_kj, g.cbf2)
            sbf1 = sbf_from_tables(g.t1_jj, g.cbf1)
        else:
            sbf = sbf_from_tables(g.t1_jj, g.cbf1)
    else:
        if use_two_hop:
            angle2 = _angle(pos, g.t2_i, g.t2_j, g.t2_k, g.t2_mask)
        angle1 = _angle(pos, g.t1_i, g.t1_j1, g.t1_j2, g.t1_mask)
        sbf_args = (ns, nr, cfg.cutoff_l, cfg.envelope_exponent)
        if use_two_hop:
            sbf2 = spherical_basis(dist_l, angle2, g.t2_kj, *sbf_args)
            sbf1 = spherical_basis(dist_l, angle1, g.t1_jj, *sbf_args)
        else:
            sbf = spherical_basis(dist_l, angle1, g.t1_jj, *sbf_args)
    if not fold_sbf:
        if use_two_hop:
            edge_attr_sbf2 = nn.mlp(params["mlp_sbf2"], sbf2)
            edge_attr_sbf1 = nn.mlp(params["mlp_sbf1"], sbf1)
        else:
            edge_attr_sbf = nn.mlp(params["mlp_sbf"], sbf)

    # ---- mixed-precision boundary: geometry math above stays f32; the
    # message-passing stack below runs in cfg.compute_dtype ----
    x = x.astype(cdt)
    edge_attr_rbf_g = edge_attr_rbf_g.astype(cdt)
    edge_attr_rbf_l = edge_attr_rbf_l.astype(cdt)
    eg_mask = g.eg_mask.astype(cdt)
    el_mask = g.el_mask.astype(cdt)
    t2_mask = g.t2_mask.astype(cdt)
    t1_mask = g.t1_mask.astype(cdt)
    if not fold_sbf:  # fold paths already produced compute-dtype outputs
        if use_two_hop:
            edge_attr_sbf2 = edge_attr_sbf2.astype(cdt)
            edge_attr_sbf1 = edge_attr_sbf1.astype(cdt)
        else:
            edge_attr_sbf = edge_attr_sbf.astype(cdt)

    # ---- plex loop (reference: models.py:196-204) ----
    outs_g, atts_g, outs_l, atts_l = [], [], [], []

    if cfg.scan_layers and cfg.n_layer > 1:
        def body(x, layer_params):
            gp, lp = layer_params
            x, out_g, att_g = L.global_mp(
                gp, x, edge_attr_rbf_g, g.eg_src, g.eg_dst, eg_mask, cfg.flow,
                num_nodes, tables=tables, lane_pack=cfg.lane_pack,
                agg_forward=cfg.agg_forward, scan_impl=cfg.sorted_scan_impl,
                gather_backward=cfg.gather_backward,
            )
            if use_two_hop:
                x, out_l, att_l = L.local_mp(
                    lp, x, edge_attr_rbf_l, edge_attr_sbf2, edge_attr_sbf1,
                    g.t2_kj, g.t2_ji, t2_mask, g.t1_jj, g.t1_ji, t1_mask,
                    g.el_src, g.el_dst, el_mask, num_nodes,
                    use_pallas=cfg.use_pallas_triplet, tables=tables,
                    agg_forward=cfg.agg_forward, scan_impl=cfg.sorted_scan_impl,
                    gather_backward=cfg.gather_backward,
                )
            else:
                x, out_l, att_l = L.local_mp_s(
                    lp, x, edge_attr_rbf_l, edge_attr_sbf,
                    g.t1_jj, g.t1_ji, t1_mask,
                    g.el_src, g.el_dst, el_mask, num_nodes, tables=tables,
                    agg_forward=cfg.agg_forward, scan_impl=cfg.sorted_scan_impl,
                    gather_backward=cfg.gather_backward,
                )
            return x, (out_g[..., 0], att_g[..., 0], out_l[..., 0], att_l[..., 0])

        g_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *params["global_layers"])
        l_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *params["local_layers"])
        x, (og, ag, ol, al) = jax.lax.scan(body, x, (g_stack, l_stack))
        # f32 fusion (see the unrolled path below for why).
        att = jnp.stack([ag, al], axis=-1).astype(jnp.float32)  # (L, N, 2)
        att = jax.nn.softmax(jax.nn.leaky_relu(att, 0.2), axis=-1)
        out = jnp.stack([og, ol], axis=-1).astype(jnp.float32)
        node_out = (out * att).sum(-1).sum(0)
        return _pool(node_out, g, cfg, pos)

    for layer in range(cfg.n_layer):
        x, out_g, att_g = L.global_mp(
            params["global_layers"][layer],
            x, edge_attr_rbf_g, g.eg_src, g.eg_dst, eg_mask, cfg.flow, num_nodes,
            tables=tables, lane_pack=cfg.lane_pack,
            agg_forward=cfg.agg_forward, scan_impl=cfg.sorted_scan_impl,
            gather_backward=cfg.gather_backward,
        )
        outs_g.append(out_g)
        atts_g.append(att_g)

        if use_two_hop:
            x, out_l, att_l = L.local_mp(
                params["local_layers"][layer],
                x, edge_attr_rbf_l, edge_attr_sbf2, edge_attr_sbf1,
                g.t2_kj, g.t2_ji, t2_mask,
                g.t1_jj, g.t1_ji, t1_mask,
                g.el_src, g.el_dst, el_mask, num_nodes,
                use_pallas=cfg.use_pallas_triplet,
                tables=tables,
                agg_forward=cfg.agg_forward, scan_impl=cfg.sorted_scan_impl,
                gather_backward=cfg.gather_backward,
            )
        else:
            x, out_l, att_l = L.local_mp_s(
                params["local_layers"][layer],
                x, edge_attr_rbf_l, edge_attr_sbf,
                g.t1_jj, g.t1_ji, t1_mask,
                g.el_src, g.el_dst, el_mask, num_nodes,
                tables=tables,
                agg_forward=cfg.agg_forward, scan_impl=cfg.sorted_scan_impl,
                gather_backward=cfg.gather_backward,
            )
        outs_l.append(out_l)
        atts_l.append(att_l)

    # ---- fusion: 2-way plex softmax per (layer, node), summed over layers
    # (reference: models.py:206-213).  Runs in f32 regardless of
    # compute_dtype: the (L, N, 2) head arrays are tiny, and a bf16 softmax
    # here measured as a uniform ~2.5% output bias on RNA scoring. ----
    att = jnp.stack(
        [jnp.stack(atts_g, 0)[..., 0], jnp.stack(atts_l, 0)[..., 0]], axis=-1
    ).astype(jnp.float32)  # (L, N, 2)
    att = jax.nn.softmax(jax.nn.leaky_relu(att, 0.2), axis=-1)
    out = jnp.stack(
        [jnp.stack(outs_g, 0)[..., 0], jnp.stack(outs_l, 0)[..., 0]], axis=-1
    ).astype(jnp.float32)  # (L, N, 2)
    node_out = (out * att).sum(-1).sum(0)  # (N,)
    return _pool(node_out, g, cfg, pos)


def _pool(node_out, g: GraphBatch, cfg: PAMNetConfig, pos):
    """Dataset-specific graph pooling (reference: models.py:215-224)."""
    kind = cfg.dataset_kind
    node_out = node_out * g.node_mask
    if kind == "qm9":
        pooled = segment_sum(node_out, g.node_graph, g.y.shape[0])
    elif kind == "pdbbind":
        # DeltaE = E_complex - E_pocket - E_ligand via the +-1 x-shift mask
        # (reference: models.py:122-125,217-219 and preprocess_pdbbind.py:33-43).
        sign = jnp.where(pos[:, 0] > 40.0, -1.0, 1.0)
        pooled = segment_sum(node_out * sign, g.node_graph, g.y.shape[0])
    else:  # rna
        pooled = segment_mean(
            node_out[:, None], g.node_graph, g.y.shape[0], mask=g.node_mask
        )[:, 0]
    return pooled * g.graph_mask
