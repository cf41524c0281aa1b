"""Independent float64 numpy/scipy oracle for the PAMNet forward pass.

This re-implements the reference math (models.py:100-224) directly from the
paper-level formulas in double precision, consuming the raw torch state_dict
(weights in torch (out, in) layout).  Graph construction is ALSO re-derived
here from the reference's index semantics (radius graph, self-loop removal,
two-hop triplet and one-hop pair enumeration — loop-level code sharing no
lines with ``pamnet_tpu.data.graphbuild``), so agreement between the oracle
and the JAX model is evidence for the whole pipeline, not just the math.
The single exception is the RNA branch's knn(50), taken from graphbuild:
knn tie-breaking (distance ties broken by index) must match production
bit-for-bit for edge sets to agree, and ``knn_graph_np`` carries its own
brute-force oracle tests (tests/test_graphbuild.py).
"""

from __future__ import annotations

import numpy as np
from scipy import special

from pamnet_tpu.data import graphbuild


def _oracle_radius(pos, r, max_num_neighbors=1000):
    """All (query, source) pairs with ||pos[q]-pos[s]|| <= r, self included,
    per-query cap by ascending source index (reference: torch_cluster.radius
    semantics at models.py:110,128).  Per-query loop, f32 like production."""
    pos = np.asarray(pos, np.float32)
    q_list, s_list = [], []
    for q in range(pos.shape[0]):
        d2 = ((pos - pos[q]) ** 2).sum(-1)
        nbr = np.nonzero(d2 <= np.float32(r) * np.float32(r))[0]
        nbr = nbr[:max_num_neighbors]
        q_list.extend([q] * len(nbr))
        s_list.extend(nbr.tolist())
    return np.asarray([q_list, s_list], np.int64)


def _oracle_drop_self_loops(edge_index):
    """src != dst filter (reference: models.py:63)."""
    e = np.asarray(edge_index, np.int64)
    return e[:, e[0] != e[1]]


def _oracle_triplets(edge_index, num_nodes):
    """Two-hop triplets re-derived by direct loop: for each edge e=(j->i),
    every edge e2=(k->j) with k != i (reference: models.py:74-84)."""
    src, dst = [a.tolist() for a in np.asarray(edge_index, np.int64)]
    in_edges = [[] for _ in range(num_nodes)]
    for e, d in enumerate(dst):
        in_edges[d].append(e)
    ii, jj, kk, e_kj, e_ji = [], [], [], [], []
    for e in range(len(src)):
        j, i = src[e], dst[e]
        for e2 in in_edges[j]:
            k = src[e2]
            if k == i:
                continue
            ii.append(i), jj.append(j), kk.append(k)
            e_kj.append(e2), e_ji.append(e)
    return {
        "idx_i": np.asarray(ii, np.int32),
        "idx_j": np.asarray(jj, np.int32),
        "idx_k": np.asarray(kk, np.int32),
        "idx_kj": np.asarray(e_kj, np.int32),
        "idx_ji": np.asarray(e_ji, np.int32),
    }


def _oracle_pairs(edge_index, num_nodes):
    """One-hop pairs re-derived by direct loop: for each edge e=(i->j1),
    every edge e2=(j2->j1) with j2 != j1, the self pair e2 == e included
    (reference: models.py:85-97)."""
    src, dst = [a.tolist() for a in np.asarray(edge_index, np.int64)]
    in_edges = [[] for _ in range(num_nodes)]
    for e, d in enumerate(dst):
        in_edges[d].append(e)
    ii, j1s, j2s, e_jj, e_ji = [], [], [], [], []
    for e in range(len(src)):
        i, j1 = src[e], dst[e]
        for e2 in in_edges[j1]:
            j2 = src[e2]
            if j2 == j1:
                continue
            ii.append(i), j1s.append(j1), j2s.append(j2)
            e_jj.append(e2), e_ji.append(e)
    return {
        "idx_i": np.asarray(ii, np.int32),
        "idx_j1": np.asarray(j1s, np.int32),
        "idx_j2": np.asarray(j2s, np.int32),
        "idx_jj": np.asarray(e_jj, np.int32),
        "idx_ji": np.asarray(e_ji, np.int32),
    }


def silu(x):
    return x / (1.0 + np.exp(-x))


def linear(sd, name, x):
    w = sd[name + ".weight"].astype(np.float64)
    y = x @ w.T
    if name + ".bias" in sd:
        y = y + sd[name + ".bias"].astype(np.float64)
    return y


def mlp(sd, name, x, stages):
    for s in range(stages):
        x = silu(linear(sd, f"{name}.{s}.0", x))
    return x


def res(sd, name, x):
    return mlp(sd, name + ".mlp", x, 2) + x


def envelope(x, p=5):
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2)
    c = -p * (p + 1) / 2.0
    val = 1.0 / x + a * x**p + b * x ** (p + 1) + c * x ** (p + 2)
    return np.where(x < 1.0, val, 0.0)


def bessel_rbf(sd, name, dist, cutoff):
    freq = sd[name + ".freq"].astype(np.float64)
    x = dist[:, None] / cutoff
    return envelope(x) * np.sin(freq * x)


def spherical_basis(dist, angle, idx_edge, cutoff, ns=7, nr=6):
    from pamnet_tpu.ops.bessel import bessel_basis_tables

    t = bessel_basis_tables(ns, nr)
    x = dist / cutoff
    rbf = np.zeros((len(dist), ns, nr))
    for l in range(ns):
        for n in range(nr):
            rbf[:, l, n] = t["norm"][l, n] * special.spherical_jn(
                l, t["zeros"][l, n] * x
            )
    rbf *= envelope(x)[:, None, None]
    cbf = np.stack(
        [
            np.sqrt((2 * l + 1) / (4 * np.pi)) * special.eval_legendre(l, np.cos(angle))
            for l in range(ns)
        ],
        axis=1,
    )
    return (rbf[idx_edge] * cbf[:, :, None]).reshape(len(angle), ns * nr)


def scatter_add(values, idx, size):
    out = np.zeros((size,) + values.shape[1:], dtype=values.dtype)
    np.add.at(out, idx, values)
    return out


def global_mp(sd, pre, x, edge_attr, src, dst, flow):
    res_x = x
    x = mlp(sd, pre + "mlp_x1", x, 1)
    if flow == "source_to_target":
        x_i, x_j, agg = x[dst], x[src], dst
    else:
        x_i, x_j, agg = x[src], x[dst], src
    m = mlp(sd, pre + "mlp_m", np.concatenate([x_i, x_j, edge_attr], -1), 1)
    m = m * linear(sd, pre + "W_edge_attr", edge_attr)
    x = x + scatter_add(m, agg, x.shape[0])
    x = mlp(sd, pre + "mlp_x2", x, 1)
    x = res(sd, pre + "res1", x) + res_x
    x = res(sd, pre + "res2", x)
    x = res(sd, pre + "res3", x)
    out = mlp(sd, pre + "mlp_out", x, 3)
    att = out @ sd[pre + "W"].astype(np.float64)
    return x, linear(sd, pre + "W_out", out), att


def local_mp(sd, pre, x, rbf, sbf2, sbf1, t2, t1, src, dst):
    res_x = x
    x = mlp(sd, pre + "mlp_x1", x, 1)
    m = np.concatenate([x[dst], x[src], rbf], -1)
    m_ji = mlp(sd, pre + "mlp_m_ji", m, 1)
    m_nb = mlp(sd, pre + "mlp_m_kj", m, 1) * linear(sd, pre + "lin_rbf", rbf)
    idx = np.concatenate([t2["idx_kj"], t1["idx_jj"]])
    idx_sc = np.concatenate([t2["idx_ji"], t1["idx_ji"]])
    sbf = np.concatenate([sbf2, sbf1], 0)
    m_other = m_nb[idx] * mlp(sd, pre + "mlp_sbf", sbf, 2)
    m_other = scatter_add(m_other, idx_sc, m.shape[0])
    m = m_ji + m_other
    m = linear(sd, pre + "lin_rbf_out", rbf) * m
    x = x + scatter_add(m, dst, x.shape[0])
    x = mlp(sd, pre + "mlp_x2", x, 1)
    x = res(sd, pre + "res1", x) + res_x
    x = res(sd, pre + "res2", x)
    x = res(sd, pre + "res3", x)
    out = mlp(sd, pre + "mlp_out", x, 3)
    att = out @ sd[pre + "W"].astype(np.float64)
    return x, linear(sd, pre + "W_out", out), att


def local_mp_s(sd, pre, x, rbf, sbf, t1, src, dst):
    """One-hop-only local layer (reference: local_message_passing.py:69-123;
    ``mlp_m_jj`` replaces ``mlp_m_kj``, single sbf stream)."""
    res_x = x
    x = mlp(sd, pre + "mlp_x1", x, 1)
    m = np.concatenate([x[dst], x[src], rbf], -1)
    m_ji = mlp(sd, pre + "mlp_m_ji", m, 1)
    m_nb = mlp(sd, pre + "mlp_m_jj", m, 1) * linear(sd, pre + "lin_rbf", rbf)
    m_other = m_nb[t1["idx_jj"]] * mlp(sd, pre + "mlp_sbf", sbf, 2)
    m_other = scatter_add(m_other, t1["idx_ji"], m.shape[0])
    m = m_ji + m_other
    m = linear(sd, pre + "lin_rbf_out", rbf) * m
    x = x + scatter_add(m, dst, x.shape[0])
    x = mlp(sd, pre + "mlp_x2", x, 1)
    x = res(sd, pre + "res1", x) + res_x
    x = res(sd, pre + "res2", x)
    x = res(sd, pre + "res3", x)
    out = mlp(sd, pre + "mlp_out", x, 3)
    att = out @ sd[pre + "W"].astype(np.float64)
    return x, linear(sd, pre + "W_out", out), att


def fuse(outs, atts):
    """Fusion module (reference: models.py:206-213): per (layer, node) 2-way
    leaky-relu softmax over plexes, weighted sum, summed over layers -> (N,)."""
    att = np.stack(
        [np.stack([a[0][:, 0] for a in atts]), np.stack([a[1][:, 0] for a in atts])],
        axis=-1,
    )  # (L, N, 2)
    att = np.where(att > 0, att, 0.2 * att)  # leaky_relu
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    out = np.stack(
        [np.stack([o[0][:, 0] for o in outs]), np.stack([o[1][:, 0] for o in outs])],
        axis=-1,
    )
    return (out * att).sum(-1).sum(0)


def angles(pos, a, b, c):
    v1 = pos[b] - pos[a]
    v2 = pos[c] - pos[b]
    dot = np.sum(v1 * v2, -1)
    cr = np.linalg.norm(np.cross(v1, v2), axis=-1)
    return np.arctan2(cr, dot)


def stack_forward(sd, x, pos, eg, el, n_layer, cutoff_l, cutoff_g, flow,
                  variant="full"):
    """Shared trunk: bases + n_layer x (global -> local) + fusion -> (N,)
    per-node scalars (reference: models.py:162-213 / 307-350 for `_s`)."""
    n = pos.shape[0]
    src, dst = el
    dist_g = np.linalg.norm(pos[eg[1]] - pos[eg[0]], axis=-1)
    dist_l = np.linalg.norm(pos[dst] - pos[src], axis=-1)

    t1 = _oracle_pairs(el, n)
    angle1 = angles(pos, t1["idx_i"], t1["idx_j1"], t1["idx_j2"])
    if variant == "full":
        t2 = _oracle_triplets(el, n)
        angle2 = angles(pos, t2["idx_i"], t2["idx_j"], t2["idx_k"])

    rbf_l = bessel_rbf(sd, "rbf_l", dist_l, cutoff_l)
    rbf_g = bessel_rbf(sd, "rbf_g", dist_g, cutoff_g)
    sbf1 = spherical_basis(dist_l, angle1, t1["idx_jj"], cutoff_l)

    ea_rbf_l = mlp(sd, "mlp_rbf_l", rbf_l, 1)
    ea_rbf_g = mlp(sd, "mlp_rbf_g", rbf_g, 1)
    if variant == "full":
        sbf2 = spherical_basis(dist_l, angle2, t2["idx_kj"], cutoff_l)
        ea_sbf2 = mlp(sd, "mlp_sbf2", sbf2, 1)
        ea_sbf1 = mlp(sd, "mlp_sbf1", sbf1, 1)
    else:
        ea_sbf = mlp(sd, "mlp_sbf", sbf1, 1)

    outs, atts = [], []
    for layer in range(n_layer):
        x, og, ag = global_mp(
            sd, f"global_layer.{layer}.", x, ea_rbf_g, eg[0], eg[1], flow,
        )
        if variant == "full":
            x, ol, al = local_mp(
                sd, f"local_layer.{layer}.", x, ea_rbf_l, ea_sbf2, ea_sbf1,
                t2, t1, src, dst,
            )
        else:
            x, ol, al = local_mp_s(
                sd, f"local_layer.{layer}.", x, ea_rbf_l, ea_sbf, t1, src, dst,
            )
        outs.append((og, ol))
        atts.append((ag, al))
    return fuse(outs, atts)


def rna_forward(sd, mol, n_layer=1, cutoff_l=2.6, cutoff_g=20.0):
    """Score one RNA molecule with the reference math, target_to_source flow
    (reference: main_rna_puzzles.py:57, models.py:138-157,221)."""
    pos = mol["pos"].astype(np.float64)
    z = mol["z"].astype(np.int64)

    # knn stays on graphbuild: distance-tie ordering must match production
    # exactly for edge sets to agree (see module docstring).
    eknn = graphbuild.knn_graph_np(mol["pos"], 50, None)
    eknn = _oracle_drop_self_loops(eknn)
    d = np.linalg.norm(pos[eknn[1]] - pos[eknn[0]], axis=-1)
    eg = eknn[:, d <= cutoff_g]
    el = eknn[:, d <= cutoff_l]

    x = sd["embeddings"].astype(np.float64)[z]
    node_out = stack_forward(
        sd, x, pos, eg, el, n_layer, cutoff_l, cutoff_g, "target_to_source"
    )
    return float(node_out.mean())  # global_mean_pool (models.py:221)


def qm9_forward(sd, mol, n_layer, cutoff_l=5.0, cutoff_g=5.0, variant="full"):
    """QM9 branch (reference: models.py:104-115,216 full; 285-353 `_s`):
    local plex = bond graph, global plex = radius(cutoff_g), add-pool."""
    pos = mol["pos"].astype(np.float64)
    z = mol["z"].astype(np.int64)

    el = _oracle_drop_self_loops(np.asarray(mol["edge_index"], np.int64))
    max_nb = 500 if variant == "s" else 1000
    eg = _oracle_radius(mol["pos"], cutoff_g, max_nb)
    eg = _oracle_drop_self_loops(eg)

    x = sd["embeddings"].astype(np.float64)[z]
    node_out = stack_forward(
        sd, x, pos, eg, el, n_layer, cutoff_l, cutoff_g, "source_to_target",
        variant=variant,
    )
    return float(node_out.sum())  # global_add_pool (models.py:216/351)


def pdbbind_forward(sd, mol, n_layer, cutoff_l=2.0, cutoff_g=6.0):
    """PDBbind branch (reference: models.py:117-136,217-219): features through
    init_linear, local = global edges masked to cutoff_l, signed add-pool
    (DeltaE via the +-1 mask on x > 40 A)."""
    pos = np.asarray(mol["pos"], np.float64)
    feat = np.asarray(mol["feat"], np.float64)

    eg = _oracle_radius(mol["pos"], cutoff_g, 1000)
    eg = _oracle_drop_self_loops(eg)
    p32 = np.asarray(mol["pos"], np.float32)
    dist_g = np.sqrt(((p32[eg[1]] - p32[eg[0]]) ** 2).sum(-1)).astype(np.float32)
    el = eg[:, dist_g <= cutoff_l]

    x = linear(sd, "init_linear", feat)
    node_out = stack_forward(
        sd, x, pos, eg, el, n_layer, cutoff_l, cutoff_g, "source_to_target"
    )
    sign = np.where(pos[:, 0] > 40.0, -1.0, 1.0)
    return float((node_out * sign).sum())
