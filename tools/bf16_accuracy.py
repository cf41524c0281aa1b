"""Measured accuracy statement for bfloat16 compute (DEVNOTES.md / VERDICT
round-1 item 2): forward-output deltas of compute_dtype=bfloat16 vs float32
on (a) the QM9 golden fixture (both variants), (b) the 21 bundled RNA natives
scored with the reference checkpoint against the committed f64 oracle
goldens.  Runs on CPU.

Usage: python tools/bf16_accuracy.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
from pamnet_tpu.models import apply_pamnet, init_pamnet


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6)))


def qm9_deltas():
    for variant in ("full", "s"):
        cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, variant=variant)
        mols = synthetic_qm9_dataset(8, seed=1234)
        gb = jax.tree.map(jnp.asarray, build_graph_batch(mols, "qm9", 5.0, 5.0,
                                                         variant=variant))
        params = init_pamnet(jax.random.PRNGKey(7), cfg)
        f32 = apply_pamnet(params, gb, cfg)
        b16 = apply_pamnet(params, gb,
                           dataclasses.replace(cfg, compute_dtype="bfloat16"))
        print(f"qm9 {variant}: max rel delta bf16 vs f32 = {rel(b16, f32):.3e}  "
              f"(outputs ~ {np.asarray(f32)[:3]})")


def rna_deltas():
    from pamnet_tpu.data.tu import TUDataset
    from pamnet_tpu.train.checkpoint import load_torch_checkpoint

    ref = os.environ.get("PAMNET_REFERENCE_ROOT", "/root/reference")
    data = os.path.join(ref, "data", "RNA-Puzzles")
    ckpt = os.path.join(ref, "save", "pamnet_rna.pt")
    if not os.path.exists(ckpt):
        print("rna: reference artifacts not mounted; skipped")
        return
    cfg = PAMNetConfig(dataset="rna_native", dim=16, n_layer=1, cutoff_l=2.6,
                       cutoff_g=20.0, flow="target_to_source")
    params = load_torch_checkpoint(ckpt)
    ds = TUDataset(data, "rna_native")
    names = ds.graph_names() if hasattr(ds, "graph_names") else None
    mols = ds.molecules()
    worst32 = worst16 = 0.0
    for i, mol in enumerate(mols):
        gb = jax.tree.map(jnp.asarray, build_graph_batch([mol], "rna", 2.6, 20.0))
        s32 = float(apply_pamnet(params, gb, cfg)[0])
        s16 = float(apply_pamnet(
            params, gb, dataclasses.replace(cfg, compute_dtype="bfloat16"))[0])
        d = abs(s16 - s32) / abs(s32)
        worst16 = max(worst16, d)
        tag = names[i] if names else i
        print(f"rna {tag}: f32={s32:.6f} bf16={s16:.6f} rel={d:.3e}")
    print(f"rna: worst bf16-vs-f32 rel delta over 21 natives = {worst16:.3e}")


if __name__ == "__main__":
    qm9_deltas()
    rna_deltas()
