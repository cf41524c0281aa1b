"""Training-TRAJECTORY parity against the reference program itself.

tests/test_reference_exec.py anchors forward + gradient parity to
``/root/reference/models.py`` executed unmodified; these tests extend that
anchor to the full TRAINING DYNAMICS: N optimizer updates of each reference
driver stack, run by the reference's own code (torch, f64) —

* QM9 (main_qm9.py:91-117): Adam + GradualWarmup(ExponentialLR) stepped with
  the fractional epoch AFTER each update + ``clip_grad_norm_(max_norm=1000)``
  + the reference's own ``utils/ema.py`` EMA,
* PDBbind (main_pdbbind.py:82-98): Adam + MultiStepLR stepped per EPOCH +
  MSE, no clip / no EMA,
* RNA (main_rna_puzzles.py:80-94): bare Adam + SmoothL1,
  flow=target_to_source,

— against our ``make_optimizer``/``make_train_step``/``warmup_exponential``/
``multistep``/``ema_update`` stack running the identical batch sequence
(JAX, float64 via ``jax.enable_x64``).  Asserts the per-update LOSS sequence
and the final parameter AND EMA-shadow trees match elementwise.

This is the strongest training-semantics check available offline: an
optimizer-chain ordering bug, an lr off-by-one, a wrong clip norm, or an EMA
decay mistake each shifts the trajectory far beyond the tolerances here.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_available
from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.batch import build_graph_batch
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset, synthetic_rna_dataset
from pamnet_tpu.models import init_pamnet
from pamnet_tpu.train.checkpoint import params_to_torch
from pamnet_tpu.train.loop import init_train_state, make_optimizer, make_train_step
from pamnet_tpu.train.schedules import multistep, warmup_exponential

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.skipif(
        not reference_available(), reason="reference artifacts not mounted"
    ),
    pytest.mark.slow,
]


# ---------------------------------------------------------------------------
# Shared machinery
# ---------------------------------------------------------------------------


def _params_f64(cfg, seed):
    params = init_pamnet(jax.random.PRNGKey(seed), cfg)
    return jax.tree.map(lambda p: np.asarray(p, np.float64), params)


def _ref_model(cfg, params64):
    from test_reference_exec import _ref_model as build

    return build(cfg, params_to_torch(params64))


def _gb_f64(mols, cfg):
    gb = build_graph_batch(
        mols, cfg.dataset_kind, cfg.cutoff_l, cfg.cutoff_g, variant=cfg.variant
    )

    def cast(a):
        a = np.asarray(a)
        return jnp.asarray(a.astype(np.float64) if a.dtype.kind == "f" else a)

    return jax.tree.map(cast, gb)


def _run_jax(cfg, params64, batches, optimizer, loss_kind, use_ema):
    """Our train loop: identical batch sequence, f64 end-to-end (modulo the
    model's tiny fixed-f32 fusion-head casts)."""
    cfg = dataclasses.replace(cfg, compute_dtype="float64")
    step_fn = make_train_step(
        cfg, optimizer, loss_kind, ema_decay=0.999 if use_ema else None
    )
    params64 = jax.tree.map(jnp.asarray, params64)
    state = init_train_state(params64, optimizer, use_ema=use_ema)
    losses = []
    for gb in batches:
        state, loss = step_fn(state, gb)
        losses.append(float(loss))
    return state, losses


def _run_torch(model, datas_per_epoch, epochs, *, lr, loss_fn, clip=None,
               scheduler=None, use_ema=False, dataset_len=None, batch_size=None):
    """The reference driver loop verbatim (main_qm9.py:99-117 /
    main_pdbbind.py:88-98 / main_rna_puzzles.py:86-94)."""
    import warnings

    from refexec import load_reference_module

    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=0,
                           amsgrad=False)
    warm = None
    if scheduler == "warmup_exponential":
        from test_schedule_torch_parity import GradualWarmupScheduler

        sch = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.9961697)
        warm = GradualWarmupScheduler(
            opt, multiplier=1.0, total_epoch=1, after_scheduler=sch
        )
    elif scheduler == "multistep":
        sch = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=[1, 2], gamma=0.2
        )
    ema = None
    if use_ema:
        EMA = load_reference_module("utils.ema").EMA
        ema = EMA(model, decay=0.999)

    losses = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # step(epoch) deprecation
        for epoch in range(epochs):
            for step, (data, y) in enumerate(datas_per_epoch):
                opt.zero_grad()
                out = model(data)
                loss = loss_fn(out, y)
                losses.append(float(loss))
                loss.backward()
                if clip is not None:
                    torch.nn.utils.clip_grad_norm_(
                        model.parameters(), max_norm=clip, norm_type=2
                    )
                opt.step()
                if warm is not None:  # main_qm9.py:114-115
                    curr_epoch = epoch + float(step) / (dataset_len / batch_size)
                    warm.step(curr_epoch)
                if ema is not None:  # main_qm9.py:117
                    ema(model)
            if scheduler == "multistep":  # main_pdbbind.py:98
                sch.step()
    return opt, ema, losses


def _assert_params_close(got_params64, model, rtol, *, label):
    """Final parameter trees elementwise (compared in the torch layout)."""
    got = params_to_torch(got_params64)
    want = {k: p.detach().numpy() for k, p in model.named_parameters()}
    assert set(want) <= set(got)
    for key, w in want.items():
        g = np.asarray(got[key], np.float64)
        scale = max(float(np.abs(w).max()), 1e-8)
        np.testing.assert_allclose(
            g, w, rtol=rtol, atol=rtol * scale,
            err_msg=f"{label} param mismatch at {key}",
        )


def _assert_shadow_close(got_ema64, ema, rtol):
    got = params_to_torch(got_ema64)
    assert set(ema.shadow) <= set(got)
    for key, w in ema.shadow.items():
        w = w.detach().numpy()
        g = np.asarray(got[key], np.float64)
        scale = max(float(np.abs(w).max()), 1e-8)
        np.testing.assert_allclose(
            g, w, rtol=rtol, atol=rtol * scale,
            err_msg=f"EMA shadow mismatch at {key}",
        )


def _batched(mols, bs):
    return [mols[i : i + bs] for i in range(0, len(mols), bs)]


# The model's fusion head carries fixed f32 casts (models/pamnet.py), so the
# two f64 programs differ by ~1e-7 relative per step.  The per-update LOSS
# sequence tracks that floor directly (rtol 1e-5).  Parameters get a looser
# tolerance: Adam's first updates are ~sign(g) = m_hat/(sqrt(v_hat)+eps), so
# a delta-g perturbation on a near-zero gradient entry moves the update by
# ~delta_g/|g| — measured up to ~1e-4 relative here.  Both tolerances sit far
# below any semantic difference (an lr off-by-one alone shifts early-step
# params by >1e-2 relative).
RTOL = 1e-5
PARAM_RTOL = 5e-4


# ---------------------------------------------------------------------------
# QM9: Adam + warmup/exponential + clip(1000) + EMA + L1
# ---------------------------------------------------------------------------


def test_qm9_training_trajectory_matches_reference():
    cfg = PAMNetConfig(dataset="QM9", dim=16, n_layer=2)
    lr, bs, epochs = 1e-3, 2, 3
    mols = synthetic_qm9_dataset(6, seed=91)
    batches = _batched(mols, bs)

    with jax.enable_x64():
        params64 = _params_f64(cfg, 41)
        model = _ref_model(cfg, params64)

        import torch.nn.functional as F

        from refexec import mols_to_data

        datas = [(mols_to_data(b, "qm9"), torch.tensor([m["y"] for m in b],
                                                       dtype=torch.float64))
                 for b in batches]
        opt, ema, ref_losses = _run_torch(
            model, datas, epochs, lr=lr, loss_fn=F.l1_loss, clip=1000.0,
            scheduler="warmup_exponential", use_ema=True,
            dataset_len=len(mols), batch_size=bs,
        )

        sched = warmup_exponential(lr, steps_per_epoch=len(batches))
        optimizer = make_optimizer(sched, weight_decay=0.0, clip_norm=1000.0)
        gbs = [_gb_f64(b, cfg) for b in batches] * epochs
        state, losses = _run_jax(cfg, params64, gbs, optimizer, "l1",
                                 use_ema=True)

        np.testing.assert_allclose(losses, ref_losses, rtol=RTOL,
                                   err_msg="per-update loss sequence")
        _assert_params_close(state.params, model, PARAM_RTOL, label="QM9")
        _assert_shadow_close(state.ema, ema, PARAM_RTOL)


# ---------------------------------------------------------------------------
# PDBbind: Adam + per-epoch MultiStepLR + MSE (no clip, no EMA)
# ---------------------------------------------------------------------------


def test_pdbbind_training_trajectory_matches_reference():
    cfg = PAMNetConfig(dataset="PDBbind", dim=16, n_layer=2,
                       cutoff_l=2.0, cutoff_g=6.0)
    lr, bs, epochs = 1e-3, 2, 3
    from test_reference_exec import _pdbbind_mol

    rng = np.random.default_rng(92)
    mols = [_pdbbind_mol(rng) for _ in range(4)]
    batches = _batched(mols, bs)

    with jax.enable_x64():
        params64 = _params_f64(cfg, 42)
        model = _ref_model(cfg, params64)

        import torch.nn.functional as F

        from refexec import mols_to_data

        datas = [(mols_to_data(b, "pdbbind"),
                  torch.tensor([m["y"] for m in b], dtype=torch.float64))
                 for b in batches]
        opt, _, ref_losses = _run_torch(
            model, datas, epochs, lr=lr, loss_fn=F.mse_loss,
            scheduler="multistep",
        )

        # milestones=[1,2] epochs exercises the per-epoch MultiStepLR
        # placement (main_pdbbind.py:98) inside a 3-epoch test.
        sched = multistep(lr, steps_per_epoch=len(batches),
                          milestones=(1, 2), gamma=0.2)
        optimizer = make_optimizer(sched, weight_decay=0.0)
        gbs = [_gb_f64(b, cfg) for b in batches] * epochs
        state, losses = _run_jax(cfg, params64, gbs, optimizer, "mse",
                                 use_ema=False)

        np.testing.assert_allclose(losses, ref_losses, rtol=RTOL,
                                   err_msg="per-update loss sequence")
        _assert_params_close(state.params, model, PARAM_RTOL, label="PDBbind")


# ---------------------------------------------------------------------------
# RNA: bare Adam + SmoothL1, flow=target_to_source
# ---------------------------------------------------------------------------


def test_rna_training_trajectory_matches_reference():
    cfg = PAMNetConfig(dataset="rna_synth", dim=16, n_layer=2,
                       cutoff_l=2.6, cutoff_g=20.0, flow="target_to_source")
    lr, bs, epochs = 1e-3, 2, 2
    from test_reference_exec import _rna_mol

    mols = [_rna_mol(g) for g in synthetic_rna_dataset(4, seed=93)]
    batches = _batched(mols, bs)

    with jax.enable_x64():
        params64 = _params_f64(cfg, 43)
        model = _ref_model(cfg, params64)

        import torch.nn.functional as F

        from refexec import mols_to_data

        datas = [(mols_to_data(b, "rna"),
                  torch.tensor([m["y"] for m in b], dtype=torch.float64))
                 for b in batches]
        opt, _, ref_losses = _run_torch(
            model, datas, epochs, lr=lr, loss_fn=F.smooth_l1_loss,
        )

        optimizer = make_optimizer(lambda step: lr, weight_decay=0.0)
        gbs = [_gb_f64(b, cfg) for b in batches] * epochs
        state, losses = _run_jax(cfg, params64, gbs, optimizer, "smooth_l1",
                                 use_ema=False)

        np.testing.assert_allclose(losses, ref_losses, rtol=RTOL,
                                   err_msg="per-update loss sequence")
        _assert_params_close(state.params, model, PARAM_RTOL, label="RNA")
