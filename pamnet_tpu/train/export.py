"""Export pamnet_tpu parameters as a torch state_dict (interop: users of the
reference implementation can load checkpoints trained here).

The name/layout mapping lives in ``checkpoint.params_to_torch`` (the inverse
of ``checkpoint.torch_to_params``); this module wraps it for callers that
want live ``torch.Tensor`` objects.  Writing a ``.pt`` file needs no torch
at all — ``checkpoint.save_torch_checkpoint`` uses the first-party writer
(utils/torchpickle.py::save_torch_pickle); ``tools/export_torch.py`` is the
CLI.
"""

from __future__ import annotations

from pamnet_tpu.train.checkpoint import save_torch_checkpoint  # noqa: F401


def params_to_torch_state_dict(params: dict) -> "dict[str, object]":
    """Return an OrderedDict of torch tensors keyed like the reference
    modules (models.py:21-56 naming).  Requires torch (test/interop use);
    prefer :func:`save_torch_checkpoint` for writing files."""
    import collections

    import torch

    from pamnet_tpu.train.checkpoint import params_to_torch

    return collections.OrderedDict(
        (k, torch.from_numpy(v)) for k, v in params_to_torch(params).items()
    )
