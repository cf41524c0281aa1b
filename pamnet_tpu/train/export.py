"""Export pamnet_tpu parameters as a torch state_dict (interop: users of the
reference implementation can load checkpoints trained here).

Inverse of ``checkpoint.torch_to_params``: walks the parameter pytree and
emits reference module-path keys (weights transposed back to torch's
(out, in) layout).
"""

from __future__ import annotations

import numpy as np


def params_to_torch_state_dict(params: dict) -> "dict[str, object]":
    """Return an OrderedDict of torch tensors keyed like the reference
    modules (models.py:21-56 naming)."""
    import collections

    import torch

    out: "collections.OrderedDict[str, torch.Tensor]" = collections.OrderedDict()

    def tensor(x, transpose=False):
        a = np.array(x)  # copy: jax arrays are non-writable numpy views
        if transpose:
            a = a.T
        return torch.from_numpy(np.ascontiguousarray(a))

    def emit_linear(prefix, p):
        out[prefix + ".weight"] = tensor(p["w"], transpose=True)
        if "b" in p:
            out[prefix + ".bias"] = tensor(p["b"])

    def emit_mlp(prefix, stages):
        for s, lin in enumerate(stages):
            emit_linear(f"{prefix}.{s}.0", lin)

    def emit_res(prefix, p):
        emit_mlp(prefix + ".mlp", p["mlp"])

    def emit_layer(prefix, p):
        # Deterministic reference ordering is not required by torch load;
        # emit in a stable sorted order.
        for name, val in p.items():
            if name == "W":
                out[f"{prefix}.W"] = tensor(val)
            elif name.startswith("res"):
                emit_res(f"{prefix}.{name}", val)
            elif name in ("W_edge_attr", "W_out", "lin_rbf", "lin_rbf_out"):
                emit_linear(f"{prefix}.{name}", val)
            else:  # mlp_* stacks
                emit_mlp(f"{prefix}.{name}", val)

    for key, val in params.items():
        if key == "embeddings":
            out["embeddings"] = tensor(val)
        elif key in ("rbf_g", "rbf_l"):
            out[f"{key}.freq"] = tensor(val["freq"])
        elif key == "init_linear":
            emit_linear("init_linear", val)
        elif key in ("global_layers", "local_layers"):
            ref = key[:-1]  # global_layer / local_layer
            for i, layer in enumerate(val):
                emit_layer(f"{ref}.{i}", layer)
        else:  # model-level mlp_* stacks
            emit_mlp(key, val)
    return out


def save_torch_checkpoint(path: str, params: dict) -> None:
    import torch

    torch.save(params_to_torch_state_dict(params), path)
