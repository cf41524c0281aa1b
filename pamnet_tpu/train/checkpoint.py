"""Checkpointing.

Two responsibilities:

1. **Torch-legacy ingestion**: load the reference's bundled
   ``save/pamnet_rna.pt`` (pre-zip torch pickle of a state_dict; see
   SURVEY.md section 2.1 bundled artifacts) and map module-path keys onto our
   parameter pytree.  Weight matrices transpose (torch Linear stores
   (out, in); we store (in, out)).

2. **Native full-train-state checkpoints** (params + optimizer + EMA + step),
   fixing the reference's save-only/no-resume gap (SURVEY.md section 5):
   msgpack via ``flax.serialization`` written atomically.
"""

from __future__ import annotations

import os
import re

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Torch-legacy state_dict -> parameter pytree
# ---------------------------------------------------------------------------

# Sequential-of-Sequential MLP names at the model level and inside layers
# (reference: models.py:41-44, global_message_passing.py:14-25,
# local_message_passing.py:14-28).
_MLP_NAMES = {
    "mlp_rbf_g", "mlp_rbf_l", "mlp_sbf1", "mlp_sbf2", "mlp_sbf",
    "mlp_x1", "mlp_x2", "mlp_m", "mlp_m_ji", "mlp_m_kj", "mlp_m_jj",
    "mlp_out",
}
# Bare Linear modules (weight [+ bias], no Sequential nesting).
_LINEAR_NAMES = {"W_edge_attr", "W_out", "lin_rbf", "lin_rbf_out", "init_linear"}


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint (legacy or zip format) into numpy arrays.

    Uses the first-party reader (utils/torchpickle.py) so the inference path
    has no torch runtime dependency; falls back to torch (if importable) for
    exotic serializations the reader doesn't cover."""
    try:
        from pamnet_tpu.utils.torchpickle import load_torch_pickle

        sd = load_torch_pickle(path)
        return {k: np.asarray(v) for k, v in sd.items()}
    except Exception:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()}


def _ensure_mlp(container: dict, name: str, stage: int) -> dict:
    lst = container.setdefault(name, [])
    while len(lst) <= stage:
        lst.append({})
    return lst[stage]


def torch_to_params(sd: dict[str, np.ndarray]) -> dict:
    """Map reference state_dict keys onto the pamnet_tpu parameter pytree.

    Handles both PAMNet and PAMNet_s trees; layer lists are sized by the
    largest index present.
    """
    params: dict = {}

    def place(container: dict, parts: list[str], value: np.ndarray):
        head = parts[0]
        if head in ("embeddings", "W"):
            container[head] = jnp.asarray(value)
        elif head in ("rbf_g", "rbf_l"):
            container.setdefault(head, {})["freq"] = jnp.asarray(value)
        elif head in _LINEAR_NAMES:
            kind = parts[1]  # weight | bias
            tgt = container.setdefault(head, {})
            if kind == "weight":
                tgt["w"] = jnp.asarray(value.T)
            else:
                tgt["b"] = jnp.asarray(value)
        elif head in _MLP_NAMES:
            # <name>.<stage>.0.(weight|bias)
            stage, kind = int(parts[1]), parts[3]
            lin = _ensure_mlp(container, head, stage)
            lin["w" if kind == "weight" else "b"] = jnp.asarray(
                value.T if kind == "weight" else value
            )
        elif head in ("res1", "res2", "res3"):
            # res.mlp.<stage>.0.(weight|bias)
            stage, kind = int(parts[2]), parts[4]
            lin = _ensure_mlp(container.setdefault(head, {}), "mlp", stage)
            lin["w" if kind == "weight" else "b"] = jnp.asarray(
                value.T if kind == "weight" else value
            )
        elif head in ("global_layer", "local_layer"):
            idx = int(parts[1])
            lst = params.setdefault(head + "s", [])
            while len(lst) <= idx:
                lst.append({})
            place(lst[idx], parts[2:], value)
        else:
            raise KeyError(f"unrecognized reference parameter: {'.'.join(parts)}")

    for key, value in sd.items():
        place(params, key.split("."), value)
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Legacy-torch checkpoint -> pamnet_tpu params (north-star oracle:
    reference README.md:107-109 RNA scoring reproduction)."""
    return torch_to_params(load_torch_state_dict(path))


def params_to_torch(params: dict) -> dict[str, np.ndarray]:
    """Inverse of :func:`torch_to_params`: map a pamnet_tpu parameter pytree
    onto the reference's ``state_dict`` key layout (models.py:22-56,
    global_message_passing.py:14-26, local_message_passing.py:14-29), so
    models trained here load into the reference implementation.  Weight
    matrices transpose back to torch's (out, in) Linear convention.
    Sub-f32 floats (bf16/f16 training states) are upcast to f32, the
    reference's dtype; f32/f64 pass through unchanged (no silent
    downcast — same rule as ops/ell.py's accumulation dtype)."""
    out: dict[str, np.ndarray] = {}

    def emit(key: str, value, transpose: bool = False):
        arr = np.asarray(value)
        if transpose:
            arr = arr.T
        if arr.dtype.itemsize < 4 and "float" in arr.dtype.name:
            arr = arr.astype(np.float32)
        out[key] = np.ascontiguousarray(arr)

    def emit_mlp(prefix: str, stages):
        for i, lin in enumerate(stages):
            emit(f"{prefix}.{i}.0.weight", lin["w"], transpose=True)
            if "b" in lin:
                emit(f"{prefix}.{i}.0.bias", lin["b"])

    def walk(container: dict, prefix: str):
        for name, value in container.items():
            key = prefix + name
            if name in ("embeddings", "W"):
                emit(key, value)
            elif name in ("rbf_g", "rbf_l"):
                emit(key + ".freq", value["freq"])
            elif name in _LINEAR_NAMES:
                emit(key + ".weight", value["w"], transpose=True)
                if "b" in value:
                    emit(key + ".bias", value["b"])
            elif name in _MLP_NAMES:
                emit_mlp(key, value)
            elif name in ("res1", "res2", "res3"):
                emit_mlp(key + ".mlp", value["mlp"])
            elif name in ("global_layers", "local_layers"):
                for i, layer in enumerate(value):
                    walk(layer, f"{name[:-1]}.{i}.")
            else:
                raise KeyError(f"unrecognized pamnet_tpu parameter: {key}")

    walk(params, "")
    return out


def save_torch_checkpoint(path: str, params: dict) -> None:
    """Write a pamnet_tpu parameter pytree as a reference-compatible
    ``torch.save`` state_dict archive (first-party writer, no torch)."""
    from pamnet_tpu.utils.torchpickle import save_torch_pickle

    save_torch_pickle(path, params_to_torch(params))


# ---------------------------------------------------------------------------
# Native train-state checkpoints (full resume capability)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state) -> None:
    """Atomic msgpack write of an arbitrary pytree (train state).

    Leaves are pulled to host with ONE ``jax.device_get`` (which issues the
    device->host copies for every leaf asynchronously before materializing)
    rather than letting serialization fetch leaf-by-leaf — the serial path
    pays one device round-trip per parameter tensor, which measured 18.8 s
    per save over this pool's TPU tunnel (~0.4 s batched)."""
    import jax
    from flax import serialization

    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, template):
    """Restore a pytree saved by :func:`save_checkpoint`; ``template`` gives
    the tree structure/shapes (e.g. a freshly-initialized train state)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_params(path: str, params_template):
    """Restore just the model parameters from a native checkpoint, whether it
    holds a full train state (params+opt+EMA+step, as the drivers save) or a
    bare parameter tree — the inference-side loader."""
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
        raw = raw["params"]
    return serialization.from_state_dict(params_template, raw)
