"""Torch-checkpoint import: reference `.pth` state dicts -> RefCondMLP.

The reference trains `ConditionalDiffusionModel`
(ERT_Conditional_Diffusion.py:121-164) and checkpoints it with
`torch.save(model.state_dict(), ...)` (`:340-345`). This module maps
those state dicts onto `ertdx.models.RefCondMLP` parameters so a
reference user can carry TRAINED WEIGHTS across instead of retraining:

    params = ertdx.compat.torch_reference_params("best_model.pth")
    eps = model.apply({"params": params}, x, t, condition)

Layout notes: torch Linear stores (out, in) -> flax Dense (in, out)
(transpose); torch Conv1d stores (out, in, k) -> flax Conv (k, in, out)
(transpose (2, 1, 0)); ertdx is feature-last so only the weight layout
changes, not the math. The reference concatenates [x, t_emb, cond_emb]
(`:161`) in the same order as RefCondMLP.denoise, so `mlp.0` needs no
column permutation. Forward equivalence vs an independently built torch
twin is pinned in tests/test_compat.py.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


# torch state-dict key -> (RefCondMLP param path, transform)
_MAP = {
    "condition_encoder.0.weight": ("conv1/Conv_0/kernel", (2, 1, 0)),
    "condition_encoder.0.bias": ("conv1/Conv_0/bias", None),
    "condition_encoder.2.weight": ("conv2/Conv_0/kernel", (2, 1, 0)),
    "condition_encoder.2.bias": ("conv2/Conv_0/bias", None),
    # Sequential indices: 0 Conv, 1 ReLU, 2 Conv, 3 ReLU, 4 AvgPool,
    # 5 Flatten, 6 Linear, 7 ReLU
    "condition_encoder.6.weight": ("cond_proj/Dense_0/kernel", (1, 0)),
    "condition_encoder.6.bias": ("cond_proj/Dense_0/bias", None),
    "time_embed.0.weight": ("time_proj/Dense_0/kernel", (1, 0)),
    "time_embed.0.bias": ("time_proj/Dense_0/bias", None),
    "mlp.0.weight": ("head1/Dense_0/kernel", (1, 0)),
    "mlp.0.bias": ("head1/Dense_0/bias", None),
    "mlp.2.weight": ("head2/Dense_0/kernel", (1, 0)),
    "mlp.2.bias": ("head2/Dense_0/bias", None),
}


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):                   # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def torch_reference_params(state: Any) -> Dict:
    """Reference torch state dict (or a `.pth` path) -> RefCondMLP params.

    Accepts a path to a `torch.save`d state dict, the state dict itself
    (torch tensors or arrays), or a full-checkpoint dict containing a
    `state_dict`/`model` entry. Raises KeyError listing anything missing.
    """
    if isinstance(state, (str, bytes)) or hasattr(state, "__fspath__"):
        import torch
        state = torch.load(state, map_location="cpu", weights_only=True)
    if isinstance(state, Mapping):
        for alias in ("state_dict", "model"):
            inner = state.get(alias)
            if isinstance(inner, Mapping) and "mlp.0.weight" in inner:
                state = inner
                break

    missing = [k for k in _MAP if k not in state]
    if missing:
        raise KeyError(
            f"not a reference ConditionalDiffusionModel state dict; "
            f"missing keys: {missing}")

    params: Dict = {}
    for tkey, (path, perm) in _MAP.items():
        arr = _to_numpy(state[tkey])
        if perm is not None:
            arr = arr.transpose(perm)
        node = params
        *parents, leaf = path.split("/")
        for part in parents:
            node = node.setdefault(part, {})
        node[leaf] = arr
    return params
